package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** q77 behavioral pins. Value exactness is the DuckDB oracle's job; these
  * pin the model property that motivates a bigram gate at all: word ORDER
  * moves the score while a unigram model is blind to it.
  */
class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scrambled word order scores below natural order; unigram model " +
    "cannot separate them") {
    import spark.implicits._
    val natural = "the cat sat on the mat and the dog sat on the rug"
    // same multiset of tokens, permuted so common bigrams break
    val scrambled = "mat the on dog sat rug the cat the and on sat the"
    val filler = (1 to 20).map(i =>
      (100L + i, s"the cat sat on the mat and bird $i flew over the mat"))
    val docs = (Seq((1L, natural), (2L, scrambled)) ++ filler)
      .toDF("doc_id", "text")

    val bi = TextAnalysis.bigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bi(1L) > bi(2L),
      s"natural order must outscore scrambled: ${bi(1L)} vs ${bi(2L)}")

    val uni = TextAnalysis.unigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni(1L) === uni(2L),
      "unigram scores are order-blind on a token permutation")
  }

  test("docs with fewer than two tokens are excluded; scores are " +
    "layout-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "single"), (2L, "two tokens here"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprob(docs).collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))

    val base = Seq((1L, "a b c a b"), (2L, "b a c b a"), (3L, "a b a b a"))
      .toDF("doc_id", "text")
    val x = TextAnalysis.bigramLogprob(base).collect().map(_.toSeq).toSeq
    val y = TextAnalysis.bigramLogprob(base.repartition(5))
      .collect().map(_.toSeq).toSeq
    assert(x === y)
  }

  test("model join is not a broadcast: the bigram model must stay " +
    "shuffle-side at scale") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c a")).toDF("doc_id", "text")
    // disable size-based auto-broadcast so the plan shows the HINTED
    // shape: with no explicit broadcast on the model relation, the
    // (w1,w2) lookup must plan as a shuffled join — the corpus-scale
    // contract (a size-estimate broadcast at fixture scale is fine and
    // AQE may still do it in production; an explicit hint would not)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = TextAnalysis.bigramLogprob(docs)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }
}
