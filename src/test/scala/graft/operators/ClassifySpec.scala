package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** q79 behavioral pins — the oracle owns value exactness; these pin that
  * the classifier actually learns (separable vocab -> perfect confusion
  * diagonal), that prediction is layout-invariant, and that the scoring
  * join keeps the model broadcast-side.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two "languages" with disjoint vocabularies: training exemplars and
    * held-out docs drawn from the same vocab per class.
    */
  private def fixture = {
    import spark.implicits._
    val aa = "alpha beta gamma delta alpha beta"
    val bb = "uno dos tres quatro uno dos"
    (Seq(
      (1L, aa, "aa"), (2L, aa + " gamma delta", "aa"),
      (3L, bb, "bb"), (4L, bb + " tres quatro", "bb"),
      (10L, "alpha gamma delta beta", "aa"),
      (11L, "beta alpha alpha gamma", "aa"),
      (12L, "dos uno tres quatro", "bb"),
      (13L, "quatro tres dos uno uno", "bb")
    ).toDF("doc_id", "text", "lang"))
  }

  test("disjoint-vocabulary classes classify perfectly (diagonal " +
    "confusion matrix)") {
    import spark.implicits._
    val labeled = fixture.filter(col("doc_id") < 10).select("doc_id", "lang")
    val (model, prior) = Classify.nbTrain(fixture, labeled)
    val pred = Classify.nbPredict(fixture, labeled, model, prior)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(10L -> "aa", 11L -> "aa", 12L -> "bb", 13L -> "bb"))
  }

  test("prediction is layout-invariant") {
    val labeled = fixture.filter(col("doc_id") < 10).select("doc_id", "lang")
    val (m1, p1) = Classify.nbTrain(fixture, labeled)
    val a = Classify.nbPredict(fixture, labeled, m1, p1)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val shuffled = fixture.repartition(7)
    val (m2, p2) = Classify.nbTrain(shuffled, labeled)
    val b = Classify.nbPredict(shuffled, labeled, m2, p2)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("streaming classify against the saved model artifact == batch " +
    "scoring, incl. across a replayed batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val labeled = fixture.filter(col("doc_id") < 10).select("doc_id", "lang")
    val (model, prior) = Classify.nbTrain(fixture, labeled)
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    Classify.saveModel(s"$dir/model", model, prior)
    // artifact round-trip preserves the model relations exactly
    val (m2, p2) = Classify.loadModel(s"$dir/model", spark)
    assert(m2.collect().map(_.toSeq).toSet ===
      model.collect().map(_.toSeq).toSet)
    assert(p2.collect().map(_.toSeq).toSet ===
      prior.collect().map(_.toSeq).toSet)

    val rows = fixture.select("doc_id", "text")
      .as[(Long, String)].collect()
    val (b1, b2) = rows.partition(_._1 < 10)
    val in = MemoryStream[(Long, String)](spark)
    val q = Classify.streamingClassify(in.toDF().toDF("doc_id", "text"),
      s"$dir/model", s"$dir/out", s"$dir/ckpt")
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "pred_lang").collect().map(_.toSeq).toSet
    val batch = Classify.nbScore(fixture, model, prior)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("confusion matrix accounts for every held-out document and the " +
    "model join is broadcast") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.SF0001)
    val conf = Classify.nbLangidConfusion(docs)
    val plan = conf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val total = conf.collect().map(_.getLong(2)).sum
    val langs = docs.select("lang").distinct().count()
    assert(total === docs.count() - langs * Classify.NB_PER_LANG)
  }
}
