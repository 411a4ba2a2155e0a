package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Connected-components equivalence: the large-star/small-star contraction
  * (the 100 TB path behind nearDupClusters) must produce the SAME labels as
  * plain min-label propagation on every graph shape, while its round count
  * is bounded by O(log n) instead of the graph diameter.
  */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelsOf(pairs: Seq[(Long, Long)],
                       cc: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame, Int))
  : (Set[(Long, Long)], Int) = {
    import spark.implicits._
    val (df, rounds) = cc(pairs.toDF("d1", "d2"))
    (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, rounds)
  }

  private def assertSameLabels(pairs: Seq[(Long, Long)], hint: String): (Int, Int) = {
    val (prop, pr) = labelsOf(pairs, Dedup.ccPropagate)
    val (star, sr) = labelsOf(pairs, Dedup.ccStarContract)
    assert(star == prop, s"$hint: star-contraction labels diverge from propagation")
    (pr, sr)
  }

  test("empty graph: both algorithms return no labels") {
    assertSameLabels(Seq.empty, "empty")
  }

  test("single pair and a two-pair chain") {
    assertSameLabels(Seq((2L, 1L)), "pair")
    assertSameLabels(Seq((1L, 2L), (2L, 3L)), "chain-3")
  }

  test("clique, star, and two disjoint components") {
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assertSameLabels(clique, "clique-5")
    assertSameLabels((2L to 8L).map(i => (1L, i)), "star-8")
    assertSameLabels(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)), "two-components")
  }

  test("seeded random graphs: labels identical across algorithms") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter(p => p._1 != p._2)
      assertSameLabels(pairs, s"random-$n")
    }
  }

  test("planted long chain: star-contraction needs far fewer rounds than propagation") {
    // a 48-node path: min-label propagation moves the minimum one hop per
    // iteration (diameter-bound); the contraction halves path lengths each
    // alternation (log-bound). Descending ids make it adversarial for the
    // min's travel direction.
    val chain = (1L until 48L).map(i => (48L - i, 48L - i + 1))
    val (propRounds, starRounds) = assertSameLabels(chain, "chain-48")
    assert(propRounds > 20,
      s"propagation on a 47-edge path should be diameter-bound, took $propRounds")
    assert(starRounds <= 10,
      s"star contraction should be log-bound, took $starRounds rounds")
    assert(starRounds * 2 < propRounds,
      s"contraction ($starRounds) must beat propagation ($propRounds) decisively")
  }

  test("q86: a planted cross-split near-dup pair is reported; " +
    "driver-side recomputation from q22 pairs + split map agrees") {
    import org.apache.spark.sql.functions._
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    graft.functions.GraftFunctions.register(spark2)
    // find two ids in different splits by evaluating the split hash
    val splits = spark2.range(1, 200)
      .select(col("id"),
        pmod(graft.functions.GraftFunctions.phash60(col("id")), lit(100L))
          .as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = splits.collectFirst { case (i, h) if h < 90 => i }.get
    val testId = splits.collectFirst { case (i, h) if h >= 95 => i }.get
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (trainId, text), (testId, text + " w11"),
      (9999L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsLshVerified(docs, 800)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((math.min(trainId, testId), math.max(trainId, testId))))

    // fixture-scale: q86 output == q22 pairs filtered by differing splits
    val D = graft.TestSpark.SF001
    val pairSplits = Dedup.queries("q22_minhash_lsh")(spark2, D)
      .select("d1", "d2", "jaccard_x1e3").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def splitOf(id: Long): String = {
      val h = spark2.range(id, id + 1)
        .select(pmod(graft.functions.GraftFunctions.phash60(col("id")),
          lit(100L))).collect()(0).getLong(0)
      if (h < 90) "train" else if (h < 95) "val" else "test"
    }
    val expected = pairSplits.collect {
      case (d1, d2, j) if splitOf(d1) != splitOf(d2) => (d1, d2, j)
    }.toSet
    val q86 = Dedup.queries("q86_split_leakage")(spark2, D)
      .select("d1", "d2", "jaccard_x1e3").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q86 === expected)
    assert(q86.nonEmpty, "fixture must exercise at least one leak")
  }

  test("q87: an embedded excerpt is containment-caught and Jaccard-" +
    "missed; symmetric twins are excluded") {
    import org.apache.spark.sql.functions._
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (1 to 12).map(i => s"w$i").mkString(" ")   // prefix excerpt
    val docs = Seq(
      (1L, big), (2L, quote),                 // asymmetric inclusion
      (3L, big + " tail"), (4L, big + " fin") // symmetric near-identical
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set((1L, 2L), (2L, 3L), (2L, 4L)),
      s"excerpt must pair with each containing doc and nothing else: $got")
    val (jac, cont) = got((1L, 2L))
    assert(cont === 1000L, s"full inclusion must score containment 1.0: $got")
    assert(jac < 800L, s"the same pair must sit below the Jaccard gate: $got")
    // the symmetric near-identical pair (3,4) is high-Jaccard — excluded
    assert(!got.contains((3L, 4L)))
  }
}

