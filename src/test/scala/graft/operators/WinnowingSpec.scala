package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** q82 behavioral pins: the winnowing guarantee (any shared token run of
  * length >= w + k - 1 yields a shared fingerprint), the density
  * reduction that motivates the algorithm, and layout invariance.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("guarantee: a shared 7-token run (w+k-1 with k=4, w=4) always " +
    "produces a shared fingerprint") {
    import spark.implicits._
    val run = "r1 r2 r3 r4 r5 r6 r7"
    // the run sits at different offsets inside otherwise-disjoint docs
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5 a6 a7 a8"),
      (2L, s"b1 $run b2 b3 b4 b5 b6 b7 b8 b9"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowingFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) >= 1L && got(2L) >= 1L,
      s"the shared run must survive winnowing in both docs: $got")
    assert(got(3L) === 0L, s"the disjoint doc shares nothing: $got")
  }

  test("density: winnowing keeps far fewer fingerprints than positions " +
    "and is layout-invariant") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.SF0001)
    val out = TextAnalysis.winnowingFingerprints(docs)
    val rows = out.collect()
    val (grams, fps) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(fps > 0 && fps < grams / 2,
      s"expected ~2/(w+1) density, got $fps of $grams")
    val shuffled = TextAnalysis.winnowingFingerprints(docs.repartition(13))
      .collect().map(_.toSeq).toSeq
    assert(shuffled === rows.map(_.toSeq).toSeq)
  }
}
