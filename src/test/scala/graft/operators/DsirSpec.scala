package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** q76 (DSIR importance resampling) behavioral pins. The value-exactness
  * of the weights is the DuckDB oracle's job; these tests pin the parts an
  * oracle can't see: that the ranking actually prefers target-domain-like
  * documents, that the score is invariant to physical layout, and that the
  * plan keeps the model state on the broadcast side.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  /** Synthetic corpus with a clean domain split: `med*` documents share a
    * vocabulary disjoint from `web*` documents, and two held-out docs mix
    * them. Bigrams follow the same split, so feature overlap == domain.
    */
  private def fixture = {
    import spark.implicits._
    val med = "dose patient trial cohort placebo outcome dose patient"
    val web = "click buy cheap deal offer click buy now deal offer"
    val mix = "dose patient click buy trial cohort deal offer"
    (Seq(
      ("t1", med), ("t2", med + " cohort placebo"), // target exemplars
      ("m1", med), ("m2", med + " outcome cohort"), // in-domain, unlabeled
      ("x1", mix),                                  // half in-domain
      ("w1", web), ("w2", web + " now cheap")       // out-of-domain
    ).toDF("doc_id", "text"))
  }

  test("in-domain documents outrank mixed, mixed outrank out-of-domain") {
    import spark.implicits._
    val target = Seq("t1", "t2").toDF("doc_id")
    val got = Curation.dsirSelectAgainst(fixture, target, buckets = 64,
        topK = 10, cache = false)
      .select("doc_id").as[String].collect().toSeq
    assert(got.length === 5, "target docs must be excluded from selection")
    assert(!got.contains("t1") && !got.contains("t2"))
    val rank = got.zipWithIndex.toMap
    assert(rank("m1") < rank("x1") && rank("m2") < rank("x1"),
      s"pure in-domain must beat the mixed doc: $got")
    assert(rank("x1") < rank("w1") && rank("x1") < rank("w2"),
      s"the mixed doc must beat pure out-of-domain: $got")
  }

  test("weights are layout-invariant (repartition/shuffle cannot move " +
    "a score)") {
    import spark.implicits._
    val target = Seq("t1", "t2").toDF("doc_id")
    val a = Curation.dsirSelectAgainst(fixture, target, 64, 10, cache = false)
      .collect().map(_.toSeq).toSeq
    val b = Curation.dsirSelectAgainst(fixture.repartition(7), target, 64, 10,
        cache = false)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("model state stays broadcast-side: no SortMergeJoin against the " +
    "bucket log-ratio table, and the target-id joins broadcast") {
    val plan = Curation.dsirSelect(Tables.documents(spark, D), cache = false)
      .queryExecution.executedPlan.toString
    // the lr relation is `buckets` rows: it must arrive via broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the only acceptable shuffled joins would be corpus-x-corpus; there
    // are none in this plan — every join carries a broadcast side
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q83: a source with alien vocabulary drifts far above sources " +
    "drawn from the shared distribution") {
    import spark.implicits._
    val common = "the data spark query table join row filter group sort"
    val alien = "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6 zzq7 zzq8 zzq9 zzq10"
    val docs = (
      (1 to 20).map(i => (i.toLong, common, s"src${i % 4}")) ++
      (21 to 25).map(i => (i.toLong, alien, "bad_feed"))
    ).toDF("doc_id", "text", "source")
    val d = Curation.sourceDrift(docs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val normals = (0 to 3).map(i => d(s"src$i"))
    assert(normals.forall(n => d("bad_feed") > n + 100000),
      s"alien source must dominate drift by a wide margin: $d")
    // layout invariance
    val d2 = Curation.sourceDrift(docs.repartition(9))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(d2 === d)
  }

  test("q83 streaming: per-batch drift against the frozen reference " +
    "artifact equals the batch path, and a drifted batch alarms") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val common = "the data spark query table join row filter group sort"
    val corpus = (1 to 40).map(i => (i.toLong, common, s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Curation.saveDriftReference(s"$dir/ref",
      Curation.referenceBuckets(corpus))

    val b1 = Seq((100L, common, "feed"))                      // in-dist
    val b2 = Seq((101L, "zq1 zq2 zq3 zq4 zq5 zq6", "feed"))   // alien
    val in = MemoryStream[(Long, String, String)](spark)
    val q = Curation.streamingDrift(
      in.toDF().toDF("doc_id", "text", "source"),
      s"$dir/ref", s"$dir/out", s"$dir/ckpt")
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val ref = spark.read.parquet(s"$dir/ref")
    def batchDrift(rows: Seq[(Long, String, String)]) =
      Curation.driftAgainst(rows.toDF("doc_id", "text", "source"), ref)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val s1 = spark.read.parquet(s"$dir/out/batch=0")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val s2 = spark.read.parquet(s"$dir/out/batch=1")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s1 === batchDrift(b1) && s2 === batchDrift(b2),
      "streamed per-batch drift must equal the batch path")
    assert(s2("feed") > s1("feed") + 100000,
      s"the alien batch must alarm far above the in-distribution one: " +
        s"$s1 vs $s2")
  }

  test("fixture-scale end-to-end: selection is deterministic and bounded") {
    val out = Curation.dsirSelect(Tables.documents(spark, D), cache = false)
    val rows = out.collect()
    assert(rows.length === 50)
    // ranking column is monotone non-increasing in output order
    val avgs = rows.map(_.getLong(3))
    assert(avgs.zip(avgs.tail).forall { case (x, y) => x >= y })
  }

  test("q109: overlap matrix reports exactly the planted shared-shingle " +
    "fractions; disjoint sources emit no row") {
    import spark.implicits._
    // A: tokens a1..a40 (38 distinct trigram shingles). B: a1..a20 then
    // b1..b20 — shares the 18 shingles fully inside the common prefix,
    // carries 38 total. C: disjoint vocabulary.
    val aToks = (1 to 40).map(i => s"a$i")
    val bToks = (1 to 20).map(i => s"a$i") ++ (1 to 20).map(i => s"b$i")
    val cToks = (1 to 40).map(i => s"c$i")
    val docs = Seq(
      (1L, aToks.mkString(" "), "en", "srcA", 0L),
      (2L, bToks.mkString(" "), "en", "srcB", 0L),
      (3L, cToks.mkString(" "), "en", "srcC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // overlap = 18*1000 DIV 38 = 473; jaccard = 18*1000 DIV 58 = 310
    assert(got === Seq(("srcA", "srcB", 18L, 473L, 310L)))
  }
}
