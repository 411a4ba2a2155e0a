package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.{SparkEntry, TestSpark}

/** q132's composed release export must stay auditable against its
  * standalone constituents: the stage sets compose exactly from
  * q125/q127/q111 under the documented precedence, the per-source dedup
  * removal counts equal q115's accounting, and mixture weights land only
  * on kept docs.
  */
class ReleaseExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  private def ids(df: DataFrame, col: String = "doc_id"): Set[Long] =
    df.select(col).collect().map(_.getLong(0)).toSet

  private lazy val q132 =
    SparkEntry.queries("q132_release_export")(spark, D)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
  private def stageSet(stage: String): Set[Long] =
    q132.filter(_._4 == stage).map(_._1).toSet

  test("dedup stages == q125's stage sets verbatim") {
    val q125 = SparkEntry.queries("q125_dedup_apply")(spark, D)
      .select("doc_id", "stage").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(stageSet("exact") === q125.filter(_._2 == "exact").map(_._1).toSet)
    assert(stageSet("neardup") ===
      q125.filter(_._2 == "neardup").map(_._1).toSet)
    // the raw sf0.001 corpus plants near-dups but no byte-identical copies,
    // so only the neardup stage is guaranteed non-empty here
    assert(stageSet("neardup").nonEmpty)
  }

  test("decontam stages == q127's stage sets minus dedup-removed docs") {
    val dedupRm = stageSet("exact") ++ stageSet("neardup")
    val q127 = SparkEntry.queries("q127_decontam_apply")(spark, D)
      .select("doc_id", "stage").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(stageSet("eval") ===
      q127.filter(_._2 == "eval").map(_._1).toSet -- dedupRm)
    assert(stageSet("contaminated") ===
      q127.filter(_._2 == "contaminated").map(_._1).toSet -- dedupRm)
    assert(stageSet("eval").nonEmpty)
  }

  test("capped stage == docs q111's cap drops, minus earlier stages") {
    val earlier = stageSet("exact") ++ stageSet("neardup") ++
      stageSet("eval") ++ stageSet("contaminated")
    val capKept = ids(SparkEntry.queries("q111_source_cap")(spark, D))
    val all = q132.map(_._1).toSet
    assert(stageSet("capped") === (all -- capKept) -- earlier)
    assert(stageSet("capped").nonEmpty)
    assert(stageSet("kept") === ((all -- earlier) intersect capKept))
  }

  test("per-source exact/neardup removal counts == q115's accounting") {
    val bySource = q132.groupBy(_._2).map { case (src, rows) =>
      src -> (rows.count(_._4 == "exact").toLong,
        rows.count(_._4 == "neardup").toLong)
    }
    val q115 = SparkEntry.queries("q115_dedup_savings")(spark, D)
      .select("source", "exact_docs_removed", "neardup_docs_removed")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, counts) =>
      assert(q115(src) === counts, s"source $src: q115=${q115(src)} q132=$counts")
    }
  }

  test("mixture weights land on kept docs only; split is the q88 leak-free assignment") {
    assert(q132.filter(_._4 != "kept").forall(_._6 == 0L),
      "removed docs must carry n_copies = 0")
    assert(q132.filter(_._4 == "kept").exists(_._6 > 0L),
      "some kept docs must carry positive mixture weight")
    // verified near-dup pairs never straddle splits: both endpoints share
    // their component representative's split by construction
    val pairs = spark.read.parquet(
        DedupArtifacts.ensureVerifiedPairs(spark, D))
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val splitOf = q132.map(r => r._1 -> r._5).toMap
    assert(pairs.nonEmpty &&
      pairs.forall { case (a, b) => splitOf(a) == splitOf(b) })
  }

  test("q150: quarantined rows override every release stage, weights are " +
    "re-planned over the clean kept set through the shared mixture " +
    "kernel, and an all-clean route reproduces q132 verbatim") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val docs = graft.sources.Tables.documents(spark, D)
    val q150 = SparkEntry.queries("q150_quarantined_release")(spark, D)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    val route = Expectations.quarantineRoute("documents", docs, "doc_id",
        Expectations.corpusDocChecks)
      .collect().map(r => (r.getLong(1), r.getString(4))).toMap
    val q132m = q132.map(r => r._1 -> r).toMap
    assert(q150.length === q132.length, "every export row must be routed")
    q150.foreach { r =>
      if (route(r._1) == "quarantined")
        assert(r._4 === "quarantined", s"doc ${r._1} must be diverted")
      else assert(r._4 === q132m(r._1)._4,
        s"clean doc ${r._1} must keep q132's stage")
    }
    assert(q150.exists(_._4 == "quarantined"),
      "the fixture ceiling rule must quarantine (the q139 demo convention)")
    // weights land only on kept rows, and equal the mixture RE-PLANNED
    // over the clean kept set through the shared q120 kernel
    assert(q150.filter(_._4 != "kept").forall(_._6 == 0L),
      "diverted/removed rows must carry zero mixture weight")
    val keptDf = q150.filter(_._4 == "kept").map(_._1).toSeq.toDF("doc_id")
    val want = TextAnalysis.mixtureMaterialize(docs.join(keptDf, "doc_id"))
      .select("doc_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q150.filter(_._4 == "kept").foreach { r =>
      assert(r._6 === want.getOrElse(r._1, 0L),
        s"kept doc ${r._1} weight must come from the re-planned mixture")
    }
    // an all-clean route must reproduce q132 verbatim, weights included
    val cleanRoute = docs.select(lit("documents").as("table_name"),
      col("doc_id").as("row_key"), lit(0L).as("n_failed"),
      lit("").as("failed"), lit("clean").as("status"))
    val repro = Curation.quarantinedReleaseExport(docs,
        SparkEntry.queries("q132_release_export")(spark, D), cleanRoute)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(repro.toSeq === q132.toSeq,
      "a clean gate must leave the export untouched")
  }

  test("q150 guard: a PARTIAL route fails loudly instead of silently " +
    "shrinking the release relation") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, D)
    val full = Expectations.quarantineRoute("documents", docs, "doc_id",
      Expectations.corpusDocChecks)
    val partial = full.filter(col("row_key") =!= full
      .select("row_key").orderBy("row_key").limit(1)
      .collect()(0).getLong(0))
    val ex = intercept[Exception] {
      Curation.quarantinedReleaseExport(docs,
        SparkEntry.queries("q132_release_export")(spark, D), partial)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("quarantine route has no row")),
      s"expected the coverage-gap error, got: $ex")
  }

  test("q142: a failing ingestion gate flags EVERY export row blocked; " +
    "a clean gate ships clear — and the export body is q132 verbatim") {
    import spark.implicits._
    val gated = SparkEntry.queries("q142_gated_release")(spark, D)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getString(6), r.getLong(7)))
    // the fixture corpus gate fails (q139's context-window ceiling), so
    // the deliverable itself must say blocked — on every row
    val nFail = Expectations.corpusAudit(spark, D)
      .filter(org.apache.spark.sql.functions.col("status") === "fail")
      .count()
    assert(nFail >= 1, "fixture gate must fail for this pin to bite")
    assert(gated.nonEmpty &&
      gated.forall(r => r._7 == "blocked" && r._8 == nFail),
      "gate-fail must flag every export row")
    // the export body is exactly q132's relation
    assert(gated.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSeq ===
      q132.toSeq, "the gate flag must not perturb the export body")
    // a clean gate ships clear: same export, manufactured all-pass audit
    val cleanGate = Seq(("documents", "not_null:text", 10L, 0L, "pass"))
      .toDF("table_name", "constraint", "n_rows", "n_violations", "status")
    val clear = Curation.gatedReleaseExport(
      SparkEntry.queries("q132_release_export")(spark, D), cleanGate)
      .select("gate_status", "n_gate_failed").distinct().collect()
    assert(clear.length === 1 && clear(0).getString(0) === "clear" &&
      clear(0).getLong(1) === 0L)
  }
}
