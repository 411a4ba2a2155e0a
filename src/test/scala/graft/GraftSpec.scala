package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** The facade: everything a reference user needs, through one object. */
class GraftSpec extends AnyFunSuite {

  private lazy val g = new Graft(TestSpark.spark, TestSpark.SF0001)

  test("tables, SQL, and the query catalog are reachable") {
    assert(g.table("lineitem").count() > 0)
    assert(g.sql("SELECT COUNT(*) AS n FROM orders").collect().head.getLong(0) > 0)
    assert(g.queryNames.size >= 47)
    assert(g.query("q10_segment_revenue").count() > 0)
    assert(g.sql("SELECT graft_cosine(array(1.0d), array(1.0d))").collect()
      .head.getDouble(0) === 1.0)
  }

  test("the reference's whole lifecycle through the facade") {
    g.cdc.createOne(101, "Faust", "S", Some("Pride"), None)
    assert(g.cdc.readOne(101).map(_.name) === Right("Faust"))
    g.cdc.updateOne(101, api.SinnerPatch(tendency = Some("Gloom")))
    assert(g.processCdc() >= 1)
    assert(g.cdc.readOne(101).map(_.tendency) === Right(Some("Gloom")))
    val state = g.latestState().filter("code = 101").collect()
    assert(state.length === 1)
  }

  test("constructor pins the session timezone to UTC (NTZ timestamp contract)") {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      new Graft(spark, TestSpark.SF0001)
      assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("curation pipeline runs end to end") {
    val curated = g.curatedCorpus()
    assert(curated.count() > 0)
    assert(curated.columns.toSeq ===
      Seq("doc_id", "lang", "n_tokens", "quality_x1e3"))
  }

  test("exportCorpus writes split/lang-partitioned shards a trainer can prune") {
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    val n = g.exportCorpus(out)
    assert(n === g.curatedCorpus().count(), "export must cover the curated corpus")
    val back = TestSpark.spark.read.parquet(out)
    assert(back.columns.contains("split") && back.columns.contains("lang"))
    val splits = back.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    // partition pruning: a split=train read must not scan other partitions
    val plan = back.filter(col("split") === "train").queryExecution
      .executedPlan.toString
    assert(plan.contains("split=train") || !plan.contains("split=test"))
    // SQL surface reaches the native hash too
    assert(g.sql("SELECT graft_phash60('abc')").collect().head.getLong(0) >= 0)
    // strict mode: repetition gates compose into the same export path
    val outS = java.nio.file.Files.createTempDirectory("graft-export-s").toString
    val nS = g.exportCorpus(outS, strict = true)
    assert(nS === g.curatedCorpus(strict = true).count())
    assert(nS < n, "strict export must drop more documents")
  }

  test("retrieval, sampling, and dedup conveniences run end to end") {
    val hits = g.search(Seq("spark", "vector"), k = 5).collect()
    assert(hits.nonEmpty && hits.length <= 5)
    assert(g.keyTerms(2).groupBy("doc_id").count()
      .filter(col("count") > 2).count() === 0)
    assert(g.sampleCorpus(perLang = 5).count() > 0)
    assert(g.crossModalDupes().count() > 0)
    assert(g.nearDupPairs().columns.contains("jaccard_x1e3"))
  }

  test("quality, packing, clustering, and session conveniences run end to end") {
    assert(g.repetitionMetrics().columns.contains("flagged"))
    assert(g.dupPassageScore().filter(col("keep") === 0).count() > 0)
    val packed = g.packCorpus(budgetTokens = 512L)
    assert(packed.count() === g.table("documents").count())
    assert(packed.select("bin").distinct().count() > 1)
    val cents = g.trainQuantizer(k = 4, iters = 2)
    assert(cents.size === 4 && cents.values.forall(_.length === 64))
    val ann = g.annSearchTrained(cents, nQueries = 2, probes = 2, topK = 2).collect()
    assert(ann.nonEmpty && ann.map(_.getLong(0)).distinct.forall(_ < 2))
    assert(g.sessions().columns.toSeq ===
      Seq("user_id", "session_idx", "n_events", "start_us", "end_us", "value_x1e4"))
    assert(g.domainMix(budget = 50L)
      .agg(org.apache.spark.sql.functions.sum("n_sampled")).head.getLong(0) <= 50L)
  }

  test("analytics and index conveniences added in round 10 run end to end") {
    assert(g.dupCentrality().columns.toSeq === Seq("doc_id", "deg", "rank_x1e12"))
    assert(g.pc1Projection().columns.toSeq === Seq("vec_id", "proj_x1e4"))
    assert(g.weightedSample(k = 10).count() === 10L)
    assert(g.lengthBuckets().columns.contains("waste_x1e3"))
    val f = g.funnel().collect()
    assert(f.length === 3 && f.head.getLong(2) >= f.last.getLong(2),
      "funnel stages must be monotonically non-increasing")
    assert(g.retention().columns.toSeq ===
      Seq("cohort_day", "day_offset", "n_active"))
    val idx = g.bm25Index()
    val viaIdx = g.bm25SearchIndexed(idx, Seq("spark", "vector"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaIdx === g.search(Seq("spark", "vector"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "indexed BM25 must equal the from-text search")
    val labels0 = g.nearDupClusters()
    val folded = g.ingestClusterLabels(g.nearDupIndex(),
      g.table("documents").select("doc_id", "text").limit(0), labels0)
    assert(folded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      labels0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "folding an empty batch must leave labels unchanged")
  }
}
