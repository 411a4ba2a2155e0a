package graft

import org.apache.spark.sql.SparkSession
import graft.api.{CdcEngine, SinnerPatch}
import graft.cdc.Envelope
import graft.store.InMemoryStore

/** Usage example + smoke driver for the engine API surface: the reference's
  * four sequence-flow scenarios (cache miss/hit, CDC invalidation, rebuild),
  * the latest-state view over the emitted change log, then a tour of the
  * training-data-pipeline surface through the Graft facade. Run:
  * `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = "4", logLevel = "ERROR")

    val store = new InMemoryStore
    val engine = new CdcEngine(store)

    engine.createOne(14, "Deren", "S", Some("Fraud"), Some("Fury"))
    engine.createOne(17, "Shalom", "S", Some("Sloth"), Some("Reticle"))

    println(s"[1] cache miss -> read-through: ${engine.readOne(14)}")
    println(s"    cache now: ${store.size} entries")
    println(s"[2] cache hit: ${engine.readOne(14)}")

    engine.updateOne(14, SinnerPatch(tendency = Some("Wrath")))
    val n = engine.processCdc(spark)
    println(s"[3] CDC pass invalidated $n key(s); cache has ${store.size} entries")

    println(s"[4] rebuild on read: ${engine.readOne(14)}")

    engine.deleteOne(17)
    engine.processCdc(spark)
    println(s"[5] after delete+CDC: readOne(17) = ${engine.readOne(17)}")

    println("[6] latest-state view from the change log:")
    Envelope.latestState(Envelope.parse(engine.changeRecords(spark)))
      .orderBy("code").show(truncate = false)

    val g = new Graft(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    println(s"[7] curated corpus: ${g.curatedCorpus().count()} docs survive " +
      "the quality gate + near-dup drop")
    println("[8] BM25 search for (spark, vector):")
    g.search(Seq("spark", "vector"), k = 3).show(truncate = false)
    println(s"[9] stratified sample: ${g.sampleCorpus(perLang = 3).count()} docs " +
      "(3 per language, hash-ordered, deterministic)")
    println(s"[10] cross-modal near-dup pairs: ${g.crossModalDupes().count()}")
    println("[11] 64-token chunks with fingerprints (first rows):")
    g.query("q47_chunk_documents").show(3, truncate = false)
    println(s"[12] strict curation (adds repetition + dup-passage gates): " +
      s"${g.curatedCorpus(strict = true).count()} docs survive")
    println("[13] sqrt-temperature domain mix (budget 50):")
    g.domainMix(budget = 50L).show(truncate = false)
    val packed = g.packCorpus(budgetTokens = 512L)
    println(s"[14] sequence packing: ${packed.count()} docs into " +
      s"${packed.select("bin").distinct().count()} bins of 512 tokens")
    val cents = g.trainQuantizer(k = 4, iters = 2)
    println(s"[15] k-means coarse quantizer trained: ${cents.size} centroids; " +
      "IVF top-2 via the trained index:")
    g.annSearchTrained(cents, nQueries = 2, probes = 2, topK = 2)
      .show(truncate = false)
    println(s"[16] gap sessions over events: ${g.sessions().count()} sessions")

    // incremental ingest: index the even docs, then ingest the odd docs
    // against that index — near-dup pairs found WITHOUT re-deduping
    val docsTbl = g.table("documents").select("doc_id", "text")
    val idx = graft.operators.Dedup
      .nearDupIndex(docsTbl.filter(org.apache.spark.sql.functions
        .col("doc_id") % 2 === 0))
    val newPairs = g.ingestNearDupPairs(idx,
      docsTbl.filter(org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0))
    println(s"[17] incremental ingest: ${newPairs.count()} near-dup pair(s) " +
      "introduced by the new batch (q64 contract)")

    // the same append-only contract for ASYMMETRIC (quote-in-document)
    // dedup: index the even docs' shingle prefixes, then ingest a batch
    // containing QUOTES of indexed documents — the inclusion pairs a
    // symmetric near-dup ingest (above) is blind to
    val evenDocs = docsTbl.filter(
      org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val cIdx = graft.operators.Dedup.containmentIndex(evenDocs)
    val quotes = graft.operators.Dedup.withPlantedExcerpts(evenDocs)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 2000000L)
    val cPairs = g.ingestContainmentPairs(cIdx, quotes)
    println(s"[17b] containment ingest: ${cPairs.count()} inclusion pair(s) " +
      s"from a ${quotes.count()}-quote batch vs a ${cIdx.count()}-doc index " +
      "(q90 contract)")

    println("[18] BPE tokenizer training (3 merges learned from the corpus):")
    g.trainTokenizer().show(truncate = false)

    val sd = g.semDedup(thresholdX1e4 = 4500)
    println(s"[19] SemDeDup at cos>=0.45: " +
      s"${sd.filter(org.apache.spark.sql.functions.col("kept") === 0).count()} " +
      s"of ${sd.count()} vectors pruned within clusters (q66)")

    println("[20] hybrid retrieval (BM25 + cosine, RRF-fused):")
    g.hybridSearch(Seq("spark", "vector", "stream")).show(5, truncate = false)

    // PQ: train codebooks, persist, encode against the frozen artifact,
    // then ADC-search the compressed codes (q69/q70)
    val (cb, codes) = g.trainPq()
    val cbDir = java.nio.file.Files.createTempDirectory("graft-demo-pq")
    graft.operators.Clustering.saveCodebooks(s"$cbDir/cb.parquet", cb, spark)
    val loaded = graft.operators.Clustering.loadCodebooks(s"$cbDir/cb.parquet", spark)
    println(s"[21] PQ: ${codes.count()} vectors -> 4 codes each " +
      s"(${loaded.size} codebook entries persisted+reloaded); ADC top-3:")
    g.pqSearch(topK = 3).show(truncate = false)

    println("[22] DSIR selection (top docs most like the stratified " +
      "target sample):")
    g.dsirSelect(topK = 5).show(truncate = false)

    println("[23] per-source drift scores (KL vs corpus):")
    g.sourceDrift().show(5, truncate = false)

    println("[24] mixture plan (token budget 100k):")
    g.mixturePlan().show(truncate = false)

    val diff = graft.operators.Prep.snapshotDiff(
      g.table("documents"),
      graft.operators.Prep.syntheticNextSnapshot(g.table("documents")))
    println(s"[25] snapshot diff vs synthetic next crawl: " +
      diff.groupBy("status").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))

    println(s"[26] split-leakage audit: " +
      s"${g.query("q86_split_leakage").count()} near-dup pair(s) straddle " +
      "train/val/test")

    val hubs = g.dupCentrality().orderBy(
      org.apache.spark.sql.functions.col("rank_x1e12").desc).limit(3).collect()
    println("[27] duplication-centrality hubs (top 3 by PageRank): " +
      hubs.map(r => s"doc=${r.getLong(0)} deg=${r.getLong(1)}").mkString(" "))

    println("[28] top-principal-component projection (first rows):")
    g.pc1Projection().show(3, truncate = false)

    val funnelRows = g.funnel().collect()
    println("[29] conversion funnel view->click->purchase: " +
      funnelRows.map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(" -> "))

    val bmIdx = g.bm25Index()
    println(s"[30] BM25 off the persisted-index path (== stage [8] search): " +
      g.bm25SearchIndexed(bmIdx, Seq("spark", "vector"), k = 3).collect()
        .map(r => s"doc=${r.getLong(0)}").mkString(" "))

    println(s"[31] weighted sample (content-mass priority, k=5): " +
      g.weightedSample(k = 5).collect().map(_.getLong(0)).mkString(", "))

    spark.stop()
  }
}
