package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.CdcEngine
import graft.cdc.{Apply, Envelope}
import graft.operators.{Clustering, Curation, Dedup, Prep, Repetition, Similarity, TextAnalysis, TextRetrieval}
import graft.sources.Tables
import graft.store.{InMemoryStore, KeyValueStore}

/** The single entry point a user of the reference switches to: the
  * reference's five CRUD endpoints and its continuous invalidation pipeline
  * (via [[cdc]]), plus the analytics/query surface over the fixture tables,
  * SQL, the declared query catalog, CDC batch apply, and corpus curation.
  *
  * {{{
  * val g = new Graft(spark, "/root/testdata/sf0.01")
  * g.table("lineitem").count()
  * g.sql("SELECT COUNT(*) FROM orders").show()
  * g.query("q10_segment_revenue").show()
  * g.cdc.createOne(5, "Augustus", "S", Some("War"), None)
  * g.cdc.readOne(5)                        // cache-aside point read
  * g.processCdc()                          // consume + invalidate
  * g.curatedCorpus().count()               // quality gate + near-dup drop
  * }}}
  */
final class Graft(val spark: SparkSession, dataDir: String,
                  store: KeyValueStore = new InMemoryStore) {

  // CDC timestamps are Debezium epoch-micros materialized as timestamp_ntz
  // (Schemas.scala): the epoch->wall-clock rendering reads the session zone,
  // so a system-zone session would shift created_at/updated_at relative to
  // what cdc.readOne returns for the same row. Pin UTC here, not just in the
  // shipped mains, so a reference user handing us a default session gets
  // reference-identical timestamps.
  spark.conf.set("spark.sql.session.timeZone", "UTC")

  graft.functions.GraftFunctions.register(spark)
  // Convenience temp views are SESSION-global and last-writer-wins: if two
  // Graft instances share one session, `sql` over bare table names resolves
  // against the most recently constructed instance's dataDir. Multi-instance
  // users should go through `table()`/`query()` (always this dataDir) or
  // give each instance its own spark.newSession().
  Tables.registerAll(spark, dataDir)

  /** The reference's CRUD + point-cache surface (O-1..O-9). */
  val cdc: CdcEngine = new CdcEngine(store)

  def table(name: String): DataFrame = Tables.load(spark, dataDir, name)

  def sql(q: String): DataFrame = spark.sql(q)

  /** Any query from the declared catalog (SparkEntry.queries). */
  def query(name: String): DataFrame = SparkEntry.queries(name)(spark, dataDir)

  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Register catalog queries as temp views, making the ENTIRE operator
    * surface reachable from pure SQL: after this, `sql("SELECT * FROM
    * q49_neardup_clusters WHERE cluster_id = 7")` works and composes —
    * a temp view binds the query's LAZY Catalyst plan, so the outer
    * statement optimizes through it (filters/projections push into the
    * operator's plan; nothing is materialized at registration). No
    * catalog entry is exempt: every operator returns a DataFrame, even
    * the index-backed ones (their artifact resolution happens at
    * registration, the scan stays lazy). SqlSurfaceSpec drives all of
    * them through spark.sql.
    */
  def registerQueryViews(names: Seq[String] = queryNames): Unit =
    names.foreach(n => query(n).createOrReplaceTempView(n))

  /** Consume pending change events and invalidate (scenario 3). */
  def processCdc(): Long = cdc.processCdc(spark)

  /** Latest-state materialized view of the engine's own change log (E-1). */
  def latestState(): DataFrame =
    Envelope.latestState(Envelope.parse(cdc.changeRecords(spark)))

  /** MERGE a change batch onto a snapshot (batch compaction path). */
  def applyChanges(base: DataFrame, records: DataFrame): DataFrame =
    Apply.applyChanges(spark, base, records)

  /** The composed training-data curation pipeline over `documents`.
    * `strict = true` adds the repetition gates (q51 intra-doc flag, q52
    * corpus dup-passage keep) between the quality gate and near-dup
    * removal.
    */
  def curatedCorpus(strict: Boolean = false): DataFrame =
    if (strict) Curation.curateStrict(Tables.documents(spark, dataDir),
      cache = false)
    else Curation.curate(Tables.documents(spark, dataDir))

  /** BM25 top-k document search over `documents` for arbitrary terms.
    * `cache=false`: a long-lived facade pins no blocks (same policy as
    * `curatedCorpus`); batch callers wanting intra-plan reuse go through
    * `TextRetrieval.bm25Search` directly.
    */
  def search(terms: Seq[String], k: Int = 10): DataFrame =
    TextRetrieval.bm25Search(Tables.documents(spark, dataDir), terms, k,
      cache = false)

  /** Top-k TF-IDF terms per document (corpus keyword profile). */
  def keyTerms(k: Int = 3): DataFrame =
    TextRetrieval.tfidfTopTerms(Tables.documents(spark, dataDir), k,
      cache = false)

  /** Deterministic hash-ordered stratified sample of `documents`. */
  def sampleCorpus(perLang: Int): DataFrame =
    TextAnalysis.stratifiedSample(Tables.documents(spark, dataDir), perLang)

  /** Near-dup pairs across text and embedding modalities, attributed. */
  def crossModalDupes(): DataFrame =
    Curation.crossModalPairs(Tables.documents(spark, dataDir),
      Tables.embeddings(spark, dataDir), cache = false)

  /** Perceptual (decoded-pixel) near-dup pairs over an image media
    * relation — catches re-encodes and recompressions byte-sha misses.
    * `media` must have the (doc_id, media_type, content) shape.
    */
  def imageNearDupes(media: DataFrame, maxHamming: Int = 3): DataFrame =
    operators.PerceptualHash.perceptualNearDup(
      operators.PerceptualHash.imageAHash(spark, media), maxHamming)

  /** Frame-level video near-dup over AVI/MJPEG payloads: re-muxes,
    * frame-dropped copies, and recompressions pair by perceptual frame
    * hashes, not bytes.
    */
  def videoNearDupes(media: DataFrame, everyKth: Int = 1,
                     maxHamming: Int = 3, minMatched: Int = 2): DataFrame =
    operators.PerceptualHash.videoNearDup(spark, media, everyKth,
      maxHamming, minMatched)

  /** Train/eval contamination report against the deterministic sample. */
  def contamination(perLang: Int = 20): DataFrame =
    Curation.contaminationReport(Tables.documents(spark, dataDir), perLang,
      cache = false)

  /** Semantic (embedding-space) train/eval contamination — catches the
    * paraphrases the n-gram probe misses.
    */
  def semanticContamination(nEval: Int = 20, thresholdX1e4: Int = 4500,
                            topK: Int = 20): DataFrame =
    Curation.semanticContamination(Tables.embeddings(spark, dataDir), nEval,
      thresholdX1e4, topK)

  /** Exact-verified text near-dup pairs at `jaccardX1e3`, LSH-pruned. */
  def nearDupPairs(jaccardX1e3: Int = 800): DataFrame =
    Dedup.jaccardPairsLshVerified(
      Tables.documents(spark, dataDir).select("doc_id", "text"),
      jaccardX1e3, cache = false)

  /** Near-dup connected components (cluster id = component min doc_id). */
  def nearDupClusters(jaccardX1e3: Int = 800): DataFrame =
    Dedup.nearDupClusters(
      Tables.documents(spark, dataDir).select("doc_id", "text"),
      jaccardX1e3, cache = false)

  /** Per-document intra-doc repetition metrics with the boilerplate flag
    * (Gopher-style top/duplicated n-gram fractions).
    */
  def repetitionMetrics(): DataFrame =
    Repetition.repetitionMetrics(Tables.documents(spark, dataDir))

  /** Per-document corpus-level duplicated-passage fraction + keep flag
    * (the CCNet line-dedup signal at 5-gram granularity).
    */
  /** Maximal cross-document shared-span runs (q80) — the copied-block
    * detector; long runs are lifted paragraphs/boilerplate.
    */
  def sharedSpans(): DataFrame =
    operators.Repetition.sharedSpanScore(Tables.documents(spark, dataDir))

  /** Winnowed fingerprints + cross-doc matches (q82). */
  def winnowing(): DataFrame =
    TextAnalysis.winnowingFingerprints(Tables.documents(spark, dataDir))

  /** Per-source distribution-drift scores (q83). */
  def sourceDrift(): DataFrame =
    Curation.sourceDrift(Tables.documents(spark, dataDir))

  /** Snapshot diff against another corpus version (q85). */
  def diffSnapshots(other: DataFrame): DataFrame =
    operators.Prep.snapshotDiff(Tables.documents(spark, dataDir), other)

  /** Near-dup pairs that straddle the train/val/test split (q86). */
  def splitLeakage(): DataFrame =
    SparkEntry.queries("q86_split_leakage")(spark, dataDir)

  /** Asymmetric containment pairs — quote-in-document inclusions (q87). */
  def containmentDupes(): DataFrame =
    operators.Dedup.containmentPairs(
      Tables.documents(spark, dataDir).select("doc_id", "text"),
      cache = false)

  def dupPassageScore(): DataFrame =
    Repetition.dupPassageScore(Tables.documents(spark, dataDir))

  /** Deterministic token-budget sequence packing of `documents`
    * (`cache=false`: the long-lived facade pins no blocks).
    */
  def packCorpus(budgetTokens: Long = 256L): DataFrame =
    Prep.packSequences(Tables.documents(spark, dataDir), budgetTokens,
      cache = false)

  /** Hybrid retrieval: BM25 lexical ranking fused with embedding-cosine
    * semantic ranking by reciprocal-rank fusion (exact integer RRF terms).
    */
  def hybridSearch(terms: Seq[String], queryVecId: Long = 0L,
                   k: Int = 10): DataFrame =
    TextRetrieval.hybridSearch(Tables.documents(spark, dataDir),
      Tables.embeddings(spark, dataDir), terms, queryVecId, k = k)

  /** SemDeDup-style semantic dedup over `embeddings`: k-means-cluster the
    * space, prune cosine near-dups within clusters keeping the member
    * farthest from its centroid. Returns (vec_id, cid, dist, kept 0/1).
    */
  def semDedup(thresholdX1e4: Int = 9000): DataFrame =
    Clustering.semDedup(Tables.embeddings(spark, dataDir), thresholdX1e4)

  /** Train product-quantization codebooks over `embeddings` (per-subspace
    * exact-integer Lloyd) and return (codebooks, per-vector codes) — the
    * compression half of an IVF-PQ index.
    */
  def trainPq(m: Int = 4): (Map[(Int, Int), Array[Long]], DataFrame) =
    Clustering.pqTrain(Tables.embeddings(spark, dataDir), m)

  /** ADC top-k over the PQ codes (the IVF-PQ query half): the corpus scan
    * touches only the m-int codes, never the vectors.
    */
  def pqSearch(queryVecId: Long = 0L, topK: Int = 10): DataFrame =
    Clustering.pqSearch(Tables.embeddings(spark, dataDir), queryVecId, topK)

  /** Encode `embeddings` against frozen PQ codebooks (train once on a
    * sample, encode every new batch) — see `Clustering.saveCodebooks` /
    * `loadCodebooks` for the shipped artifact.
    */
  def encodePq(codebooks: Map[(Int, Int), Array[Long]]): DataFrame =
    Clustering.pqEncode(Tables.embeddings(spark, dataDir), codebooks)

  /** The full composed IVF-PQ index: coarse cells prune the corpus, ADC
    * over PQ codes ranks only probed-cell members.
    */
  def ivfPqSearch(queryVecId: Long = 0L, topK: Int = 10,
                  probes: Int = 2): DataFrame =
    Clustering.ivfPqSearch(Tables.embeddings(spark, dataDir), queryVecId,
      topK, probes)

  /** Build the persisted IVF-PQ index artifact for `embeddings` under
    * `dir` (coarse centroids + codebooks + cell-partitioned codes) — the
    * offline half of the build-once/query-many ANN contract.
    */
  def buildAnnIndex(dir: String, m: Int = 4, k: Int = 8): Unit =
    Clustering.buildIvfPqIndex(Tables.embeddings(spark, dataDir), dir, m, k)

  /** Search a [[buildAnnIndex]] artifact with a raw query vector: no
    * training, no vector scan — codebooks load as literals and the plan
    * reads only the (cell-pruned) codes. `probes <= 0` = exhaustive ADC.
    */
  def annSearchIndexed(dir: String, query: Array[Double], topK: Int = 10,
                       probes: Int = 2): DataFrame =
    Clustering.ivfPqSearchIndexed(spark, dir, query, topK, probes)

  /** Train a k-means coarse quantizer over `embeddings` (exact-integer
    * Lloyd) and return the centroids in embedding space, ready for
    * [[annSearchTrained]].
    */
  def trainQuantizer(k: Int = 8, iters: Int = 3): Map[Int, Array[Double]] =
    Clustering.trainedCentroids(Tables.embeddings(spark, dataDir), k, iters)

  /** IVF ANN search through a trained coarse quantizer (falls back to
    * training one when none is supplied).
    */
  def annSearchTrained(centroids: Map[Int, Array[Double]] = null,
                       nQueries: Int = 5, probes: Int = 2, topK: Int = 3): DataFrame = {
    val cents = Option(centroids).getOrElse(trainQuantizer())
    import spark.implicits._
    val centsDf = cents.toSeq.sortBy(_._1)
      .map { case (cid, cv) => (cid.toLong, cv.toSeq) }
      .toDF("cent_id", "cent")
    Similarity.ivfSearch(
      Similarity.asDouble(Tables.embeddings(spark, dataDir)),
      centsDf, nQueries, probes, topK)
  }

  /** The exact-dedup index over `documents` — feed ingest batches through
    * `Dedup.mergeDedupIndex` to maintain it incrementally (store it
    * bucketed by content_hash so the stored side never shuffles).
    */
  def dedupIndex(): DataFrame =
    Dedup.dedupIndex(Tables.documents(spark, dataDir))

  /** The NEAR-dup index over `documents` (per-doc minhash signature +
    * hashed shingles) — persist it, then feed each ingest batch through
    * [[ingestNearDupPairs]] instead of re-deduping the corpus (q64
    * contract: union of per-batch pairs == whole-corpus pairs).
    */
  def nearDupIndex(): DataFrame =
    Dedup.nearDupIndex(
      Tables.documents(spark, dataDir).select("doc_id", "text"))

  /** Verified near-dup pairs a new `(doc_id, text)` batch introduces
    * against an existing [[nearDupIndex]] relation.
    */
  def ingestNearDupPairs(index: DataFrame, newDocs: DataFrame,
                         jaccardX1e3: Int = 800): DataFrame =
    Dedup.incrementalNearDupPairs(index,
      Dedup.nearDupIndex(newDocs.select("doc_id", "text")), jaccardX1e3)

  /** The CONTAINMENT index over `documents` (per-doc shingle array +
    * rarest-first prefix) — the asymmetric analogue of [[nearDupIndex]]
    * (q90 contract: union of per-batch pairs == whole-corpus q87).
    */
  def containmentIndex(): DataFrame =
    Dedup.containmentIndex(
      Tables.documents(spark, dataDir).select("doc_id", "text"))

  /** Containment pairs a new `(doc_id, text)` batch introduces against an
    * existing [[containmentIndex]] relation.
    */
  def ingestContainmentPairs(index: DataFrame, newDocs: DataFrame,
                             contMinX1e3: Int = 900): DataFrame =
    Dedup.incrementalContainmentPairs(index,
      Dedup.containmentIndex(newDocs.select("doc_id", "text"), contMinX1e3),
      contMinX1e3)

  /** Updated component labels after folding a new `(doc_id, text)` batch
    * into existing [[nearDupClusters]] labels (q106 contract: == q49 from
    * scratch over the union).
    */
  def ingestClusterLabels(index: DataFrame, newDocs: DataFrame,
                          labels: DataFrame,
                          jaccardX1e3: Int = 800): DataFrame =
    Dedup.incrementalNearDupClusters(index,
      Dedup.nearDupIndex(newDocs.select("doc_id", "text")), labels,
      jaccardX1e3)

  /** Duplication centrality (q101): damped integer PageRank over the
    * verified near-dup graph — template/boilerplate hubs rank highest.
    */
  def dupCentrality(jaccardX1e3: Int = 800, iters: Int = 3): DataFrame =
    Dedup.dupCentrality(Tables.documents(spark, dataDir),
      spark.read.parquet(operators.DedupArtifacts
        .ensureCurationIndex(spark, dataDir, planted = false)),
      jaccardX1e3, iters)

  /** Top-principal-component projection of the embedding cloud (q102 —
    * the "all-but-the-top" direction and each vector's coefficient).
    */
  def pc1Projection(iters: Int = 3): DataFrame =
    Clustering.pc1Projection(Tables.embeddings(spark, dataDir), iters)

  /** Deterministic weight-proportional subsample of `documents` (q103);
    * weight = content mass by default.
    */
  def weightedSample(k: Int = 200, seed: String = "ws42"): DataFrame =
    Prep.weightedSample(Tables.documents(spark, dataDir), k, seed)

  /** Padding-efficiency report for length-bucketed batching (q104). */
  def lengthBuckets(batchSize: Int = 64): DataFrame =
    Prep.lengthBuckets(Tables.documents(spark, dataDir), batchSize)

  /** Conversion funnel over `events` (q105; strictly-ordered stages). */
  def funnel(stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    operators.Relational.funnel(Tables.events(spark, dataDir), stages)

  /** Signup-cohort retention matrix over `events` (q108). */
  def retention(): DataFrame =
    operators.Relational.retention(Tables.events(spark, dataDir))

  /** Cross-source shared-vocabulary matrix (q109 — mirror-feed detector). */
  def sourceOverlap(): DataFrame =
    Curation.sourceOverlap(Tables.documents(spark, dataDir))

  /** Hourly burst flags per event type (q110; 2x trailing-3h mean). */
  def bursts(): DataFrame =
    operators.Relational.burstDetection(Tables.events(spark, dataDir))

  /** The BM25 inverted index over `documents` (q107) — persist it, merge
    * later batches by union, and search with [[bm25SearchIndexed]].
    */
  def bm25Index(): DataFrame =
    TextRetrieval.bm25Index(Tables.documents(spark, dataDir))

  /** BM25 top-k off a (merged) [[bm25Index]] relation — no text scan;
    * bit-for-bit equal to [[search]] on the same corpus.
    */
  def bm25SearchIndexed(index: DataFrame, terms: Seq[String],
                        k: Int = 10): DataFrame =
    TextRetrieval.bm25SearchFromIndex(index, terms, k)

  /** Per-user gap-based sessions over `events` (batch twin of the
    * streaming session_window pipeline).
    */
  def sessions(): DataFrame =
    graft.streaming.EventPipelines.sessionizeBatch(Tables.events(spark, dataDir))

  /** Per-document unigram LM quality score (the perplexity-filter shape). */
  def logprobScores(): DataFrame =
    TextAnalysis.unigramLogprob(Tables.documents(spark, dataDir))

  /** Train a BPE merge table over `documents` (q65 contract). */
  def trainTokenizer(nMerges: Int = operators.Bpe.N_MERGES): DataFrame =
    operators.Bpe.trainBpe(
      Tables.documents(spark, dataDir).select("text"), nMerges)

  /** Encode a `(w)` word table with an ordered merge list (the trained
    * tokenizer's segmentation).
    */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    operators.Bpe.applyMerges(words, merges)

  /** sqrt-temperature domain-mix allocation over `documents`. */
  def domainMix(budget: Long = 200L): DataFrame =
    TextAnalysis.domainMixSample(Tables.documents(spark, dataDir), budget)

  /** Token-budget mixture plan (q81): per-domain target tokens, sampling
    * rate, and repeat epochs under sqrt-temperature weights.
    */
  def mixturePlan(budgetTokens: Long = 100000L): DataFrame =
    TextAnalysis.mixturePlan(Tables.documents(spark, dataDir), budgetTokens)

  /** Bigram-LM quality scores (q77) — the word-order-sensitive companion
    * to [[logprobScores]].
    */
  def bigramLogprobScores(): DataFrame =
    TextAnalysis.bigramLogprob(Tables.documents(spark, dataDir))

  /** Single-pass ANALYZE of any fixture table (q68/q74 family): per-column
    * count/nulls/distinct/min/max/avg in one scan.
    */
  def profileTable(name: String): DataFrame =
    operators.Profile.profile(table(name))

  /** Per-source ANALYZE of a table (q78): the same single-scan profile,
    * one row per (group, column).
    */
  def profileTableBy(name: String, groupCol: String): DataFrame =
    operators.Profile.profileBy(table(name), groupCol)

  /** Learned language-ID via hashed-feature Naive Bayes (q79): trains on
    * the deterministic stratified sample, returns the held-out confusion
    * matrix.
    */
  def langidConfusion(perLang: Int = operators.Classify.NB_PER_LANG)
      : DataFrame =
    operators.Classify.nbLangidConfusion(
      Tables.documents(spark, dataDir), perLang)

  /** Equi-width histogram of one column (q74). */
  def histogram(tableName: String, column: String,
                nBuckets: Int = 16): DataFrame =
    operators.Profile.histogram(table(tableName), column,
      nBuckets = nBuckets)

  /** DSIR data selection (q76): ranks the corpus by importance weight
    * against a target-domain sample (default: the q42 stratified sample as
    * the "in-domain" exemplars). Pass an explicit `target` (doc_id
    * relation) to select against your own domain.
    */
  def dsirSelect(target: DataFrame = null, topK: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dataDir)
    // facade convention: long-lived sessions pin no cache blocks
    if (target == null) Curation.dsirSelect(docs, topK = topK, cache = false)
    else Curation.dsirSelectAgainst(docs, target, 64, topK, cache = false)
  }

  /** The end-to-end export a training run consumes: curate `documents`
    * (quality gate + near-dup drop), assign the deterministic 90/5/5
    * hash split, and write parquet shards partitioned by (split, lang) —
    * so a trainer reads `split=train/` with partition pruning and never
    * scans eval rows. Returns the curated-row count.
    */
  def exportCorpus(outDir: String, strict: Boolean = false): Long = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dataDir)
    val curated = (if (strict) Curation.curateStrict(docs, cache = false)
      else Curation.curate(docs))
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
    val h = org.apache.spark.sql.functions.pmod(
      graft.functions.GraftFunctions.phash60(
        org.apache.spark.sql.functions.col("doc_id")),
      org.apache.spark.sql.functions.lit(100L))
    val withSplit = curated.withColumn("split",
      org.apache.spark.sql.functions.when(h < 90, "train")
        .when(h < 95, "val").otherwise("test"))
    graft.sources.Sources.writePartitioned(withSplit, outDir,
      Seq("split", "lang"))
    spark.read.parquet(outDir).count()
  }
}
