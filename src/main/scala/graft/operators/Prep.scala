package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-data preparation transforms — the last mile between a curated
  * corpus and what actually ships to a trainer:
  *
  *  - q46: per-vector int8 quantization of embeddings (symmetric, scale =
  *    127/max|x|) — the memory lever for serving a 100 TB ANN index; the
  *    query emits exact-integer summaries (sum/min/max/norm) of the
  *    quantized codes so the whole codebook is hash-checkable.
  *  - q47: sliding-window token chunking (64-token windows, stride 32) —
  *    context-window packing with overlap, each chunk carrying the q28
  *    rolling fingerprint so chunk-level exact dedup composes directly.
  *
  * Both are expression work plus one explode feeding an aggregation — no
  * UDFs, codegen throughout. q47 is shuffle-free (generator + per-row
  * fingerprint fold); q46's summaries go through a partial-aggregating
  * groupBy on the unique vector id, so its exchange carries one row per
  * vector per partition — see the function comment for why that beats
  * four array-HOF folds.
  */
object Prep {

  private val Q_MAX = 127.0
  private val CHUNK = 64
  private val STRIDE = 32

  /** The q28 rolling fingerprint (one shared definition — see
    * [[TextAnalysis.rollingFp]]).
    */
  private def fpCol(chunk: Column): Column = TextAnalysis.rollingFp(chunk)

  /** Symmetric int8 quantization summary per embedding. An all-zero
    * vector gets scale 0 (codes all 0) instead of 127/0 = Infinity, which
    * would NaN every code and diverge between engines.
    */
  def quantizeEmbeddings(embs: DataFrame): DataFrame = {
    val e = Similarity.asDouble(embs)
    val maxabs = array_max(transform(col("emb"), x => abs(x)))
    // `scale` is materialized as a COLUMN before the per-element lambda
    // references it: written inline, the O(dim) max-scan would be
    // re-evaluated for every element (dim^2 per row); as a multiply-used
    // non-cheap projection Catalyst keeps it computed once per row.
    // The summaries go through explode + a partial-aggregating groupBy on
    // the unique key rather than four array-HOF folds over the same codes.
    val qarr = transform(col("emb"), x =>
      least(greatest(floor(x * col("scale") + lit(0.5)), lit(-Q_MAX)), lit(Q_MAX))
        .cast("long"))
    e.select(col("vec_id"), col("emb"),
        when(maxabs === 0.0, lit(0.0)).otherwise(lit(Q_MAX) / maxabs).as("scale"))
      .select(col("vec_id"),
        floor(col("scale") * 1000000 + lit(0.5)).cast("long").as("scale_x1e6"),
        // explode_OUTER: an empty/null embedding must still yield its one
        // output row (with null summaries), matching the oracle's
        // list_aggregate semantics — plain explode would drop the vec_id
        explode_outer(qarr).as("q"))
      .groupBy("vec_id", "scale_x1e6")
      .agg(sum(col("q")).as("q_sum"),
        min(col("q")).as("q_min"),
        max(col("q")).as("q_max"),
        sum(col("q") * col("q")).as("q_norm2"))
      .select("vec_id", "scale_x1e6", "q_sum", "q_min", "q_max", "q_norm2")
      .orderBy("vec_id")
  }

  /** The chunking transform as a plan fragment: per-row expression work
    * only (explode + slices + fingerprint fold), no sort and no shuffle —
    * so the SAME function composes under `readStream` unchanged (the
    * streaming spec chunks a document stream through this exact fragment).
    */
  def chunkTransform(docs: DataFrame): DataFrame = {
    val nChunks =
      floor((size(col("toks")) - 1).cast("double") / STRIDE).cast("int")
    val chunk = slice(col("toks"), col("ci") * STRIDE + 1, lit(CHUNK))
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), nChunks)).as("ci"))
      .select(col("doc_id"),
        col("ci").cast("int").as("chunk_idx"),
        (col("ci").cast("long") * STRIDE + 1).as("start_tok"),
        size(chunk).cast("long").as("n_chunk_tokens"),
        fpCol(chunk).as("chunk_fp"))
  }

  /** Sliding-window chunking of `documents` with per-chunk fingerprints
    * (batch form: adds the total order the gate compares on).
    */
  def chunkDocuments(docs: DataFrame): DataFrame =
    chunkTransform(docs).orderBy("doc_id", "chunk_idx")

  private val PACK_BUDGET = 256L
  // scale knob: buckets = 2^PACK_BUCKET_BITS contiguous hash ranges (the
  // shift below derives from this — raise it for a cluster)
  private val PACK_BUCKET_BITS = 5

  /** q53: token-budget sequence packing — assign documents, in a canonical
    * deterministic order, to fixed-budget token bins (the "pack documents
    * into training sequences" step; a document goes to the bin its first
    * token falls in, bins are `PACK_BUDGET` tokens wide).
    *
    * The order is (portable hash of doc_id, doc_id) — reproducible across
    * runs, engines, and repartitioning, like q42/q48. The interesting part
    * is HOW the global running token count is computed: a global
    * `Window.orderBy` would funnel the corpus through ONE partition (the
    * classic prefix-sum scaling trap), so this runs the standard two-pass
    * distributed prefix sum instead:
    *
    *   1. bucket by the TOP bits of the order key (buckets are contiguous
    *      hash ranges, so bucket order == global order), cumsum within each
    *      bucket in parallel;
    *   2. per-bucket totals (one tiny row per bucket) get an exclusive
    *      cumsum on the driver-sized side and are broadcast back as offsets.
    *
    * 32 buckets matches local[32]; at cluster scale the same top-bit split
    * yields thousands of buckets — the only serial structure is the
    * bucket-count-sized offset table. The DuckDB oracle computes the naive
    * single-window global cumsum, so the gate PROVES the two-pass
    * decomposition equals the sequential semantics row-for-row.
    */
  def packSequences(docs: DataFrame, budget: Long = PACK_BUDGET,
                    cache: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Sketches.phash60(col("doc_id")).as("h"))
      .withColumn("bkt",
        shiftright(col("h"), 60 - PACK_BUCKET_BITS).cast("int"))
    val w = Window.partitionBy("bkt").orderBy("h", "doc_id")
    // the windowed pass feeds BOTH the output rows and the per-bucket
    // totals; persist it (same convention as the dedup pipelines'
    // shared-index persist) so the corpus is tokenized/hashed once —
    // cache=false for long-lived facade sessions
    val local0 = d
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val local = if (cache) local0.persist() else local0
    // pass 2: per-bucket totals are each bucket's LAST running values —
    // derived from the windowed frame, not a second corpus aggregate —
    // then an exclusive prefix over the tiny per-bucket relation
    val wb = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("bkt")
      .agg(max("cum").as("btoks"), max("rn").as("brows"))
      .select(col("bkt"),
        coalesce(sum("btoks").over(wb), lit(0L)).as("tok_off"),
        coalesce(sum("brows").over(wb), lit(0L)).as("row_off"))
    val cumBefore = col("tok_off") + col("cum") - col("n_tokens")
    // bin id = floor(cum_before / budget): both operands are exact
    // non-negative longs far below 2^53, so the double division is exact
    // and matches the oracle's formula bit-for-bit
    local.join(broadcast(offsets), "bkt")
      .select(col("doc_id"),
        (col("row_off") + col("rn") - 1).as("pos"),
        col("n_tokens"),
        floor(cumBefore.cast("double") / budget).cast("long").as("bin"),
        (cumBefore - floor(cumBefore.cast("double") / budget).cast("long") * budget)
          .as("off_in_bin"))
      .orderBy("pos")
  }

  // --------------------------------------------------- snapshot diff --

  /** Compare two corpus snapshots by content hash: (doc_id, status) for
    * every difference — `added` (only in B), `removed` (only in A),
    * `changed` (both, different sha256). The dataset-versioning primitive
    * between crawls/ingest runs: downstream incremental operators (q58
    * dedup index, q64 near-dup index, q84 profile merge) consume exactly
    * the `added`+`changed` delta instead of the snapshot.
    *
    * Shape: one shuffle per side on doc_id into a full outer join —
    * comparing 32-byte hashes, never text (the projection carries
    * (doc_id, sha) only, asserted by the pruned ReadSchema at the scan).
    * At 100 TB both snapshots are id-bucketed on disk, and the join is
    * exchange-free.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ha = a.select(col("doc_id"), sha2(col("text"), 256).as("ha"))
    val hb = b.select(col("doc_id"), sha2(col("text"), 256).as("hb"))
    ha.join(hb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("same").as("status"))
      .filter(col("status") =!= "same")
      .orderBy("doc_id")
  }

  /** q85's deterministic synthetic snapshot B, derived from A by hash
    * class: h%10==0 removed, ==1 text-revised, ==2 duplicated as a new
    * doc (id + 1e6) — so the diff exercises every status. The oracle
    * reconstructs B from the same definition.
    */
  def syntheticNextSnapshot(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val h = Sketches.phash60(col("doc_id")) % 10
    val kept = docs.filter(h =!= 0)
      .select(col("doc_id"),
        when(h === 1, concat(col("text"), lit(" rev"))).otherwise(col("text"))
          .as("text"))
    val added = docs.filter(h === 2)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    kept.unionAll(added)
  }

  /** q91: per-document engagement weights from the event log — the
    * popularity/quality signal a training pipeline mines from behavioral
    * logs (clicks, views, purchases referencing an item) to up-weight
    * documents users actually engage with. Events reference their
    * document through `props.k` (the q30 JSON surface); per document the
    * query emits event count, distinct engaged users, total value (in
    * exact integer cents — never a float sum across engines), and a
    * sampling weight proportional to the doc's share of total engaged
    * value (x1e6).
    *
    * Scale shape: the event log is the 100 TB side, so it aggregates
    * FIRST — map-side partial (k, count/users/cents) then one shuffle of
    * doc-sized aggregate rows; the corpus join sees one row per engaged
    * doc, never raw events. The total for the weight is a scalar
    * crossJoin-broadcast (q44's corpus-stats idiom), not a global window.
    */
  def engagementWeights(events: DataFrame, docs: DataFrame): DataFrame = {
    val perDoc = events
      .select(
        from_json(col("props"), lit("k BIGINT")).getField("k").as("doc_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
        col("user_id"))
      .filter(col("doc_id").isNotNull)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum("cents").as("value_cents"))
    val joined = docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"))
    val total = joined.agg(sum("value_cents").as("total_cents"))
    joined.crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_events"), col("n_users"),
        col("value_cents"),
        when(col("total_cents") > 0,
          floor(col("value_cents") * lit(1000000.0) / col("total_cents")
            + lit(0.5)).cast("long")).otherwise(0L).as("weight_x1e6"))
      .orderBy("doc_id")
  }

  /** q92: crawl-over-crawl n-gram NOVELTY — for every document of the
    * next snapshot, the fraction of its distinct trigram shingles unseen
    * in the previous crawl (x1e3). The freshness/staleness signal behind
    * "how much genuinely new text did this crawl add": re-crawled and
    * re-hosted copies score 0, revisions score by their changed span,
    * novel documents score 1000. Composes the q85 synthetic-next-snapshot
    * fixture with the q50 shingle machinery.
    *
    * Scale shape: both sides reduce to distinct 8-byte [[Sketches.phash60]]
    * shingle keys (portable, so the DuckDB twin replays the identical
    * join); the membership probe is one hash-join on those keys and the
    * per-doc ratio a pre-partitioned aggregate — never a string shuffle,
    * never all-pairs.
    */
  def ngramNovelty(docs: DataFrame, next: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val seen = Dedup.shingles(docs)
      .select(Sketches.phash60(col("shingle")).as("h")).distinct()
    val nextSh = Dedup.shingles(next)
      .select(col("doc_id"), Sketches.phash60(col("shingle")).as("h"))
    val per = nextSh
      .join(seen.withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_novel"))
    next.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_x1e3",
        when(col("n_shingles") > 0,
          floor(col("n_novel") * lit(1000.0) / col("n_shingles") + lit(0.5))
            .cast("long")).otherwise(0L))
      .orderBy("doc_id")
  }

  /** q93: deterministic seeded GLOBAL SHUFFLE + sharding — the final
    * "shuffle the corpus before training" step, without `rand()` (which
    * is neither reproducible across retries nor replayable by an
    * oracle). Order is the 60-bit portable hash of (seed | doc_id):
    * uniformly pseudorandom, stable under re-runs and task retries, and
    * re-seedable per epoch by changing one string. Emits
    * (shard, pos, doc_id) — exactly the manifest a trainer's data
    * loader consumes.
    *
    * Scale shape: this is what makes a 100 TB shuffle tractable — ONE
    * hash-partition exchange on `shard` and a per-shard sort (each
    * shard is corpus/shards-sized), never a global sort; writing with
    * partitionBy(shard) then streams each shard independently. The
    * window's partition is the shard, so position assignment is the
    * same per-partition sort the exchange already did.
    */
  def globalShuffle(docs: DataFrame, shards: Int = 8,
                    seed: String = "s42"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val h = Sketches.phash60(
      concat(lit(seed + "|"), col("doc_id").cast("string")))
    val d = docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    d.select(col("shard"), row_number().over(w).cast("long").as("pos"),
        col("doc_id"))
      .orderBy("shard", "pos")
  }

  /** q94: incremental CRAWL DEDUP against a historical corpus via a Bloom
    * pre-filter — "which documents of the new crawl are genuinely new
    * text" without ever shuffling the history. Exact-content dedup (the
    * q18 regime) across snapshots (the q85/q92 fixture): re-crawled
    * pages and re-hosted copies are dropped, revisions and novel pages
    * survive.
    *
    * 100 TB shape: the historical corpus reduces to a Bloom filter at
    * ~2 bytes/doc (distributed build, `bit_or` partial aggregates — see
    * [[BloomJoin.buildBloom]]), broadcast once. Bloom-NEGATIVE crawl rows
    * are definitely new (no false negatives) and never enter a join;
    * only the positive slice — true duplicates plus the ~0.1% false
    * positives — is verified by an exact anti-join against the history's
    * 32-byte content hashes. Result is EXACTLY `crawl ANTI JOIN history
    * ON text`, which is why the oracle is plain SQL.
    */
  def crawlDedupBloom(history: DataFrame, crawl: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(history.sparkSession)
    val words = BloomJoin.buildBloom(history.select("text"), "text")
    val flagged = crawl.select(col("doc_id"), col("text"),
      graft.functions.GraftFunctions.bloomMightContain(
        xxhash64(col("text")), words, BloomJoin.K).as("maybe"))
    val definiteNew = flagged.filter(!col("maybe"))
    val verifiedNew = flagged.filter(col("maybe"))
      .join(history.select(sha2(col("text"), 256).as("hh")).distinct(),
        sha2(col("text"), 256) === col("hh"), "left_anti")
    def out(d: DataFrame) = d.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    out(definiteNew).unionAll(out(verifiedNew)).orderBy("doc_id")
  }

  /** q103: DETERMINISTIC WEIGHTED SAMPLING — draw a k-doc subsample whose
    * inclusion odds scale with a per-doc weight (here: n_chars, i.e.
    * content mass; engagement or quality plug in identically), yet is
    * fully reproducible across runs, retries, and layouts. Each doc gets
    * the priority key phash60(seed|doc_id) DIV weight — an inverse-
    * weighted variant of the hash-rank idiom behind q42/q48 (the
    * integer-arithmetic cousin of Efraimidis-Spirakis A-Res keys) — and
    * the k smallest (priority, doc_id) win: doubling a weight can only
    * lower (improve) a doc's priority, weight-1 docs face plain hash
    * order, and everything is exact BIGINT so the sample hash-checks.
    *
    * 100 TB shape: one map-side pass computes keys; the global k-cut is
    * orderBy+limit, which Spark executes as TakeOrdered (per-partition
    * top-k, single tiny reduce) — no full sort, no global shuffle.
    */
  def weightedSample(docs: DataFrame, k: Int = 200,
                     seed: String = "ws42"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
        greatest(col("n_chars").cast("long"), lit(1L)).as("weight"),
        Sketches.phash60(
          concat(lit(seed + "|"), col("doc_id").cast("string"))).as("h"))
      .selectExpr("doc_id", "weight", "h DIV weight AS priority")
      .orderBy("priority", "doc_id")
      .limit(k)
  }

  /** q104: LENGTH-BUCKET PADDING REPORT — assign every doc to its
    * next-power-of-two token-length bucket and report, per bucket, the
    * batch count at a fixed batch size and the padding waste if each
    * batch pads to the bucket ceiling. This is the measurement behind
    * length-bucketed batching (the cheap alternative to q53's exact
    * packing): comparing `waste_x1e3` across bucketings tells a training
    * pipeline whether bucketed batches are tight enough to skip the
    * packing pass. Bucket = 2^length(bin(n_tok - 1)) — the portable
    * bit-length idiom the HLL rho shares — and every output column is
    * exact integer arithmetic.
    *
    * 100 TB shape: one map-side pass to token counts + bucket keys, one
    * partial-aggregating groupBy over <=40 bucket keys. Nothing sorts
    * the corpus; the report is bucket-cardinality-sized.
    */
  def lengthBuckets(docs: DataFrame, batchSize: Int = 64): DataFrame =
    docs.select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .selectExpr("n_tok",
        "CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT) " +
          "ELSE CAST(power(2, length(bin(n_tok - 1))) AS BIGINT) END AS bucket")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
      .selectExpr("bucket", "n_docs", "sum_tokens",
        s"(n_docs + ${batchSize - 1}) DIV $batchSize AS n_batches",
        "n_docs * bucket AS padded_tokens",
        "((n_docs * bucket - sum_tokens) * 1000) DIV (n_docs * bucket) AS waste_x1e3")
      .orderBy("bucket")

  private[operators] val SOURCE_CAP = 20

  /** q111: PER-DOMAIN CAP — keep at most `cap` documents per source, the
    * C4/RefinedWeb-style guard against any single domain (template farms,
    * mirrors, wikis) dominating the training mix. The keep rule is the
    * catalog's deterministic idiom: each doc gets priority
    * `phash60(seed|doc_id)` and a source keeps its `cap` smallest
    * (priority, doc_id) — reproducible across runs, task retries, and
    * layouts, and a uniform random subsample of every trimmed domain.
    *
    * The SEMANTICS are q42's per-group hash-rank filter; what this
    * operator adds is the execution shape for a zipfian corpus: a
    * domain-count aggregate (rows = #domains) splits the corpus into
    * under-cap sources — which pass through a broadcast anti-join with NO
    * sort, NO window, and NO exchange — and the over-cap slice, which
    * alone pays the per-source rank. On a web corpus where the long tail
    * of domains carries most rows, the window exchange shrinks from
    * corpus-sized to head-domain-sized (and Spark's WindowGroupLimit
    * prunes each over-cap group to ~cap rows before the final rank
    * filter). The spec pins output equality with the naive
    * all-rows-through-the-window plan; the oracle IS that naive plan in
    * SQL. If the over-cap domain list itself outgrew a broadcast
    * (millions of trimmed domains), the same split runs as a shuffle
    * semi/anti join — the routing logic is unchanged.
    */
  def sourceCap(docs: DataFrame, cap: Int = SOURCE_CAP,
                seed: String = "sc42", cache: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    // NULL source coalesces to '' so sourceless docs form one capped
    // pseudo-domain instead of silently vanishing through the null-unsafe
    // joins (ADVICE r10 — the oracle's JOIN USING(source) would have
    // dropped them identically, so the gate couldn't catch it). Output
    // carries the sentinel; a corpus with a REAL '' source shares the
    // pseudo-domain's cap, documented trade for a null-safe plan.
    val d = docs.select(col("doc_id"),
      coalesce(col("source"), lit("")).as("source"),
      Sketches.phash60(
        concat(lit(seed + "|"), col("doc_id").cast("string"))).as("h"))
    // the domain-count relation feeds three consumers (the anti-join, the
    // semi-join, and the output's n_source column); without a persist each
    // branch re-scans the corpus to rebuild the aggregate. Domain-sized —
    // cache=false for long-lived facade sessions (the q53 convention)
    val counts0 = d.groupBy("source").agg(count(lit(1)).as("n_source"))
    val counts = if (cache) counts0.persist() else counts0
    val over = counts.filter(col("n_source") > cap).select("source")
    val under = d.join(broadcast(over), Seq("source"), "left_anti")
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
    val trimmed = d.join(broadcast(over), Seq("source"), "left_semi")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
    under.select("source", "doc_id")
      .unionAll(trimmed.select("source", "doc_id"))
      .join(broadcast(counts), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_source"),
        when(col("n_source") > cap, lit(1L)).otherwise(lit(0L)).as("capped"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q111: per-source document cap (domain balancing).
    "q111_source_cap" -> ((s, d) => sourceCap(Tables.documents(s, d))),

    // Q103: weighted deterministic subsample (weight = content mass).
    "q103_weighted_sample" -> ((s, d) =>
      weightedSample(Tables.documents(s, d))),

    // Q104: padding-efficiency report for length-bucketed batching.
    "q104_length_buckets" -> ((s, d) =>
      lengthBuckets(Tables.documents(s, d))),

    // Q85: snapshot diff over the synthetic next crawl.
    "q85_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      snapshotDiff(docs, syntheticNextSnapshot(docs))
    }),

    // Q91: engagement weights from the event log (props.k -> doc_id).
    "q91_engagement_weight" -> ((s, d) =>
      engagementWeights(Tables.events(s, d), Tables.documents(s, d))),

    // Q92: n-gram novelty of the synthetic next crawl vs the current one.
    "q92_ngram_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      ngramNovelty(docs, syntheticNextSnapshot(docs))
    }),

    // Q93: seeded deterministic corpus shuffle into 8 training shards.
    "q93_global_shuffle" -> ((s, d) =>
      globalShuffle(Tables.documents(s, d))),

    // Q94: new-crawl exact dedup against the current corpus as history.
    "q94_crawl_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      crawlDedupBloom(docs, syntheticNextSnapshot(docs))
    }),
    "q46_quantize_embeddings" -> ((s, d) =>
      quantizeEmbeddings(Tables.embeddings(s, d))),
    "q47_chunk_documents" -> ((s, d) =>
      chunkDocuments(Tables.documents(s, d))),
    "q53_pack_sequences" -> ((s, d) =>
      packSequences(Tables.documents(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    // the oracle is deliberately the NAIVE single-window plan — equality
    // with it is what certifies the under/over-cap routed execution
    "q111_source_cap" ->
      s"""WITH d AS (SELECT doc_id, COALESCE(source, '') AS source,
         |        ${Sketches.phash60Sql("'sc42|' || CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents),
         |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
         |      FROM d GROUP BY source),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
         |      FROM d)
         |SELECT r.doc_id, r.source, c.n_source,
         |       CASE WHEN c.n_source > $SOURCE_CAP THEN CAST(1 AS BIGINT)
         |            ELSE CAST(0 AS BIGINT) END AS capped
         |FROM r JOIN c USING (source)
         |WHERE rn <= $SOURCE_CAP
         |ORDER BY doc_id""".stripMargin,

    "q103_weighted_sample" ->
      s"""SELECT doc_id, GREATEST(n_chars, 1) AS weight,
         |       ${Sketches.phash60Sql("'ws42|' || CAST(doc_id AS VARCHAR)")}
         |         // GREATEST(n_chars, 1) AS priority
         |FROM documents
         |ORDER BY priority, doc_id
         |LIMIT 200""".stripMargin,

    "q104_length_buckets" ->
      """WITH t AS (SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
        |b AS (SELECT n_tok,
        |        CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)
        |             ELSE CAST(POWER(2, length(bin(n_tok - 1))) AS BIGINT)
        |        END AS bucket
        |      FROM t),
        |g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
        |      FROM b GROUP BY bucket)
        |SELECT bucket, n_docs, sum_tokens,
        |       (n_docs + 63) // 64 AS n_batches,
        |       n_docs * bucket AS padded_tokens,
        |       ((n_docs * bucket - sum_tokens) * 1000) // (n_docs * bucket) AS waste_x1e3
        |FROM g
        |ORDER BY bucket""".stripMargin,

    "q91_engagement_weight" ->
      """WITH e AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS doc_id,
        |        CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents, user_id
        |      FROM events
        |      WHERE json_extract(props, '$.k') IS NOT NULL),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |          CAST(SUM(cents) AS BIGINT) AS value_cents
        |        FROM e GROUP BY doc_id),
        |j AS (SELECT d.doc_id,
        |        COALESCE(a.n_events, 0) AS n_events,
        |        COALESCE(a.n_users, 0) AS n_users,
        |        COALESCE(a.value_cents, 0) AS value_cents
        |      FROM documents d LEFT JOIN agg a USING (doc_id)),
        |t AS (SELECT SUM(value_cents) AS total_cents FROM j)
        |SELECT j.doc_id, j.n_events, j.n_users, j.value_cents,
        |       CASE WHEN t.total_cents > 0
        |            THEN CAST(FLOOR(j.value_cents * 1000000.0 / t.total_cents
        |                 + 0.5) AS BIGINT)
        |            ELSE 0 END AS weight_x1e6
        |FROM j CROSS JOIN t
        |ORDER BY doc_id""".stripMargin,

    "q92_ngram_novelty" ->
      s"""WITH src AS (SELECT doc_id, text,
         |        ${Sketches.phash60Sql("doc_id")} % 10 AS h FROM documents),
         |b AS (SELECT doc_id,
         |        CASE WHEN h = 1 THEN text || ' rev' ELSE text END AS text
         |      FROM src WHERE h <> 0
         |      UNION ALL
         |      SELECT doc_id + 1000000, text FROM src WHERE h = 2),
         |atoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |ash AS (SELECT DISTINCT
         |          ${Sketches.phash60Sql("sh")} AS h
         |        FROM (SELECT l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
         |              FROM atoks, unnest(range(1, len(l) - 1)) AS t(i)
         |              WHERE len(l) >= 3)),
         |btoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM b),
         |bsh AS (SELECT DISTINCT doc_id,
         |          ${Sketches.phash60Sql("sh")} AS h
         |        FROM (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
         |              FROM btoks, unnest(range(1, len(l) - 1)) AS t(i)
         |              WHERE len(l) >= 3)),
         |per AS (SELECT bsh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |          CAST(SUM(CASE WHEN ash.h IS NULL THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_novel
         |        FROM bsh LEFT JOIN ash ON bsh.h = ash.h
         |        GROUP BY bsh.doc_id)
         |SELECT b.doc_id,
         |       COALESCE(per.n_shingles, 0) AS n_shingles,
         |       COALESCE(per.n_novel, 0) AS n_novel,
         |       CASE WHEN COALESCE(per.n_shingles, 0) > 0
         |            THEN CAST(FLOOR(per.n_novel * 1000.0 / per.n_shingles
         |                 + 0.5) AS BIGINT)
         |            ELSE 0 END AS novelty_x1e3
         |FROM b LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the Bloom stage is result-invisible by construction (no false
    // negatives; the exact anti-join removes false positives), so the
    // twin is the plain anti-join on text equality
    "q94_crawl_dedup" ->
      s"""WITH src AS (SELECT doc_id, text,
         |        ${Sketches.phash60Sql("doc_id")} % 10 AS h FROM documents),
         |b AS (SELECT doc_id,
         |        CASE WHEN h = 1 THEN text || ' rev' ELSE text END AS text
         |      FROM src WHERE h <> 0
         |      UNION ALL
         |      SELECT doc_id + 1000000, text FROM src WHERE h = 2)
         |SELECT b.doc_id,
         |       CAST(len(string_split(b.text, ' ')) AS BIGINT) AS n_tokens
         |FROM b ANTI JOIN documents d ON b.text = d.text
         |ORDER BY doc_id""".stripMargin,

    "q93_global_shuffle" ->
      s"""WITH d AS (SELECT doc_id,
         |        ${Sketches.phash60Sql("'s42|' || CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents)
         |SELECT h % 8 AS shard,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
         |            AS BIGINT) AS pos,
         |       doc_id
         |FROM d
         |ORDER BY shard, pos""".stripMargin,

    // the oracle compares TEXT equality directly — the same decision the
    // sha comparison makes (no collisions at fixture scale), immune to
    // hash-format differences between engines
    "q85_snapshot_diff" ->
      s"""WITH src AS (SELECT doc_id, text,
         |        ${Sketches.phash60Sql("doc_id")} % 10 AS h FROM documents),
         |b AS (SELECT doc_id,
         |        CASE WHEN h = 1 THEN text || ' rev' ELSE text END AS text
         |      FROM src WHERE h <> 0
         |      UNION ALL
         |      SELECT doc_id + 1000000, text FROM src WHERE h = 2)
         |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         |       CASE WHEN a.doc_id IS NULL THEN 'added'
         |            WHEN b.doc_id IS NULL THEN 'removed'
         |            WHEN a.text <> b.text THEN 'changed'
         |            ELSE 'same' END AS status
         |FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |WHERE CASE WHEN a.doc_id IS NULL THEN 'added'
         |           WHEN b.doc_id IS NULL THEN 'removed'
         |           WHEN a.text <> b.text THEN 'changed'
         |           ELSE 'same' END <> 'same'
         |ORDER BY doc_id""".stripMargin,

    "q46_quantize_embeddings" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |s AS (SELECT vec_id, emb,
         |        CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN CAST(0 AS DOUBLE)
         |             ELSE CAST($Q_MAX AS DOUBLE) / list_max(list_transform(emb, x -> abs(x))) END AS scale
         |      FROM e),
         |q AS (SELECT vec_id, scale,
         |        list_transform(emb, x -> CAST(LEAST(GREATEST(
         |          FLOOR(x * scale + CAST(0.5 AS DOUBLE)),
         |          CAST(-$Q_MAX AS DOUBLE)), CAST($Q_MAX AS DOUBLE)) AS BIGINT)) AS qa
         |      FROM s)
         |SELECT vec_id,
         |       CAST(FLOOR(scale * 1000000 + 0.5) AS BIGINT) AS scale_x1e6,
         |       CAST(list_aggregate(qa, 'sum') AS BIGINT) AS q_sum,
         |       CAST(list_aggregate(qa, 'min') AS BIGINT) AS q_min,
         |       CAST(list_aggregate(qa, 'max') AS BIGINT) AS q_max,
         |       CAST(list_aggregate(list_transform(qa, x -> x * x), 'sum') AS BIGINT) AS q_norm2
         |FROM q
         |ORDER BY vec_id""".stripMargin,

    "q47_chunk_documents" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |c AS (SELECT doc_id, l, ci FROM t,
         |        unnest(range(0, CAST(FLOOR(CAST(len(l) - 1 AS DOUBLE) / $STRIDE) AS BIGINT) + 1)) AS u(ci)),
         |ch AS (SELECT doc_id, ci, l[(ci * $STRIDE + 1):(ci * $STRIDE + $CHUNK)] AS chunk FROM c)
         |SELECT doc_id,
         |       CAST(ci AS INT) AS chunk_idx,
         |       CAST(ci * $STRIDE + 1 AS BIGINT) AS start_tok,
         |       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
         |       ${TextAnalysis.rollingFpSql("chunk")} AS chunk_fp
         |FROM ch
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    // the oracle is deliberately the NAIVE global-window cumsum — equality
    // with it is what certifies the two-pass distributed prefix sum
    "q53_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |             ${Sketches.phash60Sql("doc_id")} AS h
         |           FROM documents),
         |w AS (SELECT doc_id, n_tokens,
         |        CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
         |        CAST(COALESCE(SUM(n_tokens) OVER
         |          (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |          0) AS BIGINT) AS cumb
         |      FROM d)
         |SELECT doc_id, pos, n_tokens,
         |       CAST(FLOOR(CAST(cumb AS DOUBLE) / $PACK_BUDGET) AS BIGINT) AS bin,
         |       cumb - CAST(FLOOR(CAST(cumb AS DOUBLE) / $PACK_BUDGET) AS BIGINT) * $PACK_BUDGET AS off_in_bin
         |FROM w
         |ORDER BY pos""".stripMargin
  )
}
