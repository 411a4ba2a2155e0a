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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q85: snapshot diff over the synthetic next crawl.
    "q85_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      snapshotDiff(docs, syntheticNextSnapshot(docs))
    }),
    "q46_quantize_embeddings" -> ((s, d) =>
      quantizeEmbeddings(Tables.embeddings(s, d))),
    "q47_chunk_documents" -> ((s, d) =>
      chunkDocuments(Tables.documents(s, d))),
    "q53_pack_sequences" -> ((s, d) =>
      packSequences(Tables.documents(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
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
