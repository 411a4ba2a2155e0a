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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_quantize_embeddings" -> ((s, d) =>
      quantizeEmbeddings(Tables.embeddings(s, d))),
    "q47_chunk_documents" -> ((s, d) =>
      chunkDocuments(Tables.documents(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
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
         |ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
