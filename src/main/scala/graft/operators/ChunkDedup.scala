package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Chunk-granular dedup accounting — two operators a corpus-storage /
  * capacity-planning pipeline runs next to the document-granular q18/q49
  * family:
  *
  *  - q114: CONTENT-DEFINED CHUNKING (the Rabin/FastCDC idea, token
  *    granularity) + corpus-wide duplicated-chunk report. Chunk
  *    boundaries are a pure function of local content (a token whose
  *    portable hash lands in a residue class ends its chunk), so an
  *    insertion early in a document shifts POSITIONS but not boundary
  *    tokens — downstream chunks re-align and still dedup, which is
  *    exactly why storage systems chunk this way instead of at fixed
  *    offsets (q47). A repeated passage therefore surfaces as repeated
  *    chunk hashes regardless of where it sits in each document.
  *
  *  - q115: DEDUP-SAVINGS report per source — what a release manager
  *    reads before a dedup pass: per source, how many docs/tokens the
  *    exact stage (q18 semantics: same text keeps min doc_id) removes,
  *    how many MORE the near-dup stage removes (q49 clusters over the
  *    exact survivors, keep the min surviving member), and what remains.
  *
  * 100 TB shape: q114 is one tokenize scan -> per-doc window (cumulative
  * boundary count; partitioned by doc, never corpus-wide) -> two hash
  * aggregates on the chunk key; the duplicated-chunk output is
  * collision-sized. q115 composes the q18 hash aggregate, the q49
  * cluster relation (pair-graph-sized, broadcast), and three per-source
  * aggregates off one corpus scan — no joins wider than the corpus x
  * broadcast.
  */
object ChunkDedup {

  /** Boundary residue divisor: a token ends its chunk iff
    * phash60(token) % CHUNK_DIV == 0 — expected chunk length = the
    * divisor. 4 at fixture scale so the 12-token planted excerpts
    * contain whole chunks; a production corpus sets the divisor to its
    * target chunk size (e.g. ~512 tokens), changing nothing structural.
    */
  private val CHUNK_DIV = 4L

  /** q114: duplicated content-defined chunks over `docs` — one row per
    * chunk VALUE occurring >= 2 times: (chunk_hash, n_tokens, n_occ,
    * n_docs). Boundary-ness is per-token content, so equal chunk strings
    * imply equal internal boundary structure — the group-by key is
    * well-defined.
    */
  def cdcChunks(docs: DataFrame, div: Long = CHUNK_DIV): DataFrame =
    chunkReport(chunkCounts(docs, div))

  /** The per-(chunk, doc) occurrence partials
    * `(chunk_hash, n_tokens, doc_id, n_occ)` — the batch path's
    * intermediate AND the streaming chunk index's per-batch content:
    * additive in n_occ and unionable in (chunk_hash, doc), so per-batch
    * partials merge into the whole-corpus relation by plain union
    * (disjoint doc batches), the q58/q107 mergeable-index contract.
    *
    * Chunk identity is `md5(chunk)` — the SAME identity the q114 report
    * already exposes — taken as early as possible: the chunk TEXT dies
    * inside the per-doc reassembly projection and never reaches a
    * shuffle or the persisted index. At 100 TB the aggregate therefore
    * exchanges 16-byte hashes + longs instead of KB-long strings, and
    * the streaming index stores a hash-sized relation instead of a
    * re-sorted copy of the corpus (round-11 verdict #1). n_tokens rides
    * along as the chunk's group size (no re-split of the text), correct
    * under the same hash-collision assumption the report already makes.
    */
  private[graft] def chunkCounts(docs: DataFrame,
                                     div: Long = CHUNK_DIV): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    // chunk id = boundaries strictly BEFORE this token (a boundary token
    // ends its own chunk); per-doc running sum, never a global window
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cid = tok
      .withColumn("b", when(
        pmod(Sketches.phash60(col("tok")), lit(div)) === 0, 1L).otherwise(0L))
      .withColumn("cid", coalesce(sum(col("b")).over(w), lit(0L)))
    cid.groupBy("doc_id", "cid")
      .agg(md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok").as("t")))),
          s => s.getField("t")), " ")).as("chunk_hash"),
        count(lit(1)).as("n_tokens"))
      .groupBy("chunk_hash", "n_tokens", "doc_id")
      .agg(count(lit(1)).as("n_occ"))
  }

  /** The q114 report tail over `(chunk_hash, n_tokens, doc_id, n_occ)`
    * partials — ONE definition shared by the batch query and the
    * streaming index readout so the two can never drift.
    */
  private[operators] def chunkReport(counts: DataFrame): DataFrame =
    counts.groupBy("chunk_hash", "n_tokens")
      .agg(sum(col("n_occ")).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occ") >= 2)
      .select("chunk_hash", "n_tokens", "n_occ", "n_docs")
      .orderBy("chunk_hash")

  /** q115: per-source dedup savings. `labels` is the q49 cluster relation
    * over the SAME corpus (doc_id, cluster_id; pair-graph-sized).
    */
  def dedupSavings(docs: DataFrame, labels: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      coalesce(col("source"), lit("")).as("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      sha2(col("text"), 256).as("h"))
    // exact stage: within a hash group the min doc_id survives
    val flagged = d.withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("h")))
      .withColumn("exact_rm", (col("doc_id") =!= col("keep_id")).cast("long"))
    val survivors = flagged.filter(col("exact_rm") === 0)
    // near-dup stage over survivors: min SURVIVING member per cluster
    // survives (the canonical may itself have been an exact duplicate)
    val clustered = survivors.join(broadcast(labels.select("doc_id", "cluster_id")),
      Seq("doc_id"))
    val cmin = clustered.groupBy("cluster_id")
      .agg(min(col("doc_id")).as("cmin"))
    val ndRemoved = clustered.join(broadcast(cmin), Seq("cluster_id"))
      .filter(col("doc_id") =!= col("cmin"))
    def bySource(df: DataFrame, dc: String, tc: String): DataFrame =
      df.groupBy("source").agg(count(lit(1)).as(dc),
        sum(col("n_tokens")).as(tc))
    bySource(d, "n_docs", "n_tokens")
      .join(bySource(flagged.filter(col("exact_rm") === 1),
        "exact_docs_removed", "exact_tokens_removed"), Seq("source"), "left")
      .join(bySource(ndRemoved,
        "neardup_docs_removed", "neardup_tokens_removed"), Seq("source"), "left")
      .na.fill(0L, Seq("exact_docs_removed", "exact_tokens_removed",
        "neardup_docs_removed", "neardup_tokens_removed"))
      .withColumn("kept_tokens", col("n_tokens") -
        col("exact_tokens_removed") - col("neardup_tokens_removed"))
      .orderBy("source")
  }

  /** q125: DEDUP APPLY — the per-document materialization of the q115
    * accounting: every doc labeled with the stage that removes it
    * (`exact` — a same-text copy of a lower doc_id; `neardup` — an exact
    * survivor losing to its cluster's min surviving member) or `kept`.
    * This is the relation a pipeline actually JOINS against to emit the
    * cleaned corpus, where q115 only prices it; the two share one
    * stage-assignment definition by construction (same window + joins),
    * so the report can never disagree with the applied set.
    * Execution shape is q115's: one hash-keyed window for the exact
    * stage, broadcast pair-graph-sized cluster relations for the
    * near-dup stage, per-doc output.
    */
  def dedupApply(docs: DataFrame, labels: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      coalesce(col("source"), lit("")).as("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      sha2(col("text"), 256).as("h"))
    val flagged = d.withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("h")))
      .withColumn("exact_rm", (col("doc_id") =!= col("keep_id")).cast("long"))
    val survivors = flagged.filter(col("exact_rm") === 0)
    val clustered = survivors.join(
      broadcast(labels.select("doc_id", "cluster_id")), Seq("doc_id"))
    val cmin = clustered.groupBy("cluster_id")
      .agg(min(col("doc_id")).as("cmin"))
    val ndRemoved = clustered.join(broadcast(cmin), Seq("cluster_id"))
      .filter(col("doc_id") =!= col("cmin"))
      .select(col("doc_id"), lit(1L).as("nd_rm"))
    flagged.join(broadcast(ndRemoved), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        when(col("exact_rm") === 1, lit("exact"))
          .when(col("nd_rm") === 1, lit("neardup"))
          .otherwise(lit("kept")).as("stage"))
      .orderBy("doc_id")
  }

  /** q129: CHUNK-LEVEL STORAGE SAVINGS — the single-row capacity answer
    * the q114 report prices per chunk: of the corpus' token mass (as
    * chunked — chunks partition every document, so this EQUALS the
    * corpus token count, spec-pinned), how much is duplicate chunk
    * storage a content-addressed store would not pay twice. Pure tail
    * over the hash-keyed [[chunkCounts]] partials: Σ n_occ·n_tokens
    * total, Σ n_tokens per distinct chunk value, savings = difference.
    */
  def chunkSavings(docs: DataFrame, div: Long = CHUNK_DIV): DataFrame =
    chunkCounts(docs, div)
      .groupBy("chunk_hash", "n_tokens")
      .agg(sum(col("n_occ")).as("n_occ"))
      .agg(sum(col("n_tokens") * col("n_occ")).as("total_tokens"),
        sum(col("n_tokens")).as("unique_chunk_tokens"))
      .select(col("total_tokens"), col("unique_chunk_tokens"),
        (col("total_tokens") - col("unique_chunk_tokens")).as("dup_tokens"),
        expr("((total_tokens - unique_chunk_tokens) * 1000000)" +
          " DIV total_tokens").as("savings_x1e6"))

  /** q128: CLUSTER QUALITY STATS — per near-dup cluster, what the
    * keep-min-doc_id canonical policy (q49/q115/q125) costs against
    * keep-best-quality (q95): member count, the min-doc member's quality,
    * the best member's quality, and the gain. The table that decides
    * WHICH canonical policy a corpus release runs — if gains concentrate
    * in big clusters, keep-min is throwing away the good copies.
    * Integer quality values, broadcast pair-graph-sized label relation,
    * cluster-sized output; the keep-min member's quality comes from
    * `min_by(quality, doc_id)` (deterministic — doc_id is unique) and the
    * best value from plain `max(quality)` over exact integers, so the
    * report is deterministic with no tie-break needed.
    */
  def clusterQualityStats(docs: DataFrame, labels: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      TextAnalysis.qualityCol.as("quality_x1e3"))
    d.join(broadcast(labels.select("doc_id", "cluster_id")), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        min_by(col("quality_x1e3"), col("doc_id")).as("keepmin_quality_x1e3"),
        max(col("quality_x1e3")).as("best_quality_x1e3"))
      .select(col("cluster_id"), col("n_members"),
        col("keepmin_quality_x1e3"), col("best_quality_x1e3"),
        (col("best_quality_x1e3") - col("keepmin_quality_x1e3"))
          .as("quality_gain_x1e3"))
      .orderBy("cluster_id")
  }

  /** q131: CLUSTER SOURCE MATRIX — for every source pair (s1 <= s2), how
    * many near-dup clusters contain BOTH (diagonal = clusters touching
    * the source at all). q109 detects mirror feeds at the raw-shingle
    * level; this is the same question asked of the VERIFIED duplicate
    * graph — which feeds actually co-occur in dedup clusters, i.e.
    * where cross-source dedup is doing work and which source pairs a
    * crawler could drop. Execution: the label relation is
    * pair-graph-sized (broadcast), the distinct (cluster, source)
    * relation smaller still; the pair self-join fans out per cluster by
    * its source count (bounded by #sources), output matrix-sized.
    */
  def clusterSourceMatrix(docs: DataFrame, labels: DataFrame): DataFrame = {
    val cs = docs.select(col("doc_id"),
        coalesce(col("source"), lit("")).as("source"))
      .join(broadcast(labels.select("doc_id", "cluster_id")), Seq("doc_id"))
      .select("cluster_id", "source").distinct()
    cs.as("a").join(cs.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.source") <= col("b.source"))
      .groupBy(col("a.source").as("source1"), col("b.source").as("source2"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("source1", "source2")
  }

  /** q122: DUPLICATION PROFILE — the cluster-SIZE histogram of the q49
    * near-dup graph, with doc and token mass per size (singletons
    * included as size 1). The shape of this table is what distinguishes
    * a template-farm corpus (mass in large clusters) from organically
    * duplicated text (mass at size 2-3) — it prices the q115 savings and
    * picks between pairwise dropping and cluster-canonical strategies.
    * Execution: the label relation is pair-graph-sized (broadcast
    * everywhere); singletons come from one broadcast anti-join aggregate;
    * output is size-histogram-sized.
    */
  def clusterProfile(docs: DataFrame, labels: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val lbl = labels.select("doc_id", "cluster_id")
    val sizes = lbl.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    val clustered = d.join(broadcast(lbl), "doc_id")
      .join(broadcast(sizes), "cluster_id")
      .groupBy("cluster_size")
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val singles = d.join(broadcast(lbl), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .select(lit(1L).as("cluster_size"), col("n_docs").as("n_clusters"),
        col("n_docs"), col("n_tokens"))
      .filter(col("n_docs") > 0)
    clustered.select("cluster_size", "n_clusters", "n_docs", "n_tokens")
      .unionByName(singles)
      .orderBy("cluster_size")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q114: duplicated content-defined chunks over the corpus + planted
    // excerpts (the excerpts repeat their source's leading chunks, so the
    // fixture exercises real cross-doc chunk duplication).
    "q114_cdc_chunks" -> ((s, d) =>
      cdcChunks(Dedup.withPlantedExcerpts(
        Tables.documents(s, d).select("doc_id", "text")))),

    // Q115: per-source dedup savings; clusters from the shared raw-corpus
    // curation-index artifact (the q49 relation).
    "q115_dedup_savings" -> ((s, d) =>
      dedupSavings(Tables.documents(s, d),
        Dedup.clustersFromPairs(
          s.read.parquet(DedupArtifacts.ensureVerifiedPairs(s, d))))),

    // Q122: duplication profile (cluster-size histogram incl. singletons).
    "q122_cluster_profile" -> ((s, d) =>
      clusterProfile(Tables.documents(s, d),
        Dedup.clustersFromPairs(
          s.read.parquet(DedupArtifacts.ensureVerifiedPairs(s, d))))),

    // Q125: per-doc staged-dedup materialization (the applied twin of
    // q115's accounting), clusters from the shared artifact.
    "q125_dedup_apply" -> ((s, d) =>
      dedupApply(Tables.documents(s, d),
        Dedup.clustersFromPairs(
          s.read.parquet(DedupArtifacts.ensureVerifiedPairs(s, d))))),

    // Q128: keep-min vs keep-best quality per cluster (canonical-policy
    // pricing), clusters from the shared artifact.
    "q128_cluster_quality" -> ((s, d) =>
      clusterQualityStats(Tables.documents(s, d),
        Dedup.clustersFromPairs(
          s.read.parquet(DedupArtifacts.ensureVerifiedPairs(s, d))))),

    // Q129: chunk-level storage savings over the q114 fixture corpus.
    "q129_chunk_savings" -> ((s, d) =>
      chunkSavings(Dedup.withPlantedExcerpts(
        Tables.documents(s, d).select("doc_id", "text")))),

    // Q131: which source pairs co-occur in near-dup clusters (verified
    // mirror matrix), clusters from the shared artifact.
    "q131_cluster_sources" -> ((s, d) =>
      clusterSourceMatrix(Tables.documents(s, d),
        Dedup.clustersFromPairs(
          s.read.parquet(DedupArtifacts.ensureVerifiedPairs(s, d)))))
  )

  val oracleSql: Map[String, String] = Map(
    "q122_cluster_profile" ->
      s"""WITH RECURSIVE ${Dedup.ccLabelsCtesSql},
         |d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |      FROM documents),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |       FROM labels GROUP BY 1),
         |cl AS (SELECT cluster_size,
         |         CAST(COUNT(DISTINCT l.cluster_id) AS BIGINT) AS n_clusters,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens
         |       FROM d JOIN labels l ON d.doc_id = l.doc_id
         |       JOIN sz ON l.cluster_id = sz.cluster_id
         |       GROUP BY cluster_size),
         |sg AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
         |         CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens
         |       FROM d WHERE doc_id NOT IN (SELECT doc_id FROM labels))
         |SELECT * FROM cl
         |UNION ALL
         |SELECT * FROM sg WHERE n_docs > 0
         |ORDER BY cluster_size""".stripMargin,

    "q114_cdc_chunks" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |        UNION ALL
         |        SELECT doc_id + 2000000,
         |               array_to_string((string_split(text, ' '))[1:${Dedup.EXC_TOKENS}], ' ')
         |        FROM documents
         |        WHERE ${Sketches.phash60Sql("doc_id")} % 50 = 0),
         |tok AS (SELECT doc_id, i - 1 AS pos, l[i] AS tok
         |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM base),
         |             unnest(range(1, len(l) + 1)) AS u(i)),
         |b AS (SELECT doc_id, pos, tok,
         |        CASE WHEN ${Sketches.phash60Sql("tok")} % $CHUNK_DIV = 0
         |             THEN 1 ELSE 0 END AS b
         |      FROM tok),
         |c AS (SELECT doc_id, pos, tok,
         |        COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
         |      FROM b),
         |ch AS (SELECT doc_id, cid, string_agg(tok, ' ' ORDER BY pos) AS chunk
         |       FROM c GROUP BY doc_id, cid),
         |g AS (SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n_occ,
         |        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |      FROM ch GROUP BY chunk HAVING COUNT(*) >= 2)
         |SELECT md5(chunk) AS chunk_hash,
         |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
         |       n_occ, n_docs
         |FROM g ORDER BY chunk_hash""".stripMargin,

    "q131_cluster_sources" ->
      s"""WITH RECURSIVE ${Dedup.ccLabelsCtesSql},
         |cs AS (SELECT DISTINCT l.cluster_id, COALESCE(d.source, '') AS source
         |       FROM labels l JOIN documents d ON l.doc_id = d.doc_id)
         |SELECT a.source AS source1, b.source AS source2,
         |       CAST(COUNT(*) AS BIGINT) AS n_clusters
         |FROM cs a JOIN cs b
         |  ON a.cluster_id = b.cluster_id AND a.source <= b.source
         |GROUP BY a.source, b.source
         |ORDER BY source1, source2""".stripMargin,

    "q128_cluster_quality" ->
      s"""WITH RECURSIVE ${Dedup.ccLabelsCtesSql},
         |q AS (SELECT doc_id, ${TextAnalysis.QUALITY_SQL} AS quality_x1e3
         |      FROM documents),
         |j AS (SELECT l.cluster_id, l.doc_id, q.quality_x1e3
         |      FROM labels l JOIN q ON l.doc_id = q.doc_id),
         |km AS (SELECT cluster_id, doc_id, quality_x1e3,
         |         row_number() OVER (PARTITION BY cluster_id
         |           ORDER BY doc_id) AS rn
         |       FROM j)
         |SELECT j.cluster_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_members,
         |       CAST(MAX(km.quality_x1e3) AS BIGINT) AS keepmin_quality_x1e3,
         |       CAST(MAX(j.quality_x1e3) AS BIGINT) AS best_quality_x1e3,
         |       CAST(MAX(j.quality_x1e3) - MAX(km.quality_x1e3) AS BIGINT)
         |         AS quality_gain_x1e3
         |FROM j LEFT JOIN (SELECT cluster_id, quality_x1e3 FROM km WHERE rn = 1) km
         |  ON j.cluster_id = km.cluster_id
         |GROUP BY j.cluster_id
         |ORDER BY j.cluster_id""".stripMargin,

    "q125_dedup_apply" ->
      s"""WITH RECURSIVE ${Dedup.ccLabelsCtesSql},
         |d AS (SELECT doc_id, COALESCE(source, '') AS source,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |        sha256(text) AS h
         |      FROM documents),
         |k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h),
         |f AS (SELECT d.*, CASE WHEN d.doc_id <> k.keep_id THEN 1 ELSE 0 END AS exact_rm
         |      FROM d JOIN k USING (h)),
         |s AS (SELECT * FROM f WHERE exact_rm = 0),
         |cm AS (SELECT l.cluster_id, MIN(s.doc_id) AS cmin
         |       FROM labels l JOIN s ON l.doc_id = s.doc_id
         |       GROUP BY l.cluster_id),
         |nd AS (SELECT s.doc_id
         |       FROM s JOIN labels l ON s.doc_id = l.doc_id
         |       JOIN cm ON l.cluster_id = cm.cluster_id
         |       WHERE s.doc_id <> cm.cmin)
         |SELECT f.doc_id, f.source, f.n_tokens,
         |       CASE WHEN f.exact_rm = 1 THEN 'exact'
         |            WHEN nd.doc_id IS NOT NULL THEN 'neardup'
         |            ELSE 'kept' END AS stage
         |FROM f LEFT JOIN nd ON f.doc_id = nd.doc_id
         |ORDER BY f.doc_id""".stripMargin,

    "q129_chunk_savings" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |        UNION ALL
         |        SELECT doc_id + 2000000,
         |               array_to_string((string_split(text, ' '))[1:${Dedup.EXC_TOKENS}], ' ')
         |        FROM documents
         |        WHERE ${Sketches.phash60Sql("doc_id")} % 50 = 0),
         |tok AS (SELECT doc_id, i - 1 AS pos, l[i] AS tok
         |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM base),
         |             unnest(range(1, len(l) + 1)) AS u(i)),
         |b AS (SELECT doc_id, pos, tok,
         |        CASE WHEN ${Sketches.phash60Sql("tok")} % $CHUNK_DIV = 0
         |             THEN 1 ELSE 0 END AS b
         |      FROM tok),
         |c AS (SELECT doc_id, pos, tok,
         |        COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
         |      FROM b),
         |ch AS (SELECT doc_id, cid, string_agg(tok, ' ' ORDER BY pos) AS chunk
         |       FROM c GROUP BY doc_id, cid),
         |g AS (SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n_occ,
         |        CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens
         |      FROM ch GROUP BY chunk)
         |SELECT CAST(SUM(n_tokens * n_occ) AS BIGINT) AS total_tokens,
         |       CAST(SUM(n_tokens) AS BIGINT) AS unique_chunk_tokens,
         |       CAST(SUM(n_tokens * n_occ) - SUM(n_tokens) AS BIGINT) AS dup_tokens,
         |       CAST(((SUM(n_tokens * n_occ) - SUM(n_tokens)) * 1000000)
         |         // SUM(n_tokens * n_occ) AS BIGINT) AS savings_x1e6
         |FROM g""".stripMargin,

    "q115_dedup_savings" ->
      s"""WITH RECURSIVE ${Dedup.ccLabelsCtesSql},
         |d AS (SELECT doc_id, COALESCE(source, '') AS source,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |        sha256(text) AS h
         |      FROM documents),
         |k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h),
         |f AS (SELECT d.*, CASE WHEN d.doc_id <> k.keep_id THEN 1 ELSE 0 END AS exact_rm
         |      FROM d JOIN k USING (h)),
         |s AS (SELECT * FROM f WHERE exact_rm = 0),
         |cm AS (SELECT l.cluster_id, MIN(s.doc_id) AS cmin
         |       FROM labels l JOIN s ON l.doc_id = s.doc_id
         |       GROUP BY l.cluster_id),
         |nd AS (SELECT s.doc_id, s.source, s.n_tokens
         |       FROM s JOIN labels l ON s.doc_id = l.doc_id
         |       JOIN cm ON l.cluster_id = cm.cluster_id
         |       WHERE s.doc_id <> cm.cmin),
         |base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |         FROM d GROUP BY source),
         |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ed,
         |         CAST(SUM(n_tokens) AS BIGINT) AS et
         |       FROM f WHERE exact_rm = 1 GROUP BY source),
         |nds AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd_docs,
         |          CAST(SUM(n_tokens) AS BIGINT) AS nd_tokens
         |        FROM nd GROUP BY source)
         |SELECT base.source, base.n_docs, base.n_tokens,
         |       COALESCE(ex.ed, 0) AS exact_docs_removed,
         |       COALESCE(ex.et, 0) AS exact_tokens_removed,
         |       COALESCE(nds.nd_docs, 0) AS neardup_docs_removed,
         |       COALESCE(nds.nd_tokens, 0) AS neardup_tokens_removed,
         |       base.n_tokens - COALESCE(ex.et, 0) - COALESCE(nds.nd_tokens, 0)
         |         AS kept_tokens
         |FROM base
         |LEFT JOIN ex ON base.source = ex.source
         |LEFT JOIN nds ON base.source = nds.source
         |ORDER BY base.source""".stripMargin
  )
}
