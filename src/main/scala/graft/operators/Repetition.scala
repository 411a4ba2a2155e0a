package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Repetition-based quality filters — the Gopher/CCNet family of signals a
  * production pretraining pipeline runs between raw ingest and dedup:
  *
  *  - q51: INTRA-document repetition — per document, the fraction of n-gram
  *    positions covered by the most common 2-gram and by duplicated 2-/3-
  *    grams (the "top n-gram fraction" / "duplicate n-gram fraction" rules
  *    used to drop boilerplate and degenerate generations).
  *  - q52: INTER-document repetition — per document, the fraction of its
  *    5-gram passages that also occur in at least one other document (the
  *    corpus-level duplicated-passage signal line-dedup pipelines use; the
  *    documents table has no newlines, so the passage unit is the token
  *    5-gram rather than the line).
  *
  * Both are pure explode + hash-aggregate shapes:
  *
  *  - q51 never joins at all: one generator per document row fans out to
  *    (doc, n, gram) rows, two partial-aggregating groupBys reduce them, and
  *    every shuffle row is a gram count, never a document. Per-doc work is
  *    linear in document length.
  *  - q52's only corpus-wide operation is a groupBy on the 64-bit shingle
  *    hash followed by a join back on that same hash — the aggregate output
  *    is already hash-partitioned on the join key, so the join adds no
  *    second exchange for that side, and no operation is quadratic in
  *    anything (contrast the q21 inverted-index SELF-join: here each shingle
  *    contributes its posting-list length, not its square, because we only
  *    count documents per shingle). That is what makes this the signal you
  *    can afford corpus-wide at 100 TB while pair-level near-dup needs LSH.
  *
  * Like q21, q52 groups on `xxhash64` of the shingle so the corpus-wide
  * shuffle carries 8-byte keys instead of ~40-byte strings; the oracle
  * groups on the string itself (collision odds over a 1e6-shingle corpus
  * ~1e-8 — the same accepted trade as q21/q22, and a collision indicts the
  * run, not the design).
  */
object Repetition {

  /** Token n-gram array (n >= 1) over an ALREADY-PROJECTED token-array
    * column. Taking the column (not re-deriving `split(text)`) matters:
    * every `element_at` on an inline split re-splits the document, turning
    * per-doc work O(length^2) — a 7x bench regression before the tokens
    * were projected once (same discipline as `Dedup.shingles`).
    *
    * The short-doc branch must be explicit: Spark's `sequence(0, stop)`
    * DESCENDS for stop < 0 instead of returning empty, which would
    * fabricate grams from wrap-around indices.
    */
  private[operators] def gramArr(tk: Column, n: Int): Column =
    if (n == 1) tk
    else when(size(tk) >= n,
      transform(sequence(lit(0), size(tk) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(tk, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  private def ratioX1e3(num: Column, den: Column): Column =
    floor(num.cast("double") * lit(1000.0) / den + lit(0.5)).cast("long")

  // q51 flag thresholds (per-mille): a document is flagged when its top
  // 2-gram covers >= 12.5% of 2-gram positions or duplicated 3-grams cover
  // >= 12.5% of 3-gram positions — the Gopher-style rule shape with
  // thresholds placed to split this corpus; production tunes per source.
  private[operators] val TOP2_MAX_X1E3 = 125L
  private[operators] val DUP3_MAX_X1E3 = 125L

  /** q51: per-document n-gram repetition metrics (docs with >= 3 tokens). */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    // one generator: (n, gram) structs for n = 1,2,3 in a single explode;
    // position totals (n_tokens - n + 1) are per-row expressions, so only
    // the gram COUNTS ever reach an exchange
    val grams = flatten(array((1 to 3).map(n =>
      transform(gramArr(col("tk"), n), g => struct(lit(n).as("n"), g.as("g")))): _*))
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        explode(grams).as("ng"))
      .select(col("doc_id"), col("n_tokens"),
        col("ng.n").as("n"), col("ng.g").as("g"))
      .groupBy("doc_id", "n_tokens", "n", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_tokens")
      .agg(
        max(when(col("n") === 1, col("c"))).as("top1"),
        max(when(col("n") === 2, col("c"))).as("top2"),
        sum(when(col("n") === 2 && col("c") > 1, col("c")).otherwise(0L)).as("dup2"),
        sum(when(col("n") === 3 && col("c") > 1, col("c")).otherwise(0L)).as("dup3"))
      .select(col("doc_id"), col("n_tokens"),
        ratioX1e3(col("top1"), col("n_tokens")).as("top1_x1e3"),
        ratioX1e3(col("top2"), col("n_tokens") - 1).as("top2_x1e3"),
        ratioX1e3(col("dup2"), col("n_tokens") - 1).as("dup2_x1e3"),
        ratioX1e3(col("dup3"), col("n_tokens") - 2).as("dup3_x1e3"))
      .withColumn("flagged",
        (col("top2_x1e3") >= TOP2_MAX_X1E3 || col("dup3_x1e3") >= DUP3_MAX_X1E3)
          .cast("int"))
      .orderBy("doc_id")
  }

  private val PASSAGE_N = 5
  // drop a document when more than half of its passages occur elsewhere
  private[operators] val SHARED_MAX_X1E3 = 500L

  /** q52: per-document duplicated-passage (5-gram) fraction across the
    * corpus. Documents with fewer than 5 tokens carry zero passages and are
    * kept by definition.
    */
  def dupPassageScore(docs: DataFrame): DataFrame = {
    // distinct (doc, passage-hash): a passage repeated INSIDE one document
    // counts once — this signal is strictly inter-document (q51 owns the
    // intra-document axis)
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        explode(array_distinct(gramArr(col("tk"), PASSAGE_N))).as("p"))
      .select(col("doc_id"), xxhash64(col("p")).as("ph"))
    // documents-per-passage; the groupBy output is hash-partitioned on `ph`,
    // which is exactly the join key below
    val freq = sh.groupBy("ph").agg(count(lit(1)).as("nd"))
    val perDoc = sh.join(freq, "ph")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_x1e3",
        when(col("n_passages") === 0, lit(0L))
          .otherwise(ratioX1e3(col("n_shared"), col("n_passages"))))
      .withColumn("keep", (col("shared_x1e3") <= SHARED_MAX_X1E3).cast("int"))
      .orderBy("doc_id")
  }

  /** q80: maximal shared-SPAN length — the copied-block detector q52's
    * per-gram fraction cannot see. A doc sharing 50 scattered 5-grams and
    * a doc sharing one contiguous 50-gram block (a lifted paragraph,
    * boilerplate header, license text — the thing substring-level dedup a
    * la Lee et al. removes) have the same shared fraction; only the run
    * structure separates them. Per document: the longest run of
    * CONSECUTIVE 5-gram positions whose passage occurs in some other
    * document.
    *
    * Shape: the q52 relations plus position indexes. Gaps-and-islands
    * turns runs into groups (pos - rank over shared positions), so the
    * whole signal is two hash aggregates and one per-doc window — the
    * window's partition is a document's grams, never corpus-sized. The
    * passage-frequency join is on xxhash64 keys (q52's idiom: the shuffle
    * carries 8-byte keys, not 5-gram strings).
    */
  def sharedSpanScore(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
    val pos = tok
      .select(col("doc_id"), posexplode(gramArr(col("tk"), PASSAGE_N)))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("ph"))
    val freq = pos.select("doc_id", "ph").distinct()
      .groupBy("ph").agg(count(lit(1)).as("nd"))
    val shared = pos.join(freq, "ph").filter(col("nd") > 1)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val runs = shared
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id")
      .agg(sum("run").as("n_shared_pos"), max("run").as("max_shared_run"))
    val counts = pos.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    docs.select("doc_id").join(counts, Seq("doc_id"), "left")
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared_pos"), lit(0L)).as("n_shared_pos"),
        coalesce(col("max_shared_run"), lit(0L)).as("max_shared_run"))
      .orderBy("doc_id")
  }

  /** q98: exact-substring DEDUP ACCOUNTING (Lee et al. 2022's removal
    * regime, first-occurrence-wins) — q80 DETECTS copied blocks; this
    * operator decides what a span-level deduper would strip. Every
    * `PASSAGE_N`-gram occurring in more than one document is owned by its
    * lowest doc_id; in every OTHER document, the tokens covered by such
    * foreign shared grams are removal mass. Emits per document the exact
    * union-of-intervals token coverage: `n_dup_tokens` and the kept
    * fraction (x1e3).
    *
    * The union of equal-length sorted intervals has a closed window form:
    * each gram at `pos` covers [pos, pos+N-1], so its marginal
    * contribution is N for the first gram of a doc and
    * min(N, pos - lag(pos)) after — no interval sweep, no explode to
    * token granularity (which would multiply the relation by N).
    *
    * 100 TB shape: q80's exact machinery — 8-byte xxhash64 passage keys,
    * one (ph -> owner, nd) hash aggregate, one join back, one per-doc
    * window over the doc's own grams. Never corpus-sized partitions,
    * never all-pairs.
    */
  def spanDedupStats(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
    val pos = tok
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        posexplode(gramArr(col("tk"), PASSAGE_N)))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        xxhash64(col("col")).as("ph"))
    val own = pos.groupBy("ph")
      .agg(min("doc_id").as("owner"), countDistinct("doc_id").as("nd"))
    val foreign = pos.join(own, "ph")
      .filter(col("nd") > 1 && col("doc_id") =!= col("owner"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val covered = foreign
      .withColumn("lagpos", lag(col("pos"), 1).over(w))
      .withColumn("add", when(col("lagpos").isNull, lit(PASSAGE_N.toLong))
        .otherwise(least(lit(PASSAGE_N.toLong),
          (col("pos") - col("lagpos")).cast("long"))))
      .groupBy("doc_id").agg(sum("add").as("n_dup_tokens"))
    tok.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
      .withColumn("keep_x1e3",
        floor((col("n_tokens") - col("n_dup_tokens")).cast("double")
          * lit(1000.0) / col("n_tokens") + lit(0.5)).cast("long"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_repetition" -> ((s, d) => repetitionMetrics(Tables.documents(s, d))),
    "q52_dup_passages" -> ((s, d) => dupPassageScore(Tables.documents(s, d))),
    "q80_shared_spans" -> ((s, d) => sharedSpanScore(Tables.documents(s, d))),
    "q98_span_dedup" -> ((s, d) => spanDedupStats(Tables.documents(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    // q98 twin: same passage generation as q80, ownership by MIN(doc_id),
    // identical closed-form union-of-intervals window.
    "q98_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |pos AS (SELECT doc_id, i - 1 AS pos,
         |          l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS p
         |        FROM t, unnest(range(1, len(l) - 3)) AS u(i)
         |        WHERE len(l) >= $PASSAGE_N),
         |own AS (SELECT p, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS nd
         |        FROM pos GROUP BY p),
         |fr AS (SELECT doc_id, pos FROM pos JOIN own USING (p)
         |       WHERE nd > 1 AND doc_id <> owner),
         |cov AS (SELECT doc_id,
         |          CAST(SUM(CASE WHEN lagpos IS NULL THEN $PASSAGE_N
         |                        ELSE LEAST($PASSAGE_N, pos - lagpos) END)
         |               AS BIGINT) AS n_dup_tokens
         |        FROM (SELECT doc_id, pos,
         |                LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS lagpos
         |              FROM fr)
         |        GROUP BY doc_id),
         |n AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM t)
         |SELECT n.doc_id, n.n_tokens,
         |       COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
         |       CAST(FLOOR(CAST((n.n_tokens - COALESCE(c.n_dup_tokens, 0)) * 1000 AS DOUBLE)
         |            / n.n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT) AS keep_x1e3
         |FROM n LEFT JOIN cov c USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q80_shared_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |pos AS (SELECT doc_id, i - 1 AS pos,
         |          l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS p
         |        FROM t, unnest(range(1, len(l) - 3)) AS u(i)
         |        WHERE len(l) >= $PASSAGE_N),
         |f AS (SELECT p, COUNT(*) AS nd
         |      FROM (SELECT DISTINCT doc_id, p FROM pos) GROUP BY p),
         |sh AS (SELECT doc_id, pos FROM pos JOIN f USING (p) WHERE nd > 1),
         |runs AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS run
         |         FROM (SELECT doc_id, pos,
         |                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |               FROM sh)
         |         GROUP BY 1, 2),
         |r AS (SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_shared_pos,
         |        CAST(MAX(run) AS BIGINT) AS max_shared_run
         |      FROM runs GROUP BY 1),
         |c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM pos GROUP BY 1)
         |SELECT t.doc_id, COALESCE(c.n_grams, 0) AS n_grams,
         |       COALESCE(r.n_shared_pos, 0) AS n_shared_pos,
         |       COALESCE(r.max_shared_run, 0) AS max_shared_run
         |FROM t LEFT JOIN c USING (doc_id) LEFT JOIN r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q51_repetition" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |           WHERE len(string_split(text, ' ')) >= 3),
         |g AS (
         |  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens, 1 AS n, unnest(l) AS g FROM t
         |  UNION ALL
         |  SELECT doc_id, CAST(len(l) AS BIGINT), 2, l[i] || ' ' || l[i+1]
         |  FROM t, unnest(range(1, len(l))) AS u(i)
         |  UNION ALL
         |  SELECT doc_id, CAST(len(l) AS BIGINT), 3, l[i] || ' ' || l[i+1] || ' ' || l[i+2]
         |  FROM t, unnest(range(1, len(l) - 1)) AS u(i)),
         |c AS (SELECT doc_id, n_tokens, n, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3, 4),
         |a AS (SELECT doc_id, n_tokens,
         |        MAX(CASE WHEN n = 1 THEN c END) AS top1,
         |        MAX(CASE WHEN n = 2 THEN c END) AS top2,
         |        SUM(CASE WHEN n = 2 AND c > 1 THEN c ELSE 0 END) AS dup2,
         |        SUM(CASE WHEN n = 3 AND c > 1 THEN c ELSE 0 END) AS dup3
         |      FROM c GROUP BY 1, 2),
         |m AS (SELECT doc_id, n_tokens,
         |        CAST(FLOOR(CAST(top1 * 1000 AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT) AS top1_x1e3,
         |        CAST(FLOOR(CAST(top2 * 1000 AS DOUBLE) / (n_tokens - 1) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS top2_x1e3,
         |        CAST(FLOOR(CAST(dup2 * 1000 AS DOUBLE) / (n_tokens - 1) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dup2_x1e3,
         |        CAST(FLOOR(CAST(dup3 * 1000 AS DOUBLE) / (n_tokens - 2) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dup3_x1e3
         |      FROM a)
         |SELECT doc_id, n_tokens, top1_x1e3, top2_x1e3, dup2_x1e3, dup3_x1e3,
         |       CAST(CASE WHEN top2_x1e3 >= $TOP2_MAX_X1E3 OR dup3_x1e3 >= $DUP3_MAX_X1E3
         |            THEN 1 ELSE 0 END AS INT) AS flagged
         |FROM m ORDER BY doc_id""".stripMargin,

    "q52_dup_passages" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS p
         |       FROM t, unnest(range(1, len(l) - 3)) AS u(i)
         |       WHERE len(l) >= $PASSAGE_N),
         |f AS (SELECT p, COUNT(*) AS nd FROM sh GROUP BY p),
         |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages,
         |        CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |      FROM sh JOIN f USING (p) GROUP BY doc_id),
         |m AS (SELECT t.doc_id,
         |        COALESCE(d.n_passages, 0) AS n_passages,
         |        COALESCE(d.n_shared, 0) AS n_shared
         |      FROM t LEFT JOIN d ON t.doc_id = d.doc_id)
         |SELECT doc_id, n_passages, n_shared,
         |       CASE WHEN n_passages = 0 THEN 0
         |            ELSE CAST(FLOOR(CAST(n_shared * 1000 AS DOUBLE) / n_passages + CAST(0.5 AS DOUBLE)) AS BIGINT)
         |       END AS shared_x1e3,
         |       CAST(CASE WHEN (CASE WHEN n_passages = 0 THEN 0
         |                       ELSE CAST(FLOOR(CAST(n_shared * 1000 AS DOUBLE) / n_passages + CAST(0.5 AS DOUBLE)) AS BIGINT)
         |                       END) <= $SHARED_MAX_X1E3 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
  )
}
