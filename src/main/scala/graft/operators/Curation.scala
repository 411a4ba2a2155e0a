package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The composed training-data curation pipeline: quality scoring ->
  * quality gate -> exact near-dup removal -> curated corpus. This is the
  * shape a 100 TB text pipeline actually runs, expressed as ONE Spark plan:
  *
  *   1. per-row quality features (pure codegen'd expressions, no shuffle);
  *   2. the quality gate FIRST — it is cheap and shrinks the corpus before
  *      the expensive pair join (predicate order is the scale lever here);
  *   3. near-dup pairs at Jaccard >= 0.8 over survivors, via MinHash-LSH
  *      candidate pruning + exact verification on candidates only
  *      (Dedup.jaccardPairsLshVerified) — no shingle self-join over the
  *      full corpus anywhere in the composed plan;
  *   4. keep the lowest doc_id of each dup pair, anti-join out the rest.
  *
  * Deterministic end to end, so the whole composition is oracle-checked
  * (q32) — not just its stages.
  */
object Curation {

  private val QUALITY_MIN = 700L
  private val JACCARD_MIN = 800

  /** Quality-scored corpus: doc_id, lang, n_tokens, quality_x1e3, text.
    * The score expressions are TextAnalysis's — one definition, one oracle
    * twin, shared with q26.
    */
  def scored(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      TextAnalysis.nTokensCol.as("n_tokens"),
      TextAnalysis.qualityCol.as("quality_x1e3"), col("text"))

  /** The full curation plan over any (doc_id, lang, text) relation.
    * Facade-reachable (Graft.curatedCorpus), so `cache=false`: no blocks
    * stay pinned for the JVM lifetime; callers wanting the intra-plan reuse
    * persist the input themselves.
    */
  def curate(docs: DataFrame): DataFrame = {
    val qualified = scored(docs).filter(col("quality_x1e3") >= QUALITY_MIN)
    val losers = Dedup
      .jaccardPairsLshVerified(qualified.select(col("doc_id"), col("text")),
        JACCARD_MIN, cache = false)
      .select(col("d2").as("doc_id")).distinct()
    qualified
      .join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_tokens", "quality_x1e3")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_curation" -> ((s, d) => curate(Tables.documents(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q32_curation" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         ${TextAnalysis.QUALITY_SQL} AS quality_x1e3,
        |         text
        |  FROM documents),
        |qualified AS (SELECT * FROM scored WHERE quality_x1e3 >= 700),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM qualified),
        |sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
        |       FROM toks, unnest(range(1, len(l) - 1)) AS t(i)
        |       WHERE len(l) >= 3),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS nboth
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |losers AS (SELECT DISTINCT d2 FROM inter
        |           JOIN cnt c1 ON c1.doc_id = d1
        |           JOIN cnt c2 ON c2.doc_id = d2
        |           WHERE CAST(FLOOR(nboth * 1000.0 / (c1.n + c2.n - nboth) + 0.5) AS BIGINT) >= 800)
        |SELECT doc_id, lang, n_tokens, quality_x1e3
        |FROM qualified
        |WHERE doc_id NOT IN (SELECT d2 FROM losers)
        |ORDER BY doc_id""".stripMargin
  )
}
