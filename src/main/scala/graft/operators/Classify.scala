package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** q79: hashed-feature Naive Bayes classifier — the learned-classifier
  * class a curation pipeline runs at corpus scale (fastText-style quality
  * and domain classifiers in FineWeb/DCLM lineage; here the label is
  * `lang`, trained on the deterministic q42 stratified sample and
  * evaluated as a confusion matrix over the held-out corpus).
  *
  * Model: unigram tokens hash into `NB_B` fixed buckets (the q76 DSIR
  * idiom — nothing vocabulary-sized anywhere); per (lang, bucket) Laplace
  * log-likelihood ln((c_lb + 1) / (n_l + B)) plus a document-count prior
  * ln((d_l + 1) / (d_total + L)). Every log-prob is quantized to an x1e6
  * BIGINT at the MODEL level, so per-document scores are exact integer
  * sums, argmax is exact with a deterministic (score DESC, lang ASC)
  * tiebreak, and the whole confusion matrix hash-checks against DuckDB.
  *
  * Scale shape: training is two hash aggregates over the (tiny) labeled
  * sample; the model is DENSE — an L x B grid left-joined with observed
  * counts, so unseen (lang, bucket) pairs carry the smoothing mass and the
  * scoring join never loses a feature — and L x B rows broadcast (5 x 1024
  * here; a thousand-label classifier at B=64k is still ~1 GB-scale, the
  * documented ceiling before switching the scoring join to shuffle).
  * Scoring is one corpus pass: per-doc bucket counts, broadcast-join the
  * model (L rows per feature), one partially-aggregated (doc, lang)
  * groupBy, an L-row-per-doc window argmax. No shuffle carries more than
  * (doc_id, lang) pairs.
  */
object Classify {

  private[graft] val NB_B = 1024
  private[graft] val NB_PER_LANG = 20

  /** Train on `labeled` (doc_id, lang) against `docs` text; returns the
    * dense (lang, b, lp_x1e6) likelihood relation and the (lang, pr_x1e6)
    * prior — both bounded by L x B, both broadcastable.
    */
  def nbTrain(docs: DataFrame, labeled: DataFrame): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    val tc = docs.select(col("doc_id"), col("text"))
      .join(broadcast(labeled), "doc_id")
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .select(col("lang"), (Sketches.phash60(col("t")) % NB_B).as("b"))
      .groupBy("lang", "b").agg(count(lit(1)).as("c"))
    val nl = tc.groupBy("lang").agg(sum("c").as("n_l"))
    val grid = labeled.select("lang").distinct()
      .crossJoin(spark.range(NB_B).select(col("id").as("b")))
    // tc is <= L x B rows and nl is L rows: broadcast both so the model
    // build never shuffles (pre-AQE Catalyst can't see the grid is tiny)
    val model = grid.join(broadcast(tc), Seq("lang", "b"), "left")
      .join(broadcast(nl), "lang")
      .select(col("lang"), col("b"),
        floor((log((coalesce(col("c"), lit(0L)) + lit(1)).cast("double")) -
          log((col("n_l") + lit(NB_B)).cast("double"))) * 1000000 + lit(0.5))
          .cast("long").as("lp_x1e6"))
    val dl = labeled.groupBy("lang").agg(count(lit(1)).as("d_l"))
    val tot = dl.agg(sum("d_l").as("d_tot"), count(lit(1)).as("n_langs"))
    val prior = dl.crossJoin(broadcast(tot))
      .select(col("lang"),
        floor((log((col("d_l") + lit(1)).cast("double")) -
          log((col("d_tot") + col("n_langs")).cast("double"))) * 1000000 +
          lit(0.5)).cast("long").as("pr_x1e6"))
    (model, prior)
  }

  /** Score EVERY document in `docs` (doc_id, text) against a trained
    * (model, prior): returns (doc_id, pred_lang). The scoring pass of the
    * operator — one corpus scan, broadcast model, exact-integer argmax.
    */
  def nbScore(docs: DataFrame, model: DataFrame,
              prior: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fd = docs.select(col("doc_id"), col("text"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), (Sketches.phash60(col("t")) % NB_B).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val scored = fd.join(broadcast(model), "b")
      .groupBy("doc_id", "lang")
      .agg(sum(col("c") * col("lp_x1e6")).as("s"))
      .join(broadcast(prior), "lang")
      .select(col("doc_id"), col("lang"),
        (col("s") + col("pr_x1e6")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lang"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"))
  }

  /** Predict a label for every document in `docs` NOT in `labeled` using
    * a trained (model, prior): returns (doc_id, pred_lang).
    */
  def nbPredict(docs: DataFrame, labeled: DataFrame,
                model: DataFrame, prior: DataFrame): DataFrame =
    nbScore(docs.select(col("doc_id"), col("text"))
      .join(broadcast(labeled.select("doc_id")), Seq("doc_id"), "left_anti"),
      model, prior)

  /** Persist a trained model as a parquet artifact (the saveCodebooks
    * pattern): likelihoods and priors as two relations under `path`.
    */
  def saveModel(path: String, model: DataFrame, prior: DataFrame): Unit = {
    model.write.mode("overwrite").parquet(s"$path/likelihoods")
    prior.write.mode("overwrite").parquet(s"$path/priors")
  }

  /** Inverse of [[saveModel]]. */
  def loadModel(path: String, spark: SparkSession)
  : (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/likelihoods"),
      spark.read.parquet(s"$path/priors"))

  /** Streaming classification against the FROZEN model artifact — the
    * train-offline / score-online router (language/domain routing at
    * ingest time). Per micro-batch: [[nbScore]] with the loaded model
    * (loaded ONCE, broadcast per batch), written to a batch-keyed dir —
    * the overwrite-by-batch idiom that makes replays effectively
    * exactly-once (same contract as streamingPqEncode /
    * streamingPerceptualIngest). State: none — scoring is stateless given
    * the artifact, so there is no watermark and no state store; the
    * checkpoint only tracks source offsets.
    */
  def streamingClassify(docs: DataFrame, modelPath: String,
                        outDir: String, checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val (model, prior) = loadModel(modelPath, docs.sparkSession)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nbScore(batch, model, prior)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** The q79 catalog entry: train on the q42 stratified sample, predict
    * the held-out corpus, report the (true, predicted) confusion matrix.
    */
  def nbLangidConfusion(docs: DataFrame,
                        perLang: Int = NB_PER_LANG): DataFrame = {
    val labeled = TextAnalysis.stratifiedSample(docs, perLang)
      .select("doc_id", "lang")
    val (model, prior) = nbTrain(docs, labeled)
    nbPredict(docs, labeled, model, prior)
      .join(docs.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("true_lang", "pred_lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_nb_langid" -> ((s, d) => nbLangidConfusion(Tables.documents(s, d)))
  )

  /** q79 twin — the same dense-grid model, term for term. */
  private def nbOracleSql: String =
    s"""WITH ranked AS (SELECT doc_id, lang, row_number() OVER
       |    (PARTITION BY lang ORDER BY ${Sketches.phash60Sql("doc_id")}, doc_id) AS rnk
       |  FROM documents),
       |tr AS (SELECT doc_id, lang FROM ranked WHERE rnk <= $NB_PER_LANG),
       |tb AS (SELECT doc_id, ${Sketches.phash60Sql("t")} % $NB_B AS b
       |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |             FROM documents)),
       |tc AS (SELECT tr.lang, b, CAST(COUNT(*) AS BIGINT) AS c
       |       FROM tb JOIN tr USING (doc_id) GROUP BY 1, 2),
       |nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM tc GROUP BY 1),
       |grid AS (SELECT lang, i AS b
       |         FROM (SELECT DISTINCT lang FROM tr), range(0, $NB_B) AS t(i)),
       |model AS (SELECT g.lang, g.b,
       |            CAST(FLOOR((ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE))
       |              - ln(CAST(n_l + $NB_B AS DOUBLE))) * 1000000
       |              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lp
       |          FROM grid g
       |          LEFT JOIN tc ON g.lang = tc.lang AND g.b = tc.b
       |          JOIN nl ON g.lang = nl.lang),
       |dl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l FROM tr GROUP BY 1),
       |tot AS (SELECT CAST(SUM(d_l) AS BIGINT) AS d_tot,
       |               CAST(COUNT(*) AS BIGINT) AS n_langs FROM dl),
       |prior AS (SELECT lang,
       |            CAST(FLOOR((ln(CAST(d_l + 1 AS DOUBLE))
       |              - ln(CAST(d_tot + n_langs AS DOUBLE))) * 1000000
       |              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS pr
       |          FROM dl, tot),
       |fd AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM tb
       |       WHERE doc_id NOT IN (SELECT doc_id FROM tr) GROUP BY 1, 2),
       |sc AS (SELECT doc_id, m.lang,
       |         CAST(pr + SUM(c * lp) AS BIGINT) AS score
       |       FROM fd JOIN model m USING (b) JOIN prior USING (lang)
       |       GROUP BY doc_id, m.lang, pr),
       |pred AS (SELECT doc_id, lang AS pred_lang FROM
       |           (SELECT doc_id, lang, row_number() OVER
       |              (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
       |            FROM sc)
       |         WHERE rn = 1)
       |SELECT d.lang AS true_lang, p.pred_lang,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM pred p JOIN documents d USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q79_nb_langid" -> nbOracleSql
  )
}
