package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed k-means over the embeddings table (q54) — the coarse-
  * quantizer trainer an IVF index (q24b) needs, and the embedding-space
  * analogue of the q49 clustering family.
  *
  * Lloyd's algorithm in its canonical distributed shape: centroids are tiny
  * driver/broadcast state (k x dim), each iteration is ONE pass over the
  * data — a broadcast cross-join (k rows against each vector) scored
  * map-side, an argmin aggregate whose partial aggregation collapses the k
  * candidate rows per vector BEFORE the exchange (so the shuffle carries
  * one vector-sized row per vector, once per iteration — no corpus
  * re-join), then a partial-aggregating (cid, dim) groupBy for the
  * centroid update, whose output (k x dim rows) collects to the driver for
  * the next round. Nothing in the loop is quadratic; at 100 TB the
  * identical plan runs with larger k and the update exchange still carries
  * k x dim x partitions rows.
  *
  * Determinism/portability: vectors are quantized once to x1e6 scaled
  * BIGINTs, so distances and centroid updates are EXACT integer arithmetic
  * — no float-sum order dependence anywhere — and the DuckDB oracle replays
  * the whole training (same init, 3 unrolled iterations, floor-division
  * centroid averages) in SQL, making an iterative ML trainer hash-checkable
  * cross-engine. Init is the k vectors with the smallest
  * (phash60(vec_id), vec_id) — the same portable-hash idiom as q42/q48.
  * Assignment tie-break: least (distance, cid).
  */
object Clustering {

  private val K = 8
  private val ITERS = 3
  private val QSCALE = 1000000L
  /** Fixture embedding width — used ONLY by the oracle SQL (a static string
    * must pin it). The trainer itself derives the width from the data, so
    * `trainQuantizer` works for any embeddings table (a hardcoded width
    * would overflow dims > 64 and silently zero-pad dims < 64).
    */
  private val DIM = 64

  /** x1e6-quantized vectors `(vec_id, qv: array<long>)` — the same
    * floor(x * scale + 0.5) contract as q46, so both engines agree bitwise.
    */
  private def quantized(embs: DataFrame): DataFrame =
    Similarity.asDouble(embs).select(col("vec_id"),
      transform(col("emb"), x =>
        floor(x * QSCALE + lit(0.5)).cast("long")).as("qv"))

  /** Exact squared L2 distance between the quantized vector column and a
    * literal centroid array — a codegen'd zip_with/aggregate fold.
    */
  private def sqDist(qv: Column, cv: Column): Column =
    aggregate(zip_with(qv, cv, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** One assignment pass: per vector, the centroid minimizing
    * (distance, cid). `cents` must be broadcastable (k rows). With
    * `carryVec` the quantized vector rides through the argmin aggregate
    * (every pre-aggregation row of a vec_id holds the same qv, so `first`
    * is deterministic) — that is what lets the update pass run WITHOUT
    * re-joining the corpus: map-side partial aggregation collapses the k
    * candidate rows before the exchange, so each iteration shuffles one
    * row per vector, once.
    */
  private def assign(q: DataFrame, cents: DataFrame,
                     carryVec: Boolean = false): DataFrame = {
    val scored = q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        sqDist(col("qv"), col("cv")).as("dist"))
    val aggs =
      if (carryVec) Seq(min(struct(col("dist"), col("cid"))).as("m"),
        first("qv").as("qv"))
      else Seq(min(struct(col("dist"), col("cid"))).as("m"))
    val base = scored.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
    val out = Seq(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist")) ++
      (if (carryVec) Seq(col("qv")) else Nil)
    base.select(out: _*)
  }

  /** Train k-means and return (final centroids as (cid -> components),
    * final assignment DataFrame (vec_id, cid, dist)). The per-iteration
    * centroid state is k x dim longs — collected and re-broadcast each
    * round, exactly how a cluster implementation carries it.
    */
  def kmeans(embs: DataFrame, k: Int = K, iters: Int = ITERS)
  : (Map[Int, Array[Long]], DataFrame) = {
    val spark = embs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val q = quantized(embs).persist()
    try {
      val init = q
        .select(col("vec_id"), col("qv"), Sketches.phash60(col("vec_id")).as("h"))
        .orderBy("h", "vec_id").limit(k)
        .collect()
      var cents: Map[Int, Array[Long]] = init.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](1).toArray
      }.toMap
      require(cents.nonEmpty, "kmeans: empty embeddings input")
      // the data defines the width; every vector must agree with the seeds
      // (ragged input would otherwise corrupt the update step silently)
      val dim = cents.head._2.length
      def centsDf = cents.toSeq.sortBy(_._1)
        .map { case (cid, cv) => (cid, cv.toSeq) }
        .toDF("cid", "cv")
      for (_ <- 1 to iters) {
        // update: one (cid, dim) aggregate over the vec-carrying assignment
        // (no corpus re-join — see assign); k x dim rows come back to the
        // driver, where the floor-divided average (Math.floorDiv: exact
        // integer semantics, the oracle's (s - pmod)/n twin) forms the next
        // broadcast state. An emptied cluster keeps its previous centroid.
        val sums = assign(q, centsDf, carryVec = true)
          .select(col("cid"), posexplode(col("qv")).as(Seq("p", "v")))
          .groupBy("cid", "p")
          .agg(sum("v").as("s"), count(lit(1)).as("n"))
          .collect()
        val updated = sums.groupBy(_.getInt(0)).map { case (cid, rows) =>
          val cv = new Array[Long](dim)
          rows.foreach { r =>
            require(r.getInt(1) < dim,
              s"kmeans: vector wider than the $dim-dim seeds (ragged input)")
            cv(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
          }
          cid -> cv
        }
        cents = cents ++ updated
      }
      // eager localCheckpoint: materialize the final assignment WHILE q is
      // still persisted and truncate its lineage, so consumers neither
      // re-quantize the corpus nor depend on the about-to-drop cache
      (cents, assign(q, centsDf).localCheckpoint(true))
    } finally q.unpersist()
  }

  /** Final centroids scaled back to doubles (component / 1e6) — the form a
    * coarse IVF quantizer (q24b) consumes.
    */
  def trainedCentroids(embs: DataFrame, k: Int = K, iters: Int = ITERS)
  : Map[Int, Array[Double]] =
    kmeans(embs, k, iters)._1.map { case (cid, cv) =>
      cid -> cv.map(_.toDouble / QSCALE)
    }

  /** q54 result: per-cluster exact-integer summaries — size, membership
    * checksum, within-cluster sum of squared distances, centroid component
    * sum. Emptied clusters have no members and thus no row.
    */
  def kmeansSummary(embs: DataFrame): DataFrame = {
    val (cents, assigned) = kmeans(embs)
    val spark = embs.sparkSession
    import spark.implicits._
    val centSums = cents.toSeq
      .map { case (cid, cv) => (cid, cv.sum) }
      .toDF("cid", "cent_sum")
    assigned.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        sum("vec_id").as("sum_vec_ids"),
        sum("dist").as("wcss"))
      .join(broadcast(centSums), "cid")
      .select("cid", "n_vecs", "sum_vec_ids", "wcss", "cent_sum")
      .orderBy("cid")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with [[kmeans]], then prune high-cosine
    * near-duplicates WITHIN clusters only. This is the published scale path
    * for embedding dedup — the quadratic pair space collapses to
    * sum(cluster_size^2), and at 100 TB k grows with the corpus so cluster
    * sizes stay bounded (the within-cluster self-join shuffles on cid; a
    * pathological mega-cluster is the k-too-small symptom, fixed by
    * retraining with larger k, not by a different plan).
    *
    * Keep rule (deterministic): a vector is dropped iff some same-cluster
    * vector with a STRICTLY GREATER (dist-to-centroid, vec_id) has cosine
    * >= threshold with it — i.e. per near-dup neighborhood the member
    * farthest from its centroid survives, the paper's low-centroid-
    * similarity keep heuristic with an exact total-order tie-break. Cosine
    * is the q40 contract: the codegen'd left-to-right fold, floor-scaled
    * x1e4, bit-identical to the DuckDB twin.
    *
    * Returns every vector: (vec_id, cid, dist, kept 0/1) — full-granularity
    * so the oracle checks the decision for each row, not just counts.
    */
  def semDedup(embs: DataFrame, thresholdX1e4: Int): DataFrame = {
    val (_, assigned) = kmeans(embs) // (vec_id, cid, dist) — materialized
    val j = assigned.join(Similarity.asDouble(embs), "vec_id")
      .select(col("vec_id"), col("cid"), col("dist"), col("emb"))
      .persist()
    val cos = graft.functions.GraftFunctions.cosine(col("l.emb"), col("r.emb"))
    // left_semi: each dropped row emitted once, no distinct needed
    val drops = j.as("l").join(j.as("r"),
      col("l.cid") === col("r.cid") &&
        struct(col("r.dist"), col("r.vec_id")) >
          struct(col("l.dist"), col("l.vec_id")) &&
        floor(cos * 10000 + lit(0.5)).cast("long") >= thresholdX1e4,
      "left_semi")
      .select(col("vec_id"), lit(0L).as("kept"))
    j.join(drops, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("dist"),
        coalesce(col("kept"), lit(1L)).as("kept"))
      .orderBy("vec_id")
  }

  /** Product-quantization codebook training (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
    * compression half of IVF-PQ, the standard way a 100 TB ANN index fits
    * in memory: split each vector into `m` subspaces, run [[kmeans]]
    * independently in each, store per-vector codes (m small ints) instead
    * of the vector (m*subdim floats) — 64x smaller here.
    *
    * Everything inherits kmeans' exact-integer determinism, so the whole
    * training + encoding hash-checks cross-engine. The m trainings are
    * sequential (each is the one-shuffle-per-iteration loop); per-vector
    * code assembly is an m-way equi-join of the materialized assignments
    * on vec_id. At scale one would fuse the m assignment passes into a
    * single scan; the per-subspace update aggregates stay separate either
    * way, so the shuffle volume is identical.
    *
    * Returns (codebooks keyed by (subspace, cid), codes DataFrame
    * (vec_id, code0..code{m-1}, qerr) with qerr = exact summed squared
    * quantization error across subspaces).
    */
  def pqTrain(embs: DataFrame, m: Int = PQ_M, k: Int = K, iters: Int = ITERS)
  : (Map[(Int, Int), Array[Long]], DataFrame) = {
    val dim = embs.select(size(col("embedding"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"pqTrain: dim $dim not divisible by $m")
    val sub = dim / m
    val parts = (0 until m).map { j =>
      val sliced = embs.select(col("vec_id"),
        slice(col("embedding"), j * sub + 1, sub).as("embedding"))
      val (cents, assigned) = kmeans(sliced, k, iters)
      (cents.map { case (cid, cv) => (j, cid) -> cv },
        assigned.select(col("vec_id"), col("cid").as(s"code$j"),
          col("dist").as(s"dist$j")))
    }
    val codebooks = parts.map(_._1).reduce(_ ++ _)
    val qerr = (0 until m).map(j => col(s"dist$j")).reduce(_ + _)
    val codes = parts.map(_._2).reduce(_.join(_, "vec_id"))
      .select(col("vec_id") +: (0 until m).map(j => col(s"code$j")) :+
        qerr.as("qerr"): _*)
      .orderBy("vec_id")
    (codebooks, codes)
  }

  private val PQ_M = 4

  /** Encode vectors against FROZEN codebooks — the incremental-ingest half
    * of PQ: new batches get codes without retraining (train once on a
    * sample, encode forever). One quantization pass, then per subspace a
    * broadcast argmin against that subspace's k centroids; assembly joins
    * the m assignments on vec_id. `PqSpec` pins pqEncode(corpus, trained)
    * == pqTrain's own codes.
    */
  def pqEncode(embs: DataFrame,
               codebooks: Map[(Int, Int), Array[Long]]): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val m = codebooks.keys.map(_._1).max + 1
    val q = quantized(embs).persist()
    try {
      val parts = (0 until m).map { j =>
        val sub = codebooks((j, 0)).length
        val centsDf = codebooks.collect { case ((`j`, cid), cv) => (cid, cv.toSeq) }
          .toSeq.sortBy(_._1).toDF("cid", "cv")
        assign(q.select(col("vec_id"),
          slice(col("qv"), j * sub + 1, sub).as("qv")), centsDf)
          .select(col("vec_id"), col("cid").as(s"code$j"),
            col("dist").as(s"dist$j"))
      }
      val qerr = (0 until m).map(j => col(s"dist$j")).reduce(_ + _)
      parts.reduce(_.join(_, "vec_id"))
        .select(col("vec_id") +: (0 until m).map(j => col(s"code$j")) :+
          qerr.as("qerr"): _*)
        .orderBy("vec_id")
        .localCheckpoint(true)
    } finally q.unpersist()
  }

  /** PQ ADC search (the query half of IVF-PQ): squared-L2 top-k against the
    * [[pqTrain]] codes by asymmetric distance computation — per subspace,
    * the distance from the query slice to each of the k centroids is
    * precomputed driver-side (k x m exact longs), and each corpus vector's
    * approximate distance is the sum of m table lookups indexed by its
    * codes. The scan touches ONLY the codes relation (m small ints per
    * vector — no vectors move), which is exactly why PQ indexes scale: at
    * 100 TB the same plan reads a 64x-compressed table with the 32-entry
    * literal table folded into codegen.
    *
    * Exact integer arithmetic end-to-end (quantized query slice vs
    * quantized centroids), so the ADC distances — not just the ranking —
    * hash-check cross-engine.
    */
  def pqSearch(embs: DataFrame, queryVecId: Long = 0L, topK: Int = 10,
               m: Int = PQ_M, k: Int = K, iters: Int = ITERS): DataFrame = {
    val (codebooks, codes) = pqTrain(embs, m, k, iters)
    val qvec = quantized(embs.filter(col("vec_id") === queryVecId))
      .collect().headOption
      .map(_.getSeq[Long](1).toArray)
      .getOrElse(throw new IllegalArgumentException(
        s"pqSearch: query vec_id $queryVecId not found"))
    val sub = qvec.length / m
    val adc = (0 until m).map { j =>
      val qs = qvec.slice(j * sub, (j + 1) * sub)
      val table = (0 until k).map { c =>
        val cv = codebooks((j, c))
        lit(qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      element_at(array(table: _*), col(s"code$j") + 1)
    }.reduce(_ + _)
    codes.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), adc.cast("long").as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topK)
  }

  /** IVF-PQ search — the full composed index: the trained coarse quantizer
    * partitions the corpus into cells (inverted lists), the query probes
    * its `probes` nearest cells, and ADC over the PQ codes ranks ONLY the
    * vectors in probed cells. At 100 TB this is the shape that makes ANN
    * tractable: the scan is (corpus/k x probes) rows of m-int codes —
    * both a cell-pruned and a 64x-compressed read. Candidate ranking is
    * identical to [[pqSearch]] restricted to the probed cells (spec-pinned),
    * so recall loss comes only from cell pruning, tunable via `probes`.
    */
  def ivfPqSearch(embs: DataFrame, queryVecId: Long = 0L, topK: Int = 10,
                  probes: Int = 2, m: Int = PQ_M): DataFrame = {
    val (coarse, assigned) = kmeans(embs)
    val (codebooks, codes) = pqTrain(embs, m)
    val qvec = quantized(embs.filter(col("vec_id") === queryVecId))
      .collect().headOption
      .map(_.getSeq[Long](1).toArray)
      .getOrElse(throw new IllegalArgumentException(
        s"ivfPqSearch: query vec_id $queryVecId not found"))
    val probed = coarse.toSeq.map { case (cid, cv) =>
      (qvec.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
    }.sorted.take(probes).map(_._2)
    val sub = qvec.length / m
    val adc = (0 until m).map { j =>
      val qs = qvec.slice(j * sub, (j + 1) * sub)
      val table = (0 until K).map { c =>
        val cv = codebooks((j, c))
        lit(qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      element_at(array(table: _*), col(s"code$j") + 1)
    }.reduce(_ + _)
    codes
      .join(assigned.filter(col("cid").isin(probed: _*)).select("vec_id"), "vec_id")
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), adc.cast("long").as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topK)
  }

  /** Persist trained PQ codebooks as parquet (subspace, cid, cv) — the
    * train-once/encode-forever artifact an offline index build ships to
    * the encode and search jobs.
    */
  def saveCodebooks(path: String,
                    codebooks: Map[(Int, Int), Array[Long]],
                    spark: SparkSession): Unit = {
    import spark.implicits._
    codebooks.toSeq
      .map { case ((j, cid), cv) => (j, cid, cv.toSeq) }
      .sortBy { case (j, cid, _) => (j, cid) }
      .toDF("subspace", "cid", "cv")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveCodebooks]]. */
  def loadCodebooks(path: String, spark: SparkSession)
  : Map[(Int, Int), Array[Long]] =
    spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toArray)
      .toMap

  /** Streaming PQ encode: each embedding micro-batch is encoded against
    * the frozen codebook artifact and written batch-keyed (per-batchId
    * overwrite — replays rewrite the same directory, the effective-
    * exactly-once contract of `Curation.streamingNearDupIngest`).
    * Encoding is row-independent, so the union of batch outputs equals
    * [[pqEncode]] of the union (spec-pinned) — this is how the other
    * 99.99% of a growing corpus gets compressed without retraining.
    */
  def streamingPqEncode(embs: DataFrame, codebookPath: String,
                        codesDir: String, checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val codebooks = loadCodebooks(codebookPath, embs.sparkSession)
    embs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        pqEncode(batch, codebooks)
          .write.mode("overwrite").parquet(s"$codesDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** q66 threshold — same x1e4 cosine scale as q40/q61. */
  private val SEMDEDUP_T = 4500

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_kmeans" -> ((s, d) => kmeansSummary(Tables.embeddings(s, d))),
    "q66_semdedup" -> ((s, d) => semDedup(Tables.embeddings(s, d), SEMDEDUP_T)),
    "q69_pq_train" -> ((s, d) => pqTrain(Tables.embeddings(s, d))._2),
    "q70_pq_search" -> ((s, d) => pqSearch(Tables.embeddings(s, d)))
  )

  /** The oracle unrolls the SAME training in SQL: quantization, hash-order
    * init, `ITERS` assignment/update rounds (floor-division averages via the
    * portable (s - nonneg-mod) / n formula), final assignment, summaries.
    * [[kmeansCtesSql]] is the shared CTE prefix (through `fin` =
    * (vec_id, cid, dist)) so q66's oracle replays the identical training.
    */
  private def kmeansCtesSql: String =
    kmeansCtesSqlFor("", "embedding::DOUBLE[]", DIM)

  /** The kmeans CTE chain with every CTE name prefixed by `pfx` and the
    * source vector expression parameterized — `fin` becomes `${pfx}fin` =
    * (vec_id, cid, dist). q54 uses the unprefixed whole-vector form; q69
    * instantiates one prefixed chain per PQ subspace slice.
    */
  private[operators] def kmeansCtesSqlFor(pfx: String, vecSql: String,
                                          dim: Int): String = {
    val iterCtes = (1 to ITERS).map { i =>
      val prev = if (i == 1) s"${pfx}c0" else s"${pfx}c${i - 1}"
      // assignment against prev centroids, then per-(cid, dim) sums over
      // 1-based positions, floor-div average, keep-previous for empty cids
      s"""${pfx}a$i AS (SELECT vec_id, qv, cid, dist FROM (
         |  SELECT e.vec_id, e.qv, c.cid,
         |         CAST(list_aggregate(list_transform(e.qv, (x, i) -> (x - c.cv[i]) * (x - c.cv[i])), 'sum') AS BIGINT) AS dist,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |           CAST(list_aggregate(list_transform(e.qv, (x, i) -> (x - c.cv[i]) * (x - c.cv[i])), 'sum') AS BIGINT), c.cid) AS rn
         |  FROM ${pfx}e e CROSS JOIN $prev c) WHERE rn = 1),
         |${pfx}u$i AS (SELECT cid, p, CAST(SUM(qv[p]) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
         |        FROM ${pfx}a$i, unnest(range(1, ${dim + 1})) AS up(p) GROUP BY cid, p),
         |${pfx}n$i AS (SELECT cid, list((s - ((s % n) + n) % n) // n ORDER BY p) AS cv FROM ${pfx}u$i GROUP BY cid),
         |${pfx}c$i AS (SELECT p.cid, COALESCE(c.cv, p.cv) AS cv FROM $prev p LEFT JOIN ${pfx}n$i c USING (cid))"""
        .stripMargin
    }.mkString(",\n")
    s"""${pfx}e AS (SELECT vec_id,
       |        list_transform($vecSql, x ->
       |          CAST(FLOOR(x * $QSCALE + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS qv
       |      FROM embeddings),
       |${pfx}c0 AS (SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS cid, qv AS cv
       |       FROM (SELECT vec_id, qv, ${Sketches.phash60Sql("vec_id")} AS h FROM ${pfx}e)
       |       ORDER BY h, vec_id LIMIT $K),
       |$iterCtes,
       |${pfx}fin AS (SELECT vec_id, cid, dist FROM (
       |  SELECT e.vec_id, c.cid,
       |         CAST(list_aggregate(list_transform(e.qv, (x, i) -> (x - c.cv[i]) * (x - c.cv[i])), 'sum') AS BIGINT) AS dist,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           CAST(list_aggregate(list_transform(e.qv, (x, i) -> (x - c.cv[i]) * (x - c.cv[i])), 'sum') AS BIGINT), c.cid) AS rn
       |  FROM ${pfx}e e CROSS JOIN ${pfx}c$ITERS c) WHERE rn = 1)""".stripMargin
  }

  private def kmeansOracleSql: String =
    s"""WITH $kmeansCtesSql
       |SELECT f.cid, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |       CAST(SUM(f.vec_id) AS BIGINT) AS sum_vec_ids,
       |       CAST(SUM(f.dist) AS BIGINT) AS wcss,
       |       CAST(MIN(cs.cent_sum) AS BIGINT) AS cent_sum
       |FROM fin f JOIN (SELECT cid, CAST(list_aggregate(cv, 'sum') AS BIGINT) AS cent_sum FROM c$ITERS) cs
       |  ON f.cid = cs.cid
       |GROUP BY f.cid
       |ORDER BY f.cid""".stripMargin

  /** q66 twin: the shared kmeans CTEs, then the same within-cluster
    * drop-if-a-greater-(dist, vec_id)-near-dup-exists decision with q40's
    * exact cosine formula.
    */
  private def semDedupOracleSql: String =
    s"""WITH $kmeansCtesSql,
       |ed AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |j AS (SELECT f.vec_id, f.cid, f.dist, ed.emb
       |      FROM fin f JOIN ed ON f.vec_id = ed.vec_id),
       |drops AS (SELECT DISTINCT l.vec_id FROM j l JOIN j r
       |  ON l.cid = r.cid
       | AND (r.dist > l.dist OR (r.dist = l.dist AND r.vec_id > l.vec_id))
       | AND CAST(FLOOR(list_dot_product(l.emb, r.emb) /
       |       (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb)))
       |       * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) >= $SEMDEDUP_T)
       |SELECT j.vec_id, j.cid, j.dist,
       |       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM j LEFT JOIN drops d ON j.vec_id = d.vec_id
       |ORDER BY j.vec_id""".stripMargin

  /** q69 twin: one prefixed kmeans CTE chain per subspace slice, joined on
    * vec_id. The slice expression is DuckDB's 1-based inclusive list slice
    * of the same DOUBLE[] cast the whole-vector chain quantizes.
    */
  private def pqOracleSql: String = {
    val sub = DIM / PQ_M
    val chains = (0 until PQ_M).map { j =>
      kmeansCtesSqlFor(s"s$j", s"(embedding::DOUBLE[])[${j * sub + 1}:${(j + 1) * sub}]", sub)
    }.mkString(",\n")
    val codes = (0 until PQ_M).map(j => s"s${j}fin.cid AS code$j").mkString(", ")
    val qerr = (0 until PQ_M).map(j => s"s${j}fin.dist").mkString(" + ")
    val joins = (1 until PQ_M).map(j => s"JOIN s${j}fin USING (vec_id)").mkString(" ")
    s"""WITH $chains
       |SELECT vec_id, $codes, CAST($qerr AS BIGINT) AS qerr
       |FROM s0fin $joins
       |ORDER BY vec_id""".stripMargin
  }

  /** q70 twin: the q69 chains, plus per-subspace ADC tables computed from
    * the final centroids against the quantized query slice, summed via
    * equi-joins on the code.
    */
  private def pqSearchOracleSql: String = {
    val sub = DIM / PQ_M
    val chains = (0 until PQ_M).map { j =>
      kmeansCtesSqlFor(s"s$j", s"(embedding::DOUBLE[])[${j * sub + 1}:${(j + 1) * sub}]", sub)
    }.mkString(",\n")
    val tables = (0 until PQ_M).map { j =>
      s"""t$j AS (SELECT c.cid,
         |  CAST(list_aggregate(list_transform(c.cv, (x, i) -> (x - q.qv[i]) * (x - q.qv[i])), 'sum') AS BIGINT) AS d
         |  FROM s${j}c$ITERS c, (SELECT qv FROM s${j}e WHERE vec_id = 0) q)"""
        .stripMargin
    }.mkString(",\n")
    val joins = ((1 until PQ_M).map(j => s"JOIN s${j}fin f$j USING (vec_id)") ++
      (0 until PQ_M).map(j => s"JOIN t$j ON t$j.cid = f$j.cid")).mkString(" ")
    val dsum = (0 until PQ_M).map(j => s"t$j.d").mkString(" + ")
    s"""WITH $chains,
       |$tables
       |SELECT vec_id, CAST($dsum AS BIGINT) AS adc_dist
       |FROM s0fin f0 $joins
       |WHERE vec_id <> 0
       |ORDER BY adc_dist, vec_id
       |LIMIT 10""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q54_kmeans" -> kmeansOracleSql,
    "q66_semdedup" -> semDedupOracleSql,
    "q69_pq_train" -> pqOracleSql,
    "q70_pq_search" -> pqSearchOracleSql
  )
}
