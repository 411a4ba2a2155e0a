package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Similarity search over `embeddings.embedding: array<float>` (SURVEY.md
  * s2.5 E-10 and the training-data-pipeline extensions).
  *
  *  - q20: brute-force cosine top-k for a single query vector — the exact
  *    baseline. The query side is a broadcast (one row), so the corpus scan
  *    is a single shuffle-free stage.
  *  - q20b: batched top-k for a query SET via one corpus pass + a window —
  *    the shape you actually run at scale (broadcast the query block,
  *    never the corpus).
  *  - q24: random-hyperplane LSH bucketing — the approximate scale path.
  *    Bucket assignment is a per-row codegen'd expression; the join is an
  *    equi-join on the bucket id, so candidate generation shuffles
  *    doc->bucket rows instead of forming a cross product.
  *
  * All dot products fold left-to-right over doubles (elements cast from
  * float32 exactly), so both engines produce bit-identical doubles; final
  * scores are emitted as floor-scaled BIGINTs (see Relational's determinism
  * note).
  */
object Similarity {

  /** Sequential fold dot product in doubles: aggregate(zip_with(a,b,*)). */
  private[operators] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private[operators] def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private[graft] def asDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))

  /** Deterministic +-1 hyperplanes from a fixed LCG (no runtime randomness —
    * the planes are part of the operator definition, as they must be for a
    * reproducible index).
    */
  private[operators] def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var st = 0x9E3779B97F4A7C15L
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
    Array.fill(nPlanes)(Array.fill(dim)(if (next() > 0) 1.0 else -1.0))
  }

  /** Sign-bit bucket id under `nPlanes` fixed hyperplanes. */
  private[operators] def bucketExpr(emb: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    (0 until nPlanes).map { p =>
      val plane = array(ps(p).map(lit).toIndexedSeq: _*)
      when(dot(emb, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  private val DIM = 64
  private val N_PLANES = 8

  /** The q24 bucket expression as DuckDB SQL: the SAME fixed +-1 planes,
    * emitted as list literals, so the approximate index — not just its
    * verified output — reproduces exactly in the oracle.
    */
  private def bucketSqlExpr(embCol: String): String = {
    val ps = planes(N_PLANES, DIM)
    (0 until N_PLANES).map { p =>
      val plane = ps(p).map(x => if (x > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($embCol, $plane) > 0 THEN 1::BIGINT << $p ELSE 0::BIGINT END)"
    }.mkString(" +\n           ")
  }

  private val COS_SQL =
    "list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)))"

  /** Nearest-`p`-cells assignment of `v` against a broadcast centroid
    * relation — the shared IVF primitive ([[ivfSearch]] assignment +
    * probing, q118 delta maintenance). One broadcast pass, ties broken
    * (sim DESC, cent_id) so the argmax is a total order.
    */
  private def bestCells(v: DataFrame, cents: DataFrame, p: Int,
                        outCol: String): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cent_id"))
    v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("cent_id"),
        cosine(col("emb"), col("cent")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= p)
      .select(col("vec_id"), col("emb"), col("cent_id").as(outCol))
  }

  /** The (vec_id, cell) nearest-cell assignment relation — spec hook for
    * pinning assignment invariants (scale invariance, conservation).
    */
  private[operators] def nearestCells(v: DataFrame,
                                      cents: DataFrame): DataFrame =
    bestCells(v, cents, 1, "cell").select(col("vec_id"), col("cell"))

  /** Content-keyed, build-once IVF INVERTED LISTS over `sfDir`'s
    * embeddings table under the demo coarse quantizer (first `nCents`
    * corpus vectors): the `(vec_id, emb, cell)` nearest-cell assignment
    * relation, PARTITIONED BY cell on disk. This is what a production
    * IVF index persists between builds — the full-corpus argmax pass is
    * paid ONCE per corpus snapshot, and every search reads only the
    * `cell=K` leaf directories its queries probe (partition filters at
    * the scan), never re-assigning the base corpus per call. q118's
    * delta maintenance appends to exactly this relation in production;
    * its occupancy report reads the base side off this artifact. The key
    * chains the embeddings fingerprint ([[DedupArtifacts.embeddingsKey]]
    * — count, id checksum, vector hash), so a regenerated fixture or a
    * different quantizer config can only MISS, never serve stale lists.
    */
  private[graft] def ensureIvfAssignments(spark: SparkSession, sfDir: String,
                                          nCents: Int = 16): String =
    DedupArtifacts.cachedDir(s"$sfDir|ivfassign|k=$nCents") {
      val embs = Tables.embeddings(spark, sfDir)
      DedupArtifacts.ensureDerivedPartitioned(spark,
        DedupArtifacts.embeddingsKey(embs, "ivfassign") + s"|k=$nCents|v=1",
        "cell") {
        val e = asDouble(embs)
        val cents = e.filter(col("vec_id") < nCents)
          .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
        bestCells(e, cents, 1, "cell")
      }
    }

  /** Content-keyed, build-once LSH BUCKET relation `(vec_id, emb, bucket)`
    * over `sfDir`'s embeddings — the q24/q24c/q100 corpus side,
    * PARTITIONED BY bucket (256 sign-buckets under the 8 fixed planes).
    * Same posture as [[ensureIvfAssignments]]: bucketing the corpus is
    * index-build work, paid once; a search reads only its probed
    * `bucket=K` partitions.
    */
  private[graft] def ensureLshBuckets(spark: SparkSession,
                                      sfDir: String): String =
    DedupArtifacts.cachedDir(s"$sfDir|lshbkt|p=$N_PLANES") {
      val embs = Tables.embeddings(spark, sfDir)
      DedupArtifacts.ensureDerivedPartitioned(spark,
        DedupArtifacts.embeddingsKey(embs, "lshbkt") + s"|p=$N_PLANES|v=1",
        "bucket")(
        asDouble(embs).withColumn("bucket", bucketExpr(col("emb"), N_PLANES, DIM)))
    }

  /** Read a cell/bucket-partitioned artifact pruned to the probed
    * partition ids — by ENUMERATING the probed leaf directories (the
    * bucketed-incremental-index idiom, `Curation.prunedBatchPaths`):
    * listing cost scales with the probe set, not the partition count
    * (a 256-bucket tree walk per query is pure overhead the probe list
    * already answers). A probed id with no corpus rows has no directory
    * and is skipped; the isin filter stays on as a partition filter over
    * the already-pruned tree (the AnnIndexSpec plan pin). Partition-value
    * inference types small ids as INT; the literals match that type, and
    * the column re-casts to the LONG the live bucketing produces only
    * AFTER the filter.
    */
  private def readPartitionedPruned(spark: SparkSession, dir: String,
                                    partCol: String,
                                    probed: Seq[Long]): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val paths = probed.distinct.sorted.map(b => s"$dir/$partCol=$b")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val raw =
      if (paths.isEmpty) spark.read.parquet(dir) // degenerate: empty probe set
      else spark.read.option("basePath", dir).parquet(paths: _*)
    raw.filter(col(partCol).isin(probed.map(_.toInt): _*))
      .select(col("vec_id"), col("emb"), col(partCol).cast("long").as(partCol))
  }

  private def lshCorpus(spark: SparkSession, sfDir: String,
                        probed: Seq[Long]): DataFrame =
    readPartitionedPruned(spark, ensureLshBuckets(spark, sfDir),
      "bucket", probed)

  /** IVF search against an arbitrary coarse-centroid relation
    * `(cent_id, cent: array<double>)`: every vector is assigned to its
    * nearest centroid in one broadcast pass, queries (vec_id < nQueries)
    * probe their `probes` nearest cells, candidate generation is an
    * equi-join on the cell id, exact cosine ranks the candidates. The q24b
    * catalog entry runs this with the deterministic first-16 demo
    * quantizer; production feeds [[Clustering.trainedCentroids]] — the
    * search is centroid-source-agnostic, which is the point of IVF.
    */
  def ivfSearch(e: DataFrame, cents: DataFrame,
                nQueries: Int = 5, probes: Int = 2, topK: Int = 3): DataFrame = {
    val assigned = bestCells(e, cents, 1, "cell")
    val queries = bestCells(e.filter(col("vec_id") < nQueries), cents, probes, "cell")
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("cell"))
    ivfProbe(assigned, queries, topK)
  }

  /** The IVF PROBE tail — candidate equi-join on the cell id, exact
    * cosine ranking — shared by [[ivfSearch]] (live assignment) and
    * [[ivfSearchIndexed]] (assignment read off the persisted inverted
    * lists), so the two can never drift.
    */
  private def ivfProbe(assigned: DataFrame, queries: DataFrame,
                       topK: Int): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_x1e4").desc, col("vec_id"))
    assigned.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        floor(cosine(col("emb"), col("qe")) * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
      .distinct() // a candidate can appear via several probed cells
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= topK)
      .orderBy("q_id", "rnk")
  }

  /** [[ivfSearch]] against the PERSISTED inverted lists
    * ([[ensureIvfAssignments]]) — the q24b/q24c production lifecycle
    * completed: build once, search reads only probed cells, q118
    * maintains. Only the (tiny) query set is assigned live; its probed
    * cell ids (nQueries × probes values — bounded driver state, the
    * probe list a real ANN service also materializes) become partition
    * filters on the inverted-list scan, so NO full-corpus assignment
    * pass runs inside the search. Output is bit-identical to
    * [[ivfSearch]] (AnnIndexSpec pins artifact assignment == live
    * assignment; doubles round-trip parquet exactly).
    */
  def ivfSearchIndexed(spark: SparkSession, sfDir: String, nCents: Int = 16,
                       nQueries: Int = 5, probes: Int = 2,
                       topK: Int = 3): DataFrame = {
    val dir = ensureIvfAssignments(spark, sfDir, nCents)
    val e = asDouble(Tables.embeddings(spark, sfDir))
    val cents = e.filter(col("vec_id") < nCents)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
    val queries = bestCells(e.filter(col("vec_id") < nQueries), cents,
        probes, "cell")
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("cell"))
      .persist()
    val probed = queries.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val assigned = readPartitionedPruned(spark, dir, "cell", probed)
    ivfProbe(assigned, queries, topK)
  }

  /** q118: INCREMENTAL IVF MAINTENANCE — assign a DELTA of new vectors to
    * the FROZEN coarse centroids and report per-cell occupancy before and
    * after. This is how a 100 TB ANN index absorbs an ingest batch:
    * retraining the quantizer would invalidate every stored assignment,
    * so production freezes the centroids, routes the delta through one
    * broadcast argmax pass (delta-sized work, the base vectors are never
    * touched), and appends to the inverted lists. The per-cell count
    * report is the operational readout — cell skew is what drives probe
    * latency, and a drifting delta distribution shows up here before
    * recall degrades. Counts are additive, so the report relation itself
    * is mergeable index state (the q58/q84 posture).
    *
    * The delta fixture: vec_id < nDelta re-emitted at id + 200000 with
    * the first component scaled 1.25 — exact double arithmetic, so the
    * oracle replays the assignment bit-for-bit (the q61 twin idiom).
    */
  def ivfDeltaAssign(embs: DataFrame, nCents: Int = 16,
                     nDelta: Int = 50,
                     baseAssignDir: Option[String] = None): DataFrame = {
    val e = asDouble(embs)
    val cents = e.filter(col("vec_id") < nCents)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
    val delta = e.filter(col("vec_id") < nDelta)
      .select((col("vec_id") + 200000L).as("vec_id"),
        concat(array(element_at(col("emb"), 1) * lit(1.25)),
          slice(col("emb"), lit(2), size(col("emb")) - 1)).as("emb"))
    def cellCounts(v: DataFrame, cnt: String): DataFrame =
      bestCells(v, cents, 1, "cell")
        .groupBy(col("cell").as("cent_id")).agg(count(lit(1)).as(cnt))
    // base occupancy off the persisted inverted lists when available (the
    // q24b artifact — production never re-assigns the base corpus to
    // count its cells); assignment work is then DELTA-sized only
    val baseCounts = baseAssignDir match {
      case Some(dir) => embs.sparkSession.read.parquet(dir)
        .groupBy(col("cell").cast("long").as("cent_id"))
        .agg(count(lit(1)).as("n_base"))
      case None => cellCounts(e, "n_base")
    }
    baseCounts
      .join(cellCounts(delta, "n_delta"), Seq("cent_id"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_delta"))
      .select(col("cent_id"), col("n_base"), col("n_delta"),
        (col("n_base") + col("n_delta")).as("n_total"))
      .orderBy("cent_id")
  }

  /** q100: ANN INDEX-QUALITY EVAL — recall@k of the q24c multi-probe LSH
    * index against brute-force ground truth, per query. Building an
    * approximate index (q24/q24b/q24c/q70/q72) is half the story; a
    * pipeline must also MEASURE what the approximation loses before
    * trusting it at 100 TB, and that measurement is itself a query worth
    * gating: both the index and the truth are deterministic here, so even
    * the recall report hash-checks cross-engine.
    *
    * Scale shape: ground truth is one broadcast pass of the (tiny,
    * hash-picked) query set against the corpus — the honest O(nQueries x
    * corpus) cost of truth, which is why production evals sample queries;
    * the approximate side is the q24c bucket equi-join. Ties at the k-cut
    * are impossible ambiguity: both sides rank by the SAME
    * (cos_x1e4 DESC, vec_id) total order.
    */
  def annRecall(embs: DataFrame, nQueries: Int = 5, k: Int = 3,
                indexedSfDir: Option[String] = None): DataFrame = {
    val e = asDouble(embs)
    val q0 = e.filter(col("vec_id") < nQueries)
      .withColumn("qb", bucketExpr(col("emb"), N_PLANES, DIM))
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("qb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_x1e4").desc, col("vec_id"))
    def topk(cand: DataFrame) = cand
      .select(col("q_id"), col("vec_id"),
        floor(cosine(col("emb"), col("qe")) * 10000 + lit(0.5))
          .cast("long").as("cos_x1e4"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id")
    val truth = topk(e.crossJoin(broadcast(q0.select("q_id", "qe")))
      .filter(col("vec_id") =!= col("q_id")))
    val masks = (0L +: (0 until N_PLANES).map(i => 1L << i)).map(lit)
    val qmp = q0.withColumn("m", explode(array(masks: _*)))
      .select(col("q_id"), col("qe"), col("qb").bitwiseXOR(col("m")).as("bucket"))
      .persist()
    // approximate side off the persisted bucket relation when available:
    // ground truth pays the honest full-corpus pass, but the INDEX side
    // reads only the probed partitions, like the q24c search it evaluates
    val corpusB = indexedSfDir match {
      case Some(d) =>
        val probed = qmp.select("bucket").distinct()
          .collect().map(_.getLong(0)).toSeq
        lshCorpus(embs.sparkSession, d, probed)
      case None =>
        e.withColumn("bucket", bucketExpr(col("emb"), N_PLANES, DIM))
    }
    val approx = topk(corpusB.join(broadcast(qmp), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id")))
    truth.as("t")
      .join(approx.as("a"),
        col("t.q_id") === col("a.q_id") && col("t.vec_id") === col("a.vec_id"),
        "left")
      .groupBy(col("t.q_id").as("q_id"))
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("a.vec_id").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .withColumn("recall_x1e3",
        floor(col("n_hit") * lit(1000.0) / col("n_truth") + lit(0.5))
          .cast("long"))
      .orderBy("q_id")
  }

  /** q124: EMBEDDING OUTLIER report — the bottom decile of the corpus by
    * cosine to the corpus centroid, the standard embedding-QA sweep
    * (broken encoders, mis-joined rows, and off-distribution content all
    * surface as low centroid affinity before they poison a SemDedup/IVF
    * build). Determinism is the whole trick: a naive mean of doubles
    * sums in engine-dependent order, so the centroid is built from
    * EXACT per-component integer sums of 1e-6-quantized components
    * (associative, order-free), divided once — both engines then run
    * the identical correctly-rounded sqrt/divide and the q20c-pinned
    * sequential-fold cosine against the same centroid, bit for bit.
    *
    * 100 TB shape: the quantized component sums are one
    * (pos → two longs) aggregate (dim-sized state, map-side partial);
    * the centroid is a broadcast single row; scoring is one codegen'd
    * pass. The bottom-decile rank is the one global sort — over
    * 12-byte (cos, id) pairs, not vectors; a production sweep at
    * petabyte row counts swaps it for an approx-quantile threshold
    * scan (the q34/q34b split) without touching the scoring pass.
    */
  def centroidOutliers(embs: DataFrame): DataFrame = {
    val e = asDouble(embs)
    outliersAgainst(e, centroidComponents(e))
  }

  /** The exact quantized per-component centroid sums `(pos, sq, n)` —
    * associative and order-free, therefore MERGEABLE: partials over
    * disjoint batches sum to the whole-corpus relation (the q58/q84
    * contract; the streaming centroid index persists exactly these
    * rows and StreamingSpec pins merged == batch).
    */
  private[graft] def centroidComponents(e: DataFrame): DataFrame =
    e.select(posexplode(col("emb")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x") * 1000000 + lit(0.5)).cast("long").as("qx"))
      .groupBy("pos").agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))

  /** The q124 scoring tail against a `(pos, sq, n)` component relation —
    * ONE definition shared by the batch query and the streaming-index
    * readout so the two can never drift.
    */
  private[graft] def outliersAgainst(e: DataFrame,
                                         comp: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(e.sparkSession)
    val cent = comp
      .select(struct(col("pos"),
        (col("sq").cast("double") / (col("n").cast("double") * lit(1000000.0)))
          .as("c")).as("pc"))
      .agg(array_sort(collect_list(col("pc"))).as("pcs"))
      .select(transform(col("pcs"), p => p.getField("c")).as("cent"))
    val scored = e.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        floor(graft.functions.GraftFunctions.cosine(col("emb"), col("cent"))
          * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos_x1e4"), col("vec_id"))).cast("long"))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n_total"))))
      .filter(col("rnk") <= expr("(n_total + 9) DIV 10"))
      .select("vec_id", "cos_x1e4", "rnk")
      .orderBy("rnk")
  }

  /** q148: EMBEDDING-SPACE DRIFT per crawl batch — the embedding-side
    * analog of q144's token-composition drift: for each ingest batch
    * (the `vec_id % 3` residue idiom), how far the batch's mean
    * embedding sits from the corpus-wide mean. A trainer watches this
    * next to q144 because a crawl batch can keep the language mix stable
    * while shifting the embedding distribution (new topic, encoder
    * regression, corrupted shard) — the drift that silently moves every
    * IVF/LSH index and SemDeDup threshold built on the corpus.
    *
    * Exactness: components quantize to x1e6 integers ([[q124]]'s
    * `centroidComponents` rule), so per (batch, dim) the sums are exact
    * BIGINTs and the per-dim mean gap `|sb/nb - sc/nc|` evaluates as
    * `abs(sb*nc - sc*nb) div (nb*nc)` — one integer division of
    * non-negative exact products, identical in both engines; the L1
    * report sums those per-dim integers (truncation is part of the
    * metric's definition). The products stay far inside BIGINT at any
    * single-cluster scale (|sb| <= n·1e6, times nc); at corpus sizes
    * where n_b·n_c·1e6 approaches 9.2e18 (~10^9 vectors), widen the two
    * products to DECIMAL(38,0) — a two-line change, same plan shape.
    *
    * Scale shape: ONE corpus pass (posexplode + partial-aggregated
    * (batch, pos) sums — #batches × dim rows retained), the corpus-wide
    * sums derived from that relation, everything after broadcast-sized.
    * Output: one row per batch — vectors, L1 drift, the worst dimension
    * and its gap (argmax by gap DESC, pos ASC — the dimension to look at
    * first when the alarm fires).
    */
  def embeddingDrift(embs: DataFrame): DataFrame = {
    val e = asDouble(embs)
    driftFromComponents(e
      .select(pmod(col("vec_id"), lit(3L)).as("batch_id"),
        posexplode(col("emb")).as(Seq("pos", "x")))
      .select(col("batch_id"), col("pos"),
        floor(col("x") * 1000000 + lit(0.5)).cast("long").as("qx"))
      .groupBy("batch_id", "pos")
      .agg(sum(col("qx")).as("sb"), count(lit(1)).as("nb")))
  }

  /** The q148 report tail over a per-batch component relation
    * `(batch_id, pos, sb, nb)` — ONE definition shared by the batch
    * query and the streaming-index readout (q149) so the two can never
    * drift. `sb`/`nb` are [[centroidComponents]]' quantized sums, keyed
    * by ingest batch.
    */
  private[operators] def driftFromComponents(pb0: DataFrame): DataFrame = {
    val pb = pb0.persist() // ≤ #batches × dim rows — the one corpus pass
    val g = pb.groupBy("pos")
      .agg(sum(col("sb")).as("sc"), sum(col("nb")).as("nc"))
    val dd = pb.join(broadcast(g), Seq("pos"))
      .select(col("batch_id"), col("pos"), col("nb"),
        expr("abs(sb * nc - sc * nb) div (nb * nc)").as("d"))
    val worst = dd
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("batch_id")
          .orderBy(col("d").desc, col("pos"))))
      .filter(col("rn") === 1)
      .select(col("batch_id"), col("pos").cast("long").as("worst_pos"),
        col("d").as("max_drift_x1e6"))
    dd.groupBy("batch_id")
      .agg(max(col("nb")).as("n_vecs"), sum(col("d")).as("l1_drift_x1e6"))
      .join(worst, Seq("batch_id"))
      .select(col("batch_id"), col("n_vecs"), col("l1_drift_x1e6"),
        col("worst_pos"), col("max_drift_x1e6"))
      .orderBy("batch_id")
  }

  /** q140: HARD-NEGATIVE mining for contrastive training — for each of
    * `nQueries` hash-picked anchor vectors (the q42/q71 deterministic-
    * sample idiom), the `k` highest-cosine corpus vectors carrying a
    * DIFFERENT label: the near-misses a contrastive/retrieval trainer
    * wants in the batch because the current embedding confuses them with
    * the anchor. Labels are the embeddings table's supervision column
    * (the q99 linear-probe labels); an anchor's own row is excluded by
    * the label inequality itself.
    *
    * Scale shape: the anchor side is small by construction and
    * BROADCASTS (the q71 posture) — one shuffle-free corpus pass scores
    * anchors x corpus. The per-anchor top-k is a SALTED TWO-PHASE cut
    * (round-14 verdict fix): a single `Window.partitionBy(q_id)` would
    * hash the corpus×nQueries scored stream into only nQueries partition
    * keys, each reducer fully sorting a corpus-sized slice (WindowExec
    * sorts its partition — it does not heap). Instead phase 1 salts on
    * `pmod(xxhash64(neg_id), S)` so the local cut shuffles on
    * nQueries×S keys with ~corpus/S rows each, and phase 2 re-cuts the
    * surviving ≤ nQueries×S×k rows per anchor — the final sort touches a
    * stream whose size is independent of the corpus. The (cos desc,
    * neg_id) ordering is total, so any global top-k row is also in its
    * salt bucket's top-k: the two-phase result is exactly the one-window
    * result (spec-pinned against a driver brute force). At larger anchor
    * counts candidate generation routes through the IVF/LSH index family
    * (q24*, q61) exactly like [[Curation.semanticContaminationRouted]].
    * Exact x1e4 cosine contract (the codegen'd
    * [[graft.functions.CosineSimilarity]] with oracle-pinned operation
    * order), so the ranking hash-checks cross-engine.
    */
  def hardNegatives(embs: DataFrame, nQueries: Int = 20,
                    k: Int = 3, salts: Int = 32): DataFrame = {
    graft.functions.GraftFunctions.register(embs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val e = embs.select(col("vec_id"),
      col("label").cast("long").as("label"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    val anchors = e
      .select(col("vec_id"), col("label"), col("emb"),
        Sketches.phash60(col("vec_id")).as("h"))
      .orderBy("h", "vec_id").limit(nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("emb").as("q_emb"))
    val scored = e.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"),
        floor(graft.functions.GraftFunctions.cosine(col("emb"), col("q_emb"))
          * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
    // phase 1: local top-k per (anchor, salt) — nQueries×salts keys
    val wLocal = Window.partitionBy("q_id", "salt")
      .orderBy(col("cos_x1e4").desc, col("neg_id"))
    val survivors = scored
      .withColumn("salt", pmod(xxhash64(col("neg_id")), lit(salts)))
      .withColumn("lrnk", row_number().over(wLocal))
      .filter(col("lrnk") <= k)
      .drop("salt", "lrnk")
    // phase 2: final top-k per anchor over ≤ nQueries×salts×k rows
    val wFinal = Window.partitionBy("q_id")
      .orderBy(col("cos_x1e4").desc, col("neg_id"))
    survivors
      .withColumn("rnk", row_number().over(wFinal).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "q_label", "rnk", "neg_id", "neg_label", "cos_x1e4")
      .orderBy("q_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q140: label-aware hard-negative mining (see [[hardNegatives]]).
    "q140_hard_negatives" -> ((s, d) =>
      hardNegatives(Tables.embeddings(s, d))),

    // Q124: bottom-decile centroid-affinity outliers (see
    // [[centroidOutliers]] — exact integer-quantized centroid, q20c
    // cosine determinism contract).
    "q124_embedding_outliers" -> ((s, d) =>
      centroidOutliers(Tables.embeddings(s, d))),

    // Q148: per-batch embedding-space drift (see [[embeddingDrift]]).
    "q148_embedding_drift" -> ((s, d) =>
      embeddingDrift(Tables.embeddings(s, d))),

    // Q100: recall@3 of the q24c multi-probe index vs brute force (the
    // index side off the persisted bucket relation, like q24c itself).
    "q100_ann_recall" -> ((s, d) =>
      annRecall(Tables.embeddings(s, d), indexedSfDir = Some(d))),

    // Q20 (E-10): exact cosine top-5 of vec_id=0.
    "q20_cosine_topk" -> ((s, d) => {
      val e = asDouble(Tables.embeddings(s, d))
      val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          floor(cosine(col("emb"), col("qe")) * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
        .orderBy(col("cos_x1e4").desc, col("vec_id"))
        .limit(5)
    }),

    // Q20c: same computation through the native codegen'd Expression
    // (graft.functions.CosineSimilarity) instead of aggregate/zip_with —
    // identical accumulation order, so identical results; one fused loop
    // per row instead of three lambda folds and an intermediate array.
    "q20c_cosine_native" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val e = asDouble(Tables.embeddings(s, d))
      val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          floor(graft.functions.GraftFunctions.cosine(col("emb"), col("qe")) * 10000 + lit(0.5))
            .cast("long").as("cos_x1e4"))
        .orderBy(col("cos_x1e4").desc, col("vec_id"))
        .limit(5)
    }),

    // Q20b: top-3 neighbors for every query in vec_id < 10, one corpus pass.
    "q20b_batch_topk" -> ((s, d) => {
      val e = asDouble(Tables.embeddings(s, d))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("qe"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_x1e4").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          floor(cosine(col("emb"), col("qe")) * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
        .withColumn("rnk", row_number().over(w).cast("int"))
        .filter(col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    }),

    // Q24b: IVF-style approximate NN — a fixed set of coarse centroids
    // (deterministically the first 16 corpus vectors), every vector assigned
    // to its nearest centroid (one broadcast pass), queries probe their 2
    // nearest cells. Candidate generation is an equi-join on the cell id;
    // recall/probes is the standard IVF tradeoff. The construction is fully
    // deterministic, so the oracle replays the same index in SQL; the spec
    // additionally measures recall against brute force.
    // Q118: incremental IVF maintenance (see [[ivfDeltaAssign]]) — base
    // occupancy read off the q24b inverted-list artifact; only the delta
    // is assigned live.
    "q118_ivf_delta" -> ((s, d) =>
      ivfDeltaAssign(Tables.embeddings(s, d),
        baseAssignDir = Some(ensureIvfAssignments(s, d)))),

    // Q24b: IVF search against the PERSISTED inverted lists (the demo
    // coarse quantizer: deterministically the first 16 corpus vectors,
    // replayable in plain SQL — the oracle rebuilds the same index).
    // The production path trains the centroids instead — same search,
    // Clustering.trainedCentroids input through [[ivfSearch]]
    // (spec-compared for recall in OperatorsSpec); [[ivfSearchIndexed]]
    // reads only the probed cells off the build-once artifact.
    "q24b_ann_ivf" -> ((s, d) => ivfSearchIndexed(s, d)),

    // Q24c: multi-probe extension of q24 — each query also probes the 8
    // buckets at Hamming distance 1 (one hyperplane flip), the standard
    // recall lever when a neighbor falls just across one plane. Probe
    // fan-out is a 9-row explode on the (tiny) query side; the corpus side
    // is untouched and the join stays an equi-join on the bucket id.
    // Probe fan-out is a 9-row explode on the (tiny) query side; the
    // corpus side is the persisted bucket relation pruned to the probed
    // partitions — the index is built once, the search reads only what
    // it probes.
    "q24c_ann_multiprobe" -> ((s, d) => {
      val masks = (0L +: (0 until N_PLANES).map(i => 1L << i)).map(lit)
      val q = asDouble(Tables.embeddings(s, d)).filter(col("vec_id") < 5)
        .withColumn("qb", bucketExpr(col("emb"), N_PLANES, DIM))
        .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("qb"))
        .withColumn("m", explode(array(masks: _*)))
        .select(col("q_id"), col("qe"),
          col("qb").bitwiseXOR(col("m")).as("bucket"))
        .persist()
      val probed = q.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSeq
      val e = lshCorpus(s, d, probed)
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_x1e4").desc, col("vec_id"))
      e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          floor(cosine(col("emb"), col("qe")) * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
        .withColumn("rnk", row_number().over(w).cast("int"))
        .filter(col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    }),

    // Q24: LSH-bucketed approximate NN — candidates share a sign-bucket, so
    // the search is an equi-join, not a cross join. The fixed planes are
    // emitted into the oracle SQL as literals, so the whole approximate
    // index reproduces in DuckDB; the spec additionally checks bucket
    // containment and exactness within buckets.
    "q24_ann_lsh" -> ((s, d) => {
      val q = asDouble(Tables.embeddings(s, d)).filter(col("vec_id") < 5)
        .withColumn("bucket", bucketExpr(col("emb"), N_PLANES, DIM))
        .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("bucket"))
        .persist()
      val probed = q.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSeq
      val e = lshCorpus(s, d, probed)
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_x1e4").desc, col("vec_id"))
      e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          floor(cosine(col("emb"), col("qe")) * 10000 + lit(0.5)).cast("long").as("cos_x1e4"))
        .withColumn("rnk", row_number().over(w).cast("int"))
        .filter(col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // q140 twin: same hash-picked anchors, exact cosine with the pinned
    // op order, per-anchor top-k over the label-excluded corpus.
    "q140_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |             embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb
         |      FROM (SELECT vec_id, label, emb,
         |              ${Sketches.phash60Sql("vec_id")} AS h FROM e)
         |      ORDER BY h, vec_id LIMIT 20),
         |p AS (SELECT q.q_id, q.q_label, c.vec_id AS neg_id,
         |        c.label AS neg_label,
         |        CAST(FLOOR(list_dot_product(c.emb, q.q_emb) /
         |          (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(q.q_emb, q.q_emb)))
         |          * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cos_x1e4
         |      FROM e c CROSS JOIN q
         |      WHERE c.label <> q.q_label),
         |r AS (SELECT *, CAST(row_number() OVER
         |        (PARTITION BY q_id ORDER BY cos_x1e4 DESC, neg_id) AS BIGINT) AS rnk
         |      FROM p)
         |SELECT q_id, q_label, rnk, neg_id, neg_label, cos_x1e4
         |FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin,

    // q148 twin: identical quantization, residue split, exact-integer
    // cross products and `//` division; MAX(nb) is the batch's vector
    // count under the same "has that dimension" definition. Shared
    // VERBATIM by q149 (the index readout) — stream==batch is its
    // contract.
    "q148_embedding_drift" -> embeddingDriftOracleSql,

    "q124_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |px AS (SELECT i - 1 AS pos,
        |         CAST(FLOOR(emb[i] * 1000000 + 0.5) AS BIGINT) AS qx
        |       FROM e, unnest(range(1, len(emb) + 1)) AS u(i)),
        |cs AS (SELECT pos, CAST(SUM(qx) AS BIGINT) AS sq,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |       FROM px GROUP BY pos),
        |cent AS (SELECT list(CAST(sq AS DOUBLE) / (n * 1000000.0)
        |           ORDER BY pos) AS cent FROM cs),
        |scored AS (SELECT vec_id,
        |         CAST(FLOOR(list_dot_product(emb, cent) /
        |           (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(cent, cent)))
        |           * 10000 + 0.5) AS BIGINT) AS cos_x1e4
        |       FROM e, cent),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM e),
        |ranked AS (SELECT *, CAST(row_number() OVER
        |             (ORDER BY cos_x1e4, vec_id) AS BIGINT) AS rnk
        |           FROM scored)
        |SELECT vec_id, cos_x1e4, rnk
        |FROM ranked, nt
        |WHERE rnk <= (n_total + 9) // 10
        |ORDER BY rnk""".stripMargin,

    // q100 twin: the q24c approximate chain + the q20b brute-force chain,
    // joined per (query, neighbor), recall grouped per query.
    "q100_ann_recall" -> {
      val masks = (0L +: (0 until N_PLANES).map(i => 1L << i))
        .mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (SELECT vec_id, emb,
         |        ${bucketSqlExpr("emb")} AS bucket
         |      FROM e),
         |q0 AS (SELECT vec_id AS q_id, emb AS qe, bucket AS qb FROM b WHERE vec_id < 5),
         |qm AS (SELECT q_id, qe, xor(qb, m) AS bucket
         |       FROM q0, unnest($masks) AS t(m)),
         |acand AS (SELECT q_id, b.vec_id AS vec_id,
         |            CAST(FLOOR(${COS_SQL.format("b.emb", "qe", "b.emb", "b.emb", "qe", "qe")}
         |              * 10000 + 0.5) AS BIGINT) AS cos_x1e4
         |          FROM b JOIN qm USING (bucket) WHERE b.vec_id <> q_id),
         |apr AS (SELECT q_id, vec_id FROM (
         |          SELECT *, row_number() OVER
         |            (PARTITION BY q_id ORDER BY cos_x1e4 DESC, vec_id) AS rnk
         |          FROM acand) WHERE rnk <= 3),
         |tcand AS (SELECT q_id, e.vec_id AS vec_id,
         |            CAST(FLOOR(${COS_SQL.format("e.emb", "qe", "e.emb", "e.emb", "qe", "qe")}
         |              * 10000 + 0.5) AS BIGINT) AS cos_x1e4
         |          FROM e, q0 WHERE e.vec_id <> q_id),
         |tru AS (SELECT q_id, vec_id FROM (
         |          SELECT *, row_number() OVER
         |            (PARTITION BY q_id ORDER BY cos_x1e4 DESC, vec_id) AS rnk
         |          FROM tcand) WHERE rnk <= 3)
         |SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |       CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |       CAST(FLOOR(CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000 AS DOUBLE)
         |            / COUNT(*) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS recall_x1e3
         |FROM tru t LEFT JOIN apr a ON t.q_id = a.q_id AND t.vec_id = a.vec_id
         |GROUP BY t.q_id
         |ORDER BY t.q_id""".stripMargin
    },

    "q24c_ann_multiprobe" -> {
      val masks = (0L +: (0 until N_PLANES).map(i => 1L << i))
        .mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (SELECT vec_id, emb,
         |        ${bucketSqlExpr("emb")} AS bucket
         |      FROM e),
         |q0 AS (SELECT vec_id AS q_id, emb AS qe, bucket AS qb FROM b WHERE vec_id < 5),
         |q AS (SELECT q_id, qe, xor(qb, m) AS bucket
         |      FROM q0, unnest($masks) AS t(m)),
         |cand AS (SELECT q_id, b.vec_id AS vec_id,
         |           CAST(FLOOR(${COS_SQL.format("b.emb", "qe", "b.emb", "b.emb", "qe", "qe")}
         |             * 10000 + 0.5) AS BIGINT) AS cos_x1e4
         |         FROM b JOIN q USING (bucket) WHERE b.vec_id <> q_id),
         |ranked AS (SELECT *, CAST(row_number() OVER
         |             (PARTITION BY q_id ORDER BY cos_x1e4 DESC, vec_id) AS INT) AS rnk
         |           FROM cand)
         |SELECT q_id, vec_id, cos_x1e4, rnk FROM ranked WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin
    },

    "q24_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (SELECT vec_id, emb,
         |        ${bucketSqlExpr("emb")} AS bucket
         |      FROM e),
         |q AS (SELECT vec_id AS q_id, emb AS qe, bucket FROM b WHERE vec_id < 5),
         |cand AS (SELECT q_id, b.vec_id AS vec_id,
         |           CAST(FLOOR(${COS_SQL.format("b.emb", "qe", "b.emb", "b.emb", "qe", "qe")}
         |             * 10000 + 0.5) AS BIGINT) AS cos_x1e4
         |         FROM b JOIN q USING (bucket) WHERE b.vec_id <> q_id),
         |ranked AS (SELECT *, CAST(row_number() OVER
         |             (PARTITION BY q_id ORDER BY cos_x1e4 DESC, vec_id) AS INT) AS rnk
         |           FROM cand)
         |SELECT q_id, vec_id, cos_x1e4, rnk FROM ranked WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin,

    // q118 twin: same frozen-centroid assignment chain, delta replayed
    // with exact double arithmetic.
    "q118_ivf_delta" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, emb AS cent FROM e WHERE vec_id < 16),
         |delta AS (SELECT vec_id + 200000 AS vec_id,
         |            [emb[1] * 1.25] || emb[2:] AS emb
         |          FROM e WHERE vec_id < 50),
         |ab AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             ${COS_SQL.format("e.emb", "cent", "e.emb", "e.emb", "cent", "cent")} DESC,
         |             cent_id) AS rn
         |    FROM e, cents) WHERE rn = 1),
         |ad AS (SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, cent_id AS cell,
         |           row_number() OVER (PARTITION BY d.vec_id ORDER BY
         |             ${COS_SQL.format("d.emb", "cent", "d.emb", "d.emb", "cent", "cent")} DESC,
         |             cent_id) AS rn
         |    FROM delta d, cents) WHERE rn = 1),
         |nb AS (SELECT cell AS cent_id, CAST(COUNT(*) AS BIGINT) AS n_base
         |       FROM ab GROUP BY 1),
         |ndl AS (SELECT cell AS cent_id, CAST(COUNT(*) AS BIGINT) AS n_delta
         |        FROM ad GROUP BY 1)
         |SELECT COALESCE(nb.cent_id, ndl.cent_id) AS cent_id,
         |       COALESCE(n_base, 0) AS n_base,
         |       COALESCE(n_delta, 0) AS n_delta,
         |       COALESCE(n_base, 0) + COALESCE(n_delta, 0) AS n_total
         |FROM nb FULL OUTER JOIN ndl ON nb.cent_id = ndl.cent_id
         |ORDER BY cent_id""".stripMargin,

    "q24b_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, emb AS cent FROM e WHERE vec_id < 16),
         |sims AS (SELECT e.vec_id, e.emb, cent_id,
         |           ${COS_SQL.format("e.emb", "cent", "e.emb", "e.emb", "cent", "cent")} AS sim
         |         FROM e, cents),
         |assigned AS (SELECT vec_id, emb, cell FROM (
         |    SELECT vec_id, emb, cent_id AS cell,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
         |    FROM sims) WHERE rn = 1),
         |qcells AS (SELECT q_id, qe, cell FROM (
         |    SELECT vec_id AS q_id, emb AS qe, cent_id AS cell,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
         |    FROM sims WHERE vec_id < 5) WHERE rn <= 2),
         |cand AS (SELECT DISTINCT q_id, a.vec_id AS vec_id,
         |           CAST(FLOOR(${COS_SQL.format("a.emb", "qe", "a.emb", "a.emb", "qe", "qe")}
         |             * 10000 + 0.5) AS BIGINT) AS cos_x1e4
         |         FROM assigned a JOIN qcells USING (cell) WHERE a.vec_id <> q_id),
         |ranked AS (SELECT *, CAST(row_number() OVER
         |             (PARTITION BY q_id ORDER BY cos_x1e4 DESC, vec_id) AS INT) AS rnk
         |           FROM cand)
         |SELECT q_id, vec_id, cos_x1e4, rnk FROM ranked WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin,

    "q20_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        |scored AS (SELECT vec_id,
        |       list_dot_product(emb, qe) /
        |         (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qe, qe))) AS cos
        |       FROM e, q WHERE vec_id <> 0)
        |SELECT vec_id, CAST(FLOOR(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
        |FROM scored
        |ORDER BY cos_x1e4 DESC, vec_id
        |LIMIT 5""".stripMargin,

    "q20c_cosine_native" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        |scored AS (SELECT vec_id,
        |       list_dot_product(emb, qe) /
        |         (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qe, qe))) AS cos
        |       FROM e, q WHERE vec_id <> 0)
        |SELECT vec_id, CAST(FLOOR(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
        |FROM scored
        |ORDER BY cos_x1e4 DESC, vec_id
        |LIMIT 5""".stripMargin,

    "q20b_batch_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 10),
        |scored AS (SELECT q_id, vec_id,
        |       CAST(FLOOR(list_dot_product(emb, qe) /
        |         (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qe, qe))) * 10000 + 0.5) AS BIGINT) AS cos_x1e4
        |       FROM e, q WHERE vec_id <> q_id),
        |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_x1e4 DESC, vec_id) AS INT) AS rnk
        |           FROM scored)
        |SELECT q_id, vec_id, cos_x1e4, rnk FROM ranked WHERE rnk <= 3
        |ORDER BY q_id, rnk""".stripMargin
  )

  /** The q148/q149 shared oracle (q149 reads the same report off the
    * streaming centroid index — one SQL, one contract).
    */
  private[operators] lazy val embeddingDriftOracleSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |px AS (SELECT vec_id % 3 AS batch_id, i - 1 AS pos,
       |         CAST(FLOOR(emb[i] * 1000000 + 0.5) AS BIGINT) AS qx
       |       FROM e, unnest(range(1, len(emb) + 1)) AS u(i)),
       |pb AS (SELECT batch_id, pos, CAST(SUM(qx) AS BIGINT) AS sb,
       |         CAST(COUNT(*) AS BIGINT) AS nb
       |       FROM px GROUP BY 1, 2),
       |g AS (SELECT pos, CAST(SUM(sb) AS BIGINT) AS sc,
       |        CAST(SUM(nb) AS BIGINT) AS nc
       |      FROM pb GROUP BY pos),
       |dd AS (SELECT batch_id, pb.pos, nb,
       |         ABS(sb * nc - sc * nb) // (nb * nc) AS d
       |       FROM pb JOIN g ON pb.pos = g.pos),
       |w AS (SELECT batch_id, CAST(pos AS BIGINT) AS worst_pos,
       |        d AS max_drift_x1e6,
       |        ROW_NUMBER() OVER (PARTITION BY batch_id
       |          ORDER BY d DESC, pos) AS rn
       |      FROM dd)
       |SELECT dd.batch_id, CAST(MAX(dd.nb) AS BIGINT) AS n_vecs,
       |  CAST(SUM(dd.d) AS BIGINT) AS l1_drift_x1e6,
       |  ANY_VALUE(w.worst_pos) AS worst_pos,
       |  CAST(ANY_VALUE(w.max_drift_x1e6) AS BIGINT) AS max_drift_x1e6
       |FROM dd JOIN w ON dd.batch_id = w.batch_id AND w.rn = 1
       |GROUP BY dd.batch_id
       |ORDER BY dd.batch_id""".stripMargin
}
