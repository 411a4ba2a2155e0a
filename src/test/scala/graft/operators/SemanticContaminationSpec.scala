package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** q71's scale path: the banded LSH contamination probe must agree with
  * the broadcast cross-join path on everything it reports — precision is
  * 1.0 by construction (exact cosine verification), and in the
  * true-contamination regime (near-copies, cos >= 0.9) the 8x8 banding
  * recall is effectively 1, so on a planted-twin fixture the two paths'
  * threshold-hit sets are IDENTICAL, not merely close.
  */
class SemanticContaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001
  private val T = 9000

  test("LSH route equals the broadcast route's threshold hits on a " +
    "planted-twin eval fixture") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, D)
    // twin 5 vectors the eval selection will (mostly) pick, re-keyed above
    // the fixture id range — each twin is an exact copy, so its cosine
    // against the eval original is ~1.0: true contamination
    val evalIds = e
      .select(col("vec_id"), Sketches.phash60(col("vec_id")).as("h"))
      .orderBy("h", "vec_id").limit(20)
      .select("vec_id").as[Long].collect()
    val twins = e.filter(col("vec_id").isin(evalIds.take(5).map(Long.box): _*))
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = e.unionByName(twins)

    val broadcastHits = Curation.semanticContamination(corpus, 20, T, 20)
      .filter(col("n_hits") >= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lshHits = Curation.semanticContaminationLsh(corpus, 20, T, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(lshHits === broadcastHits,
      "banded probe must report exactly the broadcast path's hits")
    assert(lshHits.nonEmpty, "fixture must exercise contamination hits")
  }

  test("no false positives without planted contamination (fixture max " +
    "cosine < threshold)") {
    val e = Tables.embeddings(spark, D)
    assert(Curation.semanticContaminationLsh(e, 20, T, 20).count() === 0L)
  }

  test("routed entry point: broadcastable eval sizes take the exact path") {
    val e = Tables.embeddings(spark, D)
    val routed = Curation.semanticContaminationRouted(e, 20, 4500, 20)
      .collect().map(_.toSeq)
    val exact = Curation.semanticContamination(e, 20, 4500, 20)
      .collect().map(_.toSeq)
    assert(routed.toSeq === exact.toSeq)
  }

  test("embedding drift: exact integer recomputation on a planted fixture " +
    "— identical batches score alike, the shifted batch stands out on its " +
    "shifted dimension, and the metric is layout-invariant") {
    import spark.implicits._
    // batches by vec_id % 3; batch 1 shifted +0.4 on dim 1, batches 0 and
    // 2 identical by construction
    val data = Seq(
      (0L, Seq(0.5f, 0.5f)), (3L, Seq(0.7f, 0.3f)),
      (1L, Seq(0.5f, 0.9f)), (4L, Seq(0.7f, 0.7f)),
      (2L, Seq(0.5f, 0.5f)), (5L, Seq(0.7f, 0.3f)))
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.embeddingDrift(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // driver-side recomputation with the operator's own integer formula
    val q = data.flatMap { case (id, emb) =>
      emb.zipWithIndex.map { case (x, pos) =>
        (id % 3, pos, math.floor(x.toDouble * 1000000 + 0.5).toLong) }
    }
    val pb = q.groupBy(t => (t._1, t._2)).map { case ((b, p), ts) =>
      ((b, p), (ts.map(_._3).sum, ts.size.toLong)) }
    val g = pb.groupBy(_._1._2).map { case (p, m) =>
      (p, (m.values.map(_._1).sum, m.values.map(_._2).sum)) }
    val dd = pb.map { case ((b, p), (sb, nb)) =>
      val (sc, nc) = g(p)
      (b, p, nb, math.abs(sb * nc - sc * nb) / (nb * nc)) }
    val want = dd.groupBy(_._1).map { case (b, ts) =>
      val worst = ts.toSeq.sortBy(t => (-t._4, t._2)).head
      (b, ts.map(_._3).max, ts.map(_._4).sum, worst._2.toLong, worst._4)
    }.toSeq.sortBy(_._1)
    assert(got === want, s"drift recomputation mismatch: $got vs $want")
    val Seq(b0, b1, b2) = got.sortBy(_._1)
    assert(b0._3 === b2._3, "identical batches must score identically")
    assert(b1._3 > b0._3, "the shifted batch must stand out")
    assert(b1._4 === 1L, "the shifted dimension must be the worst dim")
    // layout invariance: the integer math cannot depend on partitioning
    val re = Similarity.embeddingDrift(df.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(re === got)
  }

  test("q149: the drift report off the streaming centroid index equals " +
    "the batch q148 row for row, and replaying a batch is idempotent — " +
    "the dim-sized partials the stream keeps for q124 already carry the " +
    "drift history") {
    val e = Tables.embeddings(spark, D)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-centdrift").toString
    (0 until 3).foreach { i =>
      Curation.centroidIngestBatch(
        e.filter(pmod(col("vec_id"), lit(3L)) === i), i.toLong, dir)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val want = rows(Similarity.embeddingDrift(e))
    assert(rows(Curation.embeddingDriftFromIndex(spark, dir)) === want,
      "index readout must equal the batch drift report")
    // replay: re-running the last micro-batch overwrites its own dir
    Curation.centroidIngestBatch(
      e.filter(pmod(col("vec_id"), lit(3L)) === 2), 2L, dir)
    assert(rows(Curation.embeddingDriftFromIndex(spark, dir)) === want,
      "replaying a batch must be idempotent")
    // the catalog's artifact-backed path converges to the same relation
    assert(rows(Curation.streamingEmbeddingDrift(spark, D)) === want,
      "q149 must equal q148 row for row")
    // guard: a COMPACTED index (batch identity erased — a supported q124
    // state) must be refused loudly, not read as one ~zero-drift batch;
    // and a crashed compaction (tmp/marker present) likewise
    Curation.compactCentroidIndex(spark, dir, upToBatch = 3)
    val exC = intercept[IllegalArgumentException] {
      Curation.embeddingDriftFromIndex(spark, dir)
    }
    assert(exC.getMessage.contains("compacted"),
      s"expected the compacted-index refusal, got: $exC")
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-centdrift2").toString
    (0 until 2).foreach { i =>
      Curation.centroidIngestBatch(
        e.filter(pmod(col("vec_id"), lit(3L)) === i), i.toLong, dir2)
    }
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mk = fs.create(
      new org.apache.hadoop.fs.Path(dir2, ".compact-commit"), true)
    try mk.write("2\n".getBytes("UTF-8")) finally mk.close()
    val exM = intercept[IllegalArgumentException] {
      Curation.embeddingDriftFromIndex(spark, dir2)
    }
    assert(exM.getMessage.contains("in flight or"),
      s"expected the crashed-compaction refusal, got: $exM")
  }

  test("hard negatives: k per anchor, never the anchor's label, and the " +
    "distributed top-k equals a driver-side brute force per anchor") {
    val e = Tables.embeddings(spark, D)
    val got = Similarity.hardNegatives(e, nQueries = 20, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.size === 20 && byAnchor.values.forall(_.length == 3),
      "every anchor must yield exactly k negatives")
    assert(got.forall(r => r._5 != r._2),
      "a hard negative must never share its anchor's label")
    assert(got.forall(r => r._4 != r._1),
      "the anchor itself can never be its own negative")
    // exactness: driver-side brute force for every anchor reproduces the
    // distributed window's (cos desc, id) top-k row for row
    val all = e.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2).toLong))
    val vecs = all.map(a => a._1 -> a).toMap
    def cosX1e4(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 10000 + 0.5).toLong
    }
    byAnchor.foreach { case (qId, rows) =>
      val (_, qEmb, qLabel) = vecs(qId)
      val want = all.filter(_._3 != qLabel)
        .map(v => (v._1, v._3, cosX1e4(qEmb, v._2)))
        .sortBy(v => (-v._3, v._1)).take(3)
        .zipWithIndex
        .map { case ((id, lbl, cos), i) =>
          (qId, qLabel, i + 1L, id, lbl, cos) }
      assert(rows.sortBy(_._3).toSeq === want.toSeq,
        s"anchor $qId top-k mismatch")
    }
  }
}
