package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Semantic checks for q54 beyond the DuckDB oracle: the distributed
  * trainer must equal a naive sequential Lloyd implementation EXACTLY
  * (same quantization, init, tie-breaks, floor-div averaging), and the
  * iterations must actually descend the k-means objective.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001
  private val K = 8
  private val ITERS = 3

  // naive driver-side reference: quantize, init by (phash60, id), Lloyd
  private def reference(): (Map[Int, Array[Long]], Map[Long, (Int, Long)]) = {
    graft.functions.GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, D)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"), x =>
          floor(x * 1000000L + lit(0.5)).cast("long")).as("qv"),
        Sketches.phash60(col("vec_id")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    var cents: Map[Int, Array[Long]] = vecs.sortBy(v => (v._3, v._1))
      .take(K).zipWithIndex.map { case (v, i) => i -> v._2 }.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(): Map[Long, (Int, Long)] = vecs.map { case (id, qv, _) =>
      id -> cents.toSeq.map { case (c, cv) => (dist(qv, cv), c) }.min.swap
    }.toMap
    for (_ <- 1 to ITERS) {
      val byC = assign().toSeq.map { case (id, (c, _)) => (c, id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val qvById = vecs.map(v => v._1 -> v._2).toMap
      cents = cents.map { case (c, old) =>
        byC.get(c).filter(_.nonEmpty) match {
          case None => c -> old
          case Some(ids) =>
            val n = ids.size.toLong
            c -> (0 until 64).map(p =>
              Math.floorDiv(ids.iterator.map(qvById(_)(p)).sum, n)).toArray
        }
      }
    }
    (cents, assign())
  }

  test("q54: distributed training equals the sequential Lloyd reference") {
    val (refCents, refAssign) = reference()
    val (gotCents, gotAssignDf) = Clustering.kmeans(Tables.embeddings(spark, D))
    assert(gotCents.keySet == refCents.keySet)
    gotCents.foreach { case (c, cv) =>
      assert(cv.sameElements(refCents(c)), s"centroid $c diverged")
    }
    val gotAssign = gotAssignDf.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(gotAssign == refAssign, "assignments/distances diverged")
  }

  test("q54: training descends the objective vs the initial assignment") {
    val summary = Clustering.queries("q54_kmeans")(spark, D).collect()
    val trainedWcss = summary.map(_.getLong(3)).sum
    assert(summary.map(_.getLong(1)).sum == 500L, "every vector is assigned")
    // initial-assignment WCSS from the sequential reference's init state
    graft.functions.GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, D)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"), x =>
          floor(x * 1000000L + lit(0.5)).cast("long")).as("qv"),
        Sketches.phash60(col("vec_id")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val init = vecs.sortBy(v => (v._3, v._1)).take(K).map(_._2)
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val initWcss = vecs.map { case (_, qv, _) => init.map(dist(qv, _)).min }.sum
    assert(trainedWcss < initWcss,
      s"3 Lloyd iterations should improve WCSS ($trainedWcss vs $initWcss)")
  }

  test("sample-trained kmeans: full-corpus final assignment, WCSS within " +
    "bound of full training") {
    val embs = Tables.embeddings(spark, D)
    val (_, full) = Clustering.kmeans(embs)
    val fullWcss = full.agg(sum("dist")).collect()(0).getLong(0)
    // deterministic hash-sample at 25%: Lloyd rounds see ~125 of 500
    // vectors, the final assignment sees all 500 — the 100 TB posture
    val (cents, sampled) = Clustering.kmeans(embs, sampleFraction = 0.25)
    assert(sampled.count() === 500L, "every corpus vector must be assigned")
    assert(cents.nonEmpty && cents.head._2.length === 64)
    val sampledWcss = sampled.agg(sum("dist")).collect()(0).getLong(0)
    assert(sampledWcss <= (fullWcss * 1.5).toLong,
      s"sample-trained WCSS $sampledWcss too far above full-trained $fullWcss")
    // rerun-stable: the hash sample is deterministic, not rand()-based
    val (cents2, _) = Clustering.kmeans(embs, sampleFraction = 0.25)
    assert(cents2.view.mapValues(_.toSeq).toMap ===
      cents.view.mapValues(_.toSeq).toMap)
  }

  test("q54: trainedCentroids rescale exactly and feed an IVF coarse quantizer") {
    val cents = Clustering.trainedCentroids(Tables.embeddings(spark, D))
    assert(cents.size == K)
    cents.values.foreach { cv =>
      assert(cv.length == 64)
      assert(cv.forall(c => c.abs <= 2.0), "centroids stay in embedding range")
    }
    // distinct centroids: the trainer must not collapse all clusters
    assert(cents.values.map(_.toSeq).toSet.size == K)
  }
}
