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

  test("q99: per-class probe accuracy equals a sequential nearest-centroid " +
    "recomputation over the hash split") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Tables.embeddings(spark, D)
      .select(col("vec_id"), col("label").cast("long"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long")).as("q"),
        pmod(Sketches.phash60(col("vec_id").cast("string")), lit(5L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray,
        r.getLong(3)))
    val (ev, tr) = rows.partition(_._4 == 0L)
    assert(ev.nonEmpty && tr.nonEmpty, "split must populate both sides")
    val byLabel = tr.groupBy(_._2)
    val sums = byLabel.view.mapValues { vs =>
      val s = new Array[Long](vs.head._3.length)
      vs.foreach(v => v._3.indices.foreach(i => s(i) += v._3(i)))
      (s, vs.length.toLong)
    }.toMap
    def predict(q: Array[Long]): Long =
      sums.toSeq.map { case (lbl, (s, n)) =>
        val dot = q.indices.map(i => q(i) * s(i)).sum
        val ss = s.map(x => x * x).sum
        (lbl, dot.toDouble / n - ss.toDouble / (2.0 * n * n))
      }.minBy { case (lbl, sc) => (-sc, lbl) }._1
    val expected = ev.groupBy(_._2).view.mapValues { vs =>
      val correct = vs.count(v => predict(v._3) == v._2).toLong
      (vs.length.toLong, correct,
        math.floor(correct * 1000.0 / vs.length + 0.5).toLong)
    }.toMap
    val got = Clustering.linearProbe(Tables.embeddings(spark, D)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    // the fixture's labels carry ~chance linear signal (that IS the
    // measurement — the probe reports it faithfully); totals must cover
    // the full eval split
    assert(got.values.map(_._1).sum === ev.length.toLong)
  }

  test("q99: the probe detects planted linear signal at 100% accuracy") {
    import spark.implicits._
    // class c = one-hot basis vector e_c plus a small deterministic
    // perturbation on a DIFFERENT coordinate — linearly separable by
    // construction, so nearest-centroid must score every eval vec right
    val vecs = (0L until 200L).map { id =>
      val c = (id % 4).toInt
      val arr = new Array[Float](8)
      arr(c) = 1.0f
      arr(4 + c) = 0.1f * ((id % 7).toInt + 1)
      (id, arr.toSeq, c)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val out = Clustering.linearProbe(df).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(1),
        s"class ${r.getLong(0)}: all eval members must classify correctly")
      assert(r.getLong(3) === 1000L)
    }
  }
}
