package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** q69 beyond the oracle: every PQ code must be the argmin (dist, cid) over
  * that subspace's returned codebook, and qerr must be the exact sum of the
  * chosen centroids' squared distances — i.e. the codes DataFrame and the
  * codebook map are mutually consistent, recomputed driver-side.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001
  private val M = 4
  private val K = 8

  test("codes are the codebook argmin and qerr is exact, per vector") {
    val embs = Tables.embeddings(spark, D)
    val (codebooks, codesDf) = Clustering.pqTrain(embs)
    val codes = codesDf.collect().map { r =>
      r.getLong(0) -> ((0 until M).map(j => r.getInt(1 + j)), r.getLong(1 + M))
    }.toMap

    val vecs = Similarity.asDouble(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(codes.keySet === vecs.keySet)
    val dim = vecs.head._2.length
    val sub = dim / M

    def q(x: Double): Long = math.floor(x * 1000000L + 0.5).toLong
    var sawNonZeroErr = false
    vecs.foreach { case (id, v) =>
      val (cs, qerr) = codes(id)
      var expectedErr = 0L
      (0 until M).foreach { j =>
        val qv = v.slice(j * sub, (j + 1) * sub).map(q)
        val scored = (0 until K).map { cid =>
          val cv = codebooks((j, cid))
          val d = qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, cid)
        }
        val (bestD, bestC) = scored.min
        assert(cs(j) === bestC, s"vec $id subspace $j: code ${cs(j)} != argmin $bestC")
        expectedErr += bestD
      }
      assert(qerr === expectedErr, s"vec $id: qerr $qerr != $expectedErr")
      if (expectedErr > 0) sawNonZeroErr = true
    }
    assert(sawNonZeroErr, "fixture must have non-trivial quantization error")
    assert(codebooks.keySet === (for (j <- 0 until M; c <- 0 until K) yield (j, c)).toSet)
  }

  test("q70: ADC top-k equals a driver-side table-lookup recomputation") {
    val embs = Tables.embeddings(spark, D)
    // pqTrain is deterministic, so this is the same model q70 trains
    val (codebooks, codesDf) = Clustering.pqTrain(embs)
    val codes = codesDf.collect()
      .map(r => r.getLong(0) -> (0 until M).map(j => r.getInt(1 + j))).toMap
    val vecs = Similarity.asDouble(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val sub = vecs.head._2.length / M
    def q(x: Double): Long = math.floor(x * 1000000L + 0.5).toLong
    val qv = vecs(0L).map(q)
    val table = codebooks.map { case ((j, c), cv) =>
      val qs = qv.slice(j * sub, (j + 1) * sub)
      (j, c) -> qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val expected = codes.collect { case (id, cs) if id != 0L =>
      (id, (0 until M).map(j => table((j, cs(j)))).sum)
    }.toSeq.sortBy { case (id, d) => (d, id) }.take(10)

    val got = Clustering.pqSearch(embs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q70/IVF-PQ: ivfPqSearch equals ADC ranking restricted to probed cells") {
    val embs = Tables.embeddings(spark, D)
    val (coarse, assignedDf) = Clustering.kmeans(embs)
    val cells = assignedDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (codebooks, codesDf) = Clustering.pqTrain(embs)
    val codes = codesDf.collect()
      .map(r => r.getLong(0) -> (0 until M).map(j => r.getInt(1 + j))).toMap
    val vecs = Similarity.asDouble(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val sub = vecs.head._2.length / M
    def q(x: Double): Long = math.floor(x * 1000000L + 0.5).toLong
    val qv = vecs(0L).map(q)
    val probed = coarse.toSeq.map { case (cid, cv) =>
      (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
    }.sorted.take(2).map(_._2).toSet
    val table = codebooks.map { case ((j, c), cv) =>
      val qs = qv.slice(j * sub, (j + 1) * sub)
      (j, c) -> qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val expected = codes.collect {
      case (id, cs) if id != 0L && probed(cells(id)) =>
        (id, (0 until M).map(j => table((j, cs(j)))).sum)
    }.toSeq.sortBy { case (id, d) => (d, id) }.take(10)

    val got = Clustering.ivfPqSearch(embs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(expected.nonEmpty, "probed cells must contain candidates")
  }

  test("IVF-PQ index artifact: indexed search equals both train-in-call " +
    "paths, and the search plan never touches a vector column") {
    val embs = Tables.embeddings(spark, D)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Clustering.buildIvfPqIndex(embs, dir)
    val q0 = Similarity.asDouble(embs).filter(col("vec_id") === 0L)
      .collect().head.getSeq[Double](1).toArray

    // probes=0: exhaustive ADC == pqSearch's full ranking
    val exhaustive = Clustering.ivfPqSearchIndexed(spark, dir, q0,
      topK = 10, probes = 0, excludeVecId = 0L)
    assert(exhaustive.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Clustering.pqSearch(embs).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

    // probes=2: cell-pruned ADC == ivfPqSearch's ranking
    val probed = Clustering.ivfPqSearchIndexed(spark, dir, q0,
      topK = 10, probes = 2, excludeVecId = 0L)
    assert(probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Clustering.ivfPqSearch(embs).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

    // the indexed plan reads codes only — no embedding/vector column, no
    // training subtree; the probed variant prunes cell partitions
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("embedding"), "search plan must not read vectors")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("pqEncode against frozen codebooks reproduces pqTrain's codes, and " +
    "codebooks survive a parquet round-trip") {
    val embs = Tables.embeddings(spark, D)
    val (codebooks, codesDf) = Clustering.pqTrain(embs)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Clustering.saveCodebooks(s"$dir/cb.parquet", codebooks, spark)
    val loaded = Clustering.loadCodebooks(s"$dir/cb.parquet", spark)
    assert(loaded.keySet === codebooks.keySet)
    loaded.foreach { case (k, cv) => assert(cv.toSeq === codebooks(k).toSeq, k) }

    val trained = codesDf.collect().map(r => r.toSeq).toSet
    val encoded = Clustering.pqEncode(embs, loaded).collect().map(_.toSeq).toSet
    assert(encoded === trained)
  }

  test("streaming PQ encode over two micro-batches equals batch encode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val embs = Tables.embeddings(spark, D)
    val (codebooks, _) = Clustering.pqTrain(embs)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-stream").toString
    Clustering.saveCodebooks(s"$dir/cb.parquet", codebooks, spark)

    val rows = embs.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val in = MemoryStream[(Long, Seq[Float])](spark)
    val q = Clustering.streamingPqEncode(
      in.toDF().toDF("vec_id", "embedding"),
      s"$dir/cb.parquet", s"$dir/codes", s"$dir/ckpt")
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/codes").drop("batch")
      .collect().map(_.toSeq).toSet
    val batch = Clustering.pqEncode(embs, codebooks).collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
