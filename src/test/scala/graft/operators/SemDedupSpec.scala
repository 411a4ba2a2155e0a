package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Semantic checks for q66 beyond the DuckDB oracle: planted exact
  * duplicates must lose to their higher-id twin, the output must be a
  * partition of the input, and the whole decision must equal a driver-side
  * brute-force reference (same kmeans assignment, same left-to-right cosine
  * fold, same (dist, vec_id) keep order).
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001
  private val T = 4500

  private def embs: DataFrame = Tables.embeddings(spark, D)

  test("planted exact duplicates: the lower-id twin is always dropped") {
    import spark.implicits._
    // copy 5 vectors to fresh ids above the fixture range
    val base = embs
    val twins = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    val out = Clustering.semDedup(base.unionByName(twins), T)
      .select("vec_id", "kept").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(out(id) === 0L,
        s"original $id must be dropped: its identical twin ${id + 100000L} " +
          "has the same dist and a greater vec_id")
    }
    assert(out.count(_._2 == 1L) > 0, "something must survive")
  }

  // driver-side brute-force reference at a given k: reuse the distributed
  // trainer's assignment (its own equality with sequential Lloyd is
  // ClusteringSpec's job), then decide drops with a plain quadratic loop
  private def bruteForce(corpus: DataFrame, k: Int)
  : Map[Long, (Int, Long, Long)] = {
    val (_, assigned) = Clustering.kmeans(corpus, k)
    val byId = Similarity.asDouble(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def cosX1e4(a: Array[Double], b: Array[Double]): Long = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      math.floor(dab / (math.sqrt(daa) * math.sqrt(dbb)) * 10000 + 0.5).toLong
    }
    rows.map { case (id, cid, dist) =>
      val dropped = rows.exists { case (rid, rcid, rdist) =>
        rcid == cid && (rdist > dist || (rdist == dist && rid > id)) &&
          cosX1e4(byId(id), byId(rid)) >= T
      }
      id -> ((cid, dist, if (dropped) 0L else 1L))
    }.toMap
  }

  private def assertMatchesBruteForce(corpus: DataFrame, k: Int): Unit = {
    val result = Clustering.semDedup(corpus, T, k = k)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expected = bruteForce(corpus, k)
    assert(result.keySet === expected.keySet, "output must partition the input")
    val diff = expected.collect { case (id, e) if result(id) != e => (id, e, result(id)) }
    assert(diff.isEmpty, s"k=$k mismatches: ${diff.take(5).toList}")
    assert(expected.values.exists(_._3 == 0L), s"k=$k must exercise drops")
  }

  test("q66 equals a driver-side brute-force reference on sf0.001") {
    // k=8 is also what the corpus-derived default resolves to at the
    // fixture's 500 vectors (ceil(500/64)), i.e. exactly q66's oracle run
    assertMatchesBruteForce(embs, 8)
  }

  test("decision-equality holds at two other k, and planted twins are " +
    "dropped regardless of k") {
    import spark.implicits._
    val twins = embs.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = embs.unionByName(twins)
    Seq(4, 16).foreach { k =>
      assertMatchesBruteForce(corpus, k)
      // an exact twin shares its cluster at ANY k (identical embedding =>
      // identical argmin), so the lower-id original always loses
      val out = Clustering.semDedup(corpus, T, k = k)
        .select("vec_id", "kept").as[(Long, Long)].collect().toMap
      (0L until 5L).foreach { id =>
        assert(out(id) === 0L, s"k=$k: original $id must be dropped")
      }
    }
  }

  test("sampled training (the q66 catalog path) still drops every planted " +
    "twin and partitions the input") {
    import spark.implicits._
    val twins = embs.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = embs.unionByName(twins)
    val out = Clustering.semDedup(corpus, T, sampleFraction = 0.25)
      .select("vec_id", "kept").as[(Long, Long)].collect().toMap
    assert(out.size === corpus.count(), "full corpus assigned despite " +
      "sampled training")
    // identical embeddings share a cluster under ANY centroid set, so the
    // keep rule fires regardless of which rows trained the centroids
    (0L until 5L).foreach { id =>
      assert(out(id) === 0L, s"sampled training: original $id must drop")
    }
    assert(out.count(_._2 == 1L) > 0, "something must survive")
  }

  test("corpus-derived k default scales with the corpus") {
    // 500 fixture vectors / target 64 => 8; explicit k overrides
    val derived = Clustering.semDedup(embs, T)
      .select(max(col("cid"))).collect()(0).getInt(0)
    assert(derived <= 7, "derived k=8 => cluster ids in [0, 8)")
    val explicit = Clustering.semDedup(embs, T, k = 4)
      .select(max(col("cid"))).collect()(0).getInt(0)
    assert(explicit <= 3, "explicit k=4 => cluster ids in [0, 4)")
  }
}
