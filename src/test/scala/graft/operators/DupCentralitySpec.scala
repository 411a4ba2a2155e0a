package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q101 duplication centrality: the distributed integer PageRank must match
  * a driver-side sequential replay of the same recurrence bit for bit, and
  * the rank must actually order duplication structure — a template hub above
  * its spokes, connected docs above isolated ones.
  */
class DupCentralitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val SCALE = 1000000000000L

  /** Sequential replay of dupCentrality's integer recurrence. */
  private def seqPageRank(nodes: Seq[Long], pairs: Seq[(Long, Long)],
                          iters: Int): Map[Long, (Long, Long)] = {
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    val r0 = SCALE / n
    val base = 15L * r0 / 100L
    var r = nodes.map(_ -> r0).toMap
    (1 to iters).foreach { _ =>
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(u => u -> (base + 85L * inflow.getOrElse(u, 0L) / 100L)).toMap
    }
    nodes.map(u => u -> ((deg.getOrElse(u, 0L), r(u)))).toMap
  }

  private def runPageRank(nodes: Seq[Long], pairs: Seq[(Long, Long)],
                          iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.pageRank(nodes.toDF("doc_id"), pairs.toDF("d1", "d2"), iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("pageRank matches the sequential integer recurrence exactly") {
    // star (1 hub, 4 spokes) + a mutual pair + an isolated node
    val nodes = (1L to 8L)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
    for (iters <- Seq(1, 3)) {
      assert(runPageRank(nodes, pairs, iters) === seqPageRank(nodes, pairs, iters),
        s"iters=$iters")
    }
  }

  test("pageRank local fast path == forced-distributed path, rank for rank") {
    import spark.implicits._
    val nodes = (1L to 8L)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
    def run(gate: Long) =
      Dedup.pageRank(nodes.toDF("doc_id"), pairs.toDF("d1", "d2"), 3, gate)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(Long.MaxValue) === run(-1L))
  }

  test("rank orders duplication structure: hub > spoke > pair member > isolate base") {
    val nodes = (1L to 8L)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
    val r = runPageRank(nodes, pairs, 3)
    val base = 15L * (SCALE / 8L) / 100L
    assert(r(1L)._2 > r(2L)._2, "hub above spoke")
    assert(r(6L)._2 > r(8L)._2, "pair member above isolate")
    assert(r(8L) === ((0L, base)), "isolate keeps base rank, deg 0")
    // spokes are symmetric: identical ranks
    assert(Set(r(2L), r(3L), r(4L), r(5L)).size === 1)
  }

  test("dupCentrality end-to-end: template-hub corpus through the curation index") {
    import spark.implicits._
    // Hub = 40 distinct tokens; each spoke appends 8 spoke-unique tokens:
    // J(hub, spoke) = 38/46 ~ 0.826 >= 0.8 at shingle level, while
    // J(spoke_i, spoke_j) = 38/54 ~ 0.70 < 0.8 — a star, not a clique.
    val hubToks = (1 to 40).map(i => s"t$i")
    val hub = hubToks.mkString(" ")
    val spokes = (1 to 4).map { s =>
      (10L + s, (hubToks ++ (1 to 8).map(i => s"x${s}_$i")).mkString(" "))
    }
    val docs = (Seq((1L, hub), (90L, "lone wolf document completely unrelated " +
      "to every other text in this tiny corpus")) ++ spokes)
      .toDF("doc_id", "text")
    val idx = DedupArtifacts.buildCurationIndex(docs, 900)
    val got = Dedup.dupCentrality(docs, idx, 800, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = seqPageRank(
      Seq(1L, 11L, 12L, 13L, 14L, 90L),
      Seq((1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L)), 3)
    assert(got === expected,
      "verified near-dup edges must form exactly the planted star and " +
        "ranks must replay the sequential recurrence")
    assert(got(1L)._1 === 4L && got(1L)._2 > got(11L)._2,
      "the template hub carries the highest centrality")
  }

  test("local and distributed paths agree when pair endpoints fall " +
    "OUTSIDE the node relation (ADVICE r11: divergence from iteration 2)") {
    import spark.implicits._
    // node 99 is an edge endpoint but NOT in nodes0: the distributed
    // path routes rank through nodes0 only, yet node 2's out-degree
    // still counts its edge to 99 — the local path must reproduce both
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 99L), (1L, 3L)).toDF("d1", "d2")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val local = rows(Dedup.pageRank(nodes, pairs, iters = 3,
      localMaxEdges = 1000000L))
    val dist = rows(Dedup.pageRank(nodes, pairs, iters = 3,
      localMaxEdges = -1L))
    assert(local === dist,
      s"gate-dependent results on out-of-node endpoints:\n$local\nvs\n$dist")
    // and the out-degree of node 2 counts the edge to the outside node
    assert(local.find(_._1 == 2L).get._2 === 2L)
  }
}
