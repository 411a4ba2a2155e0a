package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Pins the prefix filter's SCALE claim, not just its correctness: on a
  * corpus replicated 10x with distinct content (GrowthSmoke.replicate —
  * same pair structure per replica, zero shared shingles across
  * replicas), qualifying pairs must grow EXACTLY 10x and candidates
  * ~linearly. An all-pairs-shaped regression would grow candidates ~100x
  * and fail loudly here long before a 100 TB corpus does.
  */
class GrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("10x distinct-content replication grows containment pairs exactly " +
    "10x and candidates ~linearly") {
    val base = Dedup.withPlantedExcerpts(
      Tables.documents(spark, TestSpark.SF0001).select("doc_id", "text"))
    def measure(scale: Int): (Long, Long) = {
      val corpus = GrowthSmoke.replicate(base, scale)
      val sh = Dedup.hashedShingles(corpus).persist()
      val cand = Dedup.containmentCandidates(sh, 900).count()
      val pairs = Dedup.containmentPairsFromHashed(sh, 900, 800,
        cache = false).count()
      sh.unpersist()
      (cand, pairs)
    }
    val (cand1, pairs1) = measure(1)
    val (cand10, pairs10) = measure(10)
    assert(pairs1 > 0, "fixture must exercise containment pairs")
    assert(pairs10 === 10 * pairs1,
      s"replicas share no shingles, so pairs must be exactly 10x: " +
        s"$pairs10 vs 10*$pairs1")
    assert(cand10 <= 15L * cand1,
      s"candidates must stay ~linear (all-pairs would be ~100x): " +
        s"$cand10 vs $cand1")
  }

  test("10x replication grows the near-dup graph linearly and PageRank " +
    "treats isomorphic replicas identically") {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
    def measure(scale: Int): (Long, Long) = {
      val corpus = GrowthSmoke.replicate(base, scale)
      val pairs = Dedup.jaccardPairsLshVerified(corpus, 800, cache = false)
      (pairs.count(), Dedup.nearDupClusters(corpus, 800, cache = false).count())
    }
    val (p1, l1) = measure(1)
    val (p10, l10) = measure(10)
    assert(p1 > 0 && p10 === 10 * p1,
      s"replicas share no shingles: pairs must be exactly 10x ($p10 vs 10*$p1)")
    assert(l10 === 10 * l1,
      s"labeled docs must be exactly 10x ($l10 vs 10*$l1)")
    // isomorphism invariance: within one 10x run, every replica's rank
    // multiset equals replica 0's — PageRank sees identical subgraphs
    val corpus = GrowthSmoke.replicate(base, 10)
    val pr = Dedup.pageRank(corpus.select("doc_id"),
      Dedup.jaccardPairsLshVerified(corpus, 800, cache = false)
        .select("d1", "d2"), iters = 3).persist()
    def multiset(r: Int) = pr
      .filter(col("doc_id") >= r * 10000000L &&
        col("doc_id") < (r + 1) * 10000000L)
      .groupBy("deg", "rank_x1e12").count()
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val m0 = multiset(0)
    assert(m0.nonEmpty && multiset(5) === m0 && multiset(9) === m0,
      "isomorphic replicas must carry identical (deg, rank) multisets")
    pr.unpersist()
  }

  test("chunk family: 10x replication never merges chunks across replicas " +
    "and grows savings/profile masses exactly 10x") {
    import org.apache.spark.sql.functions._
    // q114: replica tokens are suffixed, so boundary draws DIFFER per
    // replica and the report row count is only ~linear — the exact claim
    // is zero cross-replica chunk identity: the 10x report is the
    // disjoint union of the per-replica reports (an accidental shared
    // chunk value would merge rows and break the sum)
    val base = Dedup.withPlantedExcerpts(
      Tables.documents(spark, TestSpark.SF0001).select("doc_id", "text"))
    val corpus10 = GrowthSmoke.replicate(base, 10).persist()
    val total = ChunkDedup.cdcChunks(corpus10).count()
    val per = (0 until 10).map { r =>
      ChunkDedup.cdcChunks(corpus10.filter(
        col("doc_id") >= lit(r * 10000000L) &&
          col("doc_id") < lit((r + 1) * 10000000L))).count()
    }
    assert(per.forall(_ > 0) && total === per.sum,
      s"10x chunk report must be the disjoint union of replica reports: " +
        s"$total vs $per")
    corpus10.unpersist()
    // q115/q122: cluster structure is isomorphic per replica (shingle
    // equality is preserved by the per-replica token bijection) and
    // doc_id % 10 source assignment is invariant under the +r*1e7 shift,
    // so every per-source savings field and every histogram mass grows
    // EXACTLY 10x
    val raw = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
    def measure(scale: Int): (Map[String, Seq[Long]], Map[Long, Seq[Long]]) = {
      val rep = GrowthSmoke.replicate(raw, scale)
        .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(10L))))
        .persist()
      val labels = Dedup.nearDupClusters(rep.select("doc_id", "text"), 800,
        cache = false).persist()
      val sav = ChunkDedup.dedupSavings(rep, labels).collect()
        .map(r => r.getString(0) -> (1 to 7).map(r.getLong).toSeq).toMap
      val prof = ChunkDedup.clusterProfile(rep.select("doc_id", "text"), labels)
        .collect().map(r => r.getLong(0) -> (1 to 3).map(r.getLong).toSeq).toMap
      labels.unpersist(); rep.unpersist()
      (sav, prof)
    }
    val (sav1, prof1) = measure(1)
    val (sav10, prof10) = measure(10)
    assert(sav10.keySet === sav1.keySet && sav1.nonEmpty)
    sav1.foreach { case (src, v1) =>
      assert(sav10(src) === v1.map(_ * 10),
        s"source $src savings must grow exactly 10x: ${sav10(src)} vs $v1")
    }
    assert(prof10.keySet === prof1.keySet && prof1.keySet.size > 1)
    prof1.foreach { case (size, v1) =>
      assert(prof10(size) === v1.map(_ * 10),
        s"size-$size histogram mass must grow exactly 10x: " +
          s"${prof10(size)} vs $v1")
    }
  }

  test("streaming ingest probe I/O stays flat: a one-doc batch reads its " +
    "own bucket coverage per prior dir, and compaction resets the growth") {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-growth-probe").toString
    def oneDoc(b: Int) = base.orderBy("doc_id").limit(1)
      .select((col("doc_id") + lit(b * 10000000L + 5000000L)).as("doc_id"),
        col("text"))
    Curation.nearDupIngestBatch(base, 0L, s"$dir/index", s"$dir/pairs", 800)
    def allBandDirs(upTo: Long) = Curation.prunedBatchPaths(
      spark, s"$dir/index/bands", upTo, "bb", (0L until 32L).toSet)
    val reads = (1 to 4).map { b =>
      if (b == 4)
        Curation.compactIncrementalIndex(spark, s"$dir/index", b.toLong)
      val (bandPaths, _) = Curation.nearDupIngestBatch(oneDoc(b), b.toLong,
        s"$dir/index", s"$dir/pairs", 800)
      (bandPaths.size, allBandDirs(b.toLong).size)
    }
    // every batch's probe is a strict subset of the index dirs (a one-doc
    // delta covers <= 16 of 32 band buckets)
    reads.foreach { case (read, total) =>
      assert(read > 0 && read < total,
        s"one-doc probe must read a strict subset: $read of $total") }
    // growth across batches comes ONLY from the prior one-doc dirs: each
    // adds at most the batch-1 coverage again
    val perBatch = reads.head._1
    assert(reads(1)._1 <= 2 * perBatch && reads(2)._1 <= 3 * perBatch,
      s"per-batch probe growth must be bounded by prior delta dirs: $reads")
    // compaction before batch 4 collapses the accumulated dirs back to
    // the batch-1 shape — the flat long-running-stream posture
    assert(reads(3)._1 === perBatch,
      s"post-compaction probe must equal the batch-1 read: $reads")
  }
}
