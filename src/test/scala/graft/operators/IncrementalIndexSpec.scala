package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** The bucketed persisted-index layout behind the streaming near-dup and
  * containment ingests: a micro-batch's probe must enumerate (and read)
  * ONLY the bucket directories its own probe keys hash into — per-batch
  * I/O scales with the delta, not with the accumulated corpus. Pair
  * EQUALITY with the whole-corpus result is pinned separately in
  * StreamingSpec; this spec pins the file-pruning claim itself, which is
  * what makes a long-running 100 TB stream viable.
  */
class IncrementalIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ckpt(): String =
    Files.createTempDirectory("graft-iidx-ckpt").toString

  /** Ingest the sf0.001 corpus as batch 0 and one single document as
    * batch 1, returning the index dir.
    */
  private def runTwoBatches(
      start: (org.apache.spark.sql.DataFrame, String, String, String) =>
        org.apache.spark.sql.streaming.StreamingQuery,
      single: (Long, String)): String = {
    import spark.implicits._
    val corpus = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dir = Files.createTempDirectory("graft-iidx").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = start(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", ckpt())
    try {
      in.addData(corpus); q.processAllAvailable()
      in.addData(Seq(single)); q.processAllAvailable()
    } finally q.stop()
    s"$dir/index"
  }

  /** Assert the pruned enumeration for `bkts` is non-empty and a STRICT
    * subset of the full index listing, at both the directory and the
    * parquet-file level.
    */
  private def assertStrictSubset(postDir: String, bkCol: String,
                                 bkts: Set[Long]): Unit = {
    assert(bkts.size < Curation.IDX_BUCKETS,
      s"fixture must leave headroom to prune: delta covers ${bkts.size} buckets")
    val pruned = Curation.prunedBatchPaths(spark, postDir, 1L, bkCol, bkts)
    val all = Curation.prunedBatchPaths(spark, postDir, 1L, bkCol,
      (0L until Curation.IDX_BUCKETS).toSet)
    assert(pruned.nonEmpty, "the delta's buckets must exist in the index")
    assert(pruned.toSet.subsetOf(all.toSet) && pruned.size < all.size,
      s"probe must enumerate a strict subset of bucket dirs: " +
        s"${pruned.size} of ${all.size}")
    val prunedFiles = spark.read.option("basePath", postDir)
      .parquet(pruned: _*).inputFiles.toSet
    val allFiles = spark.read.parquet(postDir).inputFiles.toSet
    assert(prunedFiles.subsetOf(allFiles) && prunedFiles.size < allFiles.size,
      s"probe must READ a strict subset of index files: " +
        s"${prunedFiles.size} of ${allFiles.size}")
  }

  test("near-dup ingest: a single-doc delta probes a strict subset of the " +
    "band-bucket index files") {
    import spark.implicits._
    val single = (100001L, "a perfectly ordinary probe document about rivers")
    val idx = runTwoBatches(Curation.streamingNearDupIngest(_, _, _, _), single)
    // recompute batch 1's band-bucket set exactly as the ingest does
    val bbs = Dedup.bandBuckets(
        Dedup.nearDupIndex(Seq(single).toDF("doc_id", "text"))
          .select("doc_id", "sig"), carrySig = false)
      .select(pmod(col("bh"), lit(Curation.IDX_BUCKETS)).as("bb"))
      .distinct().collect().map(_.getLong(0)).toSet
    assertStrictSubset(s"$idx/bands", "bb", bbs)
  }

  test("containment ingest: a single-doc delta probes a strict subset of " +
    "the shingle-bucket index files") {
    import spark.implicits._
    val single = (100001L, "a perfectly ordinary probe document about rivers")
    val idx = runTwoBatches(
      Curation.streamingContainmentIngest(_, _, _, _), single)
    val sbkts = Dedup.containmentIndex(Seq(single).toDF("doc_id", "text"))
      .select(explode(col("sh")).as("shingle"))
      .select(pmod(col("shingle"), lit(Curation.IDX_BUCKETS)).as("sbkt"))
      .distinct().collect().map(_.getLong(0)).toSet
    assertStrictSubset(s"$idx/post", "sbkt", sbkts)
  }

  test("a missing index dir means first-batch-empty, but an unreadable one " +
    "fails loudly instead of silently dropping cross-batch pairs") {
    val missing = Files.createTempDirectory("graft-iidx-none").toString + "/nope"
    assert(Curation.prunedBatchPaths(spark, missing, 5L, "bb",
      Set(0L, 1L)).isEmpty)
    // a FILE where the directory should be is corruption, not first-batch
    val asFile = Files.createTempFile("graft-iidx-file", ".parquet")
    intercept[Exception] {
      Curation.prunedBatchPaths(spark, asFile.toString, 5L, "bb", Set(0L))
    }
  }
}
