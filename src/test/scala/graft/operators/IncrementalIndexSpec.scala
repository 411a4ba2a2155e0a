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

  test("compaction merges batch dirs into one, and a post-compaction " +
    "ingest still finds exactly the cross-batch pairs") {
    import spark.implicits._
    val all = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // three batches: thirds by doc_id mod 3; stream the first two, then
    // compact, then ingest the third through the factored batch body
    val parts = all.groupBy(_._1 % 3)
    val dir = Files.createTempDirectory("graft-iidx-cmp").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = Curation.streamingNearDupIngest(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", ckpt())
    try {
      in.addData(parts(0L)); q.processAllAvailable()
      in.addData(parts(1L)); q.processAllAvailable()
    } finally q.stop()
    Curation.compactIncrementalIndex(spark, s"$dir/index", 2L)
    def batchDirs(rel: String) =
      new java.io.File(s"$dir/index/$rel").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).sorted.toSeq
    assert(batchDirs("docs") === Seq("batch=0") &&
      batchDirs("bands") === Seq("batch=0"),
      "compaction must leave exactly one batch dir per relation")
    Curation.nearDupIngestBatch(parts(2L).toDF("doc_id", "text"), 2L,
      s"$dir/index", s"$dir/pairs", 800)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "jaccard_x1e3").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = pairsOf(spark.read.parquet(s"$dir/pairs"))
    val full = pairsOf(Dedup.jaccardPairsLshVerified(
      all.toDF("doc_id", "text"), 800, cache = false))
    assert(full.nonEmpty && got === full,
      "pairs union across compaction must equal the whole-corpus result")
  }

  test("compaction crash recovery: tmp-before-commit is rolled back, " +
    "tmp-after-commit is published") {
    import spark.implicits._
    val all = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (evens, odds) = all.partition(_._1 % 2 == 0)
    def ingested(): String = {
      val dir = Files.createTempDirectory("graft-iidx-crash").toString
      val in = MemoryStream[(Long, String)](spark)
      val q = Curation.streamingNearDupIngest(in.toDF().toDF("doc_id", "text"),
        s"$dir/index", s"$dir/pairs", ckpt())
      try {
        in.addData(evens); q.processAllAvailable()
        in.addData(odds); q.processAllAvailable()
      } finally q.stop()
      dir
    }
    def rowCount(dir: String): Long =
      spark.read.option("basePath", s"$dir/index/bands")
        .parquet(s"$dir/index/bands").count()
    // window 1: compaction died BEFORE the commit marker — a stray tmp
    // must be discarded, originals stay authoritative
    val d1 = ingested()
    val before = rowCount(d1)
    val bands1 = new java.io.File(s"$d1/index/bands")
    val tmp1 = new java.io.File(bands1, ".compact-tmp")
    assert(tmp1.mkdir())
    // a read triggers recovery via prunedBatchPaths
    assert(Curation.prunedBatchPaths(spark, s"$d1/index/bands", 2L, "bb",
      (0L until Curation.IDX_BUCKETS).toSet).nonEmpty)
    assert(!tmp1.exists(), "uncommitted tmp must be rolled back")
    assert(rowCount(d1) === before)
    // window 2: compaction died AFTER committing (marker present, originals
    // deleted, tmp not yet published) — recovery must publish tmp
    val d2 = ingested()
    val total = rowCount(d2)
    val bands2 = new java.io.File(s"$d2/index/bands")
    // manufacture the committed state: merge by hand into tmp
    val merged = spark.read.option("basePath", s"$d2/index/bands")
      .parquet(s"$d2/index/bands").drop("batch")
    merged.write.mode("overwrite").partitionBy("bb")
      .parquet(s"$d2/index/bands/.compact-tmp")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d2/index/bands/.compact-commit"), "2\n")
    new java.io.File(bands2, "batch=0").listFiles().foreach(deleteRec)
    deleteRec(new java.io.File(bands2, "batch=0"))
    deleteRec(new java.io.File(bands2, "batch=1"))
    assert(Curation.prunedBatchPaths(spark, s"$d2/index/bands", 2L, "bb",
      (0L until Curation.IDX_BUCKETS).toSet).nonEmpty)
    assert(new java.io.File(bands2, "batch=0").exists() &&
      !new java.io.File(bands2, ".compact-tmp").exists() &&
      !new java.io.File(bands2, ".compact-commit").exists())
    assert(rowCount(d2) === total, "published compacted rows must equal the originals")
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
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
