package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkEntry, TestSpark}
import graft.cdc.{CdcQueries, Envelope}

/** Streaming SCD2 maintenance (round-13): the incremental fold must equal
  * the q123 batch rebuild after any in-order micro-batching, replay
  * idempotently, read bucket-pruned prior state, and answer q130 lookups
  * off the streamed relation.
  */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def histRows(df: DataFrame) =
    df.select("code", "libram", "valid_from_lsn", "valid_to_lsn", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  private def tmp(): String =
    Files.createTempDirectory("scd2stream").toString

  test("three-batch incremental fold == q123 batch history") {
    val dir = tmp()
    val p0 = Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 0, 20000), 0, dir)
    assert(p0.isEmpty, "first batch has no prior state to read")
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 20000, 40000), 1, dir)
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 40000, 50000), 2, dir)
    val streamed = histRows(Scd2Stream.scd2State(spark, dir))
    val batch = histRows(SparkEntry.queries("q123_scd2_history")(spark, ""))
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("replaying a micro-batch is idempotent") {
    val dir = tmp()
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 0, 2000), 0, dir)
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 2000, 4000), 1, dir)
    val once = histRows(Scd2Stream.scd2State(spark, dir))
    // a retried batch 1 reads the newest manifest strictly below itself
    // (batch 0) and recomputes deterministically
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 2000, 4000), 1, dir)
    assert(histRows(Scd2Stream.scd2State(spark, dir)) === once)
  }

  test("a one-key micro-batch reads only that key's bucket") {
    import spark.implicits._
    val dir = tmp()
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 0, 2000), 0, dir)
    val oneKey = Seq(
      """{"payload": {"before": null, "after": {"code": 7, "libram": "LX"}, "op": "u", "source": {"lsn": 9000000, "ts_ms": 1}, "ts_ms": 1}}""")
      .toDF("value")
    val read = Scd2Stream.scd2IngestBatch(oneKey, 1, dir)
    assert(read.size === 1 && read.head.endsWith("kbkt=7"),
      s"expected only key 7's bucket, read: $read")
    // and the fold over the combined event stream still matches batch
    val all = CdcQueries.scd2SyntheticValues(spark, 0, 2000)
      .unionByName(oneKey)
    assert(histRows(Scd2Stream.scd2State(spark, dir)) ===
      histRows(Envelope.scd2History(Envelope.parse(all))))
  }

  test("q130 lookups answered off the streamed relation") {
    val dir = tmp()
    Seq((0L, 17000L), (17000L, 33000L), (33000L, 50000L)).zipWithIndex
      .foreach { case ((lo, hi), i) =>
        Scd2Stream.scd2IngestBatch(
          CdcQueries.scd2SyntheticValues(spark, lo, hi), i.toLong, dir)
      }
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val offStream = rows(Envelope.scd2Lookup(
      Scd2Stream.scd2State(spark, dir), CdcQueries.scd2Probes(spark)))
    val batch = rows(SparkEntry.queries("q130_scd2_lookup")(spark, ""))
    assert(offStream.nonEmpty && offStream === batch)
  }

  test("streamingScd2Ingest end-to-end via MemoryStream") {
    import spark.implicits._
    val dir = tmp()
    val in = MemoryStream[String](spark)
    val q = Scd2Stream.streamingScd2Ingest(in.toDF().toDF("value"),
      s"$dir/state", s"$dir/ckpt")
    try {
      in.addData(CdcQueries.scd2SyntheticValues(spark, 0, 600)
        .collect().map(_.getString(0)).toSeq)
      q.processAllAvailable()
      in.addData(CdcQueries.scd2SyntheticValues(spark, 600, 1200)
        .collect().map(_.getString(0)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(histRows(Scd2Stream.scd2State(spark, s"$dir/state")) ===
      histRows(Envelope.scd2History(Envelope.parse(
        CdcQueries.scd2SyntheticValues(spark, 0, 1200)))))
  }

  test("pruneScd2States retires superseded batch dirs; state unchanged") {
    val dir = tmp()
    // every batch touches all 500 keys (all 32 buckets), so each batch
    // fully supersedes its predecessor's bucket ownership
    Seq((0L, 2000L), (2000L, 4000L), (4000L, 6000L)).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        Scd2Stream.scd2IngestBatch(
          CdcQueries.scd2SyntheticValues(spark, lo, hi), i.toLong, dir)
    }
    val before = histRows(Scd2Stream.scd2State(spark, dir))
    Scd2Stream.pruneScd2States(spark, dir, keep = 2)
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet
    assert(dirs === Set("batch=1", "batch=2"),
      s"batch=0 is unreferenced by the retained manifests, got $dirs")
    assert(histRows(Scd2Stream.scd2State(spark, dir)) === before)
  }

  test("prune-every-K policy: retention fires inside the ingest, the " +
    "state stays exact, and replaying the policy batch is idempotent") {
    val dir = tmp()
    // five batches under pruneEvery=2 (prunes after batches 2 and 4);
    // every batch touches all keys, so each supersedes its predecessor
    val spans = Seq((0L, 2000L), (2000L, 4000L), (4000L, 6000L),
      (6000L, 8000L), (8000L, 10000L))
    spans.zipWithIndex.foreach { case ((lo, hi), i) =>
      Scd2Stream.scd2IngestWithPolicy(
        CdcQueries.scd2SyntheticValues(spark, lo, hi), i.toLong, dir,
        pruneEvery = 2)
    }
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet
    assert(dirs === Set("batch=3", "batch=4"),
      s"the policy must retire superseded dirs automatically, got $dirs")
    val streamed = histRows(Scd2Stream.scd2State(spark, dir))
    assert(streamed === histRows(Envelope.scd2History(Envelope.parse(
      CdcQueries.scd2SyntheticValues(spark, 0, 10000)))),
      "policy-folded state == batch history over everything ingested")
    // replay batch 4 (a policy batch): the fold resolves its keep>=2
    // replay anchor (batch 3), then prunes again — state unchanged
    Scd2Stream.scd2IngestWithPolicy(
      CdcQueries.scd2SyntheticValues(spark, 8000, 10000), 4L, dir,
      pruneEvery = 2)
    assert(histRows(Scd2Stream.scd2State(spark, dir)) === streamed,
      "replaying the policy batch must be idempotent")
  }

  test("an unknown-format manifest fails with the migration message") {
    val dir = tmp()
    Scd2Stream.scd2IngestBatch(
      CdcQueries.scd2SyntheticValues(spark, 0, 100), 0, dir)
    // corrupt the committed manifest into a headerless (legacy-style) body
    // (drop the local-FS checksum sidecar so the raw rewrite is readable)
    Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/batch=0/._MANIFEST.crc"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch=0/_MANIFEST"),
      "0 0\n1 0\n")
    val e = intercept[IllegalArgumentException] {
      Scd2Stream.scd2State(spark, dir).collect()
    }
    assert(e.getMessage.contains("header"))
  }
}
