package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.cdc.Fixtures
import graft.store.InMemoryStore

/** Structured Streaming parity (SURVEY.md s3.3, s2.5 E-8): the continuous
  * invalidation consumer, the keyed latest-state view, and watermarked
  * event analytics — all through MemoryStream, no broker.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ckpt() = Files.createTempDirectory("graft-ckpt").toString

  test("streaming invalidation query DELs exactly the changed keys") {
    import spark.implicits._
    val store = new InMemoryStore
    Seq("5", "14", "17", "99").foreach(k => store.put(k, s"row-$k"))

    val in = MemoryStream[String](spark)
    val q = Pipeline.invalidationQuery(in.toDF().toDF("value"), store, ckpt())
    try {
      in.addData(Fixtures.changeLog.map(_.orNull).filter(_ != null))
      q.processAllAvailable()
      // tombstone/malformed skipped; inserts don't invalidate; 5/14/17 DEL'd
      assert(store.get("5").isEmpty && store.get("14").isEmpty && store.get("17").isEmpty)
      assert(store.get("99").isDefined)
    } finally q.stop()
  }

  test("StoreClientFactory seam: factory survives serialization and resolves the store") {
    import graft.store.SharedStores
    val store = new InMemoryStore
    store.put("k", "v")
    val factory = SharedStores.register(store)
    // The sink closure ships to executors — the factory must round-trip
    // java serialization carrying only its id, then resolve in this JVM.
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(factory); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[graft.store.StoreClientFactory]
    assert(back.client().get("k").contains("v"))
    back.client().del("k")
    assert(store.get("k").isEmpty)
  }

  test("keyed latest-state stream: max-lsn row wins, delete tombstones") {
    import spark.implicits._
    val in = MemoryStream[String](spark)
    val q = Pipeline.latestStateQuery(spark, in.toDF().toDF("value"), ckpt(), "latest_state_t")
    try {
      in.addData(Fixtures.changeLog.map(_.orNull).filter(_ != null))
      q.processAllAvailable()
      val rows = spark.table("latest_state_t")
        .select("code", "lsn", "deleted").as[(Long, Long, Boolean)]
        .collect().groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      assert(rows(5L)._3 === false)   // insert+update, alive
      assert(rows(14L)._3 === false)  // update, alive
      assert(rows(17L)._3 === true)   // deleted
    } finally q.stop()
  }

  test("watermarked tumbling window aggregates by hour and drops late data") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = EventPipelines.hourlyByType(events)
      .writeStream.format("memory").queryName("hourly_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      in.addData((t("2024-01-01 10:05:00"), "click", 1.0),
                 (t("2024-01-01 10:55:00"), "click", 2.0),
                 (t("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far past 10:00-11:00 so that window closes
      in.addData((t("2024-01-01 13:00:00"), "click", 4.0))
      q.processAllAvailable()
      // late arrival for the closed 10:00 window must be dropped
      in.addData((t("2024-01-01 10:30:00"), "click", 99.0))
      q.processAllAvailable()
      in.addData((t("2024-01-01 15:00:00"), "click", 5.0))
      q.processAllAvailable()
      val closed = spark.table("hourly_t")
        .filter(col("window_start") === t("2024-01-01 10:00:00"))
        .select("event_type", "n", "sum_value")
        .as[(String, Long, Double)].collect().toSeq
      assert(closed === Seq(("click", 2L, 3.0)), s"late row leaked: $closed")
    } finally q.stop()
  }

  test("file-source mode drives the same invalidation plan (offline S-2 stand-in)") {
    val store = new InMemoryStore
    Seq("5", "14", "17", "99").foreach(k => store.put(k, s"row-$k"))
    val dir = Files.createTempDirectory("graft-cdc-files")
    Files.writeString(dir.resolve("batch-0.jsonl"),
      Fixtures.changeLog.flatten.mkString("", "\n", "\n"))
    val q = Pipeline.invalidationQuery(
      Pipeline.fileRecords(spark, dir.toString), store, ckpt())
    try {
      q.processAllAvailable()
      assert(store.get("5").isEmpty && store.get("14").isEmpty && store.get("17").isEmpty)
      assert(store.get("99").isDefined)
    } finally q.stop()
  }

  test("driver contract: entry() returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("stream-stream interval join attributes purchases to in-window clicks only") {
    import spark.implicits._
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val purchases = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = EventPipelines.purchaseAttribution(
        clicks.toDF().toDF("user_id", "ts"),
        purchases.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("attrib_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      clicks.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 08:00:00")))
      purchases.addData(
        (1L, t("2024-01-01 10:30:00"), 5.0),  // 30 min after user-1 click -> match
        (2L, t("2024-01-01 10:30:00"), 7.0))  // 2.5h after user-2 click -> no match
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((9L, t("2024-01-01 15:00:00")))
      purchases.addData((9L, t("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_t")
        .select("user_id", "purchase_value")
        .as[(Long, Double)].collect().toSeq.filter(_._1 <= 2)
      assert(rows === Seq((1L, 5.0)), s"got $rows")
    } finally q.stop()
  }

  test("session windows close after the 30-minute gap") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)](spark)
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = EventPipelines.userSessions(events)
      .writeStream.format("memory").queryName("sessions_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // user 1: two bursts separated by > 30 min -> two sessions
      in.addData((t("2024-01-01 10:00:00"), 1L, 1.0),
                 (t("2024-01-01 10:10:00"), 1L, 2.0),
                 (t("2024-01-01 11:30:00"), 1L, 3.0))
      q.processAllAvailable()
      in.addData((t("2024-01-01 15:00:00"), 2L, 9.0)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sessions_t")
        .filter(col("user_id") === 1L)
        .select("n_events", "session_value")
        .as[(Long, Double)].collect().toSeq.sortBy(_._1)
      assert(sessions === Seq((1L, 3.0), (2L, 3.0)),
        s"expected two closed sessions, got $sessions")
    } finally q.stop()
  }

  test("batch gap-sessionization (q55) agrees with session_window on the full fixture") {
    // same 30-minute gap semantics: session_window merges an event iff it
    // lands strictly before prev-session end (= last ts + gap), the batch
    // lag form starts a new session iff diff >= gap. Keys AND extents must
    // match: (user, start, end+gap, n) from q55 == session_window output.
    val ev = graft.sources.Tables.events(spark, TestSpark.SF0001)
    val fromWindow = EventPipelines.userSessions(ev)
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val fromLag = EventPipelines.sessionizeBatch(ev)
      .select(col("user_id"), col("start_us"),
        (col("end_us") + 30L * 60 * 1000000).as("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fromLag == fromWindow,
      s"lag-based and session_window sessions diverge: ${(fromLag diff fromWindow).take(3)} / ${(fromWindow diff fromLag).take(3)}")
    assert(fromLag.size > 500, "fixture should produce many sessions")
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions equal to the q55 batch form") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)](spark)
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = EventPipelines.sessionizeStateful(events)
      .writeStream.format("memory").queryName("fmgws_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      val feed = Seq(
        (t("2024-01-01 10:00:00"), 1L, 1.5),   // user 1, session A
        (t("2024-01-01 10:10:00"), 1L, 2.25),  // extends A
        (t("2024-01-01 11:30:00"), 1L, 3.0),   // > 30 min gap -> session B
        (t("2024-01-01 10:05:00"), 2L, 7.0))   // user 2, one session
      in.addData(feed: _*)
      q.processAllAvailable()
      // advance the watermark far past every open session's gap
      in.addData((t("2024-01-02 00:00:00"), 9L, 0.0))
      q.processAllAvailable()
      val got = spark.table("fmgws_t")
        .filter(col("user_id") <= 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val expected = EventPipelines.sessionizeBatch(
        feed.toDF("ts", "user_id", "value")
          .withColumn("event_id", monotonically_increasing_id()))
        .select("user_id", "start_us", "end_us", "n_events", "value_x1e4")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == expected,
        s"custom-state sessions diverge from batch: $got vs $expected")
      assert(got.size == 3, "two user-1 sessions and one user-2 session")
    } finally q.stop()
  }

  test("stateful sessionizer extends start_us for late-but-within-watermark merges") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)](spark)
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = EventPipelines.sessionizeStateful(events)
      .writeStream.format("memory").queryName("fmgws_late_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1: the session opens at 10:20; a sibling event pushes the
      // watermark to 10:15 (10 min behind 10:25)
      in.addData((t("2024-01-01 10:20:00"), 1L, 1.0),
                 (t("2024-01-01 10:25:00"), 8L, 0.0))
      q.processAllAvailable()
      // batch 2: a LATE user-1 event at 10:17 — after the open session's
      // start, before its watermark cutoff: it must merge AND lower start_us
      in.addData((t("2024-01-01 10:17:00"), 1L, 2.0))
      q.processAllAvailable()
      in.addData((t("2024-01-02 00:00:00"), 9L, 0.0)) // flush via timeout
      q.processAllAvailable()
      val s1 = spark.table("fmgws_late_t").filter(col("user_id") === 1L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      def us(x: String) = Timestamp.valueOf(x).getTime * 1000L
      assert(s1.toSeq == Seq((us("2024-01-01 10:17:00"), us("2024-01-01 10:20:00"), 2L)),
        s"late merge must extend the session start: ${s1.toSeq}")
    } finally q.stop()
  }

  test("stateful sessionizer survives a per-user lag deeper than watermark + gap") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)](spark)
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = EventPipelines.sessionizeStateful(events)
      .writeStream.format("memory").queryName("fmgws_lag_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 advances the watermark to 11:50
      in.addData((t("2024-01-01 12:00:00"), 8L, 0.0))
      q.processAllAvailable()
      // batch 2: user 1's whole session predates (watermark - gap). Its
      // natural timeout (10:00 + 30 min) would be in the watermark's PAST;
      // FlatMapGroupsWithStateExec drops watermark-late rows before the
      // state function under EventTimeTimeout, so the row never reaches
      // setTimeoutTimestamp — and the clamp covers the remaining paths.
      // Either way the QUERY MUST SURVIVE (processAllAvailable rethrows
      // stream failures) instead of dying in a supervised restart loop.
      in.addData((t("2024-01-01 10:00:00"), 1L, 4.0))
      q.processAllAvailable()
      in.addData((t("2024-01-02 00:00:00"), 9L, 0.0))
      q.processAllAvailable()
      val s1 = spark.table("fmgws_lag_t").filter(col("user_id") === 1L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(s1.isEmpty,
        s"watermark-late rows are dropped, not sessionized: ${s1.toSeq}")
      assert(q.isActive, "deep-lag input must not kill the query")
    } finally q.stop()
  }

  test("chunking runs unchanged as a streaming transform (same plan fragment as q47)") {
    import spark.implicits._
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = graft.operators.Prep.chunkTransform(docs)
      .writeStream.format("memory").queryName("chunk_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      val text33 = (1 to 33).map(i => s"w$i").mkString(" ") // 2 chunks
      val text10 = (1 to 10).map(i => s"w$i").mkString(" ") // 1 chunk
      in.addData((7L, text33), (8L, text10))
      q.processAllAvailable()
      val rows = spark.table("chunk_t")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet
      assert(rows === Set((7L, 0, 33L), (7L, 1, 1L), (8L, 0, 10L)))
      // the streaming rows carry the same fingerprints the batch form gives
      val batch = graft.operators.Prep.chunkTransform(
        Seq((7L, text33), (8L, text10)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(4))).toSet
      val streamed = spark.table("chunk_t")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(4))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("HLL registers maintained by a stream equal the batch sketch (mergeable state)") {
    import spark.implicits._
    import graft.operators.Sketches
    val in = MemoryStream[Long](spark)
    val users = in.toDF().toDF("user_id")
    // the SAME single-aggregation fragment runs under readStream: complete
    // mode re-emits the <=64-row register table each trigger
    val q = Sketches.hllRegisters(users, col("user_id"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").option("checkpointLocation", ckpt()).start()
    try {
      in.addData(1L to 40L: _*)
      q.processAllAvailable()
      in.addData(30L to 90L: _*) // overlap: distinct count is 90, not 101
      q.processAllAvailable()
      val streamed = Sketches
        .hllEstimateFromRegisters(spark.table("hll_regs"), "est")
        .collect().head.getLong(0)
      val batch = Sketches
        .hllCountDistinct((1L to 90L).toDF("user_id"), col("user_id"), "est")
        .collect().head.getLong(0)
      assert(streamed === batch,
        "stream-maintained registers must reproduce the batch estimate")
    } finally q.stop()
  }

  test("streaming curation gates on quality and dedups exact content across batches") {
    import spark.implicits._
    val in = MemoryStream[(Long, String, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text", "lang")
    val q = graft.operators.Curation.streamingCurate(docs)
      .writeStream.format("memory").queryName("curate_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      val rich = (1 to 30).map(i => s"tok$i").mkString(" ") // high TTR, no stopwords
      val poor = Seq.fill(30)("the").mkString(" ")          // stopword wall
      in.addData((1L, rich, "en"), (2L, poor, "en"))
      q.processAllAvailable()
      in.addData((3L, rich, "en")) // exact dup of doc 1, later batch
      q.processAllAvailable()
      val kept = spark.table("curate_t").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L), s"kept $kept: poor quality and exact dups must drop")
    } finally q.stop()
  }

  test("streaming near-dup ingest: per-batch pairs union == whole corpus; replay reproduces its batch") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    import graft.sources.Tables
    val corpus = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val dir = Files.createTempDirectory("graft-ndstream").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = Curation.streamingNearDupIngest(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", ckpt())
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "jaccard_x1e3").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = pairsOf(spark.read.parquet(s"$dir/pairs"))
    val full = pairsOf(Dedup.jaccardPairsLshVerified(corpus, 800))
    assert(full.nonEmpty && got === full)
    // replay posture: a retry of batch 1 reads the index EXCLUDING its own
    // partition (even if a failed attempt already wrote it) and overwrites
    // the same directory with identical content
    val idx0 = spark.read.option("basePath", s"$dir/index/docs")
      .parquet(s"$dir/index/docs").filter(col("batch") < 1)
      .select("doc_id", "sig", "sh")
    val replay = pairsOf(Dedup.incrementalNearDupPairs(
      idx0, Dedup.nearDupIndex(odds.toDF("doc_id", "text")), 800))
    assert(replay === pairsOf(spark.read.parquet(s"$dir/pairs/batch=1")))
  }

  test("streaming cluster ingest: label state after each batch == q49 over " +
    "everything ingested so far; replay re-reads the predecessor state") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    import graft.sources.Tables
    val corpus = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text")
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val dir = Files.createTempDirectory("graft-ccstream").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = Curation.streamingClusterIngest(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", s"$dir/labels", ckpt())
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def fromScratch(d: org.apache.spark.sql.DataFrame) =
      labelsOf(Dedup.nearDupClusters(d, 800, cache = false))
    val afterB0 = labelsOf(Curation.labelStateAt(spark, s"$dir/labels", 0))
    assert(afterB0 === fromScratch(evens.toDF("doc_id", "text")),
      "batch-0 state == q49 over the even half")
    val afterB1 = labelsOf(Curation.labelStateAt(spark, s"$dir/labels", 1))
    assert(afterB1.nonEmpty && afterB1 === fromScratch(corpus),
      "batch-1 state == q49 over the whole corpus")
    assert(labelsOf(Curation.labelState(spark, s"$dir/labels")) === afterB1)
    // replay posture: re-running batch 1's fold against the batch-0 state
    // (NEVER its own directory) reproduces the committed batch-1 state
    Curation.clusterIngestBatch(odds.toDF("doc_id", "text"), 1L,
      s"$dir/index", s"$dir/pairs", s"$dir/labels", 800)
    assert(labelsOf(Curation.labelStateAt(spark, s"$dir/labels", 1)) === afterB1)
    // bucketed-write locality: a ONE-doc batch (a dup of an existing doc)
    // rewrites a strict subset of the label buckets and carries the rest
    // forward by manifest reference (the IncrementalIndexSpec idiom,
    // applied to the label state)
    def cbkts(b: Long) = {
      val d = new java.io.File(s"$dir/labels/batch=$b")
      if (!d.exists()) Set.empty[String]
      else d.listFiles().filter(_.getName.startsWith("cbkt="))
        .map(_.getName).toSet
    }
    val dupOf = rows.head
    val oneDoc = Seq((rows.map(_._1).max + 1, dupOf._2))
    val prevBuckets = cbkts(0) ++ cbkts(1)
    val (lblRead, dmRead) = Curation.clusterIngestBatch(
      oneDoc.toDF("doc_id", "text"), 2L,
      s"$dir/index", s"$dir/pairs", s"$dir/labels", 800)
    val all3 = corpus.unionByName(oneDoc.toDF("doc_id", "text"))
    assert(labelsOf(Curation.labelState(spark, s"$dir/labels")) ===
      fromScratch(all3), "one-doc fold == q49 from scratch")
    assert(cbkts(2).nonEmpty && cbkts(2).subsetOf(prevBuckets) &&
      cbkts(2).size < prevBuckets.size,
      s"one-doc batch must rewrite a strict subset of label buckets, " +
        s"got ${cbkts(2).size} of ${prevBuckets.size}")
    // read-side twin (verdict r11 #2): the one-doc batch READS a strict
    // subset of the prior label buckets — the docmap mirror resolves its
    // endpoints to their components' residues, so neither the endpoint
    // lookup nor the carry read ever scans the full prior state
    val lblReadBkts = lblRead.map(_.split("/").last).toSet
    assert(lblReadBkts.nonEmpty && lblReadBkts.subsetOf(prevBuckets) &&
      lblReadBkts.size < prevBuckets.size,
      s"one-doc batch must READ a strict subset of label buckets, " +
        s"got $lblReadBkts of $prevBuckets")
    val allDbkts = (0L until 32L).map(b => s"dbkt=$b").toSet
    val dmReadBkts = dmRead.map(_.split("/").last).toSet
    assert(dmReadBkts.nonEmpty && dmReadBkts.size < allDbkts.size &&
      dmReadBkts.subsetOf(allDbkts),
      s"one-doc batch must read only its endpoints' docmap buckets, " +
        s"got $dmReadBkts")
  }

  test("cluster ingest: a merge that EMPTIES a bucket (component's root " +
    "moves to another residue) drops the bucket from the manifest and " +
    "the state stays readable") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    val txt = "the quick brown fox jumps over the lazy dog again and again ok"
    val dir = Files.createTempDirectory("graft-ccmove").toString
    def ingest(b: Long, docs: Seq[(Long, String)]): Unit =
      Curation.clusterIngestBatch(docs.toDF("doc_id", "text"), b,
        s"$dir/idx", s"$dir/pairs", s"$dir/labels", 800)
    // batch 0: docs 37,38 (dups) -> root 37, bucket 37 % 32 = 5
    ingest(0L, Seq((37L, txt), (38L, txt)))
    // batch 1: doc 1 (dup of 37) -> merged root 1, bucket 1; bucket 5
    // must EMPTY and drop from the manifest — a dangling entry would
    // make every later read throw Path-does-not-exist
    ingest(1L, Seq((1L, txt)))
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelsOf(Curation.labelState(spark, s"$dir/labels")) ===
      Set((1L, 1L), (37L, 1L), (38L, 1L)))
    // and a further batch still ingests cleanly over the moved state
    ingest(2L, Seq((70L, txt)))
    assert(labelsOf(Curation.labelState(spark, s"$dir/labels")) ===
      Set((1L, 1L), (37L, 1L), (38L, 1L), (70L, 1L)))
  }

  test("a torn label manifest fails loudly: truncation without the END " +
    "terminator is rejected instead of silently dropping bucket ownership") {
    import spark.implicits._
    import graft.operators.Curation
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    val dir = Files.createTempDirectory("graft-torn").toString
    Curation.clusterIngestBatch(Seq((1L, txt), (2L, txt)).toDF("doc_id", "text"),
      0L, s"$dir/idx", s"$dir/pairs", s"$dir/labels", 800)
    val man = new java.io.File(s"$dir/labels/batch=0/_MANIFEST")
    val lines = java.nio.file.Files.readAllLines(man.toPath)
    assert(lines.get(lines.size - 1).startsWith("END "))
    // simulate a torn write: drop the terminator (and one entry line);
    // also drop Hadoop's sidecar checksum so the END validation itself
    // is exercised (a checksum mismatch would be a loud failure too,
    // but not on every filesystem)
    java.nio.file.Files.write(man.toPath,
      java.util.Arrays.asList(lines.get(0)))
    new java.io.File(s"$dir/labels/batch=0/._MANIFEST.crc").delete()
    val e = intercept[IllegalArgumentException] {
      Curation.labelState(spark, s"$dir/labels").collect()
    }
    assert(e.getMessage.contains("truncated") ||
      e.getMessage.contains("END"),
      s"torn manifest must be rejected with a clear message: ${e.getMessage}")
  }

  test("pruneLabelStates never deletes a manifest-less dir at/above the " +
    "committed frontier (an in-flight batch)") {
    import spark.implicits._
    import graft.operators.Curation
    val txtA = "the quick brown fox jumps over the lazy dog again and again"
    val dir = Files.createTempDirectory("graft-ccinflight").toString
    def ingest(b: Long, docs: Seq[(Long, String)]): Unit =
      Curation.clusterIngestBatch(docs.toDF("doc_id", "text"), b,
        s"$dir/idx", s"$dir/pairs", s"$dir/labels", 800)
    ingest(0L, Seq((1L, txtA), (2L, txtA)))
    ingest(1L, Seq((3L, txtA)))
    // simulate batch 2 between its bucket write and its manifest commit
    Seq((9L, 9L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/labels/batch=2/cbkt=9")
    Curation.pruneLabelStates(spark, s"$dir/labels")
    assert(new java.io.File(s"$dir/labels/batch=2").exists(),
      "in-flight dir above the committed frontier must survive pruning")
  }

  test("streaming chunk ingest: report off the append-only partials == " +
    "batch q114 over everything ingested; replay idempotent") {
    import spark.implicits._
    import graft.operators.{ChunkDedup, Curation, Dedup}
    import graft.sources.Tables
    val corpus = Dedup.withPlantedExcerpts(
      Tables.documents(spark, TestSpark.SF0001).select("doc_id", "text"))
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val dir = Files.createTempDirectory("graft-chunkstream").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = Curation.streamingChunkIngest(in.toDF().toDF("doc_id", "text"),
      s"$dir/chunks", ckpt())
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    def rep(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val got = rep(Curation.chunkReportFromIndex(spark, s"$dir/chunks"))
    val batch = rep(ChunkDedup.cdcChunks(corpus))
    assert(batch.nonEmpty && got === batch,
      "merged per-batch chunk partials must reproduce the batch q114 report")
    // replay posture: re-running batch 1 overwrites its own directory with
    // identical content; the merged report is unchanged
    ChunkDedup.chunkCounts(odds.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/chunks/batch=1")
    assert(rep(Curation.chunkReportFromIndex(spark, s"$dir/chunks")) === batch)
    // the persisted index carries the md5 chunk identity, NEVER the chunk
    // text — hash-sized rows, not a re-sorted copy of the corpus
    assert(spark.read.parquet(s"$dir/chunks").columns.toSet ===
      Set("chunk_hash", "n_tokens", "doc_id", "n_occ", "batch"),
      "chunk index schema must be hash-keyed (no text column)")
    // compaction folds the per-batch deltas into one batch=0 directory:
    // post-compaction read shape == a one-batch stream's, report unchanged
    Curation.compactChunkIndex(spark, s"$dir/chunks", 2L)
    val left = new java.io.File(s"$dir/chunks").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(left === Seq("batch=0"),
      s"compaction must leave exactly batch=0, got $left")
    assert(rep(Curation.chunkReportFromIndex(spark, s"$dir/chunks")) === batch)
  }

  test("streaming centroid ingest: outlier report off the summed " +
    "component partials == batch q124 over everything ingested; replay " +
    "idempotent") {
    import spark.implicits._
    import graft.operators.{Curation, Similarity}
    import graft.sources.Tables
    val corpus = Tables.embeddings(spark, TestSpark.SF0001)
      .select("vec_id", "embedding")
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val dir = Files.createTempDirectory("graft-centstream").toString
    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = Curation.streamingCentroidIngest(
      in.toDF().toDF("vec_id", "embedding"), s"$dir/cent", ckpt())
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    def rep(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = rep(Curation.centroidOutliersFromIndex(corpus, s"$dir/cent"))
    val batch = rep(Similarity.centroidOutliers(corpus))
    assert(batch.nonEmpty && got === batch,
      "summed integer component partials must reproduce the batch " +
        "centroid (and therefore the report) EXACTLY")
    // replay: batch 1 overwrites its own directory with identical content
    Similarity.centroidComponents(Similarity.asDouble(
        odds.toDF("vec_id", "embedding")))
      .write.mode("overwrite").parquet(s"$dir/cent/batch=1")
    assert(rep(Curation.centroidOutliersFromIndex(corpus, s"$dir/cent"))
      === batch)
    // compaction folds the per-batch partials into ONE batch=0 directory
    // (dir-count cap for an unbounded stream) without changing the report
    Curation.compactCentroidIndex(spark, s"$dir/cent", upToBatch = 2)
    val dirs = new java.io.File(s"$dir/cent").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
    assert(dirs.toSeq === Seq("batch=0"),
      s"post-compaction dir shape must be exactly batch=0, got ${dirs.toSeq}")
    assert(rep(Curation.centroidOutliersFromIndex(corpus, s"$dir/cent"))
      === batch)
  }

  test("streaming burst ingest: flags off the summed counts index == the " +
    "batch q110 over everything ingested; superseded label states prune") {
    import spark.implicits._
    import graft.operators.{Curation, Relational}
    val hr = 3600000000L
    val all = (0L to 5L).flatMap(h =>
      (0L until (if (h == 4L) 6L else 2L)).map(i => ("x", h * hr + i)))
    val (b0, b1) = all.partition(_._2 < 3 * hr)
    def toEvents(rows: Seq[(String, Long)]) = rows.toDF("event_type", "us")
      .select(col("event_type"), expr("timestamp_micros(us)").as("ts"))
    val dir = Files.createTempDirectory("graft-burststream").toString
    val in = MemoryStream[(String, Long)](spark)
    val q = Curation.streamingBurstIngest(
      in.toDF().toDF("event_type", "us")
        .select(col("event_type"), expr("timestamp_micros(us)").as("ts")),
      s"$dir/counts", ckpt())
    try {
      in.addData(b0); q.processAllAvailable()
      in.addData(b1); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows(Curation.burstsFromCounts(spark, s"$dir/counts")) ===
      rows(Relational.burstDetection(toEvents(all))),
      "merged partial counts must reproduce the batch monitor exactly")
    // label-state pruning: keep the dirs REFERENCED by the newest two
    // manifests (buckets carry forward by reference, so an old dir stays
    // live while it still owns a bucket) and delete the rest
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "pack my box with five dozen liquor jugs before noon today ok"
    def ingest(b: Long, docs: Seq[(Long, String)]): Unit =
      Curation.clusterIngestBatch(docs.toDF("doc_id", "text"), b,
        s"$dir/ndidx", s"$dir/ndpairs", s"$dir/labels", 800)
    ingest(0L, Seq((1L, textA), (2L, textA), (3L, textB), (4L, textB)))
    ingest(1L, Seq((5L, textA))) // touches cluster 1 only -> cbkt=1
    ingest(2L, Seq((6L, textB))) // touches cluster 3 only -> cbkt=3
    ingest(3L, Seq((7L, textA))) // supersedes batch 1's cbkt=1 ownership
    Curation.pruneLabelStates(spark, s"$dir/labels")
    val left = new java.io.File(s"$dir/labels").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    // newest 2 manifests are batch 2 {1->1, 3->2} and batch 3 {1->3, 3->2}
    // -> live owners {1, 2, 3}; batch 0 is unreferenced and goes
    assert(left === Seq("batch=1", "batch=2", "batch=3"))
    assert(Curation.labelState(spark, s"$dir/labels")
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 1L), (5L, 1L), (7L, 1L),
        (3L, 3L), (4L, 3L), (6L, 3L)))
  }

  test("streaming containment ingest: per-batch pairs union == whole " +
    "corpus q87; replay reproduces its batch") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    import graft.sources.Tables
    // corpus + planted excerpts so inclusion pairs exist; hash-parity
    // batches so source-excerpt pairs CROSS the stream batches
    graft.functions.GraftFunctions.register(spark)
    val corpus = Dedup.withPlantedExcerpts(
      Tables.documents(spark, TestSpark.SF0001).select("doc_id", "text"))
    val withH = corpus.withColumn("h",
      pmod(graft.functions.GraftFunctions.phash60(col("doc_id")), lit(2L)))
    val rows = withH.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val (evens, odds) = rows.partition(_._3 == 0L)
    val dir = Files.createTempDirectory("graft-contstream").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = Curation.streamingContainmentIngest(
      in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/pairs", ckpt())
    try {
      in.addData(evens.map(t => (t._1, t._2))); q.processAllAvailable()
      in.addData(odds.map(t => (t._1, t._2))); q.processAllAvailable()
    } finally q.stop()
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "jaccard_x1e3", "containment_x1e3").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    val got = pairsOf(spark.read.parquet(s"$dir/pairs"))
    val full = pairsOf(Dedup.containmentPairs(corpus, cache = false))
    assert(full.nonEmpty && got === full)
    // replay: batch 1 re-run against the index EXCLUDING its own partition
    // writes identical content to the same directory
    val idx0 = spark.read.option("basePath", s"$dir/index/docs")
      .parquet(s"$dir/index/docs").filter(col("batch") < 1)
      .select("doc_id", "sh", "pref")
    val replay = pairsOf(Dedup.incrementalContainmentPairs(
      idx0, Dedup.containmentIndex(
        odds.map(t => (t._1, t._2)).toDF("doc_id", "text"))))
    assert(replay === pairsOf(spark.read.parquet(s"$dir/pairs/batch=1")))
  }

  test("streaming perceptual ingest: per-batch pair dumps union == whole " +
    "corpus; replay reproduces its batch") {
    import spark.implicits._
    import graft.operators.PerceptualHash
    import graft.sources.Tables
    val media = PerceptualHash.synthesizeImages(
      Tables.documents(spark, TestSpark.SF0001))
    val rows = media.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))).toSeq
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val dir = Files.createTempDirectory("graft-phstream").toString
    val in = MemoryStream[(Long, String, Array[Byte])](spark)
    val q = PerceptualHash.streamingPerceptualIngest(
      in.toDF().toDF("doc_id", "media_type", "content"),
      s"$dir/index", s"$dir/pairs", ckpt())
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val got = pairsOf(spark.read.parquet(s"$dir/pairs"))
    val full = pairsOf(PerceptualHash.perceptualNearDup(
      PerceptualHash.imageAHash(spark, media)))
    assert(full.nonEmpty && got === full)
    // replay: batch 1 re-run against the index EXCLUDING its own partition
    // writes identical content to the same directory (doc-keyed hash rows
    // recovered from the banded layout: 8 band rows per doc -> distinct)
    val idx0 = spark.read.option("basePath", s"$dir/index/pbands")
      .parquet(s"$dir/index/pbands").filter(col("batch") < 1)
      .select("doc_id", "lo", "hi").distinct()
    val replay = pairsOf(PerceptualHash.incrementalPerceptualPairs(idx0,
      PerceptualHash.imageAHash(spark,
        spark.createDataset(odds).toDF("doc_id", "media_type", "content"))))
    assert(replay === pairsOf(spark.read.parquet(s"$dir/pairs/batch=1")))
  }

  test("streaming dedup drops re-delivered event ids") {
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, Double)](spark)
    val events = in.toDF().toDF("event_id", "ts", "value")
    val q = EventPipelines.dedupById(events)
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      val e1 = (1L, t("2024-01-01 10:00:00"), 1.0)
      in.addData(e1, (2L, t("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      in.addData(e1) // exact re-delivery
      q.processAllAvailable()
      in.addData((1L, t("2024-01-01 10:02:00"), 1.0)) // re-stamped re-delivery
      q.processAllAvailable()
      assert(spark.table("dedup_t").count() === 2)
    } finally q.stop()
  }

  test("streaming vocab ingest: merged partials == batch q113 curve; replay idempotent") {
    import spark.implicits._
    import graft.operators.{Curation, TextAnalysis}
    import graft.sources.Tables
    val rows = Tables.documents(spark, TestSpark.SF0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val dir = Files.createTempDirectory("graft-vocabstream").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = Curation.streamingVocabIngest(
      in.toDF().toDF("doc_id", "text"), s"$dir/vocab", ckpt())
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val want = canon(TextAnalysis.queries("q113_vocab_growth")(spark, TestSpark.SF0001))
    assert(canon(Curation.vocabGrowthFromIndex(spark, s"$dir/vocab")) === want,
      "index report must reproduce the batch curve over everything ingested")
    // replay idempotency: a fresh checkpoint re-ingests the same batches
    // under the same batch ids — every partial directory is overwritten
    // with identical content and the report is unchanged
    val in2 = MemoryStream[(Long, String)](spark)
    val q2 = Curation.streamingVocabIngest(
      in2.toDF().toDF("doc_id", "text"), s"$dir/vocab", ckpt())
    try {
      in2.addData(evens); q2.processAllAvailable()
      in2.addData(odds); q2.processAllAvailable()
    } finally q2.stop()
    assert(canon(Curation.vocabGrowthFromIndex(spark, s"$dir/vocab")) === want)
  }
}
