package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.cdc.Envelope
import graft.store.{KeyValueStore, SharedStores, StoreClientFactory}

/** The continuous form of the reference's CDC consumer (SURVEY.md s3.3):
  * one Structured Streaming query per concern, built from the SAME plan
  * fragments as the batch path (Envelope.parse / invalidationKeys are
  * DataFrame => DataFrame, so they compose with readStream unchanged).
  *
  * Delivery semantics: checkpointed offsets + idempotent sinks give
  * effectively-once, strictly stronger than the reference's at-least-once
  * mark/commit protocol (queue/cdc.go:196, :212-220) but only because the
  * sinks stay idempotent — DEL and keyed upsert both are.
  *
  * In production the source is `spark.readStream.format("kafka")...` with
  * `maxOffsetsPerTrigger=100` for O-15 poll-cap parity; tests use
  * MemoryStream with the same `value: string` contract.
  */
object Pipeline {

  /** Kafka wiring (behind a flag since no broker exists in tests). */
  def kafkaRecords(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", 100)
      .load()
      .select(col("value").cast("string").as("value"))

  /** The invalidation consumer: records -> parse -> keys -> DEL. The DELs
    * run executor-side via foreachPartition — the driver never sees the
    * data, so a hot micro-batch scales with the cluster, not the driver.
    * DEL replay is idempotent, so failure mid-batch is safe.
    */
  def invalidationQuery(records: DataFrame, factory: StoreClientFactory,
                        checkpoint: String): StreamingQuery =
    Envelope.invalidationKeys(Envelope.parse(records))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { (it: Iterator[Row]) =>
          if (it.hasNext) {
            val client = factory.client()
            it.foreach(r => client.del(r.getString(0)))
          }
        }
      }
      .start()

  /** Single-JVM convenience: registers the in-process store behind a
    * [[SharedStoreFactory]] (tests, local engine). */
  def invalidationQuery(records: DataFrame, store: KeyValueStore,
                        checkpoint: String): StreamingQuery =
    invalidationQuery(records, SharedStores.register(store), checkpoint)

  /** File-based change-record stream (offline/test mode): a directory of
    * text files, one Kafka-value JSON document per line. Same `value`
    * contract as the Kafka source, so the downstream plan is identical;
    * `maxFilesPerTrigger` bounds micro-batch size like the poll cap.
    */
  def fileRecords(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** O-16 parity: the reference's supervisor loop (queue/runner.go:11-35)
    * restarts the consumer on any non-cancel error. Here a failed query
    * restarts FROM ITS CHECKPOINT, so no records are lost or re-invalidated
    * beyond the failed micro-batch (which replays into idempotent sinks).
    *
    * Backoff mirrors the reference's retry tuning (queue/cdc.go:75-85,
    * config/config.go:121-152): exponential doubling from `basePauseMs`,
    * capped at `maxPauseMs`, with ±25% jitter so a fleet of restarting
    * consumers doesn't thundering-herd the broker. The failure counter
    * resets once a restarted run makes progress — by default a committed
    * micro-batch with input rows, since Structured Streaming also emits
    * progress events for idle zero-row triggers, and counting those would
    * let a query that always idles once before failing restart forever —
    * so the budget is per-incident, not per-JVM-lifetime: a consumer that
    * recovers and fails again days later gets a fresh `maxRestarts`.
    *
    * Returns the handle of the run that terminated cleanly; rethrows after
    * `maxRestarts` consecutive no-progress failures. `sleep`/`jitter`/
    * `madeProgress` are injectable for tests.
    */
  def supervise(start: () => StreamingQuery,
                maxRestarts: Int = 5,
                basePauseMs: Long = 100,
                maxPauseMs: Long = 30000,
                sleep: Long => Unit = Thread.sleep,
                jitter: () => Double = () =>
                  java.util.concurrent.ThreadLocalRandom.current().nextDouble(-0.25, 0.25),
                madeProgress: StreamingQuery => Boolean = q =>
                  // only COMMITTED INPUT ROWS count as progress. A full
                  // progress ring buffer does not: idle triggers also emit
                  // progress events, so a query that idles past the buffer
                  // cap before each failure would reset the budget forever —
                  // the exact unbounded-restart mode this budget closes.
                  // (The eviction blind spot — a run that committed rows,
                  // then idled 100+ triggers, then failed — burns one budget
                  // slot; with maxRestarts=5 that is strictly safer than the
                  // unbounded direction.)
                  q.recentProgress.exists(p => p != null && p.numInputRows > 0)
               ): StreamingQuery = {
    var attempts = 0
    while (true) {
      val q = start()
      try {
        q.awaitTermination()
        return q // clean stop (O-17 path)
      } catch {
        case e: Throwable =>
          // a run that committed at least one non-empty micro-batch closes
          // the prior incident: this failure starts a fresh restart budget
          if (madeProgress(q)) attempts = 0
          attempts += 1
          if (attempts > maxRestarts) throw e
          val exp = basePauseMs << math.min(attempts - 1, 20)
          val pause = (math.min(exp, maxPauseMs) * (1.0 + jitter())).toLong
          sleep(math.max(0L, pause))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** O-17 parity: graceful shutdown — stop consuming, let the in-flight
    * micro-batch finish, offsets already durable in the checkpoint.
    */
  def stopGracefully(q: StreamingQuery, timeoutMs: Long = 5000): Boolean = {
    q.stop()
    q.awaitTermination(timeoutMs)
  }

  /** Streaming latest-state view (E-1) via typed keyed state: per key, keep
    * the highest-LSN row image; a delete (null after) tombstones the key.
    * State is the (lsn, row-json) pair only — O(keys), spill-safe in the
    * state store, checkpointed exactly-once.
    */
  case class KeyedChange(code: Long, lsn: Long, after_json: String)
  case class KeyLatest(code: Long, lsn: Long, after_json: String, deleted: Boolean)

  def keyedChanges(spark: SparkSession, records: DataFrame): Dataset[KeyedChange] = {
    import spark.implicits._
    Envelope.parse(records)
      .select(
        coalesce(col("payload.after.code"), col("payload.before.code")).as("code"),
        coalesce(col("payload.source.lsn"), lit(Long.MinValue)).as("lsn"),
        to_json(col("payload.after")).as("after_json"))
      .filter(col("code").isNotNull)
      .as[KeyedChange]
  }

  /** The per-key max-LSN fold as a typed stateful stream. */
  def latestStateStream(spark: SparkSession, records: DataFrame): Dataset[KeyLatest] = {
    import spark.implicits._
    val updater: (Long, Iterator[KeyedChange], GroupState[KeyLatest]) => KeyLatest =
      (code, changes, state) => {
        val prev = state.getOption
        val top = changes.maxBy(_.lsn)
        val next =
          if (prev.exists(_.lsn >= top.lsn)) prev.get
          else KeyLatest(code, top.lsn, top.after_json, top.after_json == null)
        state.update(next)
        next
      }
    keyedChanges(spark, records)
      .groupByKey(_.code)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updater)
  }

  def latestStateQuery(spark: SparkSession, records: DataFrame,
                       checkpoint: String, queryName: String): StreamingQuery =
    latestStateStream(spark, records)
      .writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .format("memory")
      .start()

  /** E-1's MERGE variant (SURVEY.md s1.4 A3 option a): instead of evicting
    * on change, the stream maintains the cache itself — upsert the latest
    * row image, delete on tombstone. The store ends every micro-batch
    * holding exactly the latest-state view, so reads never miss. Both
    * operations are idempotent, so checkpoint replay is safe.
    */
  def materializeQuery(spark: SparkSession, records: DataFrame,
                       factory: StoreClientFactory, checkpoint: String): StreamingQuery = {
    latestStateStream(spark, records)
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[KeyLatest], _: Long) =>
        // Executor-side upsert/delete: mapGroupsWithState emits at most one
        // row per key per micro-batch, so partitions never race on a key.
        batch.foreachPartition { (it: Iterator[KeyLatest]) =>
          if (it.hasNext) {
            val client = factory.client()
            it.foreach { kl =>
              if (kl.deleted) client.del(kl.code.toString)
              else client.put(kl.code.toString, kl.after_json)
            }
          }
        }
      }
      .start()
  }

  /** Single-JVM convenience twin (tests, local engine). */
  def materializeQuery(spark: SparkSession, records: DataFrame,
                       store: KeyValueStore, checkpoint: String): StreamingQuery =
    materializeQuery(spark, records, SharedStores.register(store), checkpoint)
}
