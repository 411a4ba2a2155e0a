package graft.schemas

import org.apache.spark.sql.types._

/** Schema constants for the engine.
  *
  * `SINNER` mirrors the reference's single source-of-truth table
  * (reference scripts/init.sql:3-11); `ENVELOPE` mirrors the Debezium
  * change-event envelope the reference consumer parses
  * (reference queue/cdc.go:25-59). Schemas are always declared explicitly —
  * the reference never infers schemas and neither do we (SURVEY.md §1.3).
  */
object Schemas {

  /** Row schema of the `sinners` table (init.sql:3-11).
    * TIMESTAMP WITHOUT TIME ZONE → TimestampNTZType; session TZ is pinned
    * to UTC so NTZ vs LTZ cannot drift.
    */
  val SINNER: StructType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("class", StringType, nullable = false),
    StructField("libram", StringType, nullable = true),
    StructField("tendency", StringType, nullable = true),
    StructField("created_at", TimestampNTZType, nullable = false),
    StructField("updated_at", TimestampNTZType, nullable = false)))

  /** Row image as carried inside a Debezium envelope: Debezium serializes
    * TIMESTAMP columns as epoch MICROseconds (io.debezium.time.MicroTimestamp),
    * so `created_at`/`updated_at` are LongType here and only become
    * timestamps when a state view is materialized.
    */
  val ENVELOPE_ROW: StructType = StructType(Seq(
    StructField("code", LongType),
    StructField("name", StringType),
    StructField("class", StringType),
    StructField("libram", StringType),
    StructField("tendency", StringType),
    StructField("created_at", LongType),
    StructField("updated_at", LongType)))

  /** Debezium `source` block (reference queue/cdc.go:40-55). `sequence` and
    * `xmin` are `any` in the reference consumer → StringType (lossless).
    */
  val ENVELOPE_SOURCE: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("ts_us", LongType),
    StructField("ts_ns", LongType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),
    StructField("xmin", StringType)))

  /** Full Debezium envelope (reference queue/cdc.go:25-59): `Message →
    * Payload → {Before, After, Source, Op, ts_*}`. `before`/`after` are
    * nullable structs — null `before` ⇒ insert/snapshot, null `after` ⇒
    * delete tombstone (cdc.go:30-31, :181-186).
    */
  val ENVELOPE: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", ENVELOPE_ROW, nullable = true),
      StructField("after", ENVELOPE_ROW, nullable = true),
      StructField("source", ENVELOPE_SOURCE, nullable = true),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("ts_us", LongType),
      StructField("ts_ns", LongType),
      StructField("transaction", StringType))), nullable = true)))
}
