package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schemas.Schemas

/** Golden CDC fixtures — self-contained literal data for the reference-parity
  * queries (SURVEY §2.6 Q1–Q7), so the correctness gate can hash-compare
  * against a DuckDB oracle that rebuilds the same rows from VALUES CTEs.
  *
  * Seed rows come from reference scripts/init.sql:26-29 (codes 14, 17) plus
  * the README walkthrough row (code 5, README.md:129-133). The envelope
  * documents follow the exact consumer-visible shape (queue/cdc.go:25-59)
  * with Debezium MicroTimestamp encoding for the row timestamps.
  *
  * Epochs: T0 = 2025-01-01 00:00:00 UTC; Tn = T0 + n·100 s.
  */
object Fixtures {
  val T0: Long = 1735689600000000L // micros
  def t(n: Int): Long = T0 + n * 100000000L

  private def row(code: Long, name: String, clazz: String, libram: String,
                  tendency: String, ca: Long, ua: Long): String =
    s"""{"code": $code, "name": "$name", "class": "$clazz", "libram": "$libram",
       |"tendency": "$tendency", "created_at": $ca, "updated_at": $ua}""".stripMargin.replace("\n", " ")

  private def envelope(op: String, before: String, after: String, lsn: Long): String = {
    val tsMs = 1735689600000L + lsn - 100000L
    s"""{"payload": {"before": $before, "after": $after,
       |"source": {"version": "2.7.0.Final", "connector": "postgresql",
       |"name": "cdc-cascade-postgres", "ts_ms": $tsMs, "snapshot": "false",
       |"db": "cdc-cascade-db", "sequence": "[\\"$lsn\\"]", "ts_us": ${tsMs * 1000},
       |"ts_ns": ${tsMs * 1000000}, "schema": "public", "table": "sinners",
       |"txId": ${lsn - 99100}, "lsn": $lsn, "xmin": null},
       |"transaction": null, "op": "$op", "ts_ms": $tsMs,
       |"ts_us": ${tsMs * 1000}, "ts_ns": ${tsMs * 1000000}}}""".stripMargin.replace("\n", " ")
  }

  private val deren0    = row(14, "Deren", "S", "Fraud", "Fury", T0, T0)
  private val derenUpd  = row(14, "Deren", "S", "Fraud", "Wrath", T0, t(3))
  private val shalom0   = row(17, "Shalom", "S", "Sloth", "Reticle", T0, T0)
  private val augustus0 = row(5, "Augustus", "S", "War", "Reticle", t(1), t(1))
  private val augustusU = row(5, "Augustus", "A", "War", "Reticle", t(1), t(2))

  /** The golden change log: snapshot reads, insert, two updates, a delete,
    * a Kafka tombstone (null value) and a malformed document. Covers every
    * dispatch branch of the reference consumer (FIXTURES.md §3).
    */
  val changeLog: Seq[Option[String]] = Seq(
    Some(envelope("r", "null", deren0, 100000L)),
    Some(envelope("r", "null", shalom0, 100001L)),
    Some(envelope("c", "null", augustus0, 100002L)),
    Some(envelope("u", augustus0, augustusU, 100003L)),
    Some(envelope("u", deren0, derenUpd, 100004L)),
    Some(envelope("d", shalom0, "null", 100005L)),
    None,                 // F5: Kafka tombstone — value IS NULL
    Some("{not json"))    // F6: malformed — must be skipped, not fail

  /** Change log as a Kafka-value-shaped DataFrame (`value` nullable string). */
  def changeRecords(spark: SparkSession): DataFrame = {
    import spark.implicits._
    changeLog.map(_.orNull).toDF("value")
  }

  /** Base `sinners` table (the two init.sql seed rows) as a DataFrame with
    * the canonical SINNER schema.
    */
  def sinners(spark: SparkSession): DataFrame = sinnersFrom(spark, Seq(
    (14L, "Deren", "S", "Fraud", "Fury", T0, T0),
    (17L, "Shalom", "S", "Sloth", "Reticle", T0, T0)))

  /** New rows applied in the insert scenario (Q3). */
  def newRows(spark: SparkSession): DataFrame = sinnersFrom(spark, Seq(
    (5L, "Augustus", "S", "War", "Reticle", t(1), t(1))))

  /** Updated row images applied in the update scenario (Q4), each carrying
    * its WAL ordinal (`lsn`). The two code-14 updates share the SAME
    * `updated_at` microsecond (t(3)): last-writer-wins must break the tie on
    * lsn (SURVEY §2.6 Q4 — arg-max by (updated_at, lsn)), so the higher-lsn
    * "Envy" image wins and a timestamp-only ordering is pinned as wrong.
    */
  def updatedRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (14L, "Deren", "S", "Fraud", "Wrath", T0, t(3), 100004L),
      (14L, "Deren", "S", "Fraud", "Envy", T0, t(3), 100006L))
      .toDF("code", "name", "class", "libram", "tendency", "ca_us", "ua_us", "lsn")
      .withColumn("created_at", timestamp_micros(col("ca_us")).cast("timestamp_ntz"))
      .withColumn("updated_at", timestamp_micros(col("ua_us")).cast("timestamp_ntz"))
      .drop("ca_us", "ua_us")
      .select((Schemas.SINNER.fieldNames.toSeq :+ "lsn").map(col): _*)
  }

  /** Keys deleted in the delete scenario (Q5). */
  def deletedKeys(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(17L).toDF("code")
  }

  /** Arbitrary extra SINNER-schema rows (timestamps pinned to T0). */
  def sinnersLike(spark: SparkSession,
                  rows: Seq[(Long, String, String, String, String)]): DataFrame =
    sinnersFrom(spark, rows.map(r => (r._1, r._2, r._3, r._4, r._5, T0, T0)))

  private def sinnersFrom(spark: SparkSession,
                          rows: Seq[(Long, String, String, String, String, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("code", "name", "class", "libram", "tendency", "ca_us", "ua_us")
      .withColumn("created_at", timestamp_micros(col("ca_us")).cast("timestamp_ntz"))
      .withColumn("updated_at", timestamp_micros(col("ua_us")).cast("timestamp_ntz"))
      .drop("ca_us", "ua_us")
      .select(Schemas.SINNER.fieldNames.map(col).toSeq: _*)
  }
}
