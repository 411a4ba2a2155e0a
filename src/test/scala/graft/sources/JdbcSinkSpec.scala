package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** JDBC write-back against embedded Derby — the real DriverManager /
  * PreparedStatement / batch path, no mocks. Covers the reference's three
  * write shapes (Create/Save/Delete) plus replay idempotency and the
  * CDC latest-state → external-database materialization flow.
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(): String = {
    System.setProperty("derby.stream.error.file",
      Files.createTempDirectory("graft-derby-log").resolve("derby.log").toString)
    val dbDir = Files.createTempDirectory("graft-derby-sink").toString + "/db"
    s"jdbc:derby:$dbDir;create=true"
  }

  private def ddl(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE sinners (code BIGINT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(64) NOT NULL, updated_at TIMESTAMP)")
    finally conn.close()
  }

  private def readBack(url: String) =
    Sources.jdbc(spark, url, "sinners")
      .select(col("CODE").as("code"), col("NAME").as("name"))
      .orderBy("code")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("code", "name")
      .withColumn("updated_at", lit(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)).cast("timestamp_ntz"))
  }

  test("append writes rows; PK conflict surfaces as an error (400 parity)") {
    val url = freshDb(); ddl(url)
    JdbcSink.append(df(14L -> "Faust", 17L -> "Gregor"), url, "sinners")
    assert(readBack(url) === Seq(14L -> "Faust", 17L -> "Gregor"))
    val e = intercept[org.apache.spark.SparkException] {
      JdbcSink.append(df(14L -> "dup"), url, "sinners")
    }
    assert(e.getMessage.toLowerCase.contains("duplicate")
      || String.valueOf(e.getCause).toLowerCase.contains("batch"))
  }

  test("upsert inserts new keys, updates existing, and replay is idempotent") {
    val url = freshDb(); ddl(url)
    JdbcSink.upsert(df(14L -> "Faust", 17L -> "Gregor"), url, "sinners", Seq("code"))
    assert(readBack(url) === Seq(14L -> "Faust", 17L -> "Gregor"))
    // mixed batch: one update, one insert
    val second = df(14L -> "Faust2", 23L -> "Hel")
    JdbcSink.upsert(second, url, "sinners", Seq("code"))
    assert(readBack(url) === Seq(14L -> "Faust2", 17L -> "Gregor", 23L -> "Hel"))
    // replay the same batch (at-least-once redelivery): same final state
    JdbcSink.upsert(second, url, "sinners", Seq("code"))
    assert(readBack(url) === Seq(14L -> "Faust2", 17L -> "Gregor", 23L -> "Hel"))
  }

  test("upsert batches larger than batchSize flush correctly") {
    val url = freshDb(); ddl(url)
    val many = df((1L to 137L).map(i => i -> s"n$i"): _*)
    JdbcSink.upsert(many, url, "sinners", Seq("code"), batchSize = 25)
    assert(readBack(url).size === 137)
    val moved = df((100L to 150L).map(i => i -> s"m$i"): _*)
    JdbcSink.upsert(moved, url, "sinners", Seq("code"), batchSize = 25)
    val back = readBack(url).toMap
    assert(back.size === 150 && back(42L) === "n42" && back(120L) === "m120")
  }

  test("deleteKeys removes present keys and ignores absent ones (replay-safe)") {
    val url = freshDb(); ddl(url)
    JdbcSink.upsert(df(1L -> "a", 2L -> "b", 3L -> "c"), url, "sinners", Seq("code"))
    import spark.implicits._
    val dels = Seq(2L, 99L).toDF("code")
    JdbcSink.deleteKeys(dels, url, "sinners", Seq("code"))
    JdbcSink.deleteKeys(dels, url, "sinners", Seq("code")) // replay: no error
    assert(readBack(url) === Seq(1L -> "a", 3L -> "c"))
  }

  test("CDC latest-state view materializes to the external database (E-1 close)") {
    val url = freshDb(); ddl(url)
    import spark.implicits._
    // change log: insert 1, insert 2, update 1, delete 2 — latest state = {1->v2}
    val changes = Seq(
      (1L, "v1", 10L, "c"), (2L, "x", 11L, "c"),
      (1L, "v2", 12L, "u"), (2L, "x", 13L, "d"),
    ).toDF("code", "name", "lsn", "op")
    val latest = changes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("code").orderBy(desc("lsn"))))
      .filter(col("rn") === 1)
    val upserts = latest.filter(col("op") =!= "d")
      .select(col("code"), col("name"))
      .withColumn("updated_at", lit(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)).cast("timestamp_ntz"))
      .repartition(col("code")) // one writer per key: no cross-partition races
    val deletes = latest.filter(col("op") === "d").select("code")
    JdbcSink.upsert(upserts, url, "sinners", Seq("code"))
    JdbcSink.deleteKeys(deletes, url, "sinners", Seq("code"))
    assert(readBack(url) === Seq(1L -> "v2"))
  }
}
