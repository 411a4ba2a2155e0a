package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.TestSpark

/** Source/sink behavior: explicit-schema reads with PERMISSIVE malformed
  * handling, partition pruning on partitioned writes, and shuffle-free
  * joins on bucketed tables (the 100 TB co-location story, verified on the
  * physical plan).
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  test("json source with explicit schema nulls malformed lines instead of failing") {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("part-0.json"),
      """{"id": 1, "name": "ok"}
        |{not json at all
        |{"id": 2, "name": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sources.json(spark, dir.toString, schema)
    assert(df.count() === 3) // malformed row present as all-null (PERMISSIVE)
    assert(df.filter(col("id").isNotNull).count() === 2)
  }

  test("csv source honors explicit schema and header") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("part-0.csv"),
      "id,name\n1,alpha\n2,beta\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val rows = Sources.csv(spark, dir.toString, schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "alpha"), (2L, "beta")))
  }

  test("events reads TIMESTAMP(NANOS) without mutating the session conf") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val rows = Tables.events(spark, D)
    assert(rows.schema("ts").dataType === TimestampType)
    assert(rows.filter(col("ts").isNotNull).count() > 0)
    // per-read option, not a session-wide side effect: the session conf
    // still reports its default ("false"), not the value the read needed
    assert(spark.conf.get(key) === "false",
      "events() must not set the legacy conf on the shared session")
  }

  test("S-1 jdbc: embedded-Derby round-trip with partitioned range read and pushdown") {
    // Derby ships in /opt/spark/jars, so this exercises the REAL JDBC code
    // path (DriverManager handshake, dialect-default SQL generation, range
    // predicate construction) — not a mock. Keep Derby's log out of cwd.
    System.setProperty("derby.stream.error.file",
      Files.createTempDirectory("graft-derby-log").resolve("derby.log").toString)
    val dbDir = Files.createTempDirectory("graft-derby").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE sinners (code BIGINT NOT NULL PRIMARY KEY, name VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO sinners VALUES (?, ?)")
      (1L to 100L).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"name$i"); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    // Unpartitioned read: whole table through one connection.
    val whole = Sources.jdbc(spark, url, "sinners")
    assert(whole.count() === 100)

    // Partitioned read: 4 parallel range queries over `code` — the shape a
    // 100 TB snapshot load needs (one task per range, not one task total).
    val ranged = Sources.jdbc(spark, url, "sinners",
      partitionColumn = Some(("code", 1L, 100L, 4)))
    assert(ranged.rdd.getNumPartitions === 4,
      "partitionColumn must split the read into numPartitions range queries")
    assert(ranged.count() === 100, "range partitions must cover every row")

    // Predicate pushdown reaches the database, not a post-scan Filter.
    val point = ranged.filter(col("code") === 42L)
    val scan = point.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(CODE,42"),
      s"equality predicate not pushed to the JDBC source:\n$scan")
    assert(point.collect().map(_.getString(1)).toSeq === Seq("name42"))
  }

  test("partitioned write enables partition pruning (PartitionFilters, not data read)") {
    val out = Files.createTempDirectory("graft-part").toString + "/orders"
    Sources.writePartitioned(
      Tables.orders(spark, D), out, Seq("o_orderstatus"))
    val pruned = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning:\n$plan")
    assert(pruned.count() ===
      Tables.orders(spark, D).filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed tables join WITHOUT a shuffle (no Exchange in the plan)") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Sources.writeBucketed(Tables.orders(spark, D), "orders_b", 4,
        Seq("o_orderkey"), Seq("o_orderkey"))
      Sources.writeBucketed(
        Tables.lineitem(spark, D)
          .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines")),
        "lineitem_agg_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_agg_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_agg_b")
    }
  }
}
