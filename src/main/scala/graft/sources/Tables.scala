package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided Parquet fixture tables
  * (the `sf&lt;N&gt;` dirs under /root/testdata; see TESTDATA.md / FIXTURES.md s4).
  *
  * All loads are plain `spark.read.parquet` — declarative scans that keep
  * Catalyst free to push filters and prune columns into the Parquet reader.
  * At cluster scale these would be the same calls against an object-store
  * path; nothing here assumes local files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is physically INT64 TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Two pieces let us read it WITHOUT mutating the shared
    * session conf: an explicit schema (ts as long) skips footer schema
    * inference — the step that throws PARQUET_TYPE_ILLEGAL and ignores
    * per-read options — and the legacy nanosAsLong conf passed as a PER-READ
    * option lands in this relation's hadoop conf, where the executor-side
    * row-group readers consult it. The timestamp is then rebuilt with exact
    * integer arithmetic (`div`, not `/` — nano epochs exceed 2^53 so double
    * division would lose precision).
    */
  private val EVENTS_SCHEMA = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(EVENTS_SCHEMA)
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(s"$d/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
