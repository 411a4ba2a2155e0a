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
  /** `events.ts` has shipped as both INT64 TIMESTAMP(NANOS) (early fixture
    * generations) and TIMESTAMP(MICROS) (current ones). Spark's parquet
    * reader rejects NANOS outright unless the legacy nanosAsLong path is
    * taken, while MICROS needs nothing special — and applying the nanos
    * shim to a micros file silently scales every timestamp 1000× down
    * (Jan 2024 → ~1970). So the reader is footer-adaptive: it inspects the
    * parquet logical type annotation of `ts` (driver-side, one footer read)
    * and branches.
    *
    * NANOS branch mechanics: an explicit schema (ts as long) skips footer
    * schema inference — the step that throws PARQUET_TYPE_ILLEGAL and
    * ignores per-read options — and the legacy nanosAsLong conf passed as a
    * PER-READ option lands in this relation's hadoop conf, where the
    * executor-side row-group readers consult it. The timestamp is then
    * rebuilt with exact integer arithmetic (`div`, not `/` — nano epochs
    * exceed 2^53 so double division would lose precision).
    */
  private val EVENTS_NS_SCHEMA = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    if (tsIsNanos(s, path))
      s.read.schema(EVENTS_NS_SCHEMA)
        .option("spark.sql.legacy.parquet.nanosAsLong", "true")
        .parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else
      // timestamp[us] without a zone infers as TIMESTAMP_NTZ; downstream
      // event analytics (unix_micros, watermarks) expect TIMESTAMP. The
      // session TZ is pinned to UTC (Sessions.scala:15), so the cast is an
      // exact identity on the underlying micros — same instant DuckDB sees.
      load(spark = s, sfDir = d, name = "events")
        .withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
  }

  /** True iff the parquet `ts` column is annotated TIMESTAMP with NANOS
    * unit. Driver-side footer reads only — O(KB) per file, no row data
    * touched; at cluster scale this is the same footer the scheduler
    * reads anyway for row-group planning. When the dataset is a directory
    * with several data files, ALL footers must agree: the whole-dataset
    * reader applies ONE unit branch, so a mixed-unit regen would silently
    * decode some files at 1000x the wrong scale — fail loudly instead.
    */
  private[graft] def tsIsNanos(s: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val hconf = s.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val dataFiles =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .sortBy(_.getName.toString).toSeq
      else Seq(p)
    def nanosOf(f: Path): Boolean = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, hconf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") && (schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
      } finally reader.close()
    }
    val units = dataFiles.map(f => f -> nanosOf(f))
    require(units.map(_._2).distinct.size <= 1,
      s"mixed timestamp units across data files of $path: " +
        units.map { case (f, n) => s"${f.getName}=${if (n) "ns" else "us"}" }
          .mkString(", "))
    units.headOption.exists(_._2)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
