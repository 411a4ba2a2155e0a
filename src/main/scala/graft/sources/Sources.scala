package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the fixture parquet (SURVEY.md s2.2).
  *
  * Everything takes an EXPLICIT schema — the engine never infers (s1.3):
  * inference costs a full extra pass at 100 TB and silently drifts when a
  * malformed file lands in the path.
  */
object Sources {

  /** S-1: JDBC table source. Predicate pushdown and column pruning reach
    * the remote database via Catalyst's JDBC rules; `partitionColumn`
    * splits the read into `numPartitions` parallel range queries — without
    * it a JDBC read is a single task regardless of cluster size.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None,
           user: String = "", password: String = ""): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn.fold(base) { case (col, lo, hi, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** CSV with explicit schema; PERMISSIVE (malformed rows null out, O-12
    * skip-don't-fail parity).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines with explicit schema; PERMISSIVE. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Partitioned parquet sink: directory partitioning on low-cardinality
    * columns so reads with equality predicates prune whole directories
    * (PartitionFilters, zero I/O for pruned values).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Bucketed table sink: pre-shuffles data into `buckets` files by key so
    * that joins/aggregations on that key read co-partitioned data and skip
    * the exchange entirely — the difference between one shuffle of the
    * whole fact table per join and none. Requires a catalog table
    * (`saveAsTable`), which is how bucket metadata survives.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}
