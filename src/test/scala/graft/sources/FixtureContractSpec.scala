package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Contract on the driver-provided fixture tables (TESTDATA.md /
  * FIXTURES.md §4) so a driver-side regeneration can never silently corrupt
  * semantics again: round 8's regen changed `events.ts` from timestamp[ns]
  * to timestamp[us] and the then-unconditional nanos shim scaled every
  * events timestamp 1000× down (Jan 2024 → ~1970), silently flipping two
  * oracle queries wrong while everything still "read fine".
  *
  * Three layers, each failing with a readable diff:
  *   1. column name/type sets per table, as seen through `Tables` loaders
  *      (what every operator in the catalog consumes);
  *   2. parquet-footer logical types for the timestamp columns (the layer
  *      the round-8 regen changed) — `events.ts` must be TIMESTAMP with
  *      MICROS or NANOS unit, and `Tables.tsIsNanos` must agree with the
  *      footer so the reader branches correctly;
  *   3. coarse value sanity: row counts > 0 and every timestamp column's
  *      min/max inside the declared epoch (events start 2024-01-01) — the
  *      check that actually catches a unit mis-scale, whatever the cause.
  *
  * Runs on sf0.001 (+ footer checks on all sf dirs present) — fast.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  // expected Spark-side schema per table as produced by Tables loaders.
  // Timestamps: raw loads of zone-less parquet infer TIMESTAMP_NTZ; the
  // events loader normalizes ts to TIMESTAMP (session TZ pinned UTC).
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  private def loadVia(name: String, dir: String) =
    if (name == "events") Tables.events(spark, dir) else Tables.load(spark, dir, name)

  test("every fixture table matches the declared column names and Spark types") {
    val dir = sfDirs.head
    val diffs = Tables.names.flatMap { t =>
      val actual = loadVia(t, dir).schema.map(f => f.name -> f.dataType)
      val want = expected(t)
      if (actual == want) None
      else Some(s"$t:\n  expected ${want.map { case (n, d) => s"$n:${d.simpleString}" }.mkString(", ")}" +
        s"\n  actual   ${actual.map { case (n, d) => s"$n:${d.simpleString}" }.mkString(", ")}")
    }
    assert(diffs.isEmpty, "\nfixture schema drift:\n" + diffs.mkString("\n"))
  }

  test("events.ts parquet logical type is TIMESTAMP(MICROS|NANOS) and the reader branches to match") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    sfDirs.foreach { dir =>
      val p = new Path(s"$dir/events.parquet")
      val hconf = spark.sessionState.newHadoopConf()
      val fs = p.getFileSystem(hconf)
      val dataFile =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
            .minBy(_.getName.toString)
        else p
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(dataFile, hconf))
      val unit =
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          assert(schema.containsField("ts"), s"$dir: events parquet has no ts column")
          schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit
            case other => fail(s"$dir: events.ts logical type is $other, expected TIMESTAMP")
          }
        } finally reader.close()
      assert(
        unit == LogicalTypeAnnotation.TimeUnit.MICROS || unit == LogicalTypeAnnotation.TimeUnit.NANOS,
        s"$dir: events.ts TIMESTAMP unit is $unit — the Tables.events reader only handles MICROS and NANOS")
      assert(Tables.tsIsNanos(spark, s"$dir/events.parquet") == (unit == LogicalTypeAnnotation.TimeUnit.NANOS),
        s"$dir: Tables.tsIsNanos disagrees with the parquet footer (unit=$unit) — reader would mis-branch")
    }
  }

  test("the NANOS branch still works: a synthetic TIMESTAMP(NANOS) events " +
    "file is footer-detected and rescaled to exact micros") {
    // no driver fixture carries ns anymore (us since the Aug-13 regen), so
    // the legacy branch gets its own hand-written parquet — written with
    // parquet-mr directly because Spark cannot produce TIMESTAMP(NANOS).
    // Guards the reader against a future regen BACK to ns.
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val dir = java.nio.file.Files.createTempDirectory("graft-nsfixture")
    val file = new Path(s"$dir/events.parquet")
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LTA.timestampType(false, LTA.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LTA.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LTA.stringType()).named("props")
      .named("events")
    val gf = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter.builder(file)
      .withConf(spark.sessionState.newHadoopConf())
      .withType(schema).build()
    val baseNs = 1704067200000000000L // 2024-01-01T00:00:00Z
    (0 until 3).foreach { i =>
      val g = gf.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", baseNs + i * 1500L) // sub-microsecond deltas
      g.add("user_id", 7L)
      g.add("event_type", "signup")
      g.add("value", 1.5)
      g.add("props", """{"k": 1}""")
      w.write(g)
    }
    w.close()
    assert(Tables.tsIsNanos(spark, file.toString), "footer must report NANOS")
    val df = Tables.events(spark, dir.toString)
    assert(df.schema("ts").dataType == TimestampType)
    val micros = df.select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).sorted.toSeq
    // integer ns->us division, never double math: +1500 ns truncates to
    // +1 us, +3000 ns to +3 us
    assert(micros == Seq(baseNs / 1000, baseNs / 1000 + 1, baseNs / 1000 + 3),
      s"ns must rescale to exact micros: $micros")
  }

  test("row counts > 0 and timestamp ranges inside the declared epoch") {
    val dir = sfDirs.head
    // events declared to start 2024-01-01 (FIXTURES.md); orders/lineitem are
    // TPC-H-ish historical dates. A 1000× unit mis-scale lands in ~1970 and
    // a 1000× inflation lands far past 2100 — both well outside the window.
    val tsWindows: Map[String, (String, Int, Int)] = Map(
      "events" -> (("ts", 2023, 2027)),
      "orders" -> (("o_orderdate", 1990, 2030)),
      "lineitem" -> (("l_shipdate", 1990, 2030)))
    Tables.names.foreach { t =>
      val df = loadVia(t, dir)
      assert(df.limit(1).count() == 1, s"$t at $dir is empty")
      tsWindows.get(t).foreach { case (c, lo, hi) =>
        val Array(row) = df.agg(
          min(year(col(c))).as("lo"), max(year(col(c))).as("hi")).collect()
        val (gotLo, gotHi) = (row.getInt(0), row.getInt(1))
        assert(gotLo >= lo && gotHi <= hi,
          s"$t.$c year range [$gotLo, $gotHi] outside declared [$lo, $hi] — " +
            "timestamp unit mis-scale (ns/us/ms confusion) or corrupted regen")
      }
    }
  }
}
