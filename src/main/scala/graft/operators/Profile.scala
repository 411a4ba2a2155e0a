package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** q68: table statistics collection (the ANALYZE shape a cost-based
  * optimizer feeds on) — per-column row/null/distinct counts and typed
  * min/max in ONE scan, unpivoted to a tall (col_name, stats) relation.
  *
  * Shape (chosen by measurement, see NOTES round-5): each row explodes to
  * one skinny canonicalized (col_name, v_num, v_str) pair per profiled
  * column, a (col_name, value) hash aggregate collapses duplicates
  * map-side, and every statistic — n_rows (sum of counts), n_nulls
  * (null-value group), n_distinct (non-null group count), min/max —
  * derives from that one grouped relation with a final 5-row aggregate.
  * The naive alternative (count_distincts + plain aggs in ONE Aggregate)
  * plans an Expand x (n_cols + 1) with every non-distinct buffer evaluated
  * on every expanded row: measured 7x slower at sf0.1. This form's only
  * corpus-scale exchange carries pre-counted skinny pairs.
  *
  * Values are canonicalized BEFORE aggregation (numerics x100-scaled
  * BIGINT — exact for the 2-decimal fixture domains, timestamps to epoch
  * millis, strings raw), so min/max/distinct are all over the published
  * resolution and every output hash-checks cross-engine. n_distinct
  * counts distinct non-null canonical values (COUNT(DISTINCT) semantics).
  * At 100 TB the same plan holds; if the value-group cardinality
  * approaches the row count, swap the exact group-count for the q16b HLL
  * registers and nothing else changes.
  */
object Profile {

  sealed trait Kind
  case object NumX100 extends Kind // double/int -> x100 BIGINT
  case object Millis extends Kind // timestamp -> epoch ms BIGINT
  case object Str extends Kind // string -> min_str/max_str

  /** The q68 spec: the profiled lineitem columns. */
  val LINEITEM_COLS: Seq[(String, Kind)] = Seq(
    "l_orderkey" -> NumX100,
    "l_quantity" -> NumX100,
    "l_extendedprice" -> NumX100,
    "l_returnflag" -> Str,
    "l_shipdate" -> Millis
  )

  /** Derive a profile spec from a schema: numerics/booleans canonicalize
    * x100, timestamps/dates to epoch millis, strings raw; nested/binary
    * columns are skipped (profile the extracted features instead).
    */
  def columnSpec(df: DataFrame): Seq[(String, Kind)] = {
    import org.apache.spark.sql.types._
    df.schema.fields.toSeq.collect {
      case StructField(n, _: NumericType | BooleanType, _, _) => n -> NumX100
      case StructField(n, TimestampType | TimestampNTZType | DateType, _, _) =>
        n -> Millis
      case StructField(n, StringType, _, _) => n -> Str
    }
  }

  /** One row per profiled column, ordered by col_name: (col_name, n_rows,
    * n_nulls, n_distinct, min_num, max_num, min_str, max_str) — the
    * numeric/string pair not applicable to the column's type is NULL.
    * `cols` defaults to every profilable column in the schema; q68 passes
    * [[LINEITEM_COLS]] explicitly.
    */
  def profile(df: DataFrame, cols: Seq[(String, Kind)] = Nil): DataFrame =
    profileFromIndex(profileIndex(df, cols))

  /** The MERGEABLE half of [[profile]]: the canonicalized
    * (col_name, v_num, v_str, cnt) value-count relation. This is the
    * incremental-ANALYZE artifact — value counts are exactly mergeable
    * (sum per value group), unlike finished statistics (n_distinct of a
    * union is not the sum of n_distincts). An append-only corpus keeps
    * one index per ingested partition and merges; no 100 TB rescan to
    * refresh table stats. Size is bounded by per-column value
    * cardinality at the published x100/epoch-ms resolution; if that
    * approaches row count, swap in the q16b HLL registers (mergeable by
    * max) for the distinct component — nothing else changes.
    */
  def profileIndex(df: DataFrame, cols: Seq[(String, Kind)] = Nil)
  : DataFrame = {
    val COLS = if (cols.nonEmpty) cols else columnSpec(df)
    require(COLS.nonEmpty, "profile: no profilable columns")
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val pairs = COLS.map { case (name, kind) =>
      val c = col(name)
      val (vNum, vStr) = kind match {
        case NumX100 => (floor(c.cast("double") * 100 + lit(0.5)).cast("long"), nullS)
        // parquet reads TIMESTAMP_NTZ; the session timezone is pinned UTC
        // (Sessions/TestSpark), so the cast matches DuckDB's naive epoch_ms
        case Millis => (unix_millis(c.cast("timestamp")), nullS)
        case Str => (nullL, c)
      }
      struct(lit(name).as("col_name"), vNum.as("v_num"), vStr.as("v_str"))
    }
    df.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.*"))
      .groupBy("col_name", "v_num", "v_str")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge profile indexes built over disjoint row sets: one value-group
    * re-aggregation over relations already keyed by value — the exchange
    * carries index rows (bounded by value cardinality), never data rows.
    */
  def mergeProfileIndexes(indexes: DataFrame*): DataFrame = {
    require(indexes.nonEmpty, "mergeProfileIndexes: nothing to merge")
    indexes.reduce(_.unionAll(_))
      .groupBy("col_name", "v_num", "v_str")
      .agg(sum("cnt").as("cnt"))
  }

  /** Finalize statistics from a (merged) [[profileIndex]]. */
  def profileFromIndex(grouped: DataFrame): DataFrame = {
    val nonNull = col("v_num").isNotNull || col("v_str").isNotNull
    grouped.groupBy("col_name")
      .agg(
        sum("cnt").as("n_rows"),
        coalesce(sum(when(!nonNull, col("cnt"))), lit(0L)).as("n_nulls"),
        count(when(nonNull, lit(1))).as("n_distinct"),
        min("v_num").as("min_num"), max("v_num").as("max_num"),
        min("v_str").as("min_str"), max("v_str").as("max_str"))
      // a string column's numeric pair (and vice versa) is NULL by
      // construction — no post-processing needed; just fix column order
      .select("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str")
      .orderBy("col_name")
  }

  /** q78: [[profile]] grouped by a key column — the per-source/per-domain
    * data-quality view a corpus dashboard reads (each ingestion source
    * gets its own null rates, cardinalities and ranges, so one bad feed
    * can't hide inside corpus-wide stats). Identical single-scan melt
    * shape with the group key carried through both aggregates; output is
    * |groups| x |cols| rows. The group key rides the same exchange the
    * ungrouped profile already pays — per-group profiling is free at any
    * scale.
    */
  def profileBy(df: DataFrame, groupCol: String,
                cols: Seq[(String, Kind)] = Nil): DataFrame = {
    val COLS = if (cols.nonEmpty) cols
      else columnSpec(df).filterNot(_._1 == groupCol)
    require(COLS.nonEmpty, "profileBy: no profilable columns")
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val pairs = COLS.map { case (name, kind) =>
      val c = col(name)
      val (vNum, vStr) = kind match {
        case NumX100 => (floor(c.cast("double") * 100 + lit(0.5)).cast("long"), nullS)
        case Millis => (unix_millis(c.cast("timestamp")), nullS)
        case Str => (nullL, c)
      }
      struct(lit(name).as("col_name"), vNum.as("v_num"), vStr.as("v_str"))
    }
    val grouped = df
      .select(col(groupCol).as("grp"), explode(array(pairs: _*)).as("p"))
      .select(col("grp"), col("p.*"))
      .groupBy("grp", "col_name", "v_num", "v_str")
      .agg(count(lit(1)).as("cnt"))
    val nonNull = col("v_num").isNotNull || col("v_str").isNotNull
    grouped.groupBy("grp", "col_name")
      .agg(
        sum("cnt").as("n_rows"),
        coalesce(sum(when(!nonNull, col("cnt"))), lit(0L)).as("n_nulls"),
        count(when(nonNull, lit(1))).as("n_distinct"),
        min("v_num").as("min_num"), max("v_num").as("max_num"),
        min("v_str").as("min_str"), max("v_str").as("max_str"))
      .select(col("grp").as(groupCol), col("col_name"), col("n_rows"),
        col("n_nulls"), col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
      .orderBy(groupCol, "col_name")
  }

  /** The q78 spec: documents columns profiled per ingestion source (text
    * itself is excluded — min/max over full document bodies would shuffle
    * megabyte strings for a dashboard number; profile extracted features
    * instead).
    */
  val DOCUMENT_COLS: Seq[(String, Kind)] = Seq(
    "doc_id" -> NumX100,
    "lang" -> Str,
    "n_chars" -> NumX100
  )

  /** q74: equi-width histogram buckets for the CBO/skew view a profile's
    * min/max alone cannot give. Buckets partition the CLOSED integer span
    * [min, max] of the canonicalized value: bucket = (v-min)*nb // span,
    * span = max-min+1 — pure BIGINT arithmetic, so bucket boundaries (and
    * the whole histogram) hash-check cross-engine. Emits only non-empty
    * buckets with their true in-bucket (min, max, count).
    *
    * Scale shape: the min/max pre-pass is a tiny two-value aggregate —
    * and on a real warehouse it's FREE (parquet footer statistics carry
    * per-column min/max; Spark answers min/max from metadata when rows
    * carry no deletes) — then ONE hash-aggregate scan over nb-bounded
    * groups. Never a sort, never a shuffle wider than nb rows.
    */
  def histogram(df: DataFrame, column: String, kind: Kind = NumX100,
                nBuckets: Int = 16): DataFrame = {
    require(kind != Str, "histogram: equi-width buckets need a numeric or " +
      "timestamp column (strings have no width)")
    val v = kind match {
      case NumX100 => floor(col(column).cast("double") * 100 + lit(0.5)).cast("long")
      case Millis => unix_millis(col(column).cast("timestamp"))
      case Str => throw new IllegalArgumentException("unreachable")
    }
    val base = df.select(v.as("v")).filter(col("v").isNotNull)
    val Array(r) = base.agg(min("v"), max("v")).collect()
    if (r.isNullAt(0)) return base.sparkSession.emptyDataFrame
      .select(lit(0).as("bucket"), lit(0L).as("n_rows"),
        lit(0L).as("v_min"), lit(0L).as("v_max"))
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val span = mx - mn + 1
    // DIV, not `/`: Spark's / on longs is double division, and a float
    // quotient has no cross-engine exactness contract
    base
      .groupBy(expr(s"CAST(((v - $mn) * $nBuckets) DIV $span AS INT)")
        .as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("v").as("v_min"), max("v").as("v_max"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_profile" -> ((s, d) => profile(Tables.lineitem(s, d), LINEITEM_COLS)),
    "q74_histogram" -> ((s, d) =>
      histogram(Tables.lineitem(s, d), "l_extendedprice", NumX100, 16)),
    "q78_profile_by_source" -> ((s, d) =>
      profileBy(Tables.documents(s, d), "source", DOCUMENT_COLS)),
    // q84: the incremental path must reproduce the full-scan statistics
    // EXACTLY — build per-partition indexes over a deterministic split,
    // merge, finalize; the oracle is q68's whole-table SQL
    "q84_profile_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val even = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
      val odd = li.filter(pmod(col("l_orderkey"), lit(2)) === 1)
      profileFromIndex(mergeProfileIndexes(
        profileIndex(even, LINEITEM_COLS),
        profileIndex(odd, LINEITEM_COLS)))
    })
  )

  /** The twin runs one select per column over the same canonicalized
    * values (DuckDB has no single-pass unpivot-profile shorthand).
    */
  private def profileOracleSql: String = {
    val selects = LINEITEM_COLS.map { case (name, kind) =>
      val v = kind match {
        case NumX100 =>
          s"CAST(FLOOR(CAST($name AS DOUBLE) * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        case Millis => s"CAST(epoch_ms($name) AS BIGINT)"
        case Str => name
      }
      val (mn, mx, ms, xs) = kind match {
        case Str => ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)",
          "MIN(v)", "MAX(v)")
        case _ => ("CAST(MIN(v) AS BIGINT)", "CAST(MAX(v) AS BIGINT)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT '$name' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
         |FROM (SELECT $v AS v FROM lineitem)""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** q78 twin: one grouped select per column, unioned. */
  private def profileBySourceOracleSql: String = {
    val selects = DOCUMENT_COLS.map { case (name, kind) =>
      val v = kind match {
        case NumX100 =>
          s"CAST(FLOOR(CAST($name AS DOUBLE) * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        case Millis => s"CAST(epoch_ms($name) AS BIGINT)"
        case Str => name
      }
      val (mn, mx, ms, xs) = kind match {
        case Str => ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)",
          "MIN(v)", "MAX(v)")
        case _ => ("CAST(MIN(v) AS BIGINT)", "CAST(MAX(v) AS BIGINT)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT source, '$name' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
         |FROM (SELECT source, $v AS v FROM documents) GROUP BY source""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY source, col_name")
  }

  val oracleSql: Map[String, String] = Map(
    "q68_profile" -> profileOracleSql,
    // the merge path must equal the full scan — same twin as q68
    "q84_profile_merge" -> profileOracleSql,
    "q78_profile_by_source" -> profileBySourceOracleSql,
    "q74_histogram" ->
      """WITH v AS (SELECT CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100
        |                 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT MIN(v) AS mn, MAX(v) AS mx, MAX(v) - MIN(v) + 1 AS span FROM v)
        |SELECT CAST(((v - mn) * 16) // span AS INT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(MIN(v) AS BIGINT) AS v_min, CAST(MAX(v) AS BIGINT) AS v_max
        |FROM v, s
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
