package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** q68: table statistics collection (the ANALYZE shape a cost-based
  * optimizer feeds on) — per-column row/null/distinct counts and typed
  * min/max, computed in ONE aggregation pass over the table and unpivoted
  * to a tall (col_name, stats) relation.
  *
  * Shape notes for 100 TB:
  *  - Everything is a single global hash aggregate: no per-column rescans
  *    (a naive ANALYZE runs one scan per column; this runs one total).
  *  - The exact multi-column `count_distinct` makes Catalyst plan an
  *    Expand (rows x n_profiled_columns before partial aggregation) —
  *    the standard exact shape, kept here because exactness is what the
  *    DuckDB oracle can check. At real scale swap the distinct counters
  *    for the q16b HLL registers ([[Sketches]]) and the Expand disappears;
  *    the rest of the pass is unchanged.
  *  - Numeric min/max are emitted x100-scaled BIGINT and timestamps as
  *    epoch millis, so every value hash-checks cross-engine (no float or
  *    timestamp rendering in the output).
  */
object Profile {

  /** One profiled column: name, the raw column, and how min/max surface
    * (numeric x100 scale, epoch millis, or lexicographic string).
    */
  private sealed trait Kind
  private case object NumX100 extends Kind // double/int -> x100 BIGINT
  private case object Millis extends Kind // timestamp -> epoch ms BIGINT
  private case object Str extends Kind // string -> min_str/max_str

  private val COLS: Seq[(String, Kind)] = Seq(
    "l_orderkey" -> NumX100,
    "l_quantity" -> NumX100,
    "l_extendedprice" -> NumX100,
    "l_returnflag" -> Str,
    "l_shipdate" -> Millis
  )

  private def numX100(c: Column): Column =
    floor(c.cast("double") * 100 + lit(0.5)).cast("long")

  /** Single-pass profile of `df` restricted to `cols`. Output rows ordered
    * by col_name: (col_name, n_rows, n_nulls, n_distinct, min_num,
    * max_num, min_str, max_str) — the numeric/string pair not applicable
    * to the column's type is NULL.
    */
  def profile(df: DataFrame): DataFrame = profile(df, COLS)

  private def profile(df: DataFrame, cols: Seq[(String, Kind)]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap {
      case (name, kind) =>
        val c = col(name)
        val (mn, mx) = kind match {
          case NumX100 => (numX100(min(c)), numX100(max(c)))
          // parquet reads as TIMESTAMP_NTZ; the session timezone is pinned
          // UTC (Sessions/TestSpark), so the cast matches DuckDB's naive
          // epoch_ms exactly
          case Millis => (unix_millis(min(c).cast("timestamp")),
            unix_millis(max(c).cast("timestamp")))
          case Str => (min(c), max(c))
        }
        Seq(
          sum(c.isNull.cast("long")).as(s"${name}__nulls"),
          count_distinct(c).as(s"${name}__nd"),
          mn.as(s"${name}__min"), mx.as(s"${name}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { case (name, kind) =>
      val (minNum, maxNum, minStr, maxStr) = kind match {
        case Str => (lit(null).cast("long"), lit(null).cast("long"),
          col(s"${name}__min"), col(s"${name}__max"))
        case _ => (col(s"${name}__min"), col(s"${name}__max"),
          lit(null).cast("string"), lit(null).cast("string"))
      }
      struct(lit(name).as("col_name"), col("n_rows").as("n_rows"),
        col(s"${name}__nulls").as("n_nulls"),
        col(s"${name}__nd").as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy("col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_profile" -> ((s, d) => profile(Tables.lineitem(s, d)))
  )

  /** The twin runs one select per column (DuckDB has no single-pass
    * unpivot-profile shorthand); values use the same x100/epoch-ms
    * contracts.
    */
  private def profileOracleSql: String = {
    val selects = COLS.map { case (name, kind) =>
      val (mn, mx, ms, xs) = kind match {
        case NumX100 =>
          (s"CAST(FLOOR(CAST(MIN($name) AS DOUBLE) * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)",
            s"CAST(FLOOR(CAST(MAX($name) AS DOUBLE) * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case Millis =>
          (s"CAST(epoch_ms(MIN($name)) AS BIGINT)",
            s"CAST(epoch_ms(MAX($name)) AS BIGINT)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case Str =>
          ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)",
            s"MIN($name)", s"MAX($name)")
      }
      s"""SELECT '$name' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $name) AS BIGINT) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
         |FROM lineitem""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val oracleSql: Map[String, String] = Map(
    "q68_profile" -> profileOracleSql
  )
}
