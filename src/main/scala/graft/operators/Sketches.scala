package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Cross-engine-portable approximate sketches (E-4's HLL/percentile surface
  * re-expressed so the driver's DuckDB gate can hash-check them exactly).
  *
  * Spark's built-in sketches (`approx_count_distinct` HLL++,
  * `percentile_approx` t-digest-ish) are engine-internal: their estimates
  * can't be reproduced in another engine, so queries using them only ever
  * got a rows-only check. These implementations keep the SAME sketch
  * contract — fixed-size mergeable state, one pass, scale-independent —
  * but define every step over portable primitives (md5-derived 60-bit
  * hashes, integer registers, literal constants emitted from one Scala
  * source into BOTH the Spark plan and the DuckDB oracle SQL), so the
  * estimate itself is bit-reproducible across engines and the gate becomes
  * a hard equality check, not a shrug.
  *
  * Scale shape (100 TB): both sketches are two-level aggregates — a
  * map-side partial per partition and a merge of fixed-size state (16 HLL
  * registers / O(buckets) histogram counts), so the shuffle carries KB per
  * partition regardless of input rows.
  */
object Sketches {

  /** Portable 60-bit hash: the first 15 hex digits of md5. Identical in
    * DuckDB as `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)` — see
    * [[phash60Sql]]. 60 bits keeps it positive and exactly representable.
    * Backed by the native codegen'd [[graft.functions.PHash60]] (no hex
    * string round-trip); callers must have run `GraftFunctions.register`
    * on the session — every operator entry point here does.
    */
  private[operators] def phash60(c: Column): Column =
    graft.functions.GraftFunctions.phash60(c)

  /** The composed built-in form (hex round-trip) the native expression
    * must bit-match — kept for the PHash60Spec equivalence pin.
    */
  private[graft] def phash60Composed(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private[operators] def phash60Sql(x: String): String =
    s"CAST(('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 15)) AS BIGINT)"

  // ---------------------------------------------------------------- HLL --

  private val HLL_P = 6                 // 2^6 = 64 registers (~13% std err)
  private val HLL_M = 64
  private val WBITS = 60 - HLL_P        // rank bits per hash
  private val RHO_MAX = WBITS + 1       // rho range: 1..55 (w=0 -> 55)
  // alpha_64 * m^2 * 2^55 — the scaled-integer harmonic-mean numerator.
  // Registers are summed as exact BIGINTs 2^(55-rho) (so float summation
  // order can never differ between engines); the single final division is
  // one IEEE op, identical everywhere. alpha_64 = 0.7213/(1 + 1.079/64)
  // per the HyperLogLog paper's bias constant.
  private val ALPHA_NUM: Double =
    0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * math.pow(2.0, RHO_MAX)
  // Linear-counting lookup m*ln(m/V): computed once HERE and emitted as the
  // same double literal into both engines, so no cross-engine ln() appears.
  private val LN_TABLE: Seq[(Int, Double)] =
    (1 until HLL_M).map(v => v -> HLL_M * math.log(HLL_M.toDouble / v))

  /** rho = leading-zero count of the 56-bit rank + 1, via the portable
    * binary-string length (both engines: `length(bin(w))`).
    */
  private def rhoCol(w: Column): Column =
    when(w === 0L, lit(RHO_MAX)).otherwise(lit(RHO_MAX) - length(bin(w)))

  /** The HLL register table of `keyCol`: (bucket, rho-max). A SINGLE
    * aggregation, so the same fragment maintains registers incrementally
    * under Structured Streaming (the registers are the sketch's mergeable
    * state — max is associative and commutative); the streaming spec pins
    * stream-maintained registers == batch registers.
    */
  def hllRegisters(df: DataFrame, keyCol: Column): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = phash60(keyCol)
    df.select(h.bitwiseAND(lit((HLL_M - 1).toLong)).as("bucket"),
        shiftrightunsigned(h, HLL_P).as("w"))
      .select(col("bucket"), rhoCol(col("w")).as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** Harmonic-mean estimate over a (bucket, rho) register table. */
  def hllEstimateFromRegisters(regs: DataFrame, out: String): DataFrame = {
    val agg = regs.agg(count(lit(1)).as("nb"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($RHO_MAX - rho AS INT))")).as("s"))
    val sTotal = (col("s") +
      (lit(HLL_M.toLong) - col("nb")) * lit(1L << RHO_MAX)).cast("double")
    val rawE = lit(ALPHA_NUM) / sTotal
    val v = (lit(HLL_M.toLong) - col("nb"))
    val linear = LN_TABLE.foldLeft(lit(Double.NaN): Column) {
      case (acc, (vv, lnv)) => when(v === vv.toLong, lit(lnv)).otherwise(acc)
    }
    val est = when(rawE <= lit(2.5 * HLL_M) && v > 0L, linear).otherwise(rawE)
    agg.select(floor(est + lit(0.5)).cast("long").as(out))
  }

  /** Portable HLL distinct-count estimate of `keyCol` as a 1-row frame.
    * Plan shape: project(hash bits) -> partial max per partition ->
    * exchange of <=64 rows -> final estimate expression.
    */
  def hllCountDistinct(df: DataFrame, keyCol: Column, out: String): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, keyCol), out)

  /** The DuckDB twin of [[hllCountDistinct]] over table/column names. */
  def hllSql(table: String, key: String, out: String): String = {
    val lnCase = LN_TABLE.reverse
      .map { case (vv, lnv) => s"WHEN v = $vv THEN CAST(${lnv} AS DOUBLE)" }
      .mkString("CASE ", " ", " ELSE CAST('NaN' AS DOUBLE) END")
    s"""WITH h AS (SELECT ${phash60Sql(key)} AS h FROM $table),
       |b AS (SELECT h & ${HLL_M - 1} AS bucket, h >> $HLL_P AS w FROM h),
       |r AS (SELECT bucket,
       |        MAX(CASE WHEN w = 0 THEN $RHO_MAX ELSE $RHO_MAX - length(bin(w)) END) AS rho
       |      FROM b GROUP BY bucket),
       |a AS (SELECT COUNT(*) AS nb,
       |        CAST(SUM(1::BIGINT << ($RHO_MAX - rho)) AS BIGINT) AS s
       |      FROM r),
       |e AS (SELECT $HLL_M - nb AS v,
       |        CAST(${ALPHA_NUM} AS DOUBLE)
       |          / CAST(s + ($HLL_M - nb) * (1::BIGINT << $RHO_MAX) AS DOUBLE) AS raw
       |      FROM a)
       |SELECT CAST(FLOOR((CASE WHEN raw <= ${2.5 * HLL_M} AND v > 0
       |         THEN $lnCase ELSE raw END) + 0.5) AS BIGINT) AS $out
       |FROM e""".stripMargin
  }

  // ---------------------------------------------- histogram percentiles --

  /** Equi-width-histogram quantile over a pre-scaled exact-integer value:
    * bucket counts (the fixed-size mergeable state), cumulative rank, and
    * linear interpolation inside the target bucket. rank = ceil(q*n);
    * estimate = b*W + W*(rank - cumBefore)/cnt — every input to the float
    * ops is an exact integer, so both engines produce the same double.
    */
  def histQuantile(df: DataFrame, grp: String, valX: Column, q: Double,
                   width: Long, out: String): DataFrame = {
    val counts = df
      .groupBy(col(grp), floor(valX / lit(width.toDouble)).cast("long").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(grp).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(grp)
    val withCum = counts
      .withColumn("cum_before", coalesce(sum("cnt").over(wCum), lit(0L)))
      .withColumn("n", sum("cnt").over(wTot))
    val rank = ceil(lit(q) * col("n").cast("double"))
    withCum
      .filter(col("cum_before") < rank && (col("cum_before") + col("cnt")) >= rank)
      .select(col(grp),
        floor(col("b").cast("double") * lit(width.toDouble) +
          lit(width.toDouble) * (rank - col("cum_before")).cast("double") /
            col("cnt").cast("double") + lit(0.5))
          .cast("long").as(out))
  }

  /** DuckDB twin of [[histQuantile]]: `valX` must be the SQL for the SAME
    * scaled-integer value expression.
    */
  def histQuantileSql(table: String, grp: String, valX: String, q: Double,
                      width: Long, out: String): String =
    s"""SELECT $grp,
       |  CAST(FLOOR(CAST(b AS DOUBLE) * ${width}.0 +
       |    ${width}.0 * CAST(rank - cum_before AS DOUBLE) / CAST(cnt AS DOUBLE)
       |    + 0.5) AS BIGINT) AS $out
       |FROM (
       |  SELECT $grp, b, cnt,
       |    COALESCE(CAST(SUM(cnt) OVER (PARTITION BY $grp ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before,
       |    CEIL(CAST($q AS DOUBLE) *
       |      CAST(CAST(SUM(cnt) OVER (PARTITION BY $grp) AS BIGINT) AS DOUBLE)) AS rank
       |  FROM (SELECT $grp, CAST(FLOOR(($valX) / ${width}.0) AS BIGINT) AS b,
       |          COUNT(*) AS cnt
       |        FROM $table GROUP BY 1, 2))
       |WHERE cum_before < rank AND cum_before + cnt >= rank""".stripMargin

  // ---------------------------------------------------------- count-min --

  private val CM_D = 4   // hash rows
  private val CM_W = 64  // counters per row

  /** Exact per-token counts over `documents` — the input relation every
    * count-min stage consumes (vocabulary-sized; built with one explode +
    * one partially-aggregated groupBy).
    */
  private[operators] def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))

  /** Count-min sketch counters from a (t, c) token-count relation: CM_D x
    * CM_W exact-integer cells, each the sum of counts hashing there under
    * the row's seeded portable hash. Fixed-size mergeable state (counters
    * are LINEAR: sketch(A u B) = sketch(A) + sketch(B) cell-wise —
    * SketchesSpec pins it), completing the classic sketch trio: HLL
    * (cardinality), histogram (quantiles), count-min (frequency).
    */
  /** The CM_D (row, cell) probe coordinates of a token — ONE definition
    * shared by the counter build and the estimate probe, so the seeding
    * scheme can never diverge between them.
    */
  private def cmCells(tok: Column): Column =
    array((0 until CM_D).map(i =>
      struct(lit(i).as("i"),
        pmod(phash60(concat(lit(s"$i:"), tok)), lit(CM_W.toLong))
          .as("cell"))): _*)

  private[operators] def cmCounters(tokCounts: DataFrame): DataFrame =
    tokCounts
      .select(col("c"), explode(cmCells(col("t"))).as("rc"))
      .groupBy(col("rc.i").as("i"), col("rc.cell").as("cell"))
      .agg(sum("c").as("s"))

  /** q59: heavy hitters — the exact top-10 tokens (count desc, token asc)
    * with their count-min estimates alongside the truth. The estimate is
    * min over rows of the token's cell counter, so cm_est >= exact_cnt
    * always (one-sided error — the count-min guarantee; spec-pinned). At
    * 100 TB the exact top-k is what you CANNOT afford per-window — the
    * sketch is 256 integers of mergeable state; the exact side here exists
    * to make the estimates' accuracy visible and oracle-checkable.
    */
  def heavyHitters(docs: DataFrame, k: Int = 10,
                   cache: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // the token counts feed the counter build and the exact top-k;
    // cache=false for long-lived facade sessions (repo-wide convention)
    val tc0 = tokenCounts(docs)
    val tc = if (cache) tc0.persist() else tc0
    val counters = cmCounters(tc)
    val top = tc.orderBy(col("c").desc, col("t")).limit(k)
    top
      .select(col("t"), col("c"), explode(cmCells(col("t"))).as("rc"))
      .join(broadcast(counters),
        col("rc.i") === col("i") && col("rc.cell") === col("cell"))
      .groupBy(col("t").as("token"), col("c").as("exact_cnt"))
      .agg(min("s").as("cm_est"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q59: count-min heavy hitters (see [[heavyHitters]]).
    "q59_heavy_hitters" -> ((s, d) =>
      heavyHitters(Tables.documents(s, d))),

    // Q16b: HLL sketch distinct count — the 100 TB path where an exact
    // distinct would shuffle every key. Portable registers => exact oracle.
    "q16b_hll_users" -> ((s, d) =>
      hllCountDistinct(Tables.events(s, d), col("user_id"), "approx_users")),

    // Q34b: histogram-sketch percentiles (fixed-state mergeable, the scale
    // alternative to q34's exact sort-based percentile). Bucket widths:
    // price 100 units (x100-scaled: 10000), quantity 1 unit (x100: 100).
    "q34b_percentile_approx" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val price = histQuantile(
        li.select(col("l_returnflag"), Relational.scaled(col("l_extendedprice"), 100).as("vx")),
        "l_returnflag", col("vx"), 0.5, 10000, "p50_approx_x100")
      val qty = histQuantile(
        li.select(col("l_returnflag"), Relational.scaled(col("l_quantity"), 100).as("vx")),
        "l_returnflag", col("vx"), 0.9, 100, "p90_qty_x100")
      price.join(qty, Seq("l_returnflag")).orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q59_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
         |tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
         |cells AS (SELECT i, t, c,
         |    ${phash60Sql("CAST(i AS VARCHAR) || ':' || t")} % $CM_W AS cell
         |  FROM tc, unnest(range(0, $CM_D)) AS u(i)),
         |counters AS (SELECT i, cell, CAST(SUM(c) AS BIGINT) AS s
         |             FROM cells GROUP BY i, cell),
         |top AS (SELECT t, c FROM tc ORDER BY c DESC, t LIMIT 10)
         |SELECT top.t AS token, top.c AS exact_cnt, CAST(MIN(s) AS BIGINT) AS cm_est
         |FROM top
         |JOIN cells ON cells.t = top.t
         |JOIN counters ON counters.i = cells.i AND counters.cell = cells.cell
         |GROUP BY top.t, top.c
         |ORDER BY exact_cnt DESC, token""".stripMargin,

    "q16b_hll_users" -> hllSql("events", "user_id", "approx_users"),

    "q34b_percentile_approx" -> {
      val price = histQuantileSql("lineitem", "l_returnflag",
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)", 0.5, 10000, "p50_approx_x100")
      val qty = histQuantileSql("lineitem", "l_returnflag",
        "CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)", 0.9, 100, "p90_qty_x100")
      s"""WITH price AS ($price),
         |qty AS ($qty)
         |SELECT l_returnflag, p50_approx_x100, p90_qty_x100
         |FROM price JOIN qty USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin
    }
  )
}
