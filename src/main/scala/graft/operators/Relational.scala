package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Analytics operators over the driver fixtures (SURVEY.md s2.5 E-2..E-8,
  * s2.6 Q8-Q17): filter/project, hash aggregation, join chains, broadcast
  * joins, semi/anti joins, window functions, rollup, set ops, distinct
  * counting, and time-bucketed event aggregation.
  *
  * Determinism policy for the DuckDB oracle gate: computed doubles never
  * reach the output raw. Row-level monetary expressions are converted to
  * scaled BIGINTs with floor(x*10^s + 0.5) — floor is IEEE-exact and
  * bit-identical across engines, unlike ROUND, whose tie-breaking on binary
  * doubles differs between Spark (decimal-string HALF_UP) and DuckDB.
  * Aggregates sum those exact integers (deterministic in any order), and
  * only then optionally divide back to double (exact ints < 2^53 divide
  * deterministically). Raw column pass-throughs (same parquet value in both
  * engines) are emitted freely.
  *
  * Scale notes are on each operator: all aggregations are declarative
  * groupBy/agg so Catalyst plans partial (map-side) aggregation before the
  * shuffle; dimension joins are explicitly broadcast; fact-fact joins
  * shuffle on the join key and benefit from AQE skew handling.
  */
object Relational {

  /** floor(c * 10^scale + 0.5) as BIGINT — deterministic scaled fixed-point. */
  private[operators] def scaled(c: Column, pow10: Double): Column =
    floor(c * lit(pow10) + lit(0.5)).cast("long")

  private val revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** q105: FUNNEL ANALYTICS over the event stream — how many users reach
    * each stage of an ordered event sequence, where stage k counts only
    * events STRICTLY AFTER the user's stage-(k-1) anchor time (the classic
    * conversion funnel; re-orderings don't count). Output is one row per
    * stage with exact-integer user counts and step/overall conversion
    * ratios x1e3.
    *
    * Shape: per-stage min-timestamp aggregates keyed on user_id. Stage k
    * is one equi-join against the stage-(k-1) anchors (same key, so the
    * exchange is reused across stages) plus one partial-aggregating
    * groupBy; the report is stages-many rows, the final window runs over
    * those rows only — no corpus-wide sort anywhere.
    */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    var anchor = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts_us").as("t"))
    var stageCounts = Seq(
      anchor.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("stage"), lit(stages.head).as("event_type"),
          col("n_users")))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      anchor = ev.filter(col("event_type") === st)
        .join(anchor.withColumnRenamed("t", "prev_t"), "user_id")
        .filter(col("ts_us") > col("prev_t"))
        .groupBy("user_id").agg(min("ts_us").as("t"))
      stageCounts :+= anchor.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"),
          col("n_users"))
    }
    val w = Window.orderBy("stage") // stages-many rows: tiny by contract
    stageCounts.reduce(_ unionAll _)
      .select(col("stage"), col("event_type"), col("n_users"),
        lag(col("n_users"), 1).over(w).as("prev"),
        first(col("n_users")).over(w).as("frst"))
      .selectExpr("stage", "event_type", "n_users",
        "CAST(CASE WHEN prev IS NULL THEN 1000 WHEN prev = 0 THEN 0 " +
          "ELSE (n_users * 1000) DIV prev END AS BIGINT) AS conv_prev_x1e3",
        "CAST(CASE WHEN frst = 0 THEN 0 " +
          "ELSE (n_users * 1000) DIV frst END AS BIGINT) AS conv_first_x1e3")
      .orderBy("stage")
  }

  /** q108: RETENTION COHORTS — for each signup-day cohort, how many users
    * were active again k days later. Days are epoch-day integers
    * (unix_micros DIV 86.4e9 — no calendar functions, so both engines
    * bucket identically and the matrix is exact integers end to end).
    * Cohort = the user's FIRST signup day; activity = any event type on
    * or after it.
    *
    * Shape: one pass to (user, day) distinct activity, one tiny aggregate
    * for cohort anchors, one equi-join on user_id, one partial-
    * aggregating groupBy on (cohort_day, offset) — the output is
    * cohort x horizon sized, never event-stream sized.
    */
  def retention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts) DIV 86400000000").as("day"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("c_day"))
    val act = ev.select("user_id", "day").distinct()
    cohort.join(act, "user_id")
      .filter(col("day") >= col("c_day"))
      .groupBy(col("c_day").as("cohort_day"),
        (col("day") - col("c_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, day) is distinct already
      .orderBy("cohort_day", "day_offset")
  }

  /** q110: BURST DETECTION over the event stream — hourly counts per
    * event type flagged when they reach `factorX100`/100 times the mean
    * of the previous `window` OBSERVED hours (gaps skip, documented).
    * Division-free exactness: the threshold test multiplies through
    * (n * 100 * n_prev >= factor * base_sum), so the flag is pure integer
    * comparison and the report hash-checks. Hours are epoch-hour integers
    * (no calendar functions).
    *
    * Shape: one partial-aggregating groupBy to hourly counts (output is
    * type x hour sized), then a per-type ordered window over that small
    * relation — the event stream itself is never sorted.
    */
  def burstDetection(events: DataFrame, factorX100: Int = 200,
                     window: Int = 3): DataFrame =
    burstFlags(hourlyCounts(events), factorX100, window)

  /** The (event_type, h, n) hourly-count relation — ADDITIVE, which is
    * the whole monitoring story: per-batch partial counts persisted by
    * the streaming ingest sum to exactly this relation, so flags off the
    * merged index equal the batch computation ([[burstFlags]]).
    */
  private[graft] def hourlyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("n"))

  /** The flag tail over an (event_type, h, n) relation (pre-summed if it
    * came from partial counts).
    */
  private[graft] def burstFlags(hourly: DataFrame, factorX100: Int = 200,
                                window: Int = 3): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(-window, -1)
    hourly
      .select(col("event_type"), col("h"), col("n"),
        coalesce(sum("n").over(w), lit(0L)).as("base_sum"),
        count("n").over(w).as("n_prev"))
      .selectExpr("event_type", "h", "n", "base_sum", "n_prev",
        s"CAST(CASE WHEN n_prev = $window AND n * 100 * n_prev >= " +
          s"$factorX100 * base_sum THEN 1 ELSE 0 END AS BIGINT) AS burst")
      .orderBy("event_type", "h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q105: three-stage conversion funnel over the event stream.
    "q105_funnel" -> ((s, d) => funnel(Tables.events(s, d))),

    // Q108: signup-cohort retention matrix over the event stream.
    "q108_retention" -> ((s, d) => retention(Tables.events(s, d))),

    // Q110: hourly burst flags per event type (2x trailing-3h mean).
    "q110_burst_detection" -> ((s, d) => burstDetection(Tables.events(s, d))),

    // Q8 (E-2): filter + project + arithmetic. The shipdate range and
    // discount predicates are pushed into the parquet scan (PushedFilters);
    // only 3 of 11 lineitem columns are read (ReadSchema pruning).
    "q08_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
                col("l_shipdate") < lit("1996-01-01") &&
                col("l_discount") > lit(0.05))
        .select(col("l_orderkey"), col("l_linenumber"),
          scaled(revenue, 1e4).as("revenue_x1e4"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Q9 (E-4): TPC-H Q1 shape — hash aggregation with map-side partial
    // aggregation; the only shuffle carries 4 groups, not 600k rows.
    "q09_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(scaled(col("l_quantity"), 100)).as("qty_x100"),
          sum(scaled(col("l_extendedprice"), 100)).as("base_x100"),
          sum(scaled(revenue, 1e4)).as("disc_x1e4"),
          sum(scaled(revenue * (lit(1.0) + col("l_tax")), 1e4)).as("charge_x1e4"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("qty_x100").cast("double") / 100).as("sum_qty"),
          (col("base_x100").cast("double") / 100).as("sum_base_price"),
          (col("disc_x1e4").cast("double") / 10000).as("sum_disc_price"),
          (col("charge_x1e4").cast("double") / 10000).as("sum_charge"),
          (col("qty_x100").cast("double") / (lit(100.0) * col("count_order"))).as("avg_qty"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q10 (E-3): join chain customer >< orders >< lineitem. Both joins
    // shuffle on their keys (fact-fact); at cluster scale bucketing
    // orders/lineitem by orderkey makes the second join co-partitioned.
    "q10_segment_revenue" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_mktsegment")
        .agg(sum(scaled(revenue, 1e4)).as("rev_x1e4"),
             count(lit(1)).as("n_items"))
        .select(col("c_mktsegment"),
          (col("rev_x1e4").cast("double") / 10000).as("revenue"),
          col("n_items"))
        .orderBy("c_mktsegment")),

    // Q11 (E-3): star-schema dims — region and nation are tiny, broadcast
    // both so the customer scan never shuffles.
    "q11_region_customers" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_name")),

    // Q12 (E-3): existence joins. Semi/anti never materialize the right
    // side's columns — the build side is just a key set.
    "q12_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")),

    "q12_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")),

    // Q13 (E-5/E-6): top-k per group via row_number window — one shuffle on
    // the partition key, sort within partitions only.
    "q13_top_orders" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          scaled(col("o_totalprice"), 100).as("price_x100"),
          row_number().over(w).cast("int").as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    }),

    // Q14 (E-4): rollup with pinned NULL handling — GROUPING() markers and
    // COALESCE'd names keep subtotal rows unambiguous and orderable.
    "q14_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
             grouping(col("o_orderpriority")).cast("int").as("g1"),
             grouping(col("o_orderstatus")).cast("int").as("g2"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("g1"), col("g2"), col("n"))
        .orderBy("g1", "g2", "priority", "status")),

    // Q15 (E-7): set difference. EXCEPT is set-distinct in both engines.
    "q15_except" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"))
        .except(Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey")))
        .orderBy("o_orderkey")),

    // Q16 (E-4): exact distinct count — expands to a two-phase aggregate
    // (partial distinct per partition, then merge).
    "q16_distinct_users" -> ((s, d) =>
      Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))),

    // Q16b (HLL sketch variant) lives in operators.Sketches: the portable
    // register construction there makes the estimate oracle-checkable,
    // which Spark's engine-internal approx_count_distinct can never be.

    // Q17 (E-8 batch form): tumbling 1-hour buckets. date_trunc keeps the
    // grouping key computable inside codegen; the streaming twin uses
    // window()+watermark (graft.streaming.EventPipelines).
    "q17_hourly_events" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"))
        .agg(count(lit(1)).as("n"),
             sum(scaled(col("value"), 1e4)).as("value_x1e4"))
        .select(col("event_type"), col("hour_start"), col("n"),
          (col("value_x1e4").cast("double") / 10000).as("sum_value"))
        .orderBy("event_type", "hour_start")),

    // Q55 (E-8 batch twin): gap-based sessionization — the lag/cumulative
    // window idiom over per-user event streams; StreamingSpec pins equality
    // with the streaming session_window form.
    "q55_sessionize" -> ((s, d) =>
      graft.streaming.EventPipelines.sessionizeBatch(Tables.events(s, d))),

    // Q30 (E-2): semi-structured access — events.props is a JSON string;
    // parse with an explicit schema (never inference) and aggregate on the
    // extracted field. from_json is codegen'd and prunes to the one field.
    "q30_props_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), lit("k BIGINT")).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_with_k"),
             sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // Q31 (E-5): window frames — lag and a running range/rows frame per
    // customer ordered by date. One shuffle on the partition key.
    "q31_window_frames" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          scaled(col("o_totalprice"), 100).as("price_x100"),
          sum(scaled(col("o_totalprice"), 100)).over(running).as("run_x100"),
          lag(scaled(col("o_totalprice"), 100), 1).over(byCust).as("prev_x100"),
          row_number().over(byCust).cast("int").as("seq"))
        .orderBy("o_custkey", "seq")
    }),

    // Q14b (E-4): full cube over the same keys as the rollup.
    "q14b_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
             grouping(col("o_orderpriority")).cast("int").as("g1"),
             grouping(col("o_orderstatus")).cast("int").as("g2"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("g1"), col("g2"), col("n"))
        .orderBy("g1", "g2", "priority", "status")),

    // Q15b (E-7): set intersection (order keys present in both relations).
    "q15b_intersect" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"))
        .intersect(Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey")))
        .orderBy("o_orderkey")),

    // Q34 (E-4): exact continuous median (single-pass sort-based
    // aggregate). Inputs are pre-scaled to exact integers so the p=0.5
    // interpolation midpoint is a half-integer — exactly representable in
    // both engines, immune to (1-f)*a+f*b vs a+f*(b-a) formula differences.
    // Non-half quantiles are inherently formula-sensitive on decimals and
    // live in the sketch variant (q34b) instead.
    "q34_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          scaledAgg(percentile(scaled(col("l_quantity"), 100), lit(0.5)), 10.0)
            .as("p50_qty_c_x10"),
          scaledAgg(percentile(scaled(col("l_extendedprice"), 100), lit(0.5)), 10.0)
            .as("p50_price_c_x10"))
        .orderBy("l_returnflag")),

    // Q34b (sketch percentiles) lives in operators.Sketches: the histogram
    // sketch there has the same fixed-state mergeable contract as
    // percentile_approx but is reproducible in the DuckDB oracle.

    // Q35 (E-4): moment-based statistics. Computed in one pass via
    // co-moments; emitted floor-scaled (see determinism note — the
    // co-moment recurrences are IEEE-stable enough that 1e4 scaling is far
    // above cross-engine noise).
    "q35_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          scaledAgg(stddev_samp(col("l_quantity")), 10000.0).as("sd_qty_x1e4"),
          scaledAgg(corr(col("l_quantity"), col("l_extendedprice")) * 1e4, 1.0).as("corr_x1e4"),
          scaledAgg(covar_samp(col("l_discount"), col("l_tax")) * 1e6, 1.0).as("cov_x1e6"))
        .orderBy("l_returnflag")),

    // Q36 (E-2/E-4): ordered array aggregation — collect_list is
    // order-nondeterministic, so sort_array pins it; emitted as a joined
    // string, which both engines can produce identically.
    "q36_array_agg" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("r_name")),

    // Q38: AS-OF join — each error event matched to the same user's most
    // recent preceding purchase. Spark lacks a native as-of join, so this
    // is the compose-existing-ops form (preference (a)): one window pass
    // carrying the running last purchase id per user in event-time order —
    // a single shuffle on user_id, no range join, no cross product. The
    // oracle uses DuckDB's native ASOF LEFT JOIN (fixture timestamps are
    // globally unique, so <= semantics and the running-last are identical).
    "q38_asof_join" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // (ts, event_id) ordering: deterministic even if a future fixture
      // ever lands two same-user events in one microsecond
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        // only the two participating types feed the window — the other ~60%
        // of events neither produce output nor carry purchase state
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("purchase_id",
          last(when(col("event_type") === "purchase", col("event_id")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("purchase_id"))
        .orderBy("error_id")
    }),

    // Q39: range join — facts against interval bands. The band table is
    // tiny and broadcast, so the non-equi predicate runs as a broadcast
    // nested-loop over 4 rows per fact row (never a shuffle); at scale
    // with a LARGE interval side you'd bucket both sides by range instead.
    "q39_range_join" -> ((s, d) => {
      val bands = Seq(
        ("A_low", 0.0, 20000.0), ("B_mid", 20000.0, 40000.0),
        ("C_high", 40000.0, 60000.0), ("D_top", 60000.0, 1e9))
      import s.implicits._
      val bandDf = bands.toDF("band", "lo", "hi")
      Tables.lineitem(s, d)
        .join(broadcast(bandDf),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
             sum(scaled(col("l_extendedprice"), 100)).as("total_c"))
        .orderBy("band")
    }),

    // Q37 (E-4): pivot — orderstatus columns per priority. Spark's pivot
    // lowers to conditional aggregation; the oracle spells that lowering
    // out, which is also the portable form.
    "q37_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"),
          col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
        .orderBy("o_orderpriority"))
  )

  /** floor(expr * 100 + 0.5) as BIGINT for aggregate outputs; pass scale=1.0
    * when the expression is already pre-scaled.
    */
  private def scaledAgg(c: Column, factor: Double = 100.0): Column =
    floor(c * lit(factor) + lit(0.5)).cast("long")

  val oracleSql: Map[String, String] = Map(
    "q110_burst_detection" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
        |c AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, h, n,
        |        CAST(COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base_sum,
        |        CAST(COUNT(n) OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_prev
        |      FROM c)
        |SELECT event_type, h, n, base_sum, n_prev,
        |       CAST(CASE WHEN n_prev = 3 AND n * 100 * n_prev >= 200 * base_sum
        |            THEN 1 ELSE 0 END AS BIGINT) AS burst
        |FROM w
        |ORDER BY event_type, h""".stripMargin,

    "q108_retention" ->
      """WITH e AS (SELECT user_id, event_type,
        |        epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS c_day FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT c.c_day AS cohort_day, a.day - c.c_day AS day_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_active
        |FROM c JOIN a ON a.user_id = c.user_id AND a.day >= c.c_day
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q105_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts_us > s1.t
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_us > s2.t
        |       GROUP BY e.user_id),
        |c AS (SELECT 1 AS stage, 'view' AS event_type,
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
        |      UNION ALL SELECT 2, 'click',
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
        |      UNION ALL SELECT 3, 'purchase',
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)),
        |r AS (SELECT stage, event_type, n_users,
        |        lag(n_users) OVER (ORDER BY stage) AS prev,
        |        first_value(n_users) OVER (ORDER BY stage) AS frst
        |      FROM c)
        |SELECT stage, event_type, n_users,
        |       CAST(CASE WHEN prev IS NULL THEN 1000 WHEN prev = 0 THEN 0
        |            ELSE (n_users * 1000) // prev END AS BIGINT) AS conv_prev_x1e3,
        |       CAST(CASE WHEN frst = 0 THEN 0
        |            ELSE (n_users * 1000) // frst END AS BIGINT) AS conv_first_x1e3
        |FROM r
        |ORDER BY stage""".stripMargin,
    "q55_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
        |w AS (SELECT user_id, event_id, value, ts_us,
        |        CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL THEN 1
        |             WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) >= 1800000000 THEN 1
        |             ELSE 0 END AS new_sess
        |      FROM e),
        |s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_idx
        |      FROM w)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |       CAST(MIN(ts_us) AS BIGINT) AS start_us,
        |       CAST(MAX(ts_us) AS BIGINT) AS end_us,
        |       CAST(SUM(CAST(FLOOR(value * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS value_x1e4
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q08_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT) AS revenue_x1e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q09_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_disc_price,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_charge,
        |       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q10_segment_revenue" ->
      """SELECT c_mktsegment,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
        |       COUNT(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q11_region_customers" ->
      """SELECT r_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q12_semi" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q12_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q13_top_orders" ->
      """SELECT o_custkey, o_orderkey, price_x100, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_x100,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q14_rollup" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COALESCE(o_orderstatus, 'ALL') AS status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g1,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g2,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY g1, g2, priority, status""".stripMargin,

    "q15_except" ->
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS o_orderkey FROM lineitem
        |ORDER BY o_orderkey""".stripMargin,

    "q16_distinct_users" ->
      """SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events""".stripMargin,

    "q17_hourly_events" ->
      """SELECT event_type,
        |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, hour_start""".stripMargin,

    "q30_props_json" ->
      """SELECT event_type,
        |       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q31_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_x100,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_x100,
        |       LAG(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT), 1) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_x100,
        |       CAST(row_number() OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, seq""".stripMargin,

    "q14b_cube" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COALESCE(o_orderstatus, 'ALL') AS status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g1,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g2,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY g1, g2, priority, status""".stripMargin,

    "q15b_intersect" ->
      """SELECT o_orderkey FROM orders
        |INTERSECT
        |SELECT l_orderkey AS o_orderkey FROM lineitem
        |ORDER BY o_orderkey""".stripMargin,

    "q34_percentiles" ->
      """SELECT l_returnflag,
        |       CAST(FLOOR(quantile_cont(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT), 0.5) * 10 + 0.5) AS BIGINT) AS p50_qty_c_x10,
        |       CAST(FLOOR(quantile_cont(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT), 0.5) * 10 + 0.5) AS BIGINT) AS p50_price_c_x10
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q35_stats" ->
      """SELECT l_returnflag,
        |       CAST(FLOOR(stddev_samp(l_quantity) * 10000 + 0.5) AS BIGINT) AS sd_qty_x1e4,
        |       CAST(FLOOR(corr(l_quantity, l_extendedprice) * 10000 + 0.5) AS BIGINT) AS corr_x1e4,
        |       CAST(FLOOR(covar_samp(l_discount, l_tax) * 1000000 + 0.5) AS BIGINT) AS cov_x1e6
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q36_array_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q39_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |    ('A_low', 0.0, 20000.0), ('B_mid', 20000.0, 40000.0),
        |    ('C_high', 40000.0, 60000.0), ('D_top', 60000.0, 1000000000.0))
        |SELECT band, COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
        |FROM lineitem JOIN bands
        |  ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    "q38_asof_join" ->
      """WITH errors AS (
        |  SELECT event_id AS error_id, user_id, ts FROM events WHERE event_type = 'error'),
        |purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT e.error_id, e.user_id, p.purchase_id
        |FROM errors e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |ORDER BY e.error_id""".stripMargin,

    "q37_pivot" ->
      """SELECT o_orderpriority,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
