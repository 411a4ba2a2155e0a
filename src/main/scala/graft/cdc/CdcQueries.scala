package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reference-parity queries Q1-Q7 (SURVEY.md s2.6) with their DuckDB oracle
  * twins. These run over the golden CDC fixtures (self-contained literal
  * data), so the oracle SQL rebuilds the same rows from VALUES CTEs and
  * performs the SAME relational computation — filters, unions, window
  * arg-max — that the Spark side performs. Inputs are literal; computations
  * are not.
  *
  * Semantics per the reference:
  *  - Q1/Q2: scan + point lookup (controllers.go:38-46, :48-73)
  *  - Q3/Q4/Q5: insert / overlay-update / delete applied as batch relations
  *    (controllers.go:24-36, :75-98, :100-119)
  *  - Q6: the consumer's entire continuous computation — tombstone filter,
  *    permissive parse, null-`before` dispatch, key projection
  *    (queue/cdc.go:153-223)
  *  - Q7: latest-state materialized view generalization (E-1).
  *
  * Timestamps are emitted as formatted strings ('yyyy-MM-dd HH:mm:ss') on
  * both sides so no engine-specific timestamp physical type reaches the
  * hash comparison.
  */
object CdcQueries {

  private def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  private def fmtSinners(df: DataFrame): DataFrame =
    df.select(col("code"), col("name"), col("class"), col("libram"),
      col("tendency"), fmt(col("created_at")).as("created_at"),
      fmt(col("updated_at")).as("updated_at"))

  // Literal timestamps used by the fixtures (Fixtures.T0 + n*100s), as the
  // strings both engines must produce.
  private val T0 = "2025-01-01 00:00:00"
  private val T1 = "2025-01-01 00:01:40"
  private val T2 = "2025-01-01 00:03:20"
  private val T3 = "2025-01-01 00:05:00"

  // VALUES fragments shared by several oracle queries.
  private val baseValues =
    s"""(CAST(14 AS BIGINT), 'Deren', 'S', 'Fraud', 'Fury', '$T0', '$T0'),
       |    (CAST(17 AS BIGINT), 'Shalom', 'S', 'Sloth', 'Reticle', '$T0', '$T0')""".stripMargin

  /** The q123/q130 synthetic change stream (Debezium-honest shapes:
    * updates carry after-only, deletes before-only; lsn = id + 1e6, so
    * per-key lsn order follows id order — any id-contiguous split of
    * [lo, hi) is a valid in-order micro-batching, which is what
    * Scd2StreamSpec exploits). Shared by the catalog entries and the
    * streaming-SCD2 spec so the fixture can never drift.
    */
  private[graft] def scd2SyntheticValues(s: SparkSession, lo: Long = 0,
                                         hi: Long = 50000): DataFrame = {
    val ev = s.range(lo, hi).select(
      (col("id") % 500).as("k"), (col("id") + 1000000).as("lsn"),
      when(col("id") % 11 === 10, lit("d"))
        .when(col("id") < 500, lit("c")).otherwise(lit("u")).as("op"),
      (col("id") % 7).as("lv"))
    ev.select(
      when(col("op") === "d",
        format_string(
          """{"payload": {"before": {"code": %d}, "after": null, "op": "d", "source": {"lsn": %d, "ts_ms": 1}, "ts_ms": 1}}""",
          col("k"), col("lsn")))
        .otherwise(format_string(
          """{"payload": {"before": null, "after": {"code": %d, "libram": "L%d"}, "op": "%s", "source": {"lsn": %d, "ts_ms": 1}, "ts_ms": 1}}""",
          col("k"), col("lv"), col("op"), col("lsn"))).as("value"))
  }

  /** The q130 probe facts (2000 (k, at_lsn) rows across the lsn range). */
  private[graft] def scd2Probes(s: SparkSession): DataFrame =
    s.range(2000).select(
      (col("id") % 500).as("k"),
      (lit(999990L) + (col("id") * 37) % 50020).as("at_lsn"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 (O-1): full scan, deterministic order.
    "q01_scan" -> ((s, _) => fmtSinners(Fixtures.sinners(s)).orderBy("code")),

    // Q2 (O-2/O-3): point lookup by primary key. Catalyst pushes the
    // equality predicate into the scan; at scale this is a single-partition
    // pruned read, not a full scan.
    "q02_point" -> ((s, _) =>
      fmtSinners(Fixtures.sinners(s).filter(col("code") === lit(14L)))),

    // Q3 (O-6): insert = append-union.
    "q03_insert" -> ((s, _) =>
      fmtSinners(Fixtures.sinners(s).unionByName(Fixtures.newRows(s)))
        .orderBy("code")),

    // Q4 (O-7): last-writer-wins upsert — per-key arg-max by
    // (updated_at, lsn) over base UNION updates; the lsn tie-break makes two
    // same-microsecond updates deterministic (SURVEY §2.6 Q4). One shuffle
    // on the key; map-side partial aggregation via max_by would also work,
    // window keeps the whole row. Base snapshot rows precede any WAL update,
    // so they carry lsn 0.
    "q04_update" -> ((s, _) => {
      val all = Fixtures.sinners(s).withColumn("lsn", lit(0L))
        .unionByName(Fixtures.updatedRows(s))
      val w = Window.partitionBy("code")
        .orderBy(col("updated_at").desc, col("lsn").desc)
      fmtSinners(all.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")).orderBy("code")
    }),

    // Q5 (O-8): delete by key = anti-join against the delete set.
    "q05_delete" -> ((s, _) =>
      fmtSinners(Fixtures.sinners(s)
        .join(Fixtures.deletedKeys(s), Seq("code"), "left_anti"))
        .orderBy("code")),

    // Q6 (O-11..O-14): the consumer's whole computation over the golden
    // change log — tombstone skip, permissive parse, before-nullity
    // dispatch, stringified key projection, idempotent distinct.
    "q06_invalidation" -> ((s, _) =>
      Envelope.invalidationSet(Fixtures.changeRecords(s))
        .orderBy("invalidate_key")),

    // Q7 (E-1): latest-state materialized view — per-key arg-max by LSN,
    // deletes drop out.
    "q07_latest_state" -> ((s, _) =>
      fmtSinners(Envelope.latestState(Envelope.parse(Fixtures.changeRecords(s))))
        .orderBy("code")),

    // Q33: the consumer pipeline under load — 100k synthetic envelopes
    // generated distributively (spark.range, codegen'd format_string; no
    // driver-side data), pushed through the full parse->dispatch->project
    // dataflow. The oracle recomputes the expected key set arithmetically,
    // so JSON parsing, tombstone-free dispatch, and dedup are all checked
    // at throughput scale, not just on golden fixtures.
    // Q123: SCD2 history off a 50k-event synthetic change stream — the
    // q33 generator idiom (spark.range + codegen'd format_string, no
    // driver-side data) with Debezium-honest shapes: updates carry
    // after-only, deletes carry before-only. The oracle reconstructs the
    // event stream arithmetically and applies the identical lead() window
    // semantics, so parse, key coalescing, delete-closes-version, and
    // the current-flag all hash-check at throughput scale.
    "q123_scd2_history" -> ((s, _) =>
      Envelope.scd2History(Envelope.parse(scd2SyntheticValues(s)))),

    // Q133: per-key change churn off the same synthetic stream (see
    // [[Envelope.changeChurn]] — the retention/compaction readout).
    "q133_change_churn" -> ((s, _) =>
      Envelope.changeChurn(Envelope.parse(scd2SyntheticValues(s)))),

    // Q130: point-in-time lookup against the q123 SCD2 relation — 2000
    // probe facts spread across the lsn range, each resolved to the
    // version valid at its lsn (or 'absent' in create-before/delete
    // gaps). Same synthetic stream, same arithmetic oracle.
    "q130_scd2_lookup" -> ((s, _) =>
      Envelope.scd2Lookup(
        Envelope.scd2History(Envelope.parse(scd2SyntheticValues(s))),
        scd2Probes(s))),

    "q33_cdc_synthetic" -> ((s, _) => {
      val vals = s.range(100000).select(
        format_string(
          """{"payload": {"before": %s, "after": {"code": %d}, "op": "%s", "source": {"lsn": %d, "ts_ms": 1}, "ts_ms": 1}}""",
          when(col("id") % 3 === 0, lit("null"))
            .otherwise(format_string("""{"code": %d}""", col("id") % 1000)),
          col("id") % 1000,
          element_at(array(lit("c"), lit("u"), lit("d")), (col("id") % 3 + 1).cast("int")),
          col("id") + 100000).as("value"))
      Envelope.invalidationSet(vals).orderBy("invalidate_key")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan" ->
      s"""WITH sinners(code, name, "class", libram, tendency, created_at, updated_at) AS (VALUES
         |    $baseValues)
         |SELECT * FROM sinners ORDER BY code""".stripMargin,

    "q02_point" ->
      s"""WITH sinners(code, name, "class", libram, tendency, created_at, updated_at) AS (VALUES
         |    $baseValues)
         |SELECT * FROM sinners WHERE code = 14""".stripMargin,

    "q03_insert" ->
      s"""WITH sinners(code, name, "class", libram, tendency, created_at, updated_at) AS (VALUES
         |    $baseValues),
         |new_rows(code, name, "class", libram, tendency, created_at, updated_at) AS (VALUES
         |    (CAST(5 AS BIGINT), 'Augustus', 'S', 'War', 'Reticle', '$T1', '$T1'))
         |SELECT * FROM (SELECT * FROM sinners UNION ALL SELECT * FROM new_rows) ORDER BY code""".stripMargin,

    "q04_update" ->
      s"""WITH sinners(code, name, "class", libram, tendency, created_at, updated_at) AS (VALUES
         |    $baseValues),
         |updates(code, name, "class", libram, tendency, created_at, updated_at, lsn) AS (VALUES
         |    (CAST(14 AS BIGINT), 'Deren', 'S', 'Fraud', 'Wrath', '$T0', '$T3', CAST(100004 AS BIGINT)),
         |    (CAST(14 AS BIGINT), 'Deren', 'S', 'Fraud', 'Envy', '$T0', '$T3', CAST(100006 AS BIGINT))),
         |all_rows AS (SELECT *, CAST(0 AS BIGINT) AS lsn FROM sinners UNION ALL SELECT * FROM updates),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY code ORDER BY updated_at DESC, lsn DESC) AS rn FROM all_rows)
         |SELECT code, name, "class", libram, tendency, created_at, updated_at
         |FROM ranked WHERE rn = 1 ORDER BY code""".stripMargin,

    "q05_delete" ->
      s"""WITH sinners(code, name, "class", libram, tendency, created_at, updated_at) AS (VALUES
         |    $baseValues),
         |deletes(code) AS (VALUES (CAST(17 AS BIGINT)))
         |SELECT * FROM sinners WHERE code NOT IN (SELECT code FROM deletes) ORDER BY code""".stripMargin,

    // The change log's consumer-visible shape: one row per Kafka record.
    // (is_tombstone, payload_valid, before_code) is exactly what the
    // dispatch reads; the oracle applies the same three filters.
    "q06_invalidation" ->
      """WITH changes(is_tombstone, is_valid, before_code) AS (VALUES
        |    (FALSE, TRUE, CAST(NULL AS BIGINT)),
        |    (FALSE, TRUE, CAST(NULL AS BIGINT)),
        |    (FALSE, TRUE, CAST(NULL AS BIGINT)),
        |    (FALSE, TRUE, CAST(5 AS BIGINT)),
        |    (FALSE, TRUE, CAST(14 AS BIGINT)),
        |    (FALSE, TRUE, CAST(17 AS BIGINT)),
        |    (TRUE,  FALSE, CAST(NULL AS BIGINT)),
        |    (FALSE, FALSE, CAST(NULL AS BIGINT)))
        |SELECT DISTINCT CAST(before_code AS VARCHAR) AS invalidate_key
        |FROM changes
        |WHERE NOT is_tombstone AND is_valid AND before_code IS NOT NULL
        |ORDER BY invalidate_key""".stripMargin,

    "q07_latest_state" ->
      """WITH ch(k, code, name, "class", libram, tendency, created_us, updated_us, lsn) AS (VALUES
        |    (14, CAST(14 AS BIGINT), 'Deren', 'S', 'Fraud', 'Fury', 1735689600000000, 1735689600000000, 100000),
        |    (17, CAST(17 AS BIGINT), 'Shalom', 'S', 'Sloth', 'Reticle', 1735689600000000, 1735689600000000, 100001),
        |    (5,  CAST(5 AS BIGINT), 'Augustus', 'S', 'War', 'Reticle', 1735689700000000, 1735689700000000, 100002),
        |    (5,  CAST(5 AS BIGINT), 'Augustus', 'A', 'War', 'Reticle', 1735689700000000, 1735689800000000, 100003),
        |    (14, CAST(14 AS BIGINT), 'Deren', 'S', 'Fraud', 'Wrath', 1735689600000000, 1735689900000000, 100004),
        |    (17, CAST(NULL AS BIGINT), NULL, NULL, NULL, NULL, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 100005)),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY lsn DESC) AS rn FROM ch)
        |SELECT code, name, "class", libram, tendency,
        |       strftime(make_timestamp(created_us), '%Y-%m-%d %H:%M:%S') AS created_at,
        |       strftime(make_timestamp(updated_us), '%Y-%m-%d %H:%M:%S') AS updated_at
        |FROM ranked WHERE rn = 1 AND code IS NOT NULL ORDER BY code""".stripMargin,

    "q33_cdc_synthetic" ->
      """SELECT DISTINCT CAST(i % 1000 AS VARCHAR) AS invalidate_key
        |FROM range(100000) t(i)
        |WHERE i % 3 <> 0
        |ORDER BY invalidate_key""".stripMargin,

    "q130_scd2_lookup" ->
      """WITH ev AS (SELECT i % 500 AS code, i + 1000000 AS lsn,
        |        CASE WHEN i % 11 = 10 THEN 'd'
        |             WHEN i < 500 THEN 'c' ELSE 'u' END AS op,
        |        'L' || CAST(i % 7 AS VARCHAR) AS libram
        |      FROM range(50000) t(i)),
        |led AS (SELECT *, lead(lsn) OVER (PARTITION BY code ORDER BY lsn) AS nxt
        |        FROM ev),
        |hist AS (SELECT code, libram, lsn AS vf, COALESCE(nxt, -1) AS vt
        |         FROM led WHERE op <> 'd'),
        |probes AS (SELECT i % 500 AS k, 999990 + (i * 37) % 50020 AS at_lsn
        |           FROM range(2000) t(i))
        |SELECT CAST(p.k AS BIGINT) AS code, CAST(p.at_lsn AS BIGINT) AS at_lsn,
        |       COALESCE(h.libram, 'absent') AS libram
        |FROM probes p
        |LEFT JOIN hist h ON p.k = h.code AND h.vf <= p.at_lsn
        |  AND (h.vt = -1 OR p.at_lsn < h.vt)
        |ORDER BY code, at_lsn""".stripMargin,

    "q133_change_churn" ->
      """WITH ev AS (SELECT i % 500 AS code, i + 1000000 AS lsn,
        |        CASE WHEN i % 11 = 10 THEN 'd'
        |             WHEN i < 500 THEN 'c' ELSE 'u' END AS op
        |      FROM range(50000) t(i))
        |SELECT CAST(code AS BIGINT) AS code,
        |       CAST(COUNT(CASE WHEN op <> 'd' THEN 1 END) AS BIGINT) AS n_versions,
        |       CAST(COUNT(CASE WHEN op = 'd' THEN 1 END) AS BIGINT) AS n_deletes,
        |       CAST(MIN(lsn) AS BIGINT) AS first_lsn,
        |       CAST(MAX(lsn) AS BIGINT) AS last_lsn,
        |       CAST(CASE WHEN arg_max(op, lsn) <> 'd' THEN 1 ELSE 0 END AS BIGINT) AS is_live
        |FROM ev GROUP BY code ORDER BY code""".stripMargin,

    "q123_scd2_history" ->
      """WITH ev AS (SELECT i % 500 AS code, i + 1000000 AS lsn,
        |        CASE WHEN i % 11 = 10 THEN 'd'
        |             WHEN i < 500 THEN 'c' ELSE 'u' END AS op,
        |        'L' || CAST(i % 7 AS VARCHAR) AS libram
        |      FROM range(50000) t(i)),
        |led AS (SELECT *, lead(lsn) OVER (PARTITION BY code ORDER BY lsn) AS nxt
        |        FROM ev)
        |SELECT CAST(code AS BIGINT) AS code, libram,
        |       CAST(lsn AS BIGINT) AS valid_from_lsn,
        |       CAST(COALESCE(nxt, -1) AS BIGINT) AS valid_to_lsn,
        |       CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM led WHERE op <> 'd'
        |ORDER BY code, valid_from_lsn""".stripMargin
  )
}
