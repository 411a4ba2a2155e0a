package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schemas.Schemas

/** The reference's entire streaming computation, as declarative Spark
  * transforms over a change-record DataFrame.
  *
  * Input contract: a DataFrame with a nullable string column `value` —
  * exactly the shape of a Kafka record value (batch or `readStream`, the
  * same functions apply to both since they are plan fragments).
  *
  * Semantics reproduced exactly from the reference consumer
  * (reference queue/cdc.go:153-223):
  *  - Kafka tombstone (`value IS NULL`) → skipped before parsing (cdc.go:170-173)
  *  - malformed JSON → skipped, pipeline continues (cdc.go:175-179);
  *    `from_json` is PERMISSIVE so a bad document yields a null struct
  *  - `payload.before IS NULL` (insert `c` / snapshot `r`) → NO invalidation
  *    (cdc.go:181-186)
  *  - otherwise emit `CAST(before.code AS STRING)` as the key to invalidate
  *    (cdc.go:188-195). Dispatch is *solely* on `before` nullity; `op` is
  *    parsed but never consulted (cdc.go:34) — we reproduce that precisely.
  *
  * Everything is built from codegen'd built-ins (`from_json`, `filter`,
  * nested-field `select`) so Catalyst prunes the envelope to the fields
  * actually read — the declarative form of the reference's
  * "decode only `before.code`" schema trick (cdc.go:57-59).
  */
object Envelope {

  /** O-11 tombstone filter + O-10 envelope parse + O-12 malformed filter.
    * Output: the full typed envelope (column `payload`), bad records dropped.
    */
  def parse(records: DataFrame): DataFrame =
    records
      .filter(col("value").isNotNull)                     // O-11 tombstone skip
      .withColumn("payload",
        from_json(col("value").cast("string"), Schemas.ENVELOPE)("payload"))
      .filter(col("payload").isNotNull)                   // O-12 malformed skip
      .drop("value")

  /** O-13 + O-14: the consumer's whole continuous query. Null-`before`
    * events (insert/snapshot) produce nothing; everything else produces the
    * stringified pre-image key (O-5 int→string cast parity).
    *
    * A non-null `before` struct whose `code` is null/absent (schema drift)
    * yields key "0" — exactly what the reference does: Go's encoding/json
    * leaves `Code int` at its zero value and the consumer DELs "0"
    * (cdc.go:57-59, :188). Emitting NULL here would instead poison every
    * downstream `store.del`.
    */
  def invalidationKeys(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("payload.before").isNotNull)            // O-13
      .select(coalesce(col("payload.before.code"), lit(0L))
        .cast("string").as("invalidate_key"))             // O-14

  /** End-to-end: raw records → distinct keys to invalidate. Distinct is safe
    * (and required for deterministic output) because DEL is idempotent —
    * the reference delivers at-least-once into an idempotent sink.
    */
  def invalidationSet(records: DataFrame): DataFrame =
    invalidationKeys(parse(records)).distinct()

  /** E-1 generalization (SURVEY §2.5): latest-state materialized view.
    * Per-key arg-max by `(source.lsn, ts_ms)`; a key whose latest event has
    * null `after` (delete) disappears from the view. This strictly subsumes
    * the reference's delete-only invalidation: the view IS the cache, kept
    * consistent instead of evicted.
    *
    * `max_by` over a struct gives a single hash-aggregate with map-side
    * partial aggregation — one shuffle on the key, no window sort. At 100 TB
    * the shuffle is keyed by primary key, which is exactly how the Kafka
    * topic is already partitioned, so a co-partitioned source makes this
    * shuffle-free.
    */
  def latestState(parsed: DataFrame): DataFrame = {
    val ordKey = struct(
      coalesce(col("payload.source.lsn"), lit(Long.MinValue)),
      coalesce(col("payload.ts_ms"), lit(Long.MinValue)))
    parsed
      .select(
        coalesce(col("payload.after.code"), col("payload.before.code")).as("k"),
        col("payload.after").as("after"),
        ordKey.as("ord"))
      .filter(col("k").isNotNull) // keyless events (schema drift) can't fold
      .groupBy(col("k"))
      .agg(max_by(col("after"), col("ord")).as("latest"))
      .filter(col("latest").isNotNull)                    // last op was a delete
      .select(
        col("latest.code").as("code"),
        col("latest.name").as("name"),
        col("latest.class").as("class"),
        col("latest.libram").as("libram"),
        col("latest.tendency").as("tendency"),
        // Debezium serializes TIMESTAMP as epoch micros; materialize as NTZ.
        timestamp_micros(col("latest.created_at")).cast("timestamp_ntz").as("created_at"),
        timestamp_micros(col("latest.updated_at")).cast("timestamp_ntz").as("updated_at"))
  }

  /** q123: SCD2 (slowly-changing-dimension type 2) HISTORY off the parsed
    * change stream — the temporal complement of [[latestState]]: instead
    * of folding to the newest image, every non-delete event opens a
    * version valid over [its lsn, the key's next event's lsn), a delete
    * closes the current version without opening one, and the version a
    * key's final event opened (if not a delete) is flagged current
    * (`valid_to_lsn` = -1 rather than NULL so the cross-engine compare
    * never depends on null coercion). This is the standard
    * CDC-to-warehouse materialization next to the latest-state view.
    *
    * 100 TB shape: ONE window over (key, lsn) — the shuffle is keyed by
    * primary key, exactly how the topic is already partitioned (the
    * [[latestState]] argument), and per-key history is the partition
    * unit; no global sort before the final report ORDER BY.
    */
  def scd2History(parsed: DataFrame): DataFrame =
    scd2Fold(scd2Events(parsed)).orderBy("code", "valid_from_lsn")

  /** The SCD2 event projection `(code, op, libram, lsn)` off a parsed
    * change stream — shared by the batch fold and the streaming
    * incremental maintenance ([[graft.streaming.Scd2Stream]]) so the two
    * can never disagree on key coalescing or keyless-event handling.
    */
  private[graft] def scd2Events(parsed: DataFrame): DataFrame =
    parsed.select(
      coalesce(col("payload.after.code"), col("payload.before.code")).as("code"),
      col("payload.op").as("op"),
      col("payload.after.libram").as("libram"),
      col("payload.source.lsn").as("lsn"))
      .filter(col("code").isNotNull)

  /** The SCD2 version fold over an event relation `(code, op, libram,
    * lsn)`: one lead() window keyed by primary key — every non-delete
    * event opens a version tiled to the key's next event, a delete
    * closes without opening. Also the streaming fold's per-batch kernel:
    * a key's OPEN version re-enters as a synthetic non-delete event at
    * its own valid_from, and the fold re-tiles it with the delta
    * (closed versions are immutable and never re-enter).
    */
  private[graft] def scd2Fold(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("code").orderBy("lsn")
    ev.withColumn("nxt", lead(col("lsn"), 1).over(w))
      .filter(col("op") =!= "d")
      .select(col("code"), col("libram"),
        col("lsn").as("valid_from_lsn"),
        coalesce(col("nxt"), lit(-1L)).as("valid_to_lsn"),
        col("nxt").isNull.cast("long").as("is_current"))
  }

  /** q130: SCD2 POINT-IN-TIME LOOKUP — enrich a fact relation
    * `(k, at_lsn)` with the dimension version valid at each fact's lsn
    * ([[scd2History]]'s interval semantics consumed the way a warehouse
    * actually consumes them): the version with
    * `valid_from <= at < valid_to` (current versions open-ended), or
    * `absent` when the key was deleted or not yet created at that
    * point. Execution: an equi-join on the key with a residual range
    * predicate — at most one version matches per fact by the tiling
    * invariant, and both sides shuffle on the key (the topic's own
    * partitioning), never a global interval index.
    */
  def scd2Lookup(history: DataFrame, probes: DataFrame): DataFrame =
    probes.join(history,
      probes("k") === history("code") &&
        history("valid_from_lsn") <= probes("at_lsn") &&
        (history("valid_to_lsn") === -1L ||
          probes("at_lsn") < history("valid_to_lsn")),
      "left")
      .select(probes("k").as("code"), probes("at_lsn"),
        coalesce(history("libram"), lit("absent")).as("libram"))
      .orderBy("code", "at_lsn")

  /** q133: PER-KEY CHANGE-CHURN report — the operational readout next to
    * [[scd2History]]: per key, how many versions its stream opened
    * (non-delete events), how many deletes it saw, its lsn span, and
    * whether it is live (final event non-delete). This is the table that
    * drives CDC retention/compaction decisions — hot keys (high churn)
    * are what make log compaction pay, dead keys (is_live=0) are what
    * tombstone GC reclaims. One hash aggregate keyed by primary key (the
    * topic's own partitioning — map-side partials, no window, no sort
    * before the report ORDER BY); `max_by(op, lsn)` is deterministic
    * because lsn is unique per key.
    */
  def changeChurn(parsed: DataFrame): DataFrame =
    scd2Events(parsed)
      .groupBy("code")
      .agg(count(when(col("op") =!= "d", 1)).as("n_versions"),
        count(when(col("op") === "d", 1)).as("n_deletes"),
        min(col("lsn")).as("first_lsn"),
        max(col("lsn")).as("last_lsn"),
        max_by(col("op"), col("lsn")).as("last_op"))
      .select(col("code"), col("n_versions"), col("n_deletes"),
        col("first_lsn"), col("last_lsn"),
        (col("last_op") =!= "d").cast("long").as("is_live"))
      .orderBy("code")

  /** Observable metrics for the drop paths — parity with the reference's
    * log-and-continue (cdc.go:171, :176) without a second pass over the data.
    * Emits `records` (total input), `tombstones` (null values, O-11) and
    * `passed` (rows surviving the malformed filter, O-12), so
    * malformed = records - tombstones - passed is derivable from the metrics.
    */
  def parseWithMetrics(records: DataFrame): DataFrame =
    parse(records.observe("cdc_parse",
      count(lit(1)).as("records"),
      count(when(col("value").isNull, 1)).as("tombstones")))
      .observe("cdc_passed", count(lit(1)).as("passed"))
}
