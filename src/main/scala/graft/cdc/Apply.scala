package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CDC apply: MERGE a change-envelope batch into a keyed snapshot —
  * the E-1 latest-state fold generalized to start FROM an existing base
  * table (SURVEY.md s1.4 A3: "Delta-style MERGE" without a table format;
  * output is the next immutable snapshot, the pattern for periodic
  * compaction of a change log onto parquet at scale).
  *
  * Semantics: per key, the highest-(lsn, ts_ms) change wins; a winning
  * delete removes the key; keys untouched by the batch pass through. One
  * shuffle on the key (full outer join base >< folded-changes).
  */
object Apply {

  /** `base`: SINNER-schema snapshot. `records`: raw Kafka-value change
    * batch. Returns the next snapshot with the same schema.
    */
  def applyChanges(spark: SparkSession, base: DataFrame, records: DataFrame): DataFrame = {
    // The parse subplan feeds both consumers (fold + changed-key set) and
    // is deliberately NOT persisted: this is a long-lived library API (the
    // Graft facade calls it per micro-batch) and a per-call cache entry
    // with no unpersist hook would accumulate for the JVM lifetime. A
    // change batch is bounded, so parsing it twice is the cheaper contract;
    // callers compacting a huge backlog can persist `records` themselves.
    val parsed = Envelope.parse(records)
    val latest = Envelope.latestState(parsed)
    val changedKeys = parsed
      .select(coalesce(col("payload.after.code"), col("payload.before.code")).as("code"))
      .filter(col("code").isNotNull).distinct()
    // rows whose key saw any change are replaced by the fold result
    // (deletes simply have no fold row); untouched rows pass through.
    base.join(changedKeys, Seq("code"), "left_anti")
      .unionByName(latest)
  }

  /** Compaction driver: fold a whole directory of change batches onto a
    * snapshot in one plan (union first — one shuffle total, not one per
    * batch).
    */
  def compact(spark: SparkSession, base: DataFrame, batches: Seq[DataFrame]): DataFrame =
    applyChanges(spark, base, batches.reduce(_ unionByName _))
}
