package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md "salting for skew, AQE for runtime
  * re-plan"). AQE's skew-join split handles most cases at runtime; explicit
  * salting is the static fallback when one key dominates so heavily that
  * even split partitions overwhelm a task, or when AQE is unavailable
  * (streaming joins).
  */
object Skew {

  /** Salted inner equi-join: the skewed (big) side scatters each row into
    * one of `salt` sub-keys; the small side replicates `salt` ways. Same
    * result set as a plain join, but the hot key's rows spread across
    * `salt` reducers instead of one.
    *
    * The salt is derived from a per-row id, not randomness — replays and
    * retries stay deterministic-in-distribution without violating Spark's
    * task-retry assumptions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salt: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val expanded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted
      .join(expanded,
        salted(bigKey) === expanded(smallKey) && salted("_salt") === expanded("_salt"))
      .drop("_salt")
  }

  /** Diagnostic: per-key row counts of the heaviest keys — what you run
    * FIRST to decide whether salting is warranted.
    */
  def topKeys(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(k)

  def repartitionByKey(df: DataFrame, partitions: Int, key: String): DataFrame =
    df.repartition(partitions, col(key))
}
