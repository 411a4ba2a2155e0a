package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Bloom-filter semi-join reduction — the explicit form of Spark's own
  * `InjectRuntimeFilter` rewrite (which is internal and heuristic-gated).
  *
  * The 100 TB scenario this operator exists for: a fact table joining a
  * dim side whose key set is too large to broadcast as a hash table
  * (100M × ~20 B keys ≈ GBs) but fits a Bloom filter at ~2 bytes/key.
  * Pre-filtering the fact side at the scan cuts the rows entering the
  * join's shuffle to the hit fraction plus the filter's false-positive
  * rate (~0.1% at 16 bits/key, k=5); the exact join afterwards removes
  * the false positives, so results are EXACTLY the plain semi-join's —
  * which is also why q63's oracle is plain SQL.
  *
  * The build is fully distributed: keys hash with plain `xxhash64`
  * (codegen'd), scatter into (word, bit) contributions, and `bit_or`
  * partial-aggregates map-side, so the shuffle moving to the driver is at
  * most m/64 words regardless of dim row count. Only the finished word
  * array is collected — the same driver residency Spark's
  * BloomFilterAggregate has.
  */
object BloomJoin {

  val K = 5
  val BITS_PER_KEY = 16
  /** 2^27 bits = 16 MiB — the broadcast-budget ceiling. */
  val MAX_BITS: Long = 1L << 27

  /** Distributed Bloom build over `dim`'s key column; returns the m-bit
    * set as 64-bit words. See BloomMightContain for the shared hashing
    * contract (nested-mod positions, overflow-free under ANSI).
    *
    * Keys of ANY type: the filter is built over `xxhash64(key)` — NOT a
    * lossy `cast(key as long)`, which would null out string keys and
    * silently drop every fact row. Hash collisions across distinct keys
    * only add false positives, which the exact join removes.
    */
  def buildBloom(dim: DataFrame, dimKey: String, bitsPerKey: Int = BITS_PER_KEY,
                 k: Int = K): Array[Long] = {
    val keys = dim.where(col(dimKey).isNotNull)
      .select(xxhash64(col(dimKey)).as("key")).distinct()
    val n = math.max(1L, keys.count())
    val m = math.min(MAX_BITS, math.max(64L, ((n * bitsPerKey + 63L) / 64L) * 64L))
    val rows = keys
      .select(pmod(xxhash64(col("key")), lit(m)).as("am"),
        pmod(xxhash64(col("key"), lit(1L)), lit(m)).as("bm"))
      .select(explode(sequence(lit(0L), lit((k - 1).toLong))).as("i"),
        col("am"), col("bm"))
      .select(pmod(col("am") + col("i") * col("bm"), lit(m)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val words = new Array[Long]((m / 64L).toInt)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Exact semi-join with a Bloom pre-filter on the fact side. Result ==
    * `fact SEMI JOIN dim` for any filter parameters; the parameters only
    * move work between the pre-filter (false positives) and the exact
    * join. The exact join is left unhinted — Catalyst broadcasts it at
    * test scale and shuffles it at real scale, and in BOTH cases the
    * pre-filter has already cut the fact side at the scan.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                    dimKey: String, bitsPerKey: Int = BITS_PER_KEY,
                    k: Int = K): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    val words = buildBloom(dim, dimKey, bitsPerKey, k)
    // probe hashes the key the same way the build did — type-generic, and
    // the xxhash64 child keeps the probe expression's input LongType
    fact
      .filter(GraftFunctions.bloomMightContain(xxhash64(col(factKey)), words, k))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }

  /** q63: lineitems of urgent orders via the Bloom-pre-filtered semi-join,
    * rolled up per return flag. Oracle = the plain semi-join (the Bloom
    * stage is result-invisible by construction).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_bloom_semijoin" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      bloomSemiJoin(Tables.lineitem(s, d), "l_orderkey", urgent, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q63_bloom_semijoin" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
