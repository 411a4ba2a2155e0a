package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{BloomUtil, GraftFunctions}

/** The Bloom pre-filter must never drop a true member (the exact join can
  * remove false positives but cannot resurrect false negatives), must
  * actually prune non-members, and the SQL build side must land bits
  * exactly where the JVM probe looks for them. The filter is built over
  * xxhash64(key) (type-generic), so every direct probe here maps the raw
  * key through the same hash: XXH64.hashLong(v, 42) == SQL xxhash64(v)
  * for a bigint column.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def probe(words: Array[Long], v: Long): Boolean =
    BloomUtil.mightContain(words, BloomJoin.K, XXH64.hashLong(v, 42L))

  test("build/probe hashing agreement: every built key probes true") {
    import spark.implicits._
    val raw = (0L to 999L) ++ Seq(Long.MaxValue, Long.MinValue, -1L)
    val words = BloomJoin.buildBloom(raw.toDF("k"), "k")
    val misses = raw.filterNot(probe(words, _))
    assert(misses.isEmpty, s"false negatives: ${misses.take(5).mkString(",")}")
  }

  test("non-members are pruned at ~the designed false-positive rate") {
    import spark.implicits._
    val words = BloomJoin.buildBloom((0L to 999L).toDF("k"), "k")
    // 16 bits/key, k=5 => theoretical FP ~0.1%; assert an order of margin
    val probes = (1000000L to 1099999L)
    val fp = probes.count(probe(words, _))
    assert(fp < probes.size / 50, s"$fp false positives in ${probes.size}")
  }

  test("interpreted eval == codegen'd filter over the same keys") {
    import spark.implicits._
    val words = BloomJoin.buildBloom((0L to 99L).toDF("k"), "k")
    GraftFunctions.register(spark)
    val probed = (-500L to 500L).toDF("k")
    val viaCodegen = probed
      .filter(GraftFunctions.bloomMightContain(
        xxhash64(col("k")), words, BloomJoin.K))
      .collect().map(_.getLong(0)).toSet
    val viaInterp = (-500L to 500L).filter(probe(words, _)).toSet
    assert(viaCodegen === viaInterp)
  }

  test("string keys survive: hashed build, no lossy long cast") {
    import spark.implicits._
    val fact = (1 to 300).map(i => (i.toLong, s"name-${i % 40}"))
      .toDF("id", "key")
    val dim = (0 until 40 by 3).map(i => s"name-$i").toDF("k2")
    val plain = fact.join(dim, col("key") === col("k2"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    val bloomed = BloomJoin.bloomSemiJoin(fact, "key", dim, "k2")
      .collect().map(_.getLong(0)).sorted
    assert(plain.nonEmpty && bloomed === plain)
  }

  test("q63 == plain semi-join rollup on the sf0.001 fixture") {
    import graft.sources.Tables
    val d = graft.TestSpark.SF0001
    val urgentKeys = Tables.orders(spark, d)
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Tables.lineitem(spark, d)
      .join(urgentKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bloomed = BloomJoin.queries("q63_bloom_semijoin")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plain.nonEmpty)
    assert(bloomed.toSeq === plain.toSeq)
  }
}
