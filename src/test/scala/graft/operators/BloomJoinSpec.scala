package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{BloomUtil, GraftFunctions}

/** The Bloom pre-filter must never drop a true member (the exact join can
  * remove false positives but cannot resurrect false negatives), must
  * actually prune non-members, and the SQL build side must land bits
  * exactly where the JVM probe looks for them.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("build/probe hashing agreement: every built key probes true") {
    import spark.implicits._
    val keys = ((0L to 999L) ++ Seq(Long.MaxValue, Long.MinValue, -1L)).toDF("k")
    val words = BloomJoin.buildBloom(keys, "k")
    val misses = keys.collect().map(_.getLong(0))
      .filterNot(BloomUtil.mightContain(words, BloomJoin.K, _))
    assert(misses.isEmpty, s"false negatives: ${misses.take(5).mkString(",")}")
  }

  test("non-members are pruned at ~the designed false-positive rate") {
    import spark.implicits._
    val words = BloomJoin.buildBloom((0L to 999L).toDF("k"), "k")
    // 16 bits/key, k=5 => theoretical FP ~0.1%; assert an order of margin
    val probes = (1000000L to 1099999L)
    val fp = probes.count(BloomUtil.mightContain(words, BloomJoin.K, _))
    assert(fp < probes.size / 50, s"$fp false positives in ${probes.size}")
  }

  test("interpreted eval == codegen'd filter over the same keys") {
    import spark.implicits._
    val words = BloomJoin.buildBloom((0L to 99L).toDF("k"), "k")
    GraftFunctions.register(spark)
    val probed = (-500L to 500L).toDF("k")
    val viaCodegen = probed
      .filter(GraftFunctions.bloomMightContain(col("k"), words, BloomJoin.K))
      .collect().map(_.getLong(0)).toSet
    val viaInterp = (-500L to 500L)
      .filter(BloomUtil.mightContain(words, BloomJoin.K, _)).toSet
    assert(viaCodegen === viaInterp)
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
