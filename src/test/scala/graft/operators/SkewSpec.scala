package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Salted joins must return exactly the plain join's result set while
  * scattering the hot key.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin == plain join on a 90%-skewed key") {
    import spark.implicits._
    // 9000 rows of key 1, 1000 spread over 2..101
    val big = ((1 to 9000).map(i => (1L, i)) ++
      (1 to 1000).map(i => ((i % 100 + 2).toLong, -i))).toDF("k", "payload")
    val small = (1L to 101L).map(k => (k, s"dim$k")).toDF("k2", "name")

    val plain = big.join(small, col("k") === col("k2"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(big, small, "k", "k2", salt = 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("q62 salted rollup == plain-join rollup on the sf0.001 fixture") {
    import graft.sources.Tables
    val d = "/root/testdata/sf0.001"
    val plain = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val salted = Skew.queries("q62_salted_join")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plain.nonEmpty)
    assert(salted.toSeq === plain.toSeq)
  }

  test("topKeys surfaces the dominant key first") {
    import spark.implicits._
    val big = ((1 to 900).map(_ => 7L) ++ (1L to 100L)).toDF("k")
    val top = Skew.topKeys(big, "k", 1).collect().head
    assert(top.getLong(0) === 7L)
    assert(top.getLong(1) === 901L)
  }
}
