package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The SQL entry point (SURVEY.md s1.4: temp views + spark.sql are part of
  * the engine's public surface, replacing the reference's HTTP reads).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registerAll exposes every fixture table as a temp view") {
    Tables.registerAll(spark, TestSpark.SF0001)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() === 1, s"view $n")
    }
  }

  test("spark.sql answers the q10 join-revenue shape identically to the DataFrame API") {
    Tables.registerAll(spark, TestSpark.SF0001)
    val viaSql = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = graft.operators.Relational.queries("q10_segment_revenue")(spark, TestSpark.SF0001)
      .select("c_mktsegment", "n_items")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql === viaDf)
  }

  test("events view (nanos handled) works in SQL incl. props JSON access") {
    Tables.registerAll(spark, TestSpark.SF0001)
    val n = spark.sql(
      """SELECT COUNT(*) FROM events
        |WHERE from_json(props, 'k BIGINT').k IS NOT NULL
        |  AND ts >= TIMESTAMP '2024-01-01 00:00:00'""".stripMargin)
      .collect().head.getLong(0)
    assert(n > 0)
  }
}
