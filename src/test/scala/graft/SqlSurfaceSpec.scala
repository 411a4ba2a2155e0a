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

  test("EVERY catalog entry is SQL-reachable: registerQueryViews exposes " +
    "all queries as temp views that spark.sql executes (none exempt)") {
    val g = new Graft(TestSpark.spark, TestSpark.SF0001)
    g.registerQueryViews()
    val failures = g.queryNames.flatMap { n =>
      try {
        // a real execution through the SQL surface, not just a parse:
        // count() runs the operator's full plan behind the view
        spark.sql(s"SELECT * FROM $n").count()
        None
      } catch { case e: Throwable => Some(s"$n: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} catalog entries not SQL-reachable:\n" +
        failures.mkString("\n"))
  }

  test("views compose: SQL filters and joins optimize THROUGH a catalog view") {
    val g = new Graft(TestSpark.spark, TestSpark.SF0001)
    g.registerQueryViews(Seq("q49_neardup_clusters"))
    Tables.registerAll(spark, TestSpark.SF0001)
    // join the operator view against a fixture view in one SQL statement
    val joined = spark.sql(
      """SELECT c.cluster_id, COUNT(*) AS n_docs, SUM(d.n_chars) AS chars
        |FROM q49_neardup_clusters c JOIN documents d USING (doc_id)
        |GROUP BY c.cluster_id ORDER BY c.cluster_id""".stripMargin)
    assert(joined.count() > 0)
    // the view binds a lazy plan: a filtered reference stays a plan
    // (optimizes as one query), not a cached materialization
    val one = spark.sql(
      "SELECT * FROM q49_neardup_clusters WHERE doc_id = cluster_id")
    assert(one.queryExecution.optimizedPlan.toString.nonEmpty &&
      one.count() > 0)
  }
}
