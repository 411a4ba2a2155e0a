package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Count-min (q59) guarantees beyond the DuckDB oracle: the one-sided
  * error bound, estimate exactness for dominant tokens, and linear
  * mergeability of the counter state.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  test("q59: count-min estimates are one-sided and order-preserving on top hitters") {
    val rows = Sketches.queries("q59_heavy_hitters")(spark, D).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: estimate below truth (never allowed)")
    }
    // with ~60 distinct tokens over 4x64 cells, collisions are rare: the
    // top hitters' estimates should be exact far more often than not
    assert(rows.count(r => r.getLong(2) == r.getLong(1)) >= 7,
      "most top-hitter estimates should be collision-free on this vocabulary")
  }

  test("q59: counter state merges linearly across corpus splits") {
    val docs = Tables.documents(spark, D)
    def counters(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] = {
      graft.functions.GraftFunctions.register(spark)
      Sketches.cmCounters(Sketches.tokenCounts(df))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val whole = counters(docs)
    val a = counters(docs.filter(col("doc_id") % 2 === 0))
    val b = counters(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "sketch(A u B) must equal sketch(A) + sketch(B)")
  }
}
