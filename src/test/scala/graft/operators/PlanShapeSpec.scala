package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Physical-plan shape pins for the round-4 operators: the scale claims in
  * SCALING.md are assertions here, not prose. Plans are inspected after a
  * materializing action so AQE has finalized.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, D)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("q42: the per-stratum quota is WindowGroupLimit-optimized (partial + final)") {
    val plan = finalPlan("q42_stratified_sample")
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k filter should push into WindowGroupLimit so partitions keep only quota candidates")
  }

  test("q44: corpus stats and term df reach the scorer as broadcasts") {
    val plan = finalPlan("q44_bm25_search")
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2,
      "df and stats must broadcast — neither may shuffle the corpus side")
  }

  test("q46: quantization summaries aggregate partially before one exchange") {
    val plan = finalPlan("q46_quantize_embeddings")
    // expected exchanges: the vec_id aggregate + the final presentation sort
    assert("Exchange".r.findAllIn(plan).size -
      "BroadcastExchange".r.findAllIn(plan).size <= 2,
      s"unexpected extra shuffles in:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      "summaries must combine map-side")
  }

  test("q50: the eval shingle probe is a broadcast semi-join, not a shuffle join") {
    val plan = finalPlan("q50_contamination")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "the contamination probe must broadcast the eval shingle set")
  }

  test("q16b: the HLL estimate plan exchanges register rows, not keys") {
    val plan = finalPlan("q16b_hll_users")
    assert(plan.contains("partial_max"),
      "registers must combine map-side (partial max per bucket)")
  }
}
