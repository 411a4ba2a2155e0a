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

  test("q51: repetition metrics never join and aggregate partially between groupBys") {
    val plan = finalPlan("q51_repetition")
    assert(!plan.contains("Join"), "q51 must be a pure explode+aggregate shape")
    // the (doc,n,gram) agg re-aggregates to (doc) WITHOUT a second raw-row
    // exchange: partial aggregation on the already-partitioned side
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"unexpected extra shuffles in:\n$plan")
  }

  test("q53: packing processes the corpus once; offsets broadcast back") {
    val plan = finalPlan("q53_pack_sequences")
    assert(plan.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast, never shuffle the data side again")
    // both the output rows and the per-bucket totals must read the ONE
    // persisted windowed pass (the textual exchange count is inflated by
    // each InMemoryTableScan printing the cached build plan inline, so the
    // cache reuse is the property to pin)
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2,
      s"both prefix-sum consumers must reuse the persisted pass:\n$plan")
  }

  test("q55: sessionization reuses one user_id exchange for both windows and the aggregate") {
    val plan = finalPlan("q55_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"lag, cumsum, and the session aggregate must share the user_id shuffle:\n$plan")
  }

  test("q56: domain mixing keeps WindowGroupLimit pruning despite the column quota") {
    val plan = finalPlan("q56_domain_mix")
    assert(plan.contains("WindowGroupLimit"),
      "the literal budget bound must restore per-partition candidate pruning")
  }

  test("q61: embedding LSH pairs come from band equi-joins — no theta/cross join") {
    val plan = finalPlan("q61_embedding_lsh")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join on (band, bucket):\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "the band-bucket self-join should be a hash/sort-merge equi-join")
  }

  test("q59: count-min counters reach the top-k probe as a broadcast") {
    val plan = finalPlan("q59_heavy_hitters")
    assert(plan.contains("BroadcastHashJoin"),
      "the 256-cell counter table must broadcast to the probe side")
  }

  test("q63: the bloom probe filters the fact scan BEFORE the exact semi-join") {
    val plan = finalPlan("q63_bloom_semijoin")
    assert(plan.contains("graft_bloom_might_contain"),
      s"the fact side must carry the bloom pre-filter:\n$plan")
    assert(plan.contains("LeftSemi"),
      "false positives must be removed by an exact semi-join")
    // the probe must sit under the join (filter-then-join, not join-then-filter)
    assert(plan.indexOf("graft_bloom_might_contain") > plan.indexOf("LeftSemi"),
      "pre-filter must be on the join's input side (printed below the join node)")
  }

  test("q62: the salted join shuffles on (key, salt) — the hot key scatters") {
    val plan = finalPlan("q62_salted_join")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"salting targets shuffle joins; a broadcast here would make it moot:\n$plan")
    assert("Exchange hashpartitioning\\([^)]*_salt".r.findFirstIn(plan).isDefined,
      s"the join exchange must partition on the salt so skewed keys spread:\n$plan")
  }

  test("q102: the power-iteration output plan never joins — dots are per-row folds") {
    val plan = finalPlan("q102_pc1_projection")
    assert(!plan.contains("Join"),
      s"the projection pass must be a map-side array fold, no join:\n$plan")
  }

  test("q103: the weighted k-cut is TakeOrdered, not a global sort") {
    val plan = finalPlan("q103_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan as per-partition top-k:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global range sort for a k-cut:\n$plan")
  }

  test("q101: rank iterations are equi-joins — no cartesian/nested-loop anywhere") {
    val plan = finalPlan("q101_dup_centrality")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"message passing must stay equi-join shaped:\n$plan")
  }

  test("q140: the corpus-scale scored stream shuffles on (q_id, salt), " +
    "never on q_id alone") {
    val plan = finalPlan("q140_hard_negatives")
    // phase 1: the exchange the corpus passes through must carry the salt —
    // nQueries×salts keys, not nQueries (the round-14 verdict's skew shape)
    assert("Exchange hashpartitioning\\(q_id#\\d+L, salt#".r
      .findFirstIn(plan).isDefined,
      s"corpus-sized stream must shuffle on (q_id, salt):\n$plan")
    // and it is map-side top-k-limited before it ships (WindowGroupLimit
    // Partial), so each mapper emits ≤ nQueries×salts×k rows
    assert("WindowGroupLimit \\[q_id#\\d+L, salt#\\d+L\\][^\\n]*Partial".r
      .findFirstIn(plan).isDefined,
      s"phase-1 cut must apply map-side before the salted exchange:\n$plan")
    // phase 2's q_id-only exchange exists but only sees phase-1 survivors:
    // textually it sits ABOVE (downstream of) the salted window
    val qOnly = plan.indexOf(
      "Exchange hashpartitioning\\(q_id#\\d+L, \\d".r.findFirstIn(plan)
        .getOrElse("<<missing>>"))
    val salted = plan.indexOf(
      "Exchange hashpartitioning\\(q_id#\\d+L, salt#".r.findFirstIn(plan)
        .getOrElse("<<missing>>"))
    assert(qOnly >= 0 && salted >= 0 && qOnly < salted,
      s"the per-anchor exchange must consume the salted cut's survivors:\n$plan")
  }

  test("q105: single-partition work is stage-count sized — one one-row reduce per stage") {
    val plan = finalPlan("q105_funnel")
    assert(plan.contains("Window"), "conversion ratios are window functions")
    // each stage's global count reduces partial map-side counts to one row;
    // nothing event-stream-sized may pass through a single partition
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 4,
      s"single-partition exchanges must be one-per-stage reduces only:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"stage counts must combine map-side before the one-row reduce:\n$plan")
  }
}
