package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Connected-components equivalence: the large-star/small-star contraction
  * (the 100 TB path behind nearDupClusters) must produce the SAME labels as
  * plain min-label propagation on every graph shape, while its round count
  * is bounded by O(log n) instead of the graph diameter.
  */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelsOf(pairs: Seq[(Long, Long)],
                       cc: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame, Int))
  : (Set[(Long, Long)], Int) = {
    import spark.implicits._
    val (df, rounds) = cc(pairs.toDF("d1", "d2"))
    (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, rounds)
  }

  private def assertSameLabels(pairs: Seq[(Long, Long)], hint: String): (Int, Int) = {
    val (prop, pr) = labelsOf(pairs, Dedup.ccPropagate)
    val (star, sr) = labelsOf(pairs, Dedup.ccStarContract)
    assert(star == prop, s"$hint: star-contraction labels diverge from propagation")
    (pr, sr)
  }

  test("empty graph: both algorithms return no labels") {
    assertSameLabels(Seq.empty, "empty")
  }

  test("single pair and a two-pair chain") {
    assertSameLabels(Seq((2L, 1L)), "pair")
    assertSameLabels(Seq((1L, 2L), (2L, 3L)), "chain-3")
  }

  test("clique, star, and two disjoint components") {
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assertSameLabels(clique, "clique-5")
    assertSameLabels((2L to 8L).map(i => (1L, i)), "star-8")
    assertSameLabels(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)), "two-components")
  }

  test("seeded random graphs: labels identical across algorithms") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter(p => p._1 != p._2)
      assertSameLabels(pairs, s"random-$n")
    }
  }

  test("planted long chain: star-contraction needs far fewer rounds than propagation") {
    // a 48-node path: min-label propagation moves the minimum one hop per
    // iteration (diameter-bound); the contraction halves path lengths each
    // alternation (log-bound). Descending ids make it adversarial for the
    // min's travel direction.
    val chain = (1L until 48L).map(i => (48L - i, 48L - i + 1))
    val (propRounds, starRounds) = assertSameLabels(chain, "chain-48")
    assert(propRounds > 20,
      s"propagation on a 47-edge path should be diameter-bound, took $propRounds")
    assert(starRounds <= 10,
      s"star contraction should be log-bound, took $starRounds rounds")
    assert(starRounds * 2 < propRounds,
      s"contraction ($starRounds) must beat propagation ($propRounds) decisively")
  }
}
