package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q102 top-principal-component projection: the distributed power iteration
  * must match a sequential replay of the identical integer recurrence, the
  * recovered direction must actually find a planted dominant axis, and the
  * integer-division semantics the portability argument rests on
  * (truncation toward zero) must hold for Spark's DIV.
  */
class Pc1Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Spark DIV truncates toward zero (the q101/q102 portability contract)") {
    val r = spark.sql("SELECT -7 DIV 2 AS a, 7 DIV 2 AS b, -7 DIV -2 AS c").first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((-3L, 3L, 3L)),
      "DuckDB // and Scala / truncate toward zero; Spark DIV must agree")
  }

  /** Sequential replay of pc1Projection's exact recurrence. */
  private def seqPc1(vecs: Seq[(Long, Seq[Double])], iters: Int): Map[Long, Long] = {
    val q = vecs.map { case (id, xs) =>
      id -> xs.map(x => math.floor(x * 10000 + 0.5).toLong).toIndexedSeq
    }
    val dim = q.head._2.size
    val n = q.size.toLong
    val mean = (0 until dim).map(i => q.map(_._2(i)).sum / n)
    val c = q.map { case (id, arr) =>
      id -> arr.zip(mean).map { case (a, b) => a - b }
    }
    var v = IndexedSeq.fill(dim)(10000L)
    (1 to iters).foreach { _ =>
      val ds = c.map { case (id, cc) =>
        id -> cc.zip(v).map { case (a, b) => a * b }.sum / 10000L
      }.toMap
      val w = (0 until dim).map(i => c.map { case (id, cc) => cc(i) * ds(id) }.sum)
      val d = math.max(1L, w.map(math.abs).max / 10000L)
      v = w.map(_ / d)
    }
    c.map { case (id, cc) =>
      id -> cc.zip(v).map { case (a, b) => a * b }.sum / 10000L
    }.toMap
  }

  private def runPc1(vecs: Seq[(Long, Seq[Double])], iters: Int,
                     parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val df0 = vecs.map { case (id, xs) => (id, xs.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val df = if (parts > 1) df0.repartition(parts) else df0
    Clustering.pc1Projection(df, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("distributed power iteration == sequential integer replay") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    for (iters <- Seq(1, 3)) {
      assert(runPc1(vecs, iters) === seqPc1(vecs, iters), s"iters=$iters")
    }
  }

  test("planted dominant axis: projection sign and magnitude follow it; layout-invariant") {
    val rnd = new scala.util.Random(11)
    // variance dominated by dim 0 (amplitude ~1); the rest is ~0.02 noise
    val vecs = (1L to 60L).map { i =>
      val a = (if (i % 2 == 0) 1.0 else -1.0) * (0.5 + (i % 7) * 0.07)
      i -> (a +: Seq.fill(7)(rnd.nextDouble() * 0.04 - 0.02))
    }
    val proj = runPc1(vecs, 3)
    // one consistent sign convention across the corpus: proj correlates
    // with the planted coordinate either everywhere or nowhere
    val signs = vecs.map { case (i, xs) =>
      math.signum(proj(i).toDouble) == math.signum(xs.head) }
    assert(signs.forall(identity) || !signs.exists(identity),
      "sign convention must be uniform")
    assert(signs.forall(identity) || signs.forall(!_))
    // magnitude ordering follows |x0| for the extremes
    val byAmp = vecs.sortBy { case (_, xs) => math.abs(xs.head) }
    assert(math.abs(proj(byAmp.last._1)) > math.abs(proj(byAmp.head._1)),
      "largest planted amplitude must out-project the smallest")
    assert(runPc1(vecs, 3, parts = 7) === proj, "repartition must not change output")
  }
}
