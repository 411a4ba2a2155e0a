package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

/** Property-based checks for the expectations family (the
  * EnvelopePropertySpec convention: plain ScalaCheck generators under
  * fixed seeds — the scalatest-plus bridge is not in the offline
  * cache): for random tables and random rule parameters,
  *
  *  (i)  the q146 route is a PARTITION of the table whose per-row
  *       failure count, name-sorted label list and status all agree
  *       with a driver-side model of the strict-gate semantics
  *       (None/NULL fails every rule),
  *  (ii) route membership equals the q145 violation-rows relation
  *       exactly — report and routing are one definition,
  *  (iii) the scalar audit's per-rule violation counts equal the
  *       driver model's fold.
  */
class ExpectationsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class R(id: Long, v: Option[Long], s: Option[String])

  private case class RuleSpec(name: String, pred: R => Boolean,
                              check: Expectations.Check)

  private val genRow: Gen[(Option[Long], Option[String])] = for {
    v <- Gen.option(Gen.choose(0L, 120L))
    s <- Gen.option(Gen.oneOf("A", "B", "C", "D"))
  } yield (v, s)

  private def genCase(seed: Long): (List[R], List[RuleSpec]) = {
    val rows = Gen.choose(0, 30)
      .flatMap(n => Gen.listOfN(n, genRow))
      .apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case ((v, s), i) => R(i + 1L, v, s) }
    val (lo, hi) = {
      val a = (seed * 37) % 60
      (a.toDouble, (a + 25).toDouble)
    }
    val set = if (seed % 2 == 0) Seq("A", "B") else Seq("B", "C", "D")
    val all = List(
      RuleSpec("not_null:s", _.s.isDefined, Expectations.notNull("s")),
      RuleSpec("range:v", _.v.exists(x => x >= lo && x <= hi),
        Expectations.between("v", lo, hi)),
      RuleSpec("in_set:s", _.s.exists(set.contains),
        Expectations.inSet("s", set)))
    // a varying non-empty subset so rule-set size is exercised too
    val keep = all.zipWithIndex.filter { case (_, i) =>
      ((seed >> i) & 1L) == 0L || all.size == 1
    }.map(_._1)
    (rows, if (keep.isEmpty) all.take(1) else keep)
  }

  private def toDf(rows: List[R]) = {
    import spark.implicits._
    rows.map(r => (r.id, r.v.map(Long.box).orNull, r.s.orNull))
      .toDF("id", "v", "s")
  }

  test("property: the q146 route matches the driver model — failure " +
    "count, name-sorted labels, status partition") {
    (1 to 40).foreach { seed =>
      val (rows, rules) = genCase(seed.toLong)
      val got = Expectations.quarantineRoute("t", toDf(rows), "id",
          rules.map(_.check))
        .collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getString(3),
          r.getString(4)))).toMap
      assert(got.size === rows.size, s"seed $seed: route must cover all rows")
      rows.foreach { r =>
        val failed = rules.filter(ru => !ru.pred(r)).map(_.name).sorted
        val (n, labels, status) = got(r.id)
        assert(n === failed.size.toLong, s"seed $seed row ${r.id} n_failed")
        assert(labels === failed.mkString(","), s"seed $seed row ${r.id} labels")
        assert(status === (if (failed.isEmpty) "clean" else "quarantined"),
          s"seed $seed row ${r.id} status")
      }
    }
  }

  test("property: route membership == violation rows, and the scalar " +
    "audit's counts equal the driver fold") {
    (41 to 80).foreach { seed =>
      val (rows, rules) = genCase(seed.toLong)
      val df = toDf(rows)
      val vr = Expectations.violationRows("t", df, "id", rules.map(_.check))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      val want = (for {
        r <- rows; ru <- rules if !ru.pred(r)
      } yield (ru.name, r.id)).toSet
      assert(vr === want, s"seed $seed: violation rows must match the model")
      val audit = Expectations.audit("t", df, rules.map(_.check))
        .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
      rules.foreach { ru =>
        assert(audit(ru.name) === rows.count(r => !ru.pred(r)).toLong,
          s"seed $seed: audit count for ${ru.name}")
      }
    }
  }

  test("property: the keyed route (q152 semantics) matches the driver " +
    "model as a multiset — cleanest copy kept per duplicated key, " +
    "RefIn row-local, keyed violation rows reconcile") {
    import spark.implicits._
    (81 to 120).foreach { seed =>
      val (baseRows, rules) = genCase(seed.toLong)
      // fold a KEY column in (small domain forces duplicates; every
      // third seed plants a NULL key — a group of its own that always
      // fails RefIn)
      val keyed = baseRows.zipWithIndex.map { case (r, i) =>
        val k: Option[Long] =
          if (seed % 3 == 0 && i % 7 == 3) None
          else Some(((seed * 11 + i * 5) % 8) + 1L)
        (k, r)
      }
      val refSet = (1L to 8L).filter(k => ((seed >> (k % 5)) & 1L) == 0L)
      val df = keyed.map { case (k, r) =>
        (k.map(Long.box).orNull, r.v.map(Long.box).orNull, r.s.orNull)
      }.toDF("k", "v", "s")
      val refDf = refSet.toDF("rk")
      val uq = Seq(Expectations.Unique("unique:k", Seq("k")))
      val refs = Seq(Expectations.RefIn("ref:k->r.rk", "k", refDf, "rk"))
      val got = Expectations.keyedQuarantineRoute("t", df, "k",
          rules.map(_.check), uq, refs)
        .collect()
        .map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2),
          r.getString(3), r.getString(4)))
        .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2, r._3)).toSeq
      // driver model: per row the non-unique failures; per key group
      // the copies sorted by that signature, first kept
      val model = keyed.groupBy(_._1).toSeq.flatMap { case (k, group) =>
        val sigs = group.map { case (_, r) =>
          val scalarF = rules.filter(ru => !ru.pred(r)).map(_.name)
          val refF = if (k.exists(refSet.contains)) Nil
            else List("ref:k->r.rk")
          (scalarF ++ refF).sorted
        }.sortBy(f => (f.size, f.mkString(",")))
        sigs.zipWithIndex.map { case (f, pos) =>
          val all = (f ++ (if (pos > 0 && group.size > 1)
            List("unique:k") else Nil)).sorted
          (k, all.size.toLong, all.mkString(","),
            if (all.isEmpty) "clean" else "quarantined")
        }
      }.sortBy(r => (r._1.getOrElse(Long.MinValue), r._2, r._3))
      assert(got === model, s"seed $seed: keyed route multiset")
      // keyed violation rows reconcile: all copies of duplicated keys +
      // every dangling row, as a multiset per (constraint, key)
      val vr = Expectations.keyedViolationRows("t", df, "k", uq, refs)
        .collect()
        .map(r => (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      val wantU = keyed.groupBy(_._1).toSeq.filter(_._2.size > 1)
        .flatMap { case (k, g) => g.map(_ => ("unique:k", k)) }
      val wantR = keyed.filter { case (k, _) => !k.exists(refSet.contains) }
        .map { case (k, _) => ("ref:k->r.rk", k) }
      assert(vr.sortBy(r => (r._1, r._2.getOrElse(Long.MinValue))).toSeq ===
        (wantU ++ wantR).sortBy(r => (r._1, r._2.getOrElse(Long.MinValue))),
        s"seed $seed: keyed violation rows")
    }
  }
}
