package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** Property-based checks (SURVEY.md s5.2 item 3): for random envelope
  * streams, (i) the invalidation set is exactly the keys with at least one
  * non-null-`before` event, (ii) the latest-state view equals a reference
  * fold of ops in lsn order, (iii) replay is idempotent.
  *
  * Uses plain ScalaCheck generators sampled under fixed seeds (the
  * scalatest-plus bridge is not in the offline cache) — 40 deterministic
  * cases per property.
  */
class EnvelopePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A simplified change event: op is generated INDEPENDENTLY of
    * before/after nullity, deliberately including combinations Debezium
    * would never emit — dispatch must still follow nullity alone
    * (SURVEY.md s7.6 risk 2).
    */
  case class Ev(op: String, beforeCode: Option[Long], afterCode: Option[Long], lsn: Long)

  private val genEv: Gen[Ev] = for {
    op <- Gen.oneOf("c", "u", "d", "r")
    b <- Gen.option(Gen.choose(1L, 8L))
    a <- Gen.option(Gen.choose(1L, 8L))
    lsn <- Gen.choose(100000L, 999999L)
  } yield Ev(op, b, a, lsn)

  private val genLog: Gen[List[Ev]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, genEv))

  private def cases(n: Int): Seq[List[Ev]] =
    (1 to n).flatMap(i => genLog(Gen.Parameters.default, Seed(i.toLong)))

  private def row(code: Long): String =
    s"""{"code": $code, "name": "n$code", "class": "S", "libram": null,
       |"tendency": null, "created_at": 0, "updated_at": 0}""".stripMargin.replace("\n", " ")

  private def toJsonDoc(e: Ev): String = {
    val b = e.beforeCode.map(row).getOrElse("null")
    val a = e.afterCode.map(row).getOrElse("null")
    s"""{"payload": {"before": $b, "after": $a, "op": "${e.op}",
       |"source": {"lsn": ${e.lsn}, "ts_ms": 1}, "ts_ms": 1}}""".stripMargin.replace("\n", " ")
  }

  private def recordsDf(log: List[Ev]) = {
    import spark.implicits._
    log.map(toJsonDoc).toDF("value")
  }

  test("property: invalidation set = distinct stringified before-keys") {
    cases(40).foreach { log =>
      val expected = log.flatMap(_.beforeCode).map(_.toString).distinct.sorted
      val got = Envelope.invalidationSet(recordsDf(log))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got === expected, s"log=$log")
    }
  }

  test("property: latest-state view = fold of events in lsn order") {
    cases(40).foreach { log =>
      // reference fold: per key (after's code, else before's), the max-lsn
      // event wins; the key survives iff that event's after is non-null.
      // Drop keys whose max lsn is ambiguous (duplicate lsn with different
      // survival) — max_by tie-breaks arbitrarily and so would any engine.
      val byKey = log
        .filter(e => e.afterCode.orElse(e.beforeCode).isDefined)
        .groupBy(e => e.afterCode.orElse(e.beforeCode).get)
      val unambiguous = byKey.filter { case (_, evs) =>
        val m = evs.map(_.lsn).max
        evs.filter(_.lsn == m).map(_.afterCode.isDefined).distinct.size == 1
      }
      val expected = unambiguous.flatMap { case (k, evs) =>
        evs.maxBy(_.lsn).afterCode.map(_ => k)
      }.toSeq.sorted
      val got = Envelope.latestState(Envelope.parse(recordsDf(log)))
        .select("code").collect().map(_.getLong(0)).toSeq
        .filter(k => unambiguous.contains(k)).sorted
      assert(got === expected, s"log=$log")
    }
  }

  test("property: batch apply == model fold over base + random change log") {
    import spark.implicits._
    cases(25).foreach { log =>
      // base: keys 1..4 present with marker name "base"
      val base = Fixtures.sinnersLike(spark,
        (1L to 4L).map(k => (k, "base", "S", "L", "T")))
      val rows = Apply.applyChanges(spark, base, recordsDf(log))
        .select("code", "name").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // MERGE must yield one row per key — a duplicate would be hidden by toMap
      assert(rows.map(_._1).distinct.length === rows.length,
        s"duplicate keys in apply output: ${rows.toSeq.sorted}\nlog=$log")
      val next = rows.toMap

      // model: per key, max-lsn event wins (ties as in the latest-state
      // property — skip ambiguous keys); untouched base keys pass through
      val byKey = log
        .filter(e => e.afterCode.orElse(e.beforeCode).isDefined)
        .groupBy(e => e.afterCode.orElse(e.beforeCode).get)
      val unambiguous = byKey.filter { case (_, evs) =>
        val m = evs.map(_.lsn).max
        evs.filter(_.lsn == m).map(_.afterCode.isDefined).distinct.size == 1
      }
      val expected = scala.collection.mutable.Map[Long, String]()
      (1L to 4L).foreach(k => expected(k) = "base")
      byKey.keys.foreach(expected.remove) // any touched key is replaced or deleted
      unambiguous.foreach { case (k, evs) =>
        evs.maxBy(_.lsn).afterCode.foreach(c => expected(k) = s"n$c")
      }
      val ambiguous = byKey.keySet -- unambiguous.keySet
      val gotStable = next.view.filterKeys(!ambiguous.contains(_)).toMap
      val expStable = expected.view.filterKeys(!ambiguous.contains(_)).toMap
      assert(gotStable === expStable, s"log=$log")
    }
  }

  test("property: replaying a log any number of times changes nothing") {
    cases(40).foreach { log =>
      val once = Envelope.invalidationSet(recordsDf(log))
        .collect().map(_.getString(0)).sorted.toSeq
      val many = Envelope.invalidationSet(recordsDf(List.fill(3)(log).flatten))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(once === many, s"log=$log")
    }
  }
}
