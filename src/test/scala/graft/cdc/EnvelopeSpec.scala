package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics of the CDC dataflow (reference queue/cdc.go:153-223), including
  * the edge dispatch rules SURVEY.md s7.6 flags as easy to get wrong.
  */
class EnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tombstone (null value) and malformed JSON are skipped, not fatal") {
    val parsed = Envelope.parse(Fixtures.changeRecords(spark))
    // 8 records: 6 valid envelopes, 1 tombstone, 1 malformed
    assert(parsed.count() === 6)
  }

  test("invalidation dispatch is on before-nullity: inserts/snapshots never invalidate") {
    val keys = Envelope.invalidationSet(Fixtures.changeRecords(spark))
      .as[String].collect().sorted
    assert(keys.toSeq === Seq("14", "17", "5"))
  }

  test("dispatch ignores op entirely: op='c' with non-null before DOES invalidate") {
    // Theoretically impossible from Debezium, but the reference would
    // invalidate it (cdc.go:181-195 never reads op) — so must we.
    val weird =
      """{"payload":{"before":{"code":99},"after":{"code":99},"op":"c",
        |"source":{"lsn":1},"ts_ms":1}}""".stripMargin.replace("\n", " ")
    val keys = Envelope.invalidationSet(Seq(weird).toDF("value"))
      .as[String].collect()
    assert(keys.toSeq === Seq("99"))
  }

  test("replay (at-least-once) is idempotent: processing the log twice = once") {
    val once = Envelope.invalidationSet(Fixtures.changeRecords(spark))
      .as[String].collect().sorted.toSeq
    val twice = Envelope.invalidationSet(
      Fixtures.changeRecords(spark).union(Fixtures.changeRecords(spark)))
      .as[String].collect().sorted.toSeq
    assert(once === twice)
  }

  test("latest-state view folds by lsn; deleted keys drop out") {
    val state = Envelope.latestState(Envelope.parse(Fixtures.changeRecords(spark)))
      .orderBy("code")
      .select("code", "class", "tendency")
      .as[(Long, String, String)].collect().toSeq
    // 5: inserted then updated (class S->A); 14: updated (Fury->Wrath);
    // 17: deleted, gone.
    assert(state === Seq((5L, "A", "Reticle"), (14L, "S", "Wrath")))
  }

  test("latest-state replay is idempotent") {
    val doubled = Fixtures.changeRecords(spark).union(Fixtures.changeRecords(spark))
    val state = Envelope.latestState(Envelope.parse(doubled))
      .orderBy("code").select("code").as[Long].collect().toSeq
    assert(state === Seq(5L, 14L))
  }

  test("non-null before with null/missing code invalidates key \"0\" (Go zero-value parity)") {
    // encoding/json leaves Code at 0 when absent; the reference DELs "0",
    // never a null key that would poison store.del
    val drifted =
      """{"payload":{"before":{"id":7},"after":null,"op":"d",
        |"source":{"lsn":5},"ts_ms":1}}""".stripMargin.replace("\n", " ")
    val keys = Envelope.invalidationSet(Seq(drifted).toDF("value"))
      .as[String].collect()
    assert(keys.toSeq === Seq("0"))
  }

  test("keyless events (schema drift) are excluded from the latest-state fold") {
    val drifted =
      """{"payload":{"before":{"id":7},"after":{"id":7},"op":"u",
        |"source":{"lsn":5},"ts_ms":1}}""".stripMargin.replace("\n", " ")
    val state = Envelope.latestState(Envelope.parse(Seq(drifted).toDF("value")))
    assert(state.count() === 0)
  }

  test("unknown JSON fields are silently dropped (schema-evolution tolerance)") {
    // parity with encoding/json's unknown-field behavior (cdc.go:175):
    // an envelope with extra fields at every level still parses
    val extra =
      """{"payload":{"before":{"code":7,"brand_new_col":"x"},"after":null,
        |"op":"d","source":{"lsn":5,"new_source_field":1},"ts_ms":1,
        |"totally_new_block":{"a":1}},"another_top":true}"""
        .stripMargin.replace("\n", " ")
    val keys = Envelope.invalidationSet(Seq(extra).toDF("value"))
      .as[String].collect()
    assert(keys.toSeq === Seq("7"))
  }

  test("parse projects only the fields read downstream (nested pruning)") {
    val plan = Envelope.invalidationKeys(Envelope.parse(Fixtures.changeRecords(spark)))
      .queryExecution.optimizedPlan.toString
    // from_json should be schema-pruned to before.code, not the full envelope
    assert(!plan.contains("tendency"), "envelope parse was not pruned:\n" + plan)
  }

  test("q123: SCD2 versions tile per key, a delete closes without " +
    "reopening, and exactly one version is current per live key") {
    def env(key: Long, lsn: Long, op: String, lib: String = "A"): String =
      if (op == "d")
        s"""{"payload": {"before": {"code": $key}, "after": null, "op": "d", "source": {"lsn": $lsn, "ts_ms": 1}, "ts_ms": 1}}"""
      else
        s"""{"payload": {"before": null, "after": {"code": $key, "libram": "$lib"}, "op": "$op", "source": {"lsn": $lsn, "ts_ms": 1}, "ts_ms": 1}}"""
    // key 1: c, u, u (live, 3 versions); key 2: c, d (deleted);
    // key 3: c, d, c (re-created after delete)
    val vals = Seq(
      env(1, 10, "c", "A"), env(1, 20, "u", "B"), env(1, 30, "u", "C"),
      env(2, 11, "c", "X"), env(2, 21, "d"),
      env(3, 12, "c", "P"), env(3, 22, "d"), env(3, 32, "c", "Q"))
      .toDF("value")
    val out = Envelope.scd2History(Envelope.parse(vals)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "A", 10L, 20L, 0L), (1L, "B", 20L, 30L, 0L), (1L, "C", 30L, -1L, 1L),
      (2L, "X", 11L, 21L, 0L),
      (3L, "P", 12L, 22L, 0L), (3L, "Q", 32L, -1L, 1L)))
    // exactly one current version per key that did not end in a delete,
    // none for key 2 (the exact-output assert above already pins tiling:
    // key 1's versions chain 10->20->30->current, key 3 has the deleted
    // gap [22, 32) with no version)
    val byKey = out.groupBy(_._1)
    assert(byKey(1L).count(_._5 == 1L) === 1)
    assert(byKey(2L).count(_._5 == 1L) === 0)
    assert(byKey(3L).count(_._5 == 1L) === 1)

    // q130 lookup against the same history: probes in every regime —
    // before creation, inside each version, inside the delete gap,
    // after re-creation, and on exact boundaries (valid_from inclusive,
    // valid_to exclusive)
    import spark.implicits._
    val probes = Seq(
      (1L, 5L),   // before creation -> absent
      (1L, 10L),  // valid_from boundary -> A
      (1L, 25L),  // inside v2 -> B
      (1L, 30L),  // v2's valid_to == v3's valid_from -> C
      (1L, 99L),  // current -> C
      (2L, 15L),  // inside the only version -> X
      (2L, 21L),  // delete lsn: interval closed -> absent
      (3L, 25L),  // delete gap -> absent
      (3L, 40L))  // re-created -> Q
      .toDF("k", "at_lsn")
    val looked = Envelope.scd2Lookup(
      Envelope.scd2History(Envelope.parse(vals)), probes).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(looked === Map(
      (1L, 5L) -> "absent", (1L, 10L) -> "A", (1L, 25L) -> "B",
      (1L, 30L) -> "C", (1L, 99L) -> "C",
      (2L, 15L) -> "X", (2L, 21L) -> "absent",
      (3L, 25L) -> "absent", (3L, 40L) -> "Q"))
  }

  test("q133 churn cross-pins q123: n_versions == history rows per key, " +
    "is_live == an open version exists") {
    val vals = CdcQueries.scd2SyntheticValues(spark, 0, 5000)
    val parsed = Envelope.parse(vals)
    val churn = Envelope.changeChurn(parsed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    val hist = Envelope.scd2History(parsed).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    val versionsPerKey = hist.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val livePerKey = hist.groupBy(_._1).view
      .mapValues(rs => if (rs.exists(_._2 == 1L)) 1L else 0L).toMap
    assert(churn.nonEmpty)
    churn.foreach { case (k, (nv, live)) =>
      assert(nv === versionsPerKey.getOrElse(k, 0L), s"key $k versions")
      assert(live === livePerKey.getOrElse(k, 0L), s"key $k liveness")
    }
    // both live and dead keys must occur in the fixture window
    assert(churn.values.exists(_._2 == 1L) && churn.values.exists(_._2 == 0L))
  }
}
