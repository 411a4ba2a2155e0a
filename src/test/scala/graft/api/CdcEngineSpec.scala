package graft.api

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.store.InMemoryStore

/** The four end-to-end scenarios from the reference's sequence-flows.mmd
  * (16-53) plus the CRUD edge semantics of SURVEY.md s7.6.
  */
class CdcEngineSpec extends AnyFunSuite {

  private def fixedClock(start: LocalDateTime = LocalDateTime.of(2025, 1, 1, 0, 0, 0)) = {
    var t = start
    () => { t = t.plusSeconds(100); t }
  }

  private def freshEngine() = {
    val store = new InMemoryStore
    val e = new CdcEngine(store, fixedClock())
    e.createOne(14, "Deren", "S", Some("Fraud"), Some("Fury"))
    e.createOne(17, "Shalom", "S", Some("Sloth"), Some("Reticle"))
    (e, store)
  }

  test("scenario 1: cache miss reads through and fills the cache") {
    val (e, store) = freshEngine()
    assert(store.size === 0)
    val r = e.readOne(14)
    assert(r.map(_.name) === Right("Deren"))
    assert(store.get("14").isDefined) // filled, no TTL
  }

  test("scenario 2: cache hit short-circuits (value served from store)") {
    val (e, store) = freshEngine()
    e.readOne(14)
    // poison the table's row via a direct update... instead: verify the hit
    // decodes the stored JSON round-trip identical
    val cached = store.get("14").flatMap(e.fromJson)
    assert(cached.map(_.tendency) === Some(Some("Fury")))
    assert(e.readOne(14).map(_.name) === Right("Deren"))
  }

  test("scenario 3: a change event invalidates exactly the changed key") {
    val (e, store) = freshEngine()
    e.readOne(14); e.readOne(17)
    assert(store.size === 2)
    e.updateOne(14, SinnerPatch(tendency = Some("Wrath")))
    e.processCdc(TestSpark.spark)
    assert(store.get("14").isEmpty, "changed key must be evicted")
    assert(store.get("17").isDefined, "unrelated key must survive")
  }

  test("scenario 4: read-after-invalidate rebuilds the cache with new data") {
    val (e, store) = freshEngine()
    e.readOne(14)
    e.updateOne(14, SinnerPatch(tendency = Some("Wrath")))
    e.processCdc(TestSpark.spark)
    val r = e.readOne(14)
    assert(r.map(_.tendency) === Right(Some("Wrath")))
    assert(store.get("14").flatMap(e.fromJson).map(_.tendency) === Some(Some("Wrath")))
  }

  test("O-6: duplicate insert is a 400, not an overwrite") {
    val (e, _) = freshEngine()
    assert(e.createOne(14, "Other", "A", None, None) === Left(BadRequest))
    assert(e.readOne(14).map(_.name) === Right("Deren"))
  }

  test("O-7: overlay update — absent fields keep DB values, updated_at stamped") {
    val (e, _) = freshEngine()
    val before = e.readOne(14).toOption.get
    val after = e.updateOne(14, SinnerPatch(tendency = Some("Wrath"))).toOption.get
    assert(after.name === "Deren")           // kept
    assert(after.libram === Some("Fraud"))   // kept
    assert(after.tendency === Some("Wrath")) // overlaid
    assert(after.created_at === before.created_at)
    assert(after.updated_at.isAfter(before.updated_at)) // O-9 trigger parity
  }

  test("O-7/O-8: missing key is a 404") {
    val (e, _) = freshEngine()
    assert(e.updateOne(999, SinnerPatch()) === Left(NotFound))
    assert(e.deleteOne(999) === Left(NotFound))
  }

  test("O-8: delete returns the pre-image and removes the row") {
    val (e, _) = freshEngine()
    val r = e.deleteOne(17)
    assert(r.map(_.name) === Right("Shalom"))
    assert(e.readOne(17) === Left(NotFound))
    assert(e.readAll().map(_.code) === Seq(14L))
  }

  test("delete invalidates via before.code (O-14) and replay is idempotent") {
    val (e, store) = freshEngine()
    e.readOne(17)
    e.deleteOne(17)
    e.processCdc(TestSpark.spark)
    assert(store.get("17").isEmpty)
    val sizeAfterOnce = store.size
    e.processCdc(TestSpark.spark) // full-log replay (at-least-once)
    assert(store.size === sizeAfterOnce)
  }

  test("S-8: JSON codec round-trips nulls and escapes") {
    val (e, _) = freshEngine()
    val s = Sinner(1, "a\"b\\c", "S", None, Some("x\ny"),
      LocalDateTime.of(2025, 6, 1, 12, 0, 0), LocalDateTime.of(2025, 6, 1, 12, 0, 0))
    assert(e.fromJson(e.toJson(s)) === Some(s))
  }

  test("S-8: codec round-trips adversarial escapes (literal backslash-n, tab, CR)") {
    val (e, _) = freshEngine()
    val t = LocalDateTime.of(2025, 6, 1, 12, 0, 0)
    // "x\n" as TWO characters (backslash + n), a real tab, a real CR,
    // and a backslash immediately before a quote-escape trigger
    Seq("x\\n", "a\tb", "c\rd", "e\\\"f", "\\\\", "ctl").foreach { name =>
      val s = Sinner(2, name, "S", Some(name), None, t, t)
      assert(e.fromJson(e.toJson(s)) === Some(s), s"name=<$name>")
    }
  }

  test("cache hit serves adversarial names byte-identical (end-to-end)") {
    val (e, _) = freshEngine()
    e.createOne(55, "x\\n\ttail", "S", None, None)
    e.readOne(55) // miss -> fill
    assert(e.readOne(55).map(_.name) === Right("x\\n\ttail")) // hit -> decode
  }
}
