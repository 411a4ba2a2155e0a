package graft.api

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark
import graft.store.InMemoryStore

/** Model-based property test: the engine against a cache-aware sequential
  * model under random CRUD/CDC interleavings. The model reproduces the
  * reference's REAL consistency contract — a read between an update and the
  * next CDC pass serves the stale cached row (cache-aside + asynchronous
  * invalidation), and a CDC pass evicts every key whose history contains a
  * non-null-`before` event (the whole log replays, at-least-once).
  */
class CdcEnginePropertySpec extends AnyFunSuite {

  sealed trait Op
  case class Create(code: Long, name: String) extends Op
  case class Update(code: Long, tendency: String) extends Op
  case class Delete(code: Long) extends Op
  case class Read(code: Long) extends Op
  case object RunCdc extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> Gen.zip(Gen.choose(1L, 6L), Gen.identifier.map(_.take(8))).map(Create.tupled),
    3 -> Gen.zip(Gen.choose(1L, 6L), Gen.identifier.map(_.take(8))).map(Update.tupled),
    2 -> Gen.choose(1L, 6L).map(Delete),
    4 -> Gen.choose(1L, 6L).map(Read),
    2 -> Gen.const(RunCdc))

  private def opSeqs(n: Int): Seq[List[Op]] =
    (1 to n).flatMap(i =>
      Gen.choose(5, 40).flatMap(len => Gen.listOfN(len, genOp))
        .apply(Gen.Parameters.default, Seed(1000L + i)))

  test("property: engine matches a cache-aware model (incl. staleness windows)") {
    val spark = TestSpark.spark
    opSeqs(15).foreach { ops =>
      var t = LocalDateTime.of(2025, 1, 1, 0, 0, 0)
      val clock = () => { t = t.plusSeconds(1); t }
      val engine = new CdcEngine(new InMemoryStore, clock)

      type V = (String, Option[String]) // (name, tendency)
      val table = scala.collection.mutable.Map[Long, V]()
      val cache = scala.collection.mutable.Map[Long, V]()
      // keys with a u/d event NOT yet consumed by a CDC pass (the engine
      // consumes incrementally from a committed offset)
      val dirty = scala.collection.mutable.Set[Long]()

      def checkRead(c: Long): Unit = {
        val r = engine.readOne(c)
        cache.get(c) match {
          case Some(v) => // hit: cached row served verbatim, even if stale
            assert(r.map(x => (x.name, x.tendency)) === Right(v), s"stale-hit key $c\nops=$ops")
          case None => table.get(c) match {
            case None => assert(r === Left(NotFound), s"key $c\nops=$ops")
            case Some(v) =>
              assert(r.map(x => (x.name, x.tendency)) === Right(v), s"miss key $c\nops=$ops")
              cache(c) = v // read-through fill
          }
        }
      }

      ops.foreach {
        case Create(c, n) =>
          val r = engine.createOne(c, n, "S", None, None)
          if (table.contains(c)) assert(r === Left(BadRequest))
          else { assert(r.isRight); table(c) = (n, None) }
        case Update(c, tend) =>
          val r = engine.updateOne(c, SinnerPatch(tendency = Some(tend)))
          table.get(c) match {
            case None => assert(r === Left(NotFound))
            case Some((n, _)) =>
              assert(r.map(_.tendency) === Right(Some(tend)))
              table(c) = (n, Some(tend)); dirty += c
          }
        case Delete(c) =>
          val r = engine.deleteOne(c)
          if (table.contains(c)) { assert(r.isRight); table.remove(c); dirty += c }
          else assert(r === Left(NotFound))
        case Read(c) => checkRead(c)
        case RunCdc =>
          engine.processCdc(spark)
          dirty.foreach(cache.remove) // evicts keys changed since last pass
          dirty.clear()               // offset committed
      }

      // final CDC pass + sweep: with a clean cache, reads equal the table
      engine.processCdc(spark)
      dirty.foreach(cache.remove)
      dirty.clear()
      (1L to 6L).foreach(checkRead)

      // cross-layer invariant: folding the engine's own emitted change log
      // (latest-state view, E-1) reproduces the live table exactly —
      // CRUD semantics, envelope emission, and the fold agree end to end
      val folded = graft.cdc.Envelope
        .latestState(graft.cdc.Envelope.parse(engine.changeRecords(spark)))
        .select("code", "name", "tendency")
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), Option(r.getString(2)))).toMap
      val live = engine.readAll().map(s => s.code -> (s.name, s.tendency)).toMap
      assert(folded === live, s"log fold != table\nops=$ops")
    }
  }
}
