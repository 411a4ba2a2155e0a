package graft.api

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.store.InMemoryStore

/** The reference serves HTTP handlers and the CDC consumer concurrently
  * (main.go:37-46); the engine must tolerate the same — parallel CRUD from
  * many threads with invariants intact.
  */
class ConcurrencySpec extends AnyFunSuite {

  test("readAll on an empty table is an empty list, not an error (O-1 edge)") {
    val e = new CdcEngine(new InMemoryStore)
    assert(e.readAll() === Seq.empty)
  }

  test("parallel CRUD storm: no lost updates, no phantom rows, cache never poisoned") {
    val e = new CdcEngine(new InMemoryStore)
    val threads = 8
    val opsPerThread = 200
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val errors = new AtomicInteger(0)
    val creates = new AtomicInteger(0)
    val deletes = new AtomicInteger(0)

    (0 until threads).foreach { tid =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          val rnd = new scala.util.Random(tid) // per-thread deterministic seed
          (0 until opsPerThread).foreach { _ =>
            val code = rnd.nextInt(20).toLong
            try rnd.nextInt(4) match {
              case 0 => if (e.createOne(code, s"n$code", "S", None, None).isRight)
                creates.incrementAndGet()
              case 1 => e.updateOne(code, SinnerPatch(tendency = Some(s"t$tid")))
              case 2 => if (e.deleteOne(code).isRight) deletes.incrementAndGet()
              case 3 => e.readOne(code).foreach { s =>
                if (s.code != code) errors.incrementAndGet() // wrong row served
              }
            } catch { case _: Throwable => errors.incrementAndGet() }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errors.get() === 0)
    // conservation: live rows = successful creates - successful deletes
    assert(e.readAll().size === creates.get() - deletes.get())
    // every surviving row is internally consistent
    e.readAll().foreach { s =>
      assert(s.name === s"n${s.code}")
      assert(!s.updated_at.isBefore(s.created_at))
    }
  }
}
