package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.TestSpark
import graft.cdc.Fixtures
import graft.store.InMemoryStore

/** O-16/O-17 parity: supervised restart-from-checkpoint and graceful stop. */
class SupervisionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("supervise restarts a failing query from its checkpoint; sink stays idempotent") {
    import spark.implicits._
    val store = new InMemoryStore
    Seq("5", "14", "17").foreach(k => store.put(k, "v"))
    val ckpt = Files.createTempDirectory("graft-sup").toString
    val failures = new AtomicInteger(0)

    val in = MemoryStream[String](spark)
    in.addData(Fixtures.changeLog.map(_.orNull).filter(_ != null))

    def start(): StreamingQuery =
      graft.cdc.Envelope.invalidationKeys(
          graft.cdc.Envelope.parse(in.toDF().toDF("value")))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val keys = batch.collect().map(_.getString(0))
          if (failures.getAndIncrement() == 0)
            throw new RuntimeException("injected sink failure") // pre-commit abort
          keys.foreach(store.del)
        }
        .start()

    // run supervised in this thread until the (restarted) query drains, then stop
    val runner = new Thread(() => Pipeline.supervise(() => {
      val q = start()
      new Thread(() => {
        q.processAllAvailable()
        Pipeline.stopGracefully(q)
      }).start()
      q
    }))
    runner.start()
    runner.join(60000)
    assert(!runner.isAlive, "supervised query did not terminate")
    assert(failures.get() >= 2, "sink should have failed once and been retried")
    assert(store.get("5").isEmpty && store.get("14").isEmpty && store.get("17").isEmpty,
      "replayed batch must still invalidate all keys")
  }

  test("readOneParam O-4 parity: bad key is a 400 before any lookup") {
    import graft.api._
    val e = new CdcEngine(new InMemoryStore)
    e.createOne(14, "Deren", "S", None, None)
    assert(e.readOneParam("14").map(_.name) === Right("Deren"))
    assert(e.readOneParam("abc") === Left(BadRequest))
    assert(e.readOneParam("") === Left(BadRequest))
    assert(e.updateOneParam("1x", SinnerPatch()) === Left(BadRequest))
    assert(e.deleteOneParam("--") === Left(BadRequest))
  }
}
