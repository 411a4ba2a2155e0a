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

  // Minimal fake handle for exercising supervise's restart policy without
  // paying a real streaming query per restart. recentProgress uses a
  // null-element array purely as a "made progress" flag; the policy tests
  // inject `madeProgress = _.recentProgress.nonEmpty` since a real
  // StreamingQueryProgress is not constructible outside the spark package
  // (the default checker additionally requires numInputRows > 0 so idle
  // zero-row triggers don't reset the budget).
  private class FakeQuery(fail: Boolean, progressed: Boolean)
      extends org.apache.spark.sql.streaming.StreamingQuery {
    def name: String = "fake"
    def id: java.util.UUID = java.util.UUID.randomUUID()
    def runId: java.util.UUID = java.util.UUID.randomUUID()
    def sparkSession: org.apache.spark.sql.SparkSession = spark
    def isActive: Boolean = false
    def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
    def status: org.apache.spark.sql.streaming.StreamingQueryStatus = null
    def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      if (progressed) Array(null) else Array.empty
    def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress = null
    def awaitTermination(): Unit =
      if (fail) throw new RuntimeException("injected query failure")
    def awaitTermination(timeoutMs: Long): Boolean = { awaitTermination(); true }
    def processAllAvailable(): Unit = ()
    def stop(): Unit = ()
    def explain(): Unit = ()
    def explain(extended: Boolean): Unit = ()
  }

  test("supervise backs off exponentially with a cap before giving up") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val ex = intercept[RuntimeException] {
      Pipeline.supervise(() => new FakeQuery(fail = true, progressed = false),
        maxRestarts = 4, basePauseMs = 100, maxPauseMs = 400,
        sleep = delays.append(_), jitter = () => 0.0,
        madeProgress = _.recentProgress.nonEmpty)
    }
    assert(ex.getMessage === "injected query failure")
    assert(delays.toSeq === Seq(100L, 200L, 400L, 400L),
      "expected doubling then cap, one pause per allowed restart")
  }

  test("supervise resets the restart budget once a run makes progress") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val runs = new AtomicInteger(0)
    // every run fails but reports committed progress; with maxRestarts=1 a
    // lifetime budget would rethrow on the second failure — the per-incident
    // reset keeps restarting until the clean run
    Pipeline.supervise(() => {
      val r = runs.incrementAndGet()
      if (r <= 4) new FakeQuery(fail = true, progressed = true)
      else new FakeQuery(fail = false, progressed = true)
    }, maxRestarts = 1, basePauseMs = 100, maxPauseMs = 400,
      sleep = delays.append(_), jitter = () => 0.0,
      madeProgress = _.recentProgress.nonEmpty)
    assert(runs.get() === 5)
    assert(delays.toSeq === Seq(100L, 100L, 100L, 100L),
      "each failure-after-progress restarts a fresh budget at the base pause")
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
