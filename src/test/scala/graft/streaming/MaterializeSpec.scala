package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.cdc.Fixtures
import graft.store.InMemoryStore

/** E-1 MERGE variant: the stream maintains the cache (upsert latest row,
  * delete tombstoned keys) instead of evicting.
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("materializeQuery leaves the store holding exactly the latest-state view") {
    import spark.implicits._
    val store = new InMemoryStore
    val in = MemoryStream[String](spark)
    val q = Pipeline.materializeQuery(spark, in.toDF().toDF("value"), store,
      Files.createTempDirectory("graft-mat").toString)
    try {
      in.addData(Fixtures.changeLog.map(_.orNull).filter(_ != null))
      q.processAllAvailable()
      // 5 inserted+updated (class A), 14 updated (Wrath), 17 deleted
      assert(store.size === 2)
      assert(store.get("5").exists(_.contains("\"class\":\"A\"")))
      assert(store.get("14").exists(_.contains("Wrath")))
      assert(store.get("17").isEmpty)
    } finally q.stop()
  }

  test("observed metrics expose records/tombstones/passed (O-12 log parity)") {
    import spark.implicits._
    val df = graft.cdc.Envelope.parseWithMetrics(Fixtures.changeRecords(spark))
    df.collect()
    val m = df.queryExecution.observedMetrics
    assert(m("cdc_parse").getAs[Long]("records") === 8)
    assert(m("cdc_parse").getAs[Long]("tombstones") === 1)
    assert(m("cdc_passed").getAs[Long]("passed") === 6)
    // malformed = records - tombstones - passed = 1
  }
}
