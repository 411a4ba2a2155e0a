package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the q04 last-writer-wins tie-break (SURVEY §2.6 Q4: arg-max by
  * (updated_at, lsn)). The fixture plants TWO updates for code 14 in the
  * same microsecond; only the lsn ordering makes the winner deterministic,
  * so this fails if anyone drops the tie-break column.
  */
class CdcQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q04 picks the higher-lsn image when updated_at ties") {
    val rows = CdcQueries.queries("q04_update")(spark, "")
      .collect().map(r => r.getAs[Long]("code") -> r.getAs[String]("tendency")).toMap
    assert(rows(14L) === "Envy",   "tie must resolve by lsn, not arrival order")
    assert(rows(17L) === "Reticle", "non-updated rows keep their base image")
  }
}
