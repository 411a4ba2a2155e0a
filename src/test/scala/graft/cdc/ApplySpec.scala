package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Batch MERGE apply: change batches fold onto a snapshot; untouched keys
  * pass through; deletes remove; replay/compaction are equivalent.
  */
class ApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def baseWithBystander() =
    Fixtures.sinners(spark).unionByName(
      Fixtures.sinnersLike(spark, Seq((99L, "Bystander", "B", "None", "None"))))

  test("applyChanges: updates replace, deletes remove, inserts appear, untouched pass through") {
    val next = Apply.applyChanges(spark, baseWithBystander(), Fixtures.changeRecords(spark))
    val rows = next.select("code", "tendency").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // 5 inserted+updated, 14 updated to Wrath, 17 deleted, 99 untouched
    assert(rows.map(_._1) === Seq(5L, 14L, 99L))
    assert(rows.find(_._1 == 14L).get._2 === "Wrath")
  }

  test("compact(batches) == applyChanges(union) == sequential applies") {
    val recs = Fixtures.changeRecords(spark)
    val (b1, b2) = (recs.limit(4), recs.exceptAll(recs.limit(4)))
    val sequential = Apply.applyChanges(spark,
      Apply.applyChanges(spark, baseWithBystander(), b1), b2)
      .select("code").as[Long].collect().sorted.toSeq
    val compacted = Apply.compact(spark, baseWithBystander(), Seq(b1, b2))
      .select("code").as[Long].collect().sorted.toSeq
    assert(sequential === compacted)
  }

  test("applying an empty batch is the identity") {
    val empty = Seq.empty[String].toDF("value")
    val next = Apply.applyChanges(spark, baseWithBystander(), empty)
      .select("code").as[Long].collect().sorted.toSeq
    assert(next === Seq(14L, 17L, 99L))
  }
}
