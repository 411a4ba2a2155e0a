package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Incremental LSH near-dup maintenance must reproduce the whole-corpus
  * result for ANY batch split: every pair's later-ingested endpoint finds
  * the earlier one in the index (or its own batch), so unioning per-batch
  * incremental pairs is exactly the full pair set.
  */
class IncrementalNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, TestSpark.SF0001)
    .select("doc_id", "text")

  private def collectPairs(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

  private lazy val full =
    collectPairs(Dedup.jaccardPairsLshVerified(docs, 800))

  test("two-batch ingest == whole-corpus LSH-verified pairs") {
    assert(full.nonEmpty, "fixture must contain near-dup pairs")
    val a = Dedup.nearDupIndex(docs.filter(col("doc_id") % 2 === 0))
    val b = Dedup.nearDupIndex(docs.filter(col("doc_id") % 2 =!= 0))
    val inc = Dedup.incrementalNearDupPairs(a.limit(0), a, 800)
      .union(Dedup.incrementalNearDupPairs(a, b, 800))
    assert(collectPairs(inc) === full)
  }

  test("three-batch ingest in any order == whole-corpus pairs") {
    val batches = (0 to 2).map(m =>
      Dedup.nearDupIndex(docs.filter(col("doc_id") % 3 === m)))
    // ingest order 2, 0, 1 — order must not matter
    val order = Seq(batches(2), batches(0), batches(1))
    val inc = order.zipWithIndex.map { case (delta, i) =>
      val index = order.take(i)
        .reduceOption(_ unionByName _)
        .getOrElse(delta.limit(0))
      Dedup.incrementalNearDupPairs(index, delta, 800)
    }.reduce(_ union _)
    assert(collectPairs(inc) === full)
  }

  test("q64 catalog query matches the q22 result") {
    val q64 = collectPairs(
      Dedup.queries("q64_neardup_incremental")(spark, TestSpark.SF0001))
    assert(q64 === full)
  }

  // ---- q90: the same contract lifted to the asymmetric containment regime ----

  private def collect4(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

  private lazy val docsExc = Dedup.withPlantedExcerpts(docs)
  private lazy val fullCont = collect4(Dedup.containmentPairs(docsExc, cache = false))

  test("q90: two-batch ingest == whole-corpus containment pairs " +
    "(stale index-time prefixes stay exact)") {
    assert(fullCont.nonEmpty, "fixture must contain containment pairs")
    // hash-parity split so source-excerpt pairs cross batches (doc_id
    // parity would keep them together — excerpt id = source + 2e6)
    graft.functions.GraftFunctions.register(spark)
    val h = pmod(graft.functions.GraftFunctions.phash60(col("doc_id")), lit(2L))
    val a = Dedup.containmentIndex(docsExc.filter(h === 0))
    val b = Dedup.containmentIndex(docsExc.filter(h =!= 0))
    val inc = Dedup.incrementalContainmentPairs(a.limit(0), a)
      .union(Dedup.incrementalContainmentPairs(a, b))
    assert(collect4(inc) === fullCont)
  }

  test("q90: three-batch ingest in any order == whole-corpus containment pairs") {
    val batches = (0 to 2).map(m =>
      Dedup.containmentIndex(docsExc.filter(col("doc_id") % 3 === m)))
    val order = Seq(batches(1), batches(2), batches(0))
    val inc = order.zipWithIndex.map { case (delta, i) =>
      val index = order.take(i)
        .reduceOption(_ unionByName _)
        .getOrElse(delta.limit(0))
      Dedup.incrementalContainmentPairs(index, delta)
    }.reduce(_ union _)
    assert(collect4(inc) === fullCont)
  }

  test("q90 catalog query matches the whole-corpus q87 result") {
    val q90 = collect4(
      Dedup.queries("q90_containment_incremental")(spark, TestSpark.SF0001))
    assert(q90 === fullCont)
  }
}
