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

  // ---- q106: the incremental contract lifted to component LABELS ----

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val fullLabels = labelSet(Dedup.ccStarContract(
    Dedup.jaccardPairsLshVerified(docs, 800).select("d1", "d2"))._1)

  test("q106: folding the odd batch into even-batch labels == from-scratch " +
    "q49, in either ingest order") {
    assert(fullLabels.nonEmpty)
    val a = Dedup.nearDupIndex(docs.filter(col("doc_id") % 2 === 0))
    val b = Dedup.nearDupIndex(docs.filter(col("doc_id") % 2 =!= 0))
    def seed(idx: DataFrame) = Dedup.ccStarContract(
      Dedup.incrementalNearDupPairs(idx.limit(0), idx, 800)
        .select("d1", "d2"))._1
    assert(labelSet(Dedup.incrementalNearDupClusters(a, b, seed(a), 800))
      === fullLabels, "even first")
    assert(labelSet(Dedup.incrementalNearDupClusters(b, a, seed(b), 800))
      === fullLabels, "odd first")
  }

  test("q106: a delta doc bridging two existing components relabels both " +
    "to the global min") {
    import spark.implicits._
    // S = 40 shared tokens; T1 = S+A, T2 = S+B (8 own tokens each):
    // J(T1,T2) ~ 0.70 < 0.8, J(S,T1) = J(S,T2) ~ 0.83 >= 0.8 — so {1,2}
    // and {3,4} are separate components until bridge doc 5 (= S) arrives.
    val s40 = (1 to 40).map(i => s"t$i")
    val t1 = (s40 ++ (1 to 8).map(i => s"a$i")).mkString(" ")
    val t2 = (s40 ++ (1 to 8).map(i => s"b$i")).mkString(" ")
    val batchA = Seq((1L, t1), (2L, t1), (3L, t2), (4L, t2))
      .toDF("doc_id", "text")
    val batchB = Seq((5L, s40.mkString(" "))).toDF("doc_id", "text")
    val idxA = Dedup.nearDupIndex(batchA)
    val idxB = Dedup.nearDupIndex(batchB)
    val labelsA = Dedup.ccStarContract(
      Dedup.incrementalNearDupPairs(idxA.limit(0), idxA, 800)
        .select("d1", "d2"))._1
    assert(labelSet(labelsA) === Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)),
      "two separate components before the bridge")
    val merged = labelSet(
      Dedup.incrementalNearDupClusters(idxA, idxB, labelsA, 800))
    assert(merged === (1L to 5L).map(_ -> 1L).toSet,
      "bridge doc must merge both components onto the global min label")
  }
}
