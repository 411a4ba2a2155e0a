package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}
import graft.sources.Tables

/** The persisted ANN index artifacts (round-13: IVF inverted lists and the
  * LSH bucket relation) must be pure CACHES of the live assignment — and
  * the searches routed through them must read probe-sized slices, never
  * the full relation.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  private def e = Similarity.asDouble(Tables.embeddings(spark, D))

  test("IVF inverted-list artifact == live nearest-cell assignment") {
    val dir = Similarity.ensureIvfAssignments(spark, D)
    val stored = spark.read.parquet(dir)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
    val live = Similarity.nearestCells(e, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored.nonEmpty && stored === live,
      s"missing=${live -- stored} extra=${stored -- live}")
    // the artifact's embeddings round-trip exactly: searching off the
    // artifact is bit-identical to the live search
    val cents2 = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(rows(Similarity.ivfSearchIndexed(spark, D)) ===
      rows(Similarity.ivfSearch(e, cents2)))
  }

  test("LSH bucket artifact == live sign-bucketing") {
    val dir = Similarity.ensureLshBuckets(spark, D)
    val stored = spark.read.parquet(dir)
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val liveBuckets = Similarity.asDouble(Tables.embeddings(spark, D))
      .withColumn("bucket",
        graft.operators.Similarity.bucketExpr(col("emb"), 8, 64))
      .select("vec_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored.nonEmpty && stored === liveBuckets)
  }

  test("q24b search reads the inverted lists partition-pruned (no full-corpus assignment)") {
    val df = SparkEntry.queries("q24b_ann_ivf")(spark, D)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"inverted-list scan must carry cell partition filters:\n$plan")
    // the only embeddings-table scans inside the search are the pushed
    // query/centroid slices — no unfiltered corpus read (i.e. no
    // full-corpus assignment pass) remains in the search plan
    val corpusScans = plan.linesIterator
      .filter(_.contains("embeddings.parquet")).toSeq
    assert(corpusScans.nonEmpty &&
      corpusScans.forall(_.contains("LessThan(vec_id")),
      s"an embeddings scan is missing its query/centroid slice filter:\n" +
        corpusScans.mkString("\n"))
  }

  test("q24c search reads the bucket relation partition-pruned") {
    val df = SparkEntry.queries("q24c_ann_multiprobe")(spark, D)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"bucket scan must carry bucket partition filters:\n$plan")
  }

  test("embedding-pair artifact == live exact pair scan (q45's embedding side)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("v1", "v2", "cos_x1e4").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = rows(spark.read.parquet(
      DedupArtifacts.ensureEmbeddingPairs(spark, D)))
    val live = rows(Dedup.embeddingNearDupPairs(
      Tables.embeddings(spark, D), 4500))
    assert(stored.nonEmpty && stored === live)
  }

  test("q118 base occupancy off the artifact == live base occupancy") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val embs = Tables.embeddings(spark, D)
    val routed = rows(Similarity.ivfDeltaAssign(embs,
      baseAssignDir = Some(Similarity.ensureIvfAssignments(spark, D))))
    val live = rows(Similarity.ivfDeltaAssign(embs))
    assert(routed.nonEmpty && routed === live)
  }
}
