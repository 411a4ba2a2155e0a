package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.CdcQueries
import graft.operators.{BloomJoin, Bpe, ChunkDedup, Classify, Clustering, Curation, Dedup, Expectations, Multimodal, PerceptualHash, Prep, Profile, Relational, Repetition, Similarity, Sketches, Skew, TextAnalysis, TextRetrieval}

/** Driver contract — see /root/repo/SURVEY.md s7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY.md s2.6 Q1-Q20
  * plus the LLM-pipeline extensions); `oracleSql` carries the DuckDB twin
  * for every deterministic query. Queries without an oracle entry
  * (approximate sketches, engine-native hashes) get the driver's rows-only
  * check and are asserted in ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the customer->orders->lineitem revenue rollup (Q10).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q10_segment_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md s2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ Relational.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Curation.queries ++ Sketches.queries ++ TextRetrieval.queries ++
      Prep.queries ++ Repetition.queries ++ Clustering.queries ++
      Skew.queries ++ BloomJoin.queries ++ Bpe.queries ++ Profile.queries ++
      PerceptualHash.queries ++ Classify.queries ++ ChunkDedup.queries ++
      Expectations.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CdcQueries.oracleSql ++ Relational.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ TextAnalysis.oracleSql ++ Multimodal.oracleSql ++
      Curation.oracleSql ++ Sketches.oracleSql ++ TextRetrieval.oracleSql ++
      Prep.oracleSql ++ Repetition.oracleSql ++ Clustering.oracleSql ++
      Skew.oracleSql ++ BloomJoin.oracleSql ++ Bpe.oracleSql ++
      Profile.oracleSql ++ PerceptualHash.oracleSql ++ Classify.oracleSql ++
      ChunkDedup.oracleSql ++ Expectations.oracleSql
}
