package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** q112 pins beyond the DuckDB oracle: the portable per-permutation
  * minhash is reproduced by an INDEPENDENT MD5 implementation (no Spark
  * expressions involved), an exact-duplicate pair lands in bucket 10
  * caught with zero estimator error, and the bucketed report accounts for
  * every exact pair of the planted-gradient corpus.
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  /** phash60 reimplemented from its definition (first 15 hex chars of the
    * md5 of the UTF-8 string, read as hex) via java.security — independent
    * of every Spark/Catalyst code path.
    */
  private def md5hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def shingleSet(text: String): Set[String] = {
    val t = text.split(" ")
    if (t.length < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
  }

  test("portable 64-perm signatures match an independent MD5 implementation") {
    val docs = Tables.documents(spark, D).orderBy("doc_id").limit(5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sig = Dedup.calSignatures(
        Tables.documents(spark, D).filter(col("doc_id").isin(docs.keys.toSeq: _*)))
      .collect()
      .map(r => r.getLong(0) -> (0 until 64).map(i => r.getLong(i + 1)))
      .toMap
    assert(sig.nonEmpty)
    sig.foreach { case (id, got) =>
      val sh = shingleSet(docs(id))
      val expect = (0 until 64).map(i => sh.map(s => md5hash60(s"$i|$s")).min)
      assert(got == expect, s"doc $id signature diverges from the MD5 replay")
    }
  }

  test("an exact duplicate pair is caught in bucket 10 with zero estimator error") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val rows = Dedup.lshCalibration(df, 600).collect()
    assert(rows.length == 1, "only the identical pair clears the threshold")
    val r = rows.head
    assert(r.getLong(0) == 10 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getLong(3) == 1000, "identical shingle sets must always be caught")
    assert(r.getLong(4) == 0, "identical signatures estimate J=1 exactly")
  }

  test("the report accounts for every exact pair of the planted-gradient corpus") {
    val corpus = Dedup.withPlantedRevisions(Tables.documents(spark, D))
    val nPairs = Dedup.jaccardPairs(corpus, 600).count()
    val rep = Dedup.queries("q112_lsh_calibration")(spark, D).collect()
    assert(rep.map(_.getLong(1)).sum == nPairs,
      "every exact pair must appear in exactly one bucket")
    // the planted prefix ladder spans several similarity levels — the
    // whole point of the gradient fixture
    assert(rep.length >= 3, s"expected a multi-bucket curve, got ${rep.length}")
    assert(rep.map(_.getLong(0)).toSeq == rep.map(_.getLong(0)).toSeq.sorted)
  }

  test("q112 artifact route: report from the persisted pairs+signature " +
    "state equals the direct from-text computation") {
    graft.functions.GraftFunctions.register(spark)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val direct = rows(Dedup.lshCalibration(Dedup.withPlantedRevisions(
      graft.sources.Tables.documents(spark, D).select("doc_id", "text"))))
    val viaArtifact = rows(Dedup.queries("q112_lsh_calibration")(spark, D))
    assert(direct.nonEmpty && viaArtifact === direct)
  }
}
