package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Similarity
import graft.sources.Tables

/** The native codegen'd cosine Expression: bit-equality with the
  * higher-order-function form, SQL registration paths, and null semantics.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  test("native expression is bit-identical to the aggregate/zip_with form") {
    val viaFold = Similarity.queries("q20_cosine_topk")(spark, D)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaNative = Similarity.queries("q20c_cosine_native")(spark, D)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaNative === viaFold)
  }

  test("registered in SQL via GraftFunctions.register on any session") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, D).limit(5).createOrReplaceTempView("emb_t")
    val rows = spark.sql(
      """SELECT vec_id,
        |       graft_cosine(CAST(embedding AS ARRAY<DOUBLE>),
        |                    CAST(embedding AS ARRAY<DOUBLE>)) AS c
        |FROM emb_t""".stripMargin).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("implicit cast accepts float arrays directly") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, D).limit(3).createOrReplaceTempView("emb_t2")
    val rows = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_t2").collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("GraftExtensions applies its injection cleanly") {
    // getOrCreate() in this suite would return the shared session (extensions
    // only apply at FIRST session construction), so end-to-end coverage of
    // the config path lives in the Verify/Bench mains, which set
    // spark.sql.extensions as the first session of their JVMs. Here: the
    // injection itself must apply without error on a fresh extensions bag.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("null array element yields null (matches the fold form), both eval paths") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS a,
        |       aggregate(zip_with(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d),
        |                          (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS fold_ref
        |""".stripMargin).collect().head
    assert(r.isNullAt(0), "native must be null on null element")
    assert(r.isNullAt(1), "fold form is null on null element (the contract)")
    val interp = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[java.lang.Double](1.0, null),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[java.lang.Double](1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      .eval(null)
    assert(interp === null)
  }

  test("null semantics: null input or length mismatch yields null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
        |       graft_cosine(array(1.0d, 2.0d), array(1.0d)) AS b""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("two calls with non-nullable children compile in one codegen scope") {
    // non-nullable, non-foldable children (arrays built from range's id)
    // make nullSafeCodeGen emit the body UNSCOPED twice in one projection —
    // exactly the case that used to redeclare fixed local names. fallback=off
    // turns any codegen compile error into a test failure instead of a
    // silent interpreted fallback.
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.sql(
        """SELECT graft_cosine(array(CAST(id AS DOUBLE), 2.0d), array(2.0d, 1.0d)) AS c1,
          |       graft_cosine(array(CAST(id AS DOUBLE), 0.0d), array(1.0d, 0.0d)) AS c2
          |FROM range(1, 2)""".stripMargin).collect().head
      assert(math.abs(r.getDouble(0) - 0.8) < 1e-12)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 2.0, 1.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interp = e.eval(null).asInstanceOf[Double]
    val expected = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(interp - expected) < 1e-15)
  }
}
