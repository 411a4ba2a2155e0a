package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Sketches

/** The native portable hash must be bit-identical to the composed
  * conv(substring(md5)) form — every oracle-checked sketch (HLL, SimHash,
  * sampling, split assignment) relies on that equality, since the DuckDB
  * twins parse the hex form.
  */
class PHash60Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native phash60 equals the composed md5/conv form on varied inputs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val inputs = Seq(
      "", "a", "hello", "hello world", "0", "12345", "-7",
      "élève", "日本語", "😀 emoji",
      "a" * 500, (1 to 100).mkString(" ")) ++
      (1 to 200).map(i => s"doc-$i-${i * 31}")
    val df = inputs.toDF("s")
    val rows = df.select(
      GraftFunctions.phash60(col("s")).as("native"),
      Sketches.phash60Composed(col("s")).as("composed")).collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for input '$in'")
      assert(r.getLong(0) >= 0, s"hash must be a nonnegative 60-bit value")
    }
  }

  test("native phash60 agrees between interpreted eval and codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (1 to 50).map(i => s"value-$i").toDF("s")
    val viaPlan = df.select(GraftFunctions.phash60(col("s"))).collect()
      .map(_.getLong(0))
    val direct = (1 to 50).map(i =>
      PHash60Util.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"value-$i")))
    assert(viaPlan.toSeq == direct)
  }

  test("null in, null out") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(Some("x"), None).toDF("s")
    val got = df.select(GraftFunctions.phash60(col("s"))).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }
}
