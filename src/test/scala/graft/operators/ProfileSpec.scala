package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Tables

/** q68 beyond the oracle: the single-pass profile must equal a driver-side
  * recomputation from the raw rows, column by column.
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  test("profile stats equal a driver-side recomputation on sf0.001") {
    val li = Tables.lineitem(spark, D)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "l_shipdate")
      .collect()
    val n = li.length.toLong
    def x100(d: Double): Long = math.floor(d * 100 + 0.5).toLong

    val got = Profile.profile(Tables.lineitem(spark, D), Profile.LINEITEM_COLS)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate"))
    got.values.foreach { r =>
      assert(r.getLong(1) === n, s"${r.getString(0)}: n_rows")
      assert(r.getLong(2) === 0L, s"${r.getString(0)}: n_nulls")
    }

    val keys = li.map(_.getLong(0))
    assert(got("l_orderkey").getLong(3) === keys.distinct.length.toLong)
    assert(got("l_orderkey").getLong(4) === x100(keys.min.toDouble))
    assert(got("l_orderkey").getLong(5) === x100(keys.max.toDouble))

    val qty = li.map(_.getDouble(1))
    assert(got("l_quantity").getLong(3) === qty.distinct.length.toLong)
    assert(got("l_quantity").getLong(4) === x100(qty.min))
    assert(got("l_quantity").getLong(5) === x100(qty.max))

    val flags = li.map(_.getString(3))
    assert(got("l_returnflag").getLong(3) === flags.distinct.length.toLong)
    assert(got("l_returnflag").getString(6) === flags.min)
    assert(got("l_returnflag").getString(7) === flags.max)
    assert(got("l_returnflag").isNullAt(4) && got("l_returnflag").isNullAt(5))

    val ship = li.map(_.getAs[java.time.LocalDateTime](4)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    assert(got("l_shipdate").getLong(4) === ship.min)
    assert(got("l_shipdate").getLong(5) === ship.max)
    assert(got("l_shipdate").isNullAt(6) && got("l_shipdate").isNullAt(7))
  }

  test("histogram buckets partition the value span and sum to the row " +
    "count (driver-side recomputation)") {
    val vals = Tables.lineitem(spark, D).collect()
      .map(r => math.floor(r.getAs[Double]("l_extendedprice") * 100 + 0.5).toLong)
    val (mn, mx) = (vals.min, vals.max)
    val span = mx - mn + 1
    val expected = vals.groupBy(v => (((v - mn) * 16) / span).toInt)
      .map { case (b, vs) => b -> ((vs.length.toLong, vs.min, vs.max)) }
    val got = Profile.histogram(Tables.lineitem(spark, D), "l_extendedprice")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === vals.length.toLong)
    assert(got.keys.forall(b => b >= 0 && b < 16))
  }

  test("profileBy: each group's slice equals profile() of that group's " +
    "rows alone") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, D)
    val grouped = Profile.profileBy(docs, "source", Profile.DOCUMENT_COLS)
      .collect()
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    assert(grouped.map(_.getString(0)).distinct.sorted.toSeq ===
      sources.toSeq)
    for (src <- sources.take(2)) {
      val slice = grouped.filter(_.getString(0) == src)
        .map(r => r.toSeq.drop(1)).sortBy(_.head.toString)
      val solo = Profile.profile(docs.filter(col("source") === src),
          Profile.DOCUMENT_COLS)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(slice.toSeq === solo.toSeq, s"group $src slice != solo profile")
    }
  }

  test("profileIndex: a 3-way split merged equals the direct profile, " +
    "including non-additive n_distinct") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val li = Tables.lineitem(spark, D)
    val parts = (0 to 2).map(i =>
      Profile.profileIndex(li.filter(pmod(col("l_orderkey"), lit(3)) === i),
        Profile.LINEITEM_COLS))
    val merged = Profile.profileFromIndex(
        Profile.mergeProfileIndexes(parts: _*))
      .collect().map(_.toSeq).toSeq
    val direct = Profile.profile(li, Profile.LINEITEM_COLS)
      .collect().map(_.toSeq).toSeq
    assert(merged === direct)
    // the reason the artifact is value counts, not finished stats: the
    // sum of per-part n_distincts over-counts values present in several
    // parts — if this ever equals the true distinct count the fixture
    // stopped exercising the property
    val naive = parts.map(p => Profile.profileFromIndex(p)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap)
    val trueDistinct = direct.map(r => r.head -> r(3)).toMap
    val overcount = naive.map(_("l_quantity")).sum
    assert(overcount > trueDistinct("l_quantity").asInstanceOf[Long],
      "fixture must exercise cross-part value overlap")
  }

  test("generic signature: default spec derives from the schema of any " +
    "table (region)") {
    val region = Tables.region(spark, D)
    val got = Profile.profile(region).collect()
      .map(r => r.getString(0) -> r).toMap
    // every region column is profilable (int key + two strings)
    assert(got.keySet === region.schema.fieldNames.toSet)
    val rows = region.collect()
    val names = rows.map(_.getString(1))
    assert(got("r_name").getLong(1) === rows.length.toLong)
    assert(got("r_name").getLong(3) === names.distinct.length.toLong)
    assert(got("r_name").getString(6) === names.min)
    assert(got("r_regionkey").getLong(4) ===
      rows.map(_.getInt(0)).min.toLong * 100)
  }
}
