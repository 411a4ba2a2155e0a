package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: a typo here would silently weaken the
  * correctness gate (an oracle entry without a matching query is never
  * executed; a query without an oracle only gets a rows-only check).
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("query names are stable, non-empty, and shell-safe") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"unsafe query name: $n")
    }
    assert(SparkEntry.queries.size >= 45)
  }

  test("Verify.run replicates the driver layout end-to-end at sf0.001") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("graft-verify-contract").toString
    val (ok, failed) = Verify.run(spark, TestSpark.SF0001, out)
    assert(failed === 0, s"$failed queries failed in Verify.run")
    assert(ok === SparkEntry.queries.size)
    // One real parquet FILE (not a part-file directory) per query.
    SparkEntry.queries.keys.foreach { n =>
      val f = new java.io.File(s"$out/$n.parquet")
      assert(f.isFile, s"missing or non-file: $out/$n.parquet")
      assert(spark.read.parquet(f.getPath).count() >= 0)
    }
    // oracle_sql.json must be valid JSON with one key per declared oracle —
    // parse it with Spark's JSON reader (same strictness class as the
    // driver's json.load).
    val oracle = spark.read.option("multiLine", true).json(s"$out/oracle_sql.json")
    assert(oracle.columns.toSet === SparkEntry.oracleSql.keySet)
    assert(oracle.count() === 1)
  }

  test("resolveArgs never treats a --flag as a path (round-14 junk-dir " +
    "incident)") {
    val env = Map("SPARK_GRAFT_SF_DIR" -> "/sf", "SPARK_GRAFT_OUT_DIR" -> "/out")
    // a lone unknown flag falls through to env defaults, never an outDir
    assert(Verify.resolveArgs(Array("--list-oracle-gaps"), env) ===
      ("/sf", "/out"))
    // flags mixed with real positionals are dropped, positionals survive
    assert(Verify.resolveArgs(
      Array("--verbose", "/data/sf0.01", "--x", "myout"), env) ===
      ("/data/sf0.01", "myout"))
    // the documented two-positional contract is unchanged
    assert(Verify.resolveArgs(Array("/data/sf0.01", "out"), env) ===
      ("/data/sf0.01", "out"))
  }

  test("jsonQuote escapes control characters and quotes safely") {
    assert(Verify.jsonQuote("a\"b\\c\nd\te\rf\u0001g") ===
      "\"a\\\"b\\\\c\\nd\\te\\rf\\u0001g\"")
  }

  test("every declared query carries an oracle — none fall to rows-only checks") {
    // Round 4 closed the gap: the approximate sketches (HLL, histogram
    // percentile, SimHash) were rebuilt on portable hashes/constants, the
    // LSH pipelines emit exact-verified output, and the ANN indexes are
    // deterministic enough to replay in SQL — so the rows-only set is empty.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set.empty[String],
      s"queries without an oracle: $noOracle")
  }
}
