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

  test("declared no-oracle queries are exactly the approximate/engine-hash ones") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "q16b_hll_users",        // HLL sketch — approximate
      "q22_minhash_lsh",       // xxhash64 signatures — engine-native hash
      "q23_simhash_pairs",     // xxhash64 bit votes — engine-native hash
      "q24_ann_lsh",           // approximate NN
      "q24b_ann_ivf",          // approximate NN
      "q34b_percentile_approx" // t-digest sketch — approximate
    )
    assert(noOracle === expected,
      s"unexpected rows-only queries: ${noOracle -- expected}; missing: ${expected -- noOracle}")
  }
}
