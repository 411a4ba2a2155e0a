package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getString(4))).toSeq

  test("audit counts planted violations exactly, per constraint class") {
    import spark.implicits._
    val t = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "A", 10L), (2L, "B", 20L), (2L, "A", 200L), // dup id 2; 200 out of range
      (null, "C", 30L),                                // null id
      (4L, "Z", null),                                 // bad status; null value
      (5L, "A", 50L))
      .toDF("id", "status", "value")
    val ref = Seq("A", "B").toDF("code") // C and Z unreferenced
    val audit = Expectations.audit("t", t, Seq(
      Expectations.notNull("id"),
      Expectations.Unique("unique:id", Seq("id")),
      Expectations.inSet("status", Seq("A", "B", "C")),
      Expectations.between("value", 0.0, 100.0),
      Expectations.RefIn("ref:status->ref.code", "status", ref, "code")))
    val got = rows(audit.orderBy("constraint"))
    assert(got === Seq(
      ("t", "in_set:status", 6L, 1L, "fail"),          // Z
      ("t", "not_null:id", 6L, 1L, "fail"),            // one null id
      ("t", "range:value", 6L, 2L, "fail"),            // 200 + NULL both fail
      ("t", "ref:status->ref.code", 6L, 2L, "fail"),   // C and Z rows
      ("t", "unique:id", 6L, 2L, "fail")),             // both id=2 rows
      s"planted-violation audit mismatch: $got")
  }

  test("a clean table passes every constraint (NULL-free, in-range, " +
    "unique, referenced)") {
    import spark.implicits._
    val t = Seq((1L, "A", 10L), (2L, "B", 20L)).toDF("id", "status", "value")
    val ref = Seq("A", "B").toDF("code")
    val audit = Expectations.audit("t", t, Seq(
      Expectations.notNull("id"),
      Expectations.Unique("unique:id", Seq("id")),
      Expectations.between("value", 0.0, 100.0),
      Expectations.RefIn("ref:status->ref.code", "status", ref, "code")))
    assert(rows(audit).forall(r => r._4 == 0L && r._5 == "pass"))
  }

  test("hostile constraint names (quotes, backslashes) are labels, not " +
    "SQL — the unpivot is Column-API, audit() is public") {
    import spark.implicits._
    val t = Seq((1L, 10L), (2L, 200L)).toDF("id", "value")
    val name = "weird' name\\ , 99999999), ('pwned"
    val got = rows(Expectations.audit("t", t, Seq(
      Expectations.Check(name, col("value") <= 100),
      Expectations.notNull("id"))).orderBy("constraint"))
    assert(got.map(_._2).contains(name),
      s"the hostile name must come back verbatim as the label: $got")
    assert(got.find(_._2 == name).get._4 === 1L) // and it really counted
  }

  test("audit with no rules is a caller error; a ZERO-ROW table passes " +
    "scalar rules with 0 violations, never NULL") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Expectations.audit("t", Seq((1L, 2L)).toDF("a", "b"), Seq.empty)
    }
    val empty = Seq.empty[(java.lang.Long, java.lang.Long)].toDF("a", "b")
    val got = rows(Expectations.audit("t", empty, Seq(
      Expectations.notNull("a"),
      Expectations.Unique("unique:a", Seq("a")),
      Expectations.between("b", 0.0, 1.0))).orderBy("constraint"))
    assert(got.forall(r => r._3 == 0L && r._4 == 0L && r._5 == "pass"),
      s"zero-row audit must be all-pass with 0 (not NULL) counts: $got")
  }

  test("all scalar rules on one table fold into ONE scan (the audit adds " +
    "aggregate columns, not passes)") {
    val orders = graft.sources.Tables.orders(spark, D)
    val audit = Expectations.audit("orders", orders, Seq(
      Expectations.notNull("o_custkey"),
      Expectations.inSet("o_orderstatus", Seq("O", "F", "P")),
      Expectations.between("o_totalprice", 0.0, 400000.0)))
    audit.write.format("noop").mode("overwrite").save()
    val scans = audit.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"3 scalar rules must share one table scan, got $scans")
  }

  test("the corpus gate passes the structural rules and fails exactly the " +
    "context-window ceiling (the corpus needs chunking, and the gate says so)") {
    val got = rows(Expectations.corpusAudit(spark, D))
    val failed = got.filter(_._5 == "fail").map(r => (r._1, r._2)).toSet
    assert(failed === Set(("documents", "range:doc_tokens")),
      s"unexpected corpus-gate failure set: $failed")
    // the cross-field consistency rule really ran over data (not vacuous)
    val nc = got.find(_._2 == "consistent:n_chars").get
    assert(nc._3 > 0 && nc._4 == 0L && nc._5 == "pass")
    // the embeddings FK covers the whole embeddings table
    val fk = got.find(_._2 == "ref:vec_id->documents.doc_id").get
    assert(fk._3 > 0 && fk._5 == "pass")
  }

  test("streaming audit: per-batch scalar partials sum to the batch audit " +
    "over everything ingested, and replay is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val orders = graft.sources.Tables.orders(spark, D)
      .select("o_custkey", "o_orderstatus", "o_totalprice")
    val checks = Seq(
      Expectations.notNull("o_custkey"),
      Expectations.inSet("o_orderstatus", Seq("O", "F", "P")),
      Expectations.between("o_totalprice", 0.0, 400000.0))
    val all = orders.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val (evens, odds) = all.partition(_._1 % 2 == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-audit-ckpt").toString
    val in = MemoryStream[(Long, String, Double)](spark)
    val q = Expectations.streamingAuditIngest(
      in.toDF().toDF("o_custkey", "o_orderstatus", "o_totalprice"),
      dir, ckpt, checks)
    try {
      in.addData(evens); q.processAllAvailable()
      in.addData(odds); q.processAllAvailable()
    } finally q.stop()
    val want = rows(Expectations.audit("orders", orders, checks)
      .orderBy("constraint"))
    assert(rows(Expectations.auditFromPartials(spark, "orders", dir)) === want,
      "summed partials must equal the batch audit over the whole table")
    // the range rule must genuinely fail so the streamed status rule is
    // exercised on both outcomes
    assert(want.exists(r => r._2 == "range:o_totalprice" && r._5 == "fail"))
    // replay: re-running the last micro-batch overwrites its own partial
    // directory, leaving the readout unchanged
    Expectations.auditIngestBatch(
      odds.toDF("o_custkey", "o_orderstatus", "o_totalprice"), 1L, dir, checks)
    assert(rows(Expectations.auditFromPartials(spark, "orders", dir)) === want,
      "replaying a batch must be idempotent")
  }

  test("the warehouse audit surfaces exactly the two deliberately strict " +
    "constraints as failures on the fixture") {
    val got = rows(Expectations.warehouseAudit(spark, D))
    val failed = got.filter(_._5 == "fail").map(r => (r._1, r._2)).toSet
    assert(failed === Set(("orders", "range:o_totalprice"),
      ("lineitem", "unique:l_orderkey")),
      s"unexpected failure set: $failed")
    // n_rows must agree across every constraint row of the same table
    got.groupBy(_._1).foreach { case (tbl, rs) =>
      assert(rs.map(_._3).distinct.size === 1,
        s"$tbl constraint rows disagree on n_rows: $rs")
    }
    // pass rows really have zero violations and vice versa
    assert(got.forall(r => (r._4 == 0L) == (r._5 == "pass")))
  }
}
