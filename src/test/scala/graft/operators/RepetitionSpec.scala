package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Semantic checks for the repetition-quality operators (q51/q52) beyond the
  * DuckDB oracle: both metrics are recomputed driver-side from the raw text
  * with naive Scala collections, and the short-document edge (fewer tokens
  * than the gram width) is pinned, since Spark's descending `sequence`
  * behavior makes that the easiest silent-corruption spot.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  private def grams(toks: Array[String], n: Int): Seq[String] =
    if (toks.length < n) Seq.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))

  private def ratioX1e3(num: Long, den: Long): Long =
    math.floor(num.toDouble * 1000.0 / den + 0.5).toLong

  test("q51: metrics match a driver-side recomputation on every document") {
    val texts = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Repetition.queries("q51_repetition")(spark, D).collect()
    val expectedDocs = texts.filter(_._2.split(" ").length >= 3).keySet
    assert(rows.map(_.getLong(0)).toSet == expectedDocs)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ")
      val n = toks.length.toLong
      def cnt(k: Int) = grams(toks, k).groupBy(identity).map(_._2.size.toLong)
      val top1 = cnt(1).max
      val top2 = cnt(2).max
      val dup2 = cnt(2).filter(_ > 1).sum
      val dup3 = cnt(3).filter(_ > 1).sum
      assert(r.getLong(1) == n, s"doc ${r.getLong(0)} n_tokens")
      assert(r.getLong(2) == ratioX1e3(top1, n), s"doc ${r.getLong(0)} top1")
      assert(r.getLong(3) == ratioX1e3(top2, n - 1), s"doc ${r.getLong(0)} top2")
      assert(r.getLong(4) == ratioX1e3(dup2, n - 1), s"doc ${r.getLong(0)} dup2")
      assert(r.getLong(5) == ratioX1e3(dup3, n - 2), s"doc ${r.getLong(0)} dup3")
      val flag = if (r.getLong(3) >= 125 || r.getLong(5) >= 125) 1 else 0
      assert(r.getInt(6) == flag, s"doc ${r.getLong(0)} flagged")
    }
    assert(rows.exists(_.getInt(6) == 1) && rows.exists(_.getInt(6) == 0),
      "fixture should exercise both flag branches")
  }

  test("q52: shared-passage fractions match a driver-side recomputation") {
    val texts = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val perDoc = texts.map { case (id, t) =>
      id -> grams(t.split(" "), 5).toSet
    }.toMap
    val docFreq = perDoc.values.flatten
      .groupBy(identity).map { case (p, occ) => p -> occ.size }
    val rows = Repetition.queries("q52_dup_passages")(spark, D).collect()
    assert(rows.map(_.getLong(0)).toSet == perDoc.keySet,
      "q52 must keep one row per document, including passage-free ones")
    rows.foreach { r =>
      val ps = perDoc(r.getLong(0))
      val shared = ps.count(p => docFreq(p) > 1).toLong
      assert(r.getLong(1) == ps.size.toLong, s"doc ${r.getLong(0)} n_passages")
      assert(r.getLong(2) == shared, s"doc ${r.getLong(0)} n_shared")
      val frac = if (ps.isEmpty) 0L else ratioX1e3(shared, ps.size.toLong)
      assert(r.getLong(3) == frac, s"doc ${r.getLong(0)} shared_x1e3")
      assert(r.getInt(4) == (if (frac <= 500) 1 else 0), s"doc ${r.getLong(0)} keep")
    }
    assert(rows.exists(_.getInt(4) == 0), "fixture should drop some near-dups")
  }

  test("q98: dup-token coverage matches an interval-union recomputation " +
    "on every fixture document") {
    val texts = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // driver-side truth: token-level coverage via an actual boolean array,
    // NOT the closed-form window (independent derivation)
    val occ = texts.map { case (id, t) => id -> grams(t.split(" "), 5) }.toMap
    val owner = occ.toSeq
      .flatMap { case (id, ps) => ps.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (p, ids) =>
        p -> (ids.map(_._2).min, ids.map(_._2).distinct.size) }
    val rows = Repetition.queries("q98_span_dedup")(spark, D).collect()
    assert(rows.map(_.getLong(0)).toSet == occ.keySet)
    rows.foreach { r =>
      val id = r.getLong(0)
      val toks = texts.toMap.apply(id).split(" ")
      val covered = new Array[Boolean](toks.length)
      occ(id).zipWithIndex.foreach { case (p, pos) =>
        val (own, nd) = owner(p)
        if (nd > 1 && own != id) (pos until pos + 5).foreach(covered(_) = true)
      }
      val dup = covered.count(identity).toLong
      assert(r.getLong(1) == toks.length.toLong, s"doc $id n_tokens")
      assert(r.getLong(2) == dup, s"doc $id n_dup_tokens")
      assert(r.getLong(3) == ratioX1e3(toks.length - dup, toks.length.toLong),
        s"doc $id keep_x1e3")
    }
    assert(rows.exists(_.getLong(2) > 0), "fixture must contain foreign spans")
  }

  test("q98: overlapping foreign spans are counted once and the owner " +
    "keeps its copy for free") {
    import spark.implicits._
    // doc 1 owns the passage; doc 2 lifts tokens 0..6 (grams at pos 0,1,2
    // overlap -> union is 7 tokens, not 15); doc 3 is clean
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g x y z"),
      (3L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = Repetition.spanDedupStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((0L, 1000L)), "owner doc is untouched")
    assert(out(2L) == ((7L, 300L)), "union coverage 7 of 10 -> keep 300")
    assert(out(3L) == ((0L, 1000L)), "clean doc untouched")
  }

  test("q56: quotas match the sqrt-allocation math and fill with smallest-hash docs") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, D)
    val byLang = docs.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val w = byLang.view.mapValues(ids =>
      math.floor(math.sqrt(ids.length.toDouble) * 1000).toLong).toMap
    val tw = w.values.sum
    val hashes = docs
      .select(col("doc_id"), Sketches.phash60(col("doc_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextAnalysis.queries("q56_domain_mix")(spark, D).collect()
    assert(rows.map(_.getString(0)).toSeq == byLang.keys.toSeq.sorted)
    rows.foreach { r =>
      val lang = r.getString(0)
      val n = byLang(lang).length.toLong
      val quota = math.min(n, 200L * w(lang) / tw)
      assert(r.getLong(1) == n && r.getLong(2) == quota && r.getLong(3) == quota,
        s"$lang quota math")
      val expectedSample = byLang(lang).sortBy(id => (hashes(id), id)).take(quota.toInt)
      assert(r.getLong(4) == expectedSample.sum, s"$lang must sample smallest-hash docs")
    }
  }

  test("q56: sqrt temperature upsamples small domains relative to raw share") {
    import spark.implicits._
    val skewed = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 425).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val q = TextAnalysis.domainMixSample(skewed).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nBig, qBig) = q("big")
    val (nSmall, qSmall) = q("small")
    assert(qBig + qSmall <= 200)
    // flattening: the small domain's share of the mix strictly exceeds its
    // share of the corpus; the large domain's is strictly below
    assert(qSmall.toDouble / (qBig + qSmall) > nSmall.toDouble / (nBig + nSmall),
      s"small domain not upsampled: quota $qSmall/$qBig vs corpus $nSmall/$nBig")
  }

  test("q81: token-budget plan respects the budget, upsamples the " +
    "low-resource domain, and epochs = ceil(target/available)") {
    import spark.implicits._
    val docs = (
      (1 to 50).map(i => (i.toLong, "tok " * 199 + "tok", "big")) ++  // 200 tokens x 50
      (51 to 55).map(i => (i.toLong, "tok tok tok tok", "small"))     // 4 tokens x 5
    ).toDF("doc_id", "text", "lang")
    val p = TextAnalysis.mixturePlan(docs, budgetTokens = 5000L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (bigN, bigT, bigR, bigE) = p("big")
    val (smallN, smallT, smallR, smallE) = p("small")
    assert(bigT + smallT <= 5000L, "targets must not exceed the budget")
    assert(smallR > bigR,
      s"sqrt temperature must give the small domain the higher rate: $p")
    assert(smallE === (smallT + smallN - 1) / smallN &&
      bigE === (bigT + bigN - 1) / bigN)
    assert(smallE > 1L, s"the tiny domain must need repeat epochs: $p")
  }

  test("strict curation composes the repetition gates and leaves no near-dups") {
    val docs = Tables.documents(spark, D)
    val strict = Curation.curateStrict(docs).collect()
    val strictIds = strict.map(_.getLong(0)).toSet
    assert(strict.forall(_.getLong(3) >= 700L), "quality gate must hold")
    val qtext = Curation.scored(docs)
      .filter(col("quality_x1e3") >= 700L).select("doc_id", "text")
    val flaggedIds = Repetition.repetitionMetrics(qtext)
      .filter(col("flagged") === 1).collect().map(_.getLong(0)).toSet
    val unkeptIds = Repetition.dupPassageScore(qtext)
      .filter(col("keep") === 0).collect().map(_.getLong(0)).toSet
    assert((strictIds & flaggedIds).isEmpty, "no flagged doc may survive")
    assert((strictIds & unkeptIds).isEmpty, "no dup-passage doc may survive")
    assert(flaggedIds.nonEmpty && unkeptIds.nonEmpty,
      "fixture should exercise both gates")
    // the defining dedup invariant: no >= 0.8-Jaccard pair WITHIN the output
    val survivors = docs.select("doc_id", "text")
      .filter(col("doc_id").isInCollection(strictIds))
    assert(Dedup.jaccardPairs(survivors, 800).count() == 0L,
      "strict output must be near-dup free")
    val loose = Curation.curate(docs).count()
    assert(strict.length < loose, "strict must drop more than the loose pipeline")
  }

  test("q60: unigram log-likelihoods match an exact driver-side recomputation") {
    val texts = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val counts = texts.values.flatten.groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    val nTotal = counts.values.sum.toDouble
    def lp(t: String): Long =
      math.floor((math.log(counts(t)) - math.log(nTotal)) * 1e6 + 0.5).toLong
    val rows = TextAnalysis.queries("q60_unigram_logprob")(spark, D).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getLong(0))
      val slp = toks.map(lp).sum
      assert(r.getLong(1) == toks.length.toLong)
      assert(r.getLong(2) == math.floor(slp.toDouble / toks.length + 0.5).toLong,
        s"doc ${r.getLong(0)} avg logprob")
    }
    // sanity: likelihoods are negative and vary across the corpus
    assert(rows.forall(_.getLong(2) < 0L))
    assert(rows.map(_.getLong(2)).distinct.length > 100)
  }

  test("q58: index merge is associative maintenance — equals the full rebuild") {
    val docs = Tables.documents(spark, D)
    val full = Dedup.dedupIndex(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // three disjoint ingest batches folded in arbitrary order
    val batches = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val merged = batches.map(Dedup.dedupIndex)
      .reduce(Dedup.mergeDedupIndex)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged == full, "incremental merge must equal full recompute")
    // cross-batch duplicates (none are byte-identical in this fixture, so
    // synthesize): the min/sum merge must pick the earliest winner and
    // total the copies across batches
    import spark.implicits._
    val b1 = Seq((10L, "same text"), (30L, "other")).toDF("doc_id", "text")
    val b2 = Seq((20L, "same text"), (5L, "same text")).toDF("doc_id", "text")
    val m = Dedup.mergeDedupIndex(Dedup.dedupIndex(b1), Dedup.dedupIndex(b2))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m == Map(5L -> 3L, 30L -> 1L),
      s"cross-batch dup must merge to (earliest winner, total copies): $m")
  }

  test("q58: a bucketed stored index merges a delta without shuffling itself") {
    val docs = Tables.documents(spark, D)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Sources.writeBucketed(
        Dedup.dedupIndex(docs.filter(col("doc_id") < 400)),
        "dedup_index_b", 4, Seq("content_hash"), Seq("content_hash"))
      val delta = Dedup.dedupIndex(docs.filter(col("doc_id") >= 400))
      val merged = Dedup.mergeDedupIndex(spark.table("dedup_index_b"), delta)
      val plan = merged.queryExecution.executedPlan.toString
      // exactly the delta side may exchange; the stored side must not:
      // one Exchange total in the merge plan
      assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
        s"stored index side should not shuffle:\n$plan")
      assert(merged.count() == Dedup.dedupIndex(docs).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS dedup_index_b")
    }
  }

  test("q51/q52: documents shorter than the gram width degrade cleanly") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "one"),                     // 1 token: below every gram width
      (2L, "two tokens"),              // 2: below q51's 3-gram floor
      (3L, "a b c"),                   // 3: exactly q51's floor, below q52's
      (4L, "a b c d e"),               // 5: exactly one passage
      (5L, "a b c d e")                // its exact duplicate
    ).toDF("doc_id", "text")
    val m = Repetition.repetitionMetrics(tiny).collect()
    assert(m.map(_.getLong(0)).toSet == Set(3L, 4L, 5L),
      "metrics exist exactly for >= 3-token docs")
    val p = Repetition.dupPassageScore(tiny)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    assert(p(1L) == ((0L, 0L, 1)) && p(2L) == ((0L, 0L, 1)) && p(3L) == ((0L, 0L, 1)),
      "short docs carry zero passages and are kept")
    assert(p(4L) == ((1L, 1L, 0)) && p(5L) == ((1L, 1L, 0)),
      "exact 5-token duplicates share their single passage and are dropped")
  }

  test("q80: a contiguous copied block yields a long max run; the same " +
    "grams scattered yield runs of 1") {
    import spark.implicits._
    val block = (1 to 10).map(i => s"b$i").mkString(" ")  // 10-token block
    // doc 1 and 2 share the block verbatim -> 6 consecutive shared 5-grams.
    // doc 3 contains the block's grams CUT APART by unique separators, so
    // every shared gram is isolated (no two consecutive positions shared).
    val scattered = (1 to 10).sliding(5).zipWithIndex.map { case (w, i) =>
      w.map(j => s"b$j").mkString(" ") + s" sep${i}a sep${i}b sep${i}c sep${i}d"
    }.mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $block u4 u5"),
      (2L, s"v1 v2 $block v3 v4 v5"),
      (3L, scattered)
    ).toDF("doc_id", "text")
    val got = Repetition.sharedSpanScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L)._2 === 6L, s"10-token block = 6 consecutive 5-grams: $got")
    assert(got(2L)._2 === 6L, got.toString)
    assert(got(3L)._2 === 1L,
      s"scattered shared grams must never chain into a run: $got")
    assert(got(3L)._1 >= 6L, "the scattered doc still SHARES many grams — " +
      "q52's fraction signal cannot separate it from the block copies")
  }
}
