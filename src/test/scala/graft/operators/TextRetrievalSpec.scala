package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Semantic checks for the retrieval/sampling/redaction operators (q41-q44)
  * beyond the DuckDB hash oracle: the oracle proves cross-engine equality,
  * these prove the numbers mean what they claim.
  */
class TextRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  test("q41: TF-IDF ranks are 1..3 per doc and scores decrease with rank") {
    val rows = TextRetrieval.queries("q41_tfidf_terms")(spark, D)
      .select("doc_id", "rnk", "tfidf_x1e4").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length),
        s"doc $doc ranks not contiguous")
      val scores = byRank.map(_.getLong(2)).toSeq
      assert(scores == scores.sorted.reverse, s"doc $doc scores not descending")
    }
  }

  test("q41: scores match a driver-side TF-IDF recomputation for sample docs") {
    val docs = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val got = TextRetrieval.queries("q41_tfidf_terms")(spark, D)
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getString(1), r.getLong(2))).toMap
    docs.keys.toSeq.sorted.take(5).foreach { doc =>
      val tf = docs(doc).groupBy(identity).view.mapValues(_.size)
      val expected = tf.map { case (t, f) =>
        t -> math.floor(
          f.toDouble * math.log(n.toDouble / dfMap(t)) * 10000 + 0.5).toLong
      }.toSeq.sortBy { case (t, s) => (-s, t) }.take(3)
      expected.zipWithIndex.foreach { case ((t, s), i) =>
        assert(got((doc, i + 1)) == ((t, s)),
          s"doc $doc rank ${i + 1}: got ${got((doc, i + 1))}, expected ($t, $s)")
      }
    }
  }

  test("q44: BM25 output is sorted, bounded, and hits only matching docs") {
    val res = TextRetrieval.queries("q44_bm25_search")(spark, D)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.length <= 10 && res.nonEmpty)
    val scores = res.map(_._2).toSeq
    assert(scores == scores.sorted.reverse, "not sorted by score desc")
    // every returned doc must actually contain a query term
    val hits = Tables.documents(spark, D)
      .filter(col("text").rlike("(^| )(spark|vector|stream)( |$)"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(res.map(_._1).forall(hits.contains), "BM25 returned a non-matching doc")
  }

  test("q42: stratified sample takes exactly min(20, stratum size) per lang, deterministically") {
    val q = TextAnalysis.queries("q42_stratified_sample")
    val a = q(spark, D).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = q(spark, D).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b, "sample not deterministic across runs")
    val strata = Tables.documents(spark, D).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy(_._1).view.mapValues(_.size).toMap
    strata.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0) == math.min(20L, n),
        s"lang $lang: sampled ${got.getOrElse(lang, 0)} of $n")
    }
  }

  test("q45: cross-modal union equals text-pairs plus embedding-pairs with correct attribution") {
    val docs = Tables.documents(spark, D).select(col("doc_id"), col("text"))
    val txt = Dedup.jaccardPairs(docs, 800)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = Dedup.embeddingNearDupPairs(Tables.embeddings(spark, D), 4500)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Curation.queries("q45_crossmodal_dedup")(spark, D)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    assert(got.keySet == (txt union emb), "pair set is not the union")
    got.foreach { case (p, m) =>
      val expected =
        if (txt(p) && emb(p)) "both" else if (txt(p)) "text" else "embedding"
      assert(m == expected, s"pair $p attributed $m, expected $expected")
    }
  }

  test("q50: contamination fractions match a driver-side recomputation") {
    val docs = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def shingles(toks: Seq[String]): Set[String] =
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    val sampleIds = TextAnalysis.stratifiedSample(
        Tables.documents(spark, D), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val evalSh = sampleIds.flatMap(id => shingles(docs(id)))
    val expected = (docs.keySet -- sampleIds).flatMap { id =>
      val sh = shingles(docs(id))
      if (sh.isEmpty) None
      else {
        val c = math.floor(
          (sh count evalSh).toLong * 1000.0 / sh.size + 0.5).toLong
        if (c > 0) Some(id -> (sh.size.toLong, c)) else None
      }
    }.toMap
    val got = Curation.queries("q50_contamination")(spark, D)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("q43: counts and lengths match a driver-side Java-regex recomputation") {
    val pat = "\\bcustomer\\b|\\d\\d\\d+"
    val texts = Tables.documents(spark, D)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.queries("q43_redaction")(spark, D).collect()
    assert(rows.exists(_.getLong(1) > 0), "fixture should contain sensitive tokens")
    rows.foreach { r =>
      val (doc, n, before, after) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val text = texts(doc)
      val expectedN = pat.r.findAllMatchIn(text).size.toLong
      val expectedAfter = text.replaceAll(pat, "[REDACTED]").length.toLong
      assert(n == expectedN, s"doc $doc: n_sensitive $n != $expectedN")
      assert(before == text.length.toLong, s"doc $doc: len_before")
      assert(after == expectedAfter, s"doc $doc: len_after $after != $expectedAfter")
    }
  }

  test("q71: semantic contamination equals a driver-side recomputation") {
    val embs = Tables.embeddings(spark, D)
    val vecs = Similarity.asDouble(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    graft.functions.GraftFunctions.register(spark)
    val hashes = embs.select(col("vec_id"),
      Sketches.phash60(col("vec_id")).as("h")).collect()
      .map(r => (r.getLong(1), r.getLong(0)))
    val evalIds = hashes.sorted.take(20).map(_._2).toSet
    def cosX1e4(a: Array[Double], b: Array[Double]): Long = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      math.floor(dab / (math.sqrt(daa) * math.sqrt(dbb)) * 10000 + 0.5).toLong
    }
    val expected = vecs.collect { case (id, v) if !evalIds(id) =>
      val scores = evalIds.toSeq.map(e => cosX1e4(v, vecs(e)))
      (id, scores.max, scores.count(_ >= 4500).toLong)
    }.toSeq.sortBy { case (id, mx, _) => (-mx, id) }.take(20)

    val got = Curation.semanticContamination(embs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(expected.map(_._2).max >= 4500 || expected.nonEmpty)
  }

  test("q67: RRF fusion equals a driver-side fusion of the two rank lists") {
    val pool = 20
    val docs = Tables.documents(spark, D)
    val embs = Tables.embeddings(spark, D)
    // independently collected rank lists, fused with plain integer math
    val lex = TextRetrieval.bm25Search(docs, Seq("spark", "vector", "stream"), pool)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val vecs = Similarity.asDouble(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qe = vecs(0L)
    def cosX1e4(a: Array[Double], b: Array[Double]): Long = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      var i = 0
      while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
      math.floor(dab / (math.sqrt(daa) * math.sqrt(dbb)) * 10000 + 0.5).toLong
    }
    val sem = vecs.toSeq.collect { case (id, v) if id != 0L => (id, cosX1e4(v, qe)) }
      .sortBy { case (id, c) => (-c, id) }.take(pool).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (lex.keySet ++ sem.keySet).toSeq.map { id =>
      val lr = lex.getOrElse(id, 0)
      val sr = sem.getOrElse(id, 0)
      val rrf = (if (lr > 0) 1000000L / (60 + lr) else 0L) +
        (if (sr > 0) 1000000L / (60 + sr) else 0L)
      (id, lr, sr, rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)

    val got = TextRetrieval.hybridSearch(docs, embs, Seq("spark", "vector", "stream"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(expected.exists(_._2 > 0) && expected.exists(_._3 > 0),
      "fixture must exercise both rankers")
  }

  test("q96: phrase search finds the planted dominant trigram with exact positions") {
    import spark.implicits._
    // "alpha beta gamma" occurs 3x (doc 1 once, doc 2 twice); every other
    // trigram at most 2x, so it is the derived phrase
    val docs = Seq(
      (1L, "x y z alpha beta gamma p q"),
      (2L, "alpha beta gamma u v alpha beta gamma"),
      (3L, "no match here at all"),
      (4L, "alpha beta delta alpha beta delta")
    ).toDF("doc_id", "text")
    val out = TextRetrieval.phraseSearch(docs).collect()
    assert(out.forall(_.getString(1) == "alpha beta gamma"))
    val byDoc = out.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(byDoc.keySet == Set(1L, 2L))
    assert(byDoc(1L) == ((1L, 3L)), "doc 1: one hit at position 3")
    assert(byDoc(2L) == ((2L, 0L)), "doc 2: two hits, first at position 0")
  }

  test("q96: ties break to the lexicographically smallest phrase") {
    import spark.implicits._
    // "b b b" and "a a a" both occur twice; the tie must pick "a a a"
    val docs = Seq(
      (1L, "b b b b z a a a"),
      (2L, "a a a q")
    ).toDF("doc_id", "text")
    // doc1: "b b b" twice, "a a a" once; doc2: "a a a" once -> both at 2
    val out = TextRetrieval.phraseSearch(docs).collect()
    assert(out.nonEmpty && out.forall(_.getString(1) == "a a a"))
  }

  test("q107: search off a merged incremental index == from-text BM25, " +
    "for any batch split") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, D)
    val direct = TextRetrieval.bm25Search(docs, TextRetrieval.QUERY_TERMS, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(direct.nonEmpty)
    val two = TextRetrieval.bm25SearchFromIndex(
      TextRetrieval.bm25Index(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(TextRetrieval.bm25Index(docs.filter(col("doc_id") % 2 =!= 0))),
      TextRetrieval.QUERY_TERMS, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(two === direct, "two-batch merge must equal the from-text search")
    // three batches, merged in a scrambled order — union order irrelevant
    val thirds = (0 to 2).map(m =>
      TextRetrieval.bm25Index(docs.filter(col("doc_id") % 3 === m)))
    val three = TextRetrieval.bm25SearchFromIndex(
      thirds(2).unionByName(thirds(0)).unionByName(thirds(1)),
      TextRetrieval.QUERY_TERMS, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(three === direct, "three-batch scrambled merge must equal direct")
  }
}
