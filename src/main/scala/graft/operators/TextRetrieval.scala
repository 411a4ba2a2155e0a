package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Retrieval scoring over `documents` — the ranking half of a training-data
  * pipeline (near-dup clustering picks a keeper; retrieval picks what goes
  * into a curriculum or eval set):
  *
  *  - q41: per-document top TF-IDF terms (the classic weighting, one
  *    explode + two hash-aggregates + a broadcast of the 1-row corpus
  *    count — no shuffle grows with vocabulary beyond the (doc,term)
  *    aggregate itself).
  *  - q44: BM25 document ranking for a fixed query term set (k1=1.2,
  *    b=0.75). The per-term partial scores are summed as conditional
  *    aggregates in a FIXED literal order, because a float SUM over rows
  *    is order-dependent across engines while `s1 + s2 + s3` is not.
  *
  * Both use ln() on exact-integer-derived doubles; both engines' libm is
  * correctly rounded to <=1 ulp on these inputs, and the floor-scaled
  * outputs sit ~2^40 away from decision boundaries, so the oracle equality
  * is stable (verified at sf0.001/0.01/0.1).
  *
  * 100 TB shape: everything is (doc,term)-keyed hash aggregation plus
  * broadcasts of O(1) or O(query-terms) relations; the corpus never
  * self-joins and never sorts globally except for the final top-k.
  */
object TextRetrieval {

  private def toks: Column = split(col("text"), " ")

  private val BM25_K1 = 1.2
  private val BM25_B = 0.75
  private[operators] val QUERY_TERMS = Seq("spark", "vector", "stream")

  /** Top-k TF-IDF terms per document over any (doc_id, text) relation.
    * tf and df are exact longs; the only float ops are one division, one
    * ln, one multiply — identical IEEE sequences in both engines.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int, cache: Boolean = true): DataFrame = {
    // the (doc,term) aggregate feeds both the score join and the df
    // aggregate; persisting it means the corpus is tokenized once
    val tf0 = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val tf = if (cache) tf0.persist() else tf0
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tfidf = col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_x1e4").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        floor(tfidf * 10000 + lit(0.5)).cast("long").as("tfidf_x1e4"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .orderBy("doc_id", "rnk")
  }

  /** BM25 top-k documents for a query term set. Per-term partial scores are
    * summed as conditional aggregates in the literal term order (see object
    * doc); docs matching no query term drop out via the inner join,
    * mirroring an inverted-index lookup.
    */
  def bm25Search(docs: DataFrame, rawTerms: Seq[String], k: Int,
                 cache: Boolean = true): DataFrame = {
    // dedupe caller-supplied terms: a repeated term would get two
    // conditional-sum columns and double its contribution to the total
    val terms = rawTerms.distinct
    require(terms.nonEmpty, "bm25Search needs at least one query term")
    // stats derive from the per-doc length relation, so the corpus-wide
    // constants cost one extra pass over O(docs) rows, not a re-scan
    val lens0 = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val lens = if (cache) lens0.persist() else lens0
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    bm25Score(tf, lens, terms, k)
  }

  /** The shared scoring tail behind [[bm25Search]] and
    * [[bm25SearchFromIndex]]: one BM25 definition, one float-order
    * contract (per-term conditional sums added in literal term order), so
    * the from-text and from-index paths are hash-identical by
    * construction.
    */
  private def bm25Score(tf: DataFrame, lens: DataFrame,
                        terms: Seq[String], k: Int): DataFrame = {
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val termScore = idf * (col("tf").cast("double") * lit(BM25_K1 + 1)) /
      (col("tf").cast("double") +
        lit(BM25_K1) * (lit(1 - BM25_B) +
          lit(BM25_B) * col("dl").cast("double") / avgdl))
    val scored = tf.join(broadcast(df), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), termScore.as("ts"))
    // conditional sums: each group has at most one non-zero row per term,
    // so the float aggregation is exact; the cross-term addition happens
    // once, in this literal order
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("ts")).otherwise(lit(0.0))).as(s"s$i")
    }
    val total = terms.indices.map(i => col(s"s$i")).reduceLeft(_ + _)
    scored.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        floor(total * 10000 + lit(0.5)).cast("long").as("bm25_x1e4"))
      .orderBy(col("bm25_x1e4").desc, col("doc_id"))
      .limit(k)
  }

  /** q107: the full inverted-index relation for a document batch — one
    * row per (doc_id, term) with the term frequency, document length
    * denormalized onto every posting. Indexes of DISJOINT batches merge
    * by plain union (tf is per-doc, dl is per-doc, df/N/avgdl derive
    * from the merged relation), which is the whole incremental story:
    * a new crawl appends its postings, nothing re-tokenizes history.
    */
  def bm25Index(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** q107: BM25 top-k straight off a (merged) [[bm25Index]] relation —
    * no text scan. The query-term filter hits the postings relation
    * first, so only matching postings shuffle; corpus stats come from
    * the per-doc (doc_id, dl) projection of the same index. Bit-for-bit
    * equal to [[bm25Search]] on the same corpus (shared [[bm25Score]]
    * tail; spec- and oracle-pinned).
    */
  def bm25SearchFromIndex(index: DataFrame, rawTerms: Seq[String],
                          k: Int): DataFrame = {
    val terms = rawTerms.distinct
    require(terms.nonEmpty, "bm25SearchFromIndex needs at least one query term")
    val lens = index.select("doc_id", "dl").distinct().persist()
    val tf = index.filter(col("term").isin(terms: _*))
      .select("doc_id", "term", "tf")
    bm25Score(tf, lens, terms, k)
  }

  private val RRF_K = 60
  private val HYBRID_POOL = 20
  private val HYBRID_QVEC = 0L

  /** q67: hybrid retrieval — BM25 lexical ranking fused with embedding-
    * cosine semantic ranking by reciprocal-rank fusion (Cormack et al.
    * 2009): score(d) = sum over systems of 1/(K + rank_sys(d)), over each
    * system's top-`pool`. Both rank lists are exact and deterministic
    * ((scaled score, doc_id) total order), and the RRF terms are integer
    * divisions 1e6 DIV (K + rank), so the fused score is an exact BIGINT —
    * the whole fusion hash-checks cross-engine.
    *
    * Scale shape: each side is the already-scale-shaped ranker (BM25 =
    * (doc,term) hash aggregates + broadcasts; semantic = the q20 scan —
    * swap in [[Similarity.ivfSearch]] through a trained quantizer at
    * corpus scale). The fusion itself joins two `pool`-row relations —
    * driver-trivial at any corpus size, which is RRF's point: systems
    * only exchange ranks, never scores or corpora.
    */
  def hybridSearch(docs: DataFrame, embs: DataFrame, rawTerms: Seq[String],
                   queryVecId: Long = HYBRID_QVEC, pool: Int = HYBRID_POOL,
                   rrfK: Int = RRF_K, k: Int = 10): DataFrame = {
    val lexr = bm25Search(docs, rawTerms, pool, cache = false)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25_x1e4").desc, col("doc_id"))).cast("int"))
      .select("doc_id", "lex_rank")
    val e = Similarity.asDouble(embs)
    val q = e.filter(col("vec_id") === queryVecId).select(col("emb").as("qe"))
    val semr = e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        floor(Similarity.cosine(col("emb"), col("qe")) * 10000 + lit(0.5))
          .cast("long").as("cos_x1e4"))
      .orderBy(col("cos_x1e4").desc, col("doc_id")).limit(pool)
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("cos_x1e4").desc, col("doc_id"))).cast("int"))
      .select("doc_id", "sem_rank")
    // each RRF term handles the full-outer null EXPLICITLY against the raw
    // join column (absent from a ranker => term 0) — it must never see a
    // coalesced 0 rank, which would award 1e6/(K+0) to absent documents
    def rrfTerm(rank: String): Column =
      when(col(rank).isNull, lit(0L))
        .otherwise(expr(s"1000000 DIV ($rrfK + $rank)"))
    lexr.join(semr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).as("sem_rank"),
        (rrfTerm("lex_rank") + rrfTerm("sem_rank"))
          .cast("long").as("rrf_x1e6"))
      .orderBy(col("rrf_x1e6").desc, col("doc_id"))
      .limit(k)
  }

  /** q96: positional PHRASE SEARCH against a corpus-derived query — the
    * exact-phrase retrieval primitive (BM25 ranks bags of words; a phrase
    * query additionally constrains token ADJACENCY, which needs positional
    * postings). The query phrase is derived, not hard-coded: the globally
    * most frequent `n`-gram (ties broken lexicographically), so the same
    * phrase falls out of any corpus at any scale and the DuckDB twin can
    * re-derive it. Emits every matching document with its hit count and
    * first match position.
    *
    * 100 TB shape: positional postings are a flatMap off the token array
    * (no shuffle); the phrase derivation is a map-side-combined (gram ->
    * count) aggregate whose result reduces to ONE broadcast row; the
    * search pass filters AT THE GENERATOR against that broadcast scalar,
    * so the second scan shuffles only actual hits (a production system
    * would serve this from a persisted postings index — this is the
    * index-build + one-query shape). The corpus never self-joins.
    */
  def phraseSearch(docs: DataFrame, n: Int = 3): DataFrame = {
    val occ = docs.select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"),
        posexplode(Repetition.gramArr(col("tk"), n)).as(Seq("pos", "g")))
    // min over (-count, gram) = highest count, lexicographically-smallest
    // gram on ties — one row, broadcast
    val top = occ.groupBy("g").agg(count(lit(1)).as("c"))
      .agg(min(struct((-col("c")).as("negc"), col("g").as("g"))).as("t"))
      .select(col("t.g").as("phrase"))
    occ.join(broadcast(top), col("g") === col("phrase"))
      .groupBy("doc_id", "phrase")
      .agg(count(lit(1)).as("n_hits"),
        min(col("pos")).cast("long").as("first_pos"))
      .select("doc_id", "phrase", "n_hits", "first_pos")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q41: top-3 TF-IDF terms per document.
    "q41_tfidf_terms" -> ((s, d) =>
      tfidfTopTerms(Tables.documents(s, d), 3)),

    // Q44: BM25 top-10 documents for the fixed demo query.
    "q44_bm25_search" -> ((s, d) =>
      bm25Search(Tables.documents(s, d), QUERY_TERMS, 10)),

    // Q107: the corpus ingested as two disjoint batches, each reduced to
    // its inverted index; search runs off the MERGED index — contract:
    // == q44 off the raw text (same oracle).
    "q107_bm25_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idxA = bm25Index(docs.filter(col("doc_id") % 2 === 0))
      val idxB = bm25Index(docs.filter(col("doc_id") % 2 =!= 0))
      bm25SearchFromIndex(idxA.unionByName(idxB), QUERY_TERMS, 10)
    }),

    // Q67: RRF hybrid of the q44 lexical ranker and the q20 semantic
    // ranker (query vector = embedding of vec_id 0).
    "q67_hybrid_search" -> ((s, d) =>
      hybridSearch(Tables.documents(s, d), Tables.embeddings(s, d),
        QUERY_TERMS)),

    // Q96: exact-phrase search for the corpus's most frequent trigram.
    "q96_phrase_search" -> ((s, d) =>
      phraseSearch(Tables.documents(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q41_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, term,
        |    CAST(FLOOR(CAST(tf AS DOUBLE) *
        |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS tfidf_x1e4
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY doc_id ORDER BY tfidf_x1e4 DESC, term) AS INT) AS rnk FROM scored)
        |SELECT doc_id, term, tfidf_x1e4, rnk FROM ranked WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    // q107 shares q44's oracle: scoring off the merged incremental index
    // must reproduce the from-text search bit for bit.
    "q107_bm25_incremental" ->
      s"""WITH $bm25CtesSql
         |SELECT doc_id, bm25_x1e4 FROM bm25
         |ORDER BY bm25_x1e4 DESC, doc_id
         |LIMIT 10""".stripMargin,

    "q44_bm25_search" ->
      s"""WITH $bm25CtesSql
         |SELECT doc_id, bm25_x1e4 FROM bm25
         |ORDER BY bm25_x1e4 DESC, doc_id
         |LIMIT 10""".stripMargin,

    // q67 twin: q44's BM25 CTEs + q20's cosine formula, each ranked to the
    // top-HYBRID_POOL, fused with exact integer-division RRF terms.
    "q67_hybrid_search" ->
      s"""WITH $bm25CtesSql,
         |lexr AS (SELECT doc_id, CAST(row_number() OVER
         |           (ORDER BY bm25_x1e4 DESC, doc_id) AS INT) AS lex_rank
         |         FROM (SELECT doc_id, bm25_x1e4 FROM bm25
         |               ORDER BY bm25_x1e4 DESC, doc_id LIMIT $HYBRID_POOL)),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |qv AS (SELECT emb AS qe FROM e WHERE vec_id = $HYBRID_QVEC),
         |sem AS (SELECT vec_id AS doc_id,
         |          CAST(FLOOR(list_dot_product(emb, qe) /
         |            (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qe, qe)))
         |            * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cos_x1e4
         |        FROM e, qv WHERE vec_id <> $HYBRID_QVEC
         |        ORDER BY cos_x1e4 DESC, doc_id LIMIT $HYBRID_POOL),
         |semr AS (SELECT doc_id, CAST(row_number() OVER
         |           (ORDER BY cos_x1e4 DESC, doc_id) AS INT) AS sem_rank FROM sem)
         |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         |       COALESCE(l.lex_rank, 0) AS lex_rank,
         |       COALESCE(s.sem_rank, 0) AS sem_rank,
         |       CAST(COALESCE(1000000 // ($RRF_K + l.lex_rank), 0) +
         |            COALESCE(1000000 // ($RRF_K + s.sem_rank), 0) AS BIGINT) AS rrf_x1e6
         |FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
         |ORDER BY rrf_x1e6 DESC, doc_id
         |LIMIT 10""".stripMargin,

    // q96 twin: identical positional trigram generation (1-based range i
    // maps to 0-based pos = i-1), identical (count DESC, gram ASC) phrase
    // derivation, identical hit aggregation.
    "q96_phrase_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |occ AS (SELECT doc_id, i - 1 AS pos,
        |          l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
        |        FROM toks, unnest(range(1, len(l) - 1)) AS t(i)
        |        WHERE len(l) >= 3),
        |top AS (SELECT g FROM occ GROUP BY g
        |        ORDER BY COUNT(*) DESC, g ASC LIMIT 1)
        |SELECT o.doc_id, t.g AS phrase,
        |       CAST(COUNT(*) AS BIGINT) AS n_hits,
        |       CAST(MIN(o.pos) AS BIGINT) AS first_pos
        |FROM occ o JOIN top t ON o.g = t.g
        |GROUP BY o.doc_id, t.g
        |ORDER BY doc_id""".stripMargin
  )

  /** The q44 BM25 pipeline as a shared CTE prefix ending in
    * `bm25` = (doc_id, bm25_x1e4) — q67's lexical side replays it
    * verbatim with a different pool size.
    */
  private def bm25CtesSql: String = {
    val terms = QUERY_TERMS.map(t => s"'$t'").mkString(", ")
    val perTerm = QUERY_TERMS.zipWithIndex.map { case (t, i) =>
      s"CAST(SUM(CASE WHEN term = '$t' THEN ts ELSE CAST(0.0 AS DOUBLE) END) AS DOUBLE) AS s$i"
    }.mkString(",\n        ")
    val total = QUERY_TERMS.indices.map(i => s"s$i").mkString(" + ")
    s"""lens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
       |          FROM documents),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |       WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT doc_id, term,
       |    ln((CAST(n_docs - df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
       |       (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |    * (CAST(tf AS DOUBLE) * CAST(${BM25_K1 + 1} AS DOUBLE))
       |    / (CAST(tf AS DOUBLE) +
       |       CAST($BM25_K1 AS DOUBLE) * (CAST(${1 - BM25_B} AS DOUBLE) +
       |         CAST($BM25_B AS DOUBLE) * CAST(dl AS DOUBLE) /
       |           (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS ts
       |  FROM tf JOIN df USING (term) JOIN lens USING (doc_id), stats),
       |agg AS (SELECT doc_id,
       |        $perTerm
       |      FROM scored GROUP BY doc_id),
       |bm25 AS (SELECT doc_id, CAST(FLOOR(($total) * 10000 + 0.5) AS BIGINT) AS bm25_x1e4
       |         FROM agg)""".stripMargin
  }
}
