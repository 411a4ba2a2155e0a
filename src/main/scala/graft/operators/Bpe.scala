package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed BPE tokenizer training — the learn-the-vocabulary step of
  * an LLM data pipeline, as a deterministic Spark job (q65).
  *
  * Classic word-level byte-pair encoding: the corpus is scanned ONCE into
  * a (word, count) vocabulary; every training iteration then runs over the
  * vocabulary relation (orders of magnitude smaller than the corpus —
  * this is why BPE trainers scale), counting adjacent symbol pairs
  * weighted by word count, merging the most frequent pair (ties broken
  * lexicographically so both engines agree), and rewriting each word's
  * symbol array with the standard greedy LEFT-TO-RIGHT non-overlapping
  * merge.
  *
  * The greedy rewrite is the subtle part distributed: selection inside a
  * run of consecutive matches is sequential ("a a a" merges once, not
  * twice). But matches of a pair (a,b) with a != b can never overlap, and
  * for a == b the overlapping matches form contiguous islands where
  * greedy selection is exactly the even offsets — so the rewrite becomes
  * gaps-and-islands window algebra (cumulative match count -> island id,
  * offset parity -> selected, lag(selected) -> consumed), identical in
  * Spark and the DuckDB oracle, with no sequential fold anywhere.
  * Pair counts deliberately count overlapping positions ("aaa"
  * contributes 2 to (a,a)) — the standard BPE counting convention.
  *
  * The oracle (q65) unrolls N_MERGES iterations in SQL, top-pair
  * selection included — the same executable-twin idiom as q54's k-means.
  */
object Bpe {

  val N_MERGES = 3

  case class Merge(it: Long, sym_left: String, sym_right: String,
                   merged: String, pair_cnt: Long)

  /** (w, cnt, syms) — the corpus's only full scan. The char split is
    * post-filtered for empties so Spark's zero-width-regex split edge
    * cases can't differ from DuckDB's string_split(w, '').
    */
  private[operators] def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", filter(split(col("w"), ""), x => x =!= ""))

  /** Most frequent adjacent pair, ties by (left, right) binary order. */
  private[operators] def topPair(v: DataFrame): Option[(String, String, Long)] = {
    val rows = v.select(col("cnt"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(1).collect()
    rows.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** One greedy merge pass over the vocabulary (see object doc for why
    * this is pure window algebra). `get` (not element_at) for the
    * lookahead: out-of-bounds must be null, not an ANSI error.
    */
  private[operators] def applyMerge(v: DataFrame, a: String, b: String): DataFrame = {
    val wOrd = Window.partitionBy("w").orderBy("pos")
    val staged = v
      .select(col("w"), col("cnt"), col("syms"),
        posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("m", col("sym") === lit(a) &&
        coalesce(get(col("syms"), col("pos") + 1) === lit(b), lit(false)))
      .withColumn("grp", when(col("m"),
        col("pos") - sum(when(col("m"), 1).otherwise(0)).over(wOrd)))
    val island = Window.partitionBy("w", "grp")
    staged
      .withColumn("off", col("pos") - min("pos").over(island))
      .withColumn("sel", col("m") && pmod(col("off"), lit(2)) === 0)
      .withColumn("selp", lag(col("sel"), 1, false).over(wOrd))
      .withColumn("out", when(col("sel"), lit(a + b))
        .when(col("selp"), lit(null).cast("string"))
        .otherwise(col("sym")))
      .filter(col("out").isNotNull)
      .groupBy("w", "cnt")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("out").as("o")))),
        s => s.getField("o")).as("syms"))
  }

  /** Train `nMerges` merges; returns the ordered merge table. Each
    * iteration materializes the next vocabulary before releasing the
    * previous one (the k-means persist discipline); the only driver state
    * is one (pair, count) row per iteration.
    */
  def trainBpe(docs: DataFrame, nMerges: Int = N_MERGES): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var v = vocab(docs).persist()
    v.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var it = 1
    var exhausted = false
    while (it <= nMerges && !exhausted) {
      topPair(v) match {
        case Some((a, b, n)) =>
          merges += Merge(it.toLong, a, b, a + b, n)
          val next = applyMerge(v, a, b).persist()
          next.count()
          v.unpersist()
          v = next
        case None => exhausted = true
      }
      it += 1
    }
    v.unpersist()
    merges.toSeq.toDF()
      .select("it", "sym_left", "sym_right", "merged", "pair_cnt")
  }

  /** The tokenizer's encode step: apply an ordered merge list to a
    * `(w, cnt)` word table (cnt optional — defaulted to 1), returning
    * (w, cnt, syms) with the trained segmentation.
    */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val base = (if (words.columns.contains("cnt")) words
      else words.withColumn("cnt", lit(1L)))
      .withColumn("syms", filter(split(col("w"), ""), x => x =!= ""))
    merges.foldLeft(base) { case (v, (a, b)) => applyMerge(v, a, b) }
  }

  private def iterSql(i: Int): String = {
    val prev = s"v${i - 1}"
    s"""p$i AS (SELECT syms[j] AS a, syms[j + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
       |        FROM $prev, unnest(range(1, len(syms))) AS u(j) GROUP BY 1, 2),
       |t$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
       |e$i AS (SELECT w, cnt, syms, j AS pos, syms[j] AS sym, t.a AS ta, t.b AS tb
       |        FROM $prev, unnest(range(1, len(syms) + 1)) AS u(j) CROSS JOIN t$i t),
       |m$i AS (SELECT *, (sym = ta AND COALESCE(syms[pos + 1] = tb, FALSE)) AS m FROM e$i),
       |g$i AS (SELECT *, CASE WHEN m THEN pos - SUM(CASE WHEN m THEN 1 ELSE 0 END)
       |                        OVER (PARTITION BY w ORDER BY pos) END AS grp FROM m$i),
       |o$i AS (SELECT *, pos - MIN(pos) OVER (PARTITION BY w, grp) AS off FROM g$i),
       |s$i AS (SELECT *, (m AND off % 2 = 0) AS sel FROM o$i),
       |l$i AS (SELECT *, COALESCE(LAG(sel) OVER (PARTITION BY w ORDER BY pos), FALSE) AS selp FROM s$i),
       |v$i AS (SELECT w, cnt, list(outsym ORDER BY pos) AS syms FROM (
       |          SELECT w, cnt, pos,
       |                 CASE WHEN sel THEN ta || tb WHEN selp THEN NULL ELSE sym END AS outsym
       |          FROM l$i) WHERE outsym IS NOT NULL GROUP BY w, cnt)"""
      .stripMargin
  }

  /** q97: the full tokenizer LIFECYCLE as one query — train the merge
    * table on the corpus (q65), ENCODE the corpus with it, and emit the
    * resulting token-vocabulary statistics (token -> total occurrences
    * weighted by word count). This is the artifact a pipeline actually
    * ships to the trainer: the learned subword vocabulary with its
    * frequency mass, and the check that encode is consistent with
    * training (merged symbols appear, their parts' counts drop).
    *
    * 100 TB shape: identical to q65 — ONE corpus scan builds the
    * (word, count) vocabulary; training AND encoding then run over the
    * vocabulary relation (orders of magnitude smaller), and the output
    * is vocabulary-sized. Encoding a new corpus against a frozen merge
    * table is [[applyMerges]] on its own vocab — no retraining.
    */
  def encodeCorpusStats(docs: DataFrame, nMerges: Int = N_MERGES): DataFrame =
    encodeStatsWithMerges(docs,
      trainBpe(docs, nMerges).collect()
        .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq)

  /** The encode-only tail of [[encodeCorpusStats]]: apply a FROZEN merge
    * table to the corpus vocabulary and emit the weighted token counts —
    * what a warm catalog run pays once the training artifact exists.
    */
  def encodeStatsWithMerges(docs: DataFrame,
                            merges: Seq[(String, String)]): DataFrame =
    applyMerges(vocab(docs), merges)
      .select(col("cnt"), explode(col("syms")).as("token"))
      .groupBy("token")
      .agg(sum("cnt").as("n_occ"))
      .orderBy("token")

  /** Resolve (building on first miss) the learned merge-table artifact
    * for the documents corpus of `sfDir` — content-keyed on the corpus
    * fingerprint + merge count, so training is paid ONCE per corpus
    * snapshot and both q65 (read the table) and q97 (encode with it) are
    * training-free on a warm catalog. The 100 TB posture this models is
    * exactly how tokenizers ship: train once, freeze, encode everywhere.
    */
  private[graft] def ensureMerges(s: SparkSession, sfDir: String,
                                  nMerges: Int = N_MERGES): String = {
    // the corpus fingerprint is recomputed per call (one cheap scan, the
    // q112/q66 ensureDerived idiom) — an earlier path-keyed memoization
    // here bypassed the content key for the rest of the JVM session, so
    // a fixture regeneration at the same path mid-session served the
    // stale merge table to q65/q97/q119
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    DedupArtifacts.ensureDerived(s,
      DedupArtifacts.corpusKey(docs, "bpe") + s"|m=$nMerges|v=1")(
      trainBpe(docs.select("text"), nMerges))
  }

  /** q119: TOKENIZER FERTILITY BY LANGUAGE — encode the corpus vocabulary
    * with the FROZEN q65 merge table and report per-language fertility
    * (BPE tokens per word) and compression (chars per BPE token). The
    * standard multilingual-tokenizer health check: a vocabulary trained
    * on a skewed mix over-fragments under-represented languages, which
    * shows up as fertility disparity here long before it shows up as
    * quality loss — and it directly prices each language's token budget.
    *
    * 100 TB shape: segmentation is per-WORD, so the encode runs once over
    * the corpus-wide vocabulary relation (orders of magnitude smaller
    * than the corpus); the per-(lang, word) counts are one tokenize
    * aggregate; the join is vocabulary-sized; output is language-sized.
    */
  def fertilityByLang(docs: DataFrame,
                      merges: Seq[(String, String)]): DataFrame = {
    val enc = applyMerges(vocab(docs.select("text")), merges)
      .select(col("w"), size(col("syms")).cast("long").as("nsyms"))
    val lw = docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
    lw.join(enc, "w")
      .groupBy("lang")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("nsyms")).as("n_bpe_tokens"),
        sum(col("cnt") * length(col("w"))).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"), col("n_chars"),
        floor(col("n_bpe_tokens").cast("double") * 1000 / col("n_words")
          + lit(0.5)).cast("long").as("tokens_per_word_x1e3"),
        floor(col("n_chars").cast("double") * 1000 / col("n_bpe_tokens")
          + lit(0.5)).cast("long").as("chars_per_token_x1e3"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q65: the learned merge table over the documents corpus (served from
    // the build-once training artifact).
    "q65_bpe_merges" -> ((s, d) =>
      s.read.parquet(ensureMerges(s, d)).orderBy("it")),

    // Q97: token-vocabulary statistics of the corpus encoded with the
    // FROZEN q65 merge table — encode-only per call.
    "q97_bpe_encode" -> ((s, d) => {
      val merges = s.read.parquet(ensureMerges(s, d)).collect()
        .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      encodeStatsWithMerges(Tables.documents(s, d).select("text"), merges)
    }),

    // Q119: per-language tokenizer fertility with the frozen merges.
    "q119_bpe_fertility" -> ((s, d) => {
      val merges = s.read.parquet(ensureMerges(s, d)).collect()
        .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      fertilityByLang(Tables.documents(s, d).select("lang", "text"), merges)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q65_bpe_merges" -> {
      val iters = (1 to N_MERGES).map(iterSql).mkString(",\n")
      val finals = (1 to N_MERGES).map(i =>
        s"SELECT CAST($i AS BIGINT) AS it, a AS sym_left, b AS sym_right, a || b AS merged, n AS pair_cnt FROM t$i")
        .mkString("\nUNION ALL\n")
      s"""WITH v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
         |            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |            WHERE len(w) > 0 GROUP BY w),
         |$iters
         |SELECT * FROM (
         |$finals
         |) ORDER BY it""".stripMargin
    },

    // q119 twin: the q65 chain to the final vocabulary, then per-language
    // word counts joined on the encoded segmentation.
    "q119_bpe_fertility" -> {
      val iters = (1 to N_MERGES).map(iterSql).mkString(",\n")
      s"""WITH v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
         |            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |            WHERE len(w) > 0 GROUP BY w),
         |$iters,
         |enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS nsyms FROM v$N_MERGES),
         |lw AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         |       WHERE len(w) > 0 GROUP BY 1, 2)
         |SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_words,
         |       CAST(SUM(cnt * nsyms) AS BIGINT) AS n_bpe_tokens,
         |       CAST(SUM(cnt * len(w)) AS BIGINT) AS n_chars,
         |       CAST(FLOOR(CAST(SUM(cnt * nsyms) AS DOUBLE) * 1000 / SUM(cnt)
         |         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS tokens_per_word_x1e3,
         |       CAST(FLOOR(CAST(SUM(cnt * len(w)) AS DOUBLE) * 1000 / SUM(cnt * nsyms)
         |         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS chars_per_token_x1e3
         |FROM lw JOIN enc USING (w)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // q97 twin: the q65 training chain carried one step further — explode
    // the final vocabulary's symbol arrays into weighted token counts.
    "q97_bpe_encode" -> {
      val iters = (1 to N_MERGES).map(iterSql).mkString(",\n")
      s"""WITH v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
         |            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |            WHERE len(w) > 0 GROUP BY w),
         |$iters
         |SELECT token, CAST(SUM(cnt) AS BIGINT) AS n_occ
         |FROM (SELECT cnt, unnest(syms) AS token FROM v$N_MERGES)
         |GROUP BY token
         |ORDER BY token""".stripMargin
    }
  )
}
