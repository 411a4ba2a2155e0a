package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Text-analysis operators over `documents` (training-data-pipeline surface:
  * token statistics, quality scoring, language identification, document
  * fingerprinting; SURVEY.md s2.5 E-11).
  *
  * Everything is built from codegen'd higher-order functions (split /
  * transform / filter / aggregate) — no UDFs — so token work happens inside
  * whole-stage codegen and the only generators are explicit explodes for
  * the term-frequency aggregations.
  */
object TextAnalysis {

  private def toks: Column = split(col("text"), " ")

  /** floor-scaled ratio of two exact longs — deterministic across engines. */
  private def ratioX(num: Column, den: Column, scale: Double): Column =
    floor(num.cast("double") * lit(scale) / den + lit(0.5)).cast("long")

  // Quality-score building blocks, shared with the Curation pipeline so the
  // two can never desynchronize (single definition, single oracle twin).
  private[operators] def nTokensCol: Column = size(toks).cast("long")
  private[operators] def nTypesCol: Column = size(array_distinct(toks)).cast("long")
  private[operators] def nStopCol: Column =
    size(filter(toks, t => t.isin("the", "a"))).cast("long")

  /** The rolling polynomial fingerprint over a token-array column:
    * fold (acc*31 + (len*128 + first-char)) mod 1e9+7. ONE definition
    * shared by q28 (whole document) and Prep's q47 (per chunk) — the
    * chunk-0 == q28 identity PrepSpec pins depends on these never
    * diverging. [[rollingFpSql]] is its DuckDB twin over a list expr.
    */
  private[operators] def rollingFp(tokArr: Column): Column =
    aggregate(tokArr, lit(0L), (acc, t) =>
      pmod(acc * lit(31L) +
        (length(t).cast("long") * lit(128L) + ascii(t).cast("long")),
        lit(1000000007L)))

  private[operators] def rollingFpSql(listExpr: String): String =
    s"""list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform($listExpr,
       |          t -> CAST(length(t) * 128 + ascii(t) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  /** score = 500*type-token-ratio + 500*(1 - stopword-ratio), from exact ints. */
  private[operators] def qualityCol: Column = floor(
    nTypesCol.cast("double") * lit(500.0) / nTokensCol +
      (nTokensCol - nStopCol).cast("double") * lit(500.0) / nTokensCol +
      lit(0.5)).cast("long")

  /** The DuckDB twin of [[qualityCol]] as an expression over `text`. */
  private[operators] val QUALITY_SQL: String =
    """CAST(FLOOR(
      |           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 500.0
      |             / len(string_split(text, ' ')) +
      |           (CAST(len(string_split(text, ' ')) AS BIGINT)
      |             - CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT)) * 500.0
      |             / len(string_split(text, ' ')) + 0.5) AS BIGINT)""".stripMargin

  /** Deterministic stratified sampling — per stratum (`lang`), the
    * `perStratum` documents with the smallest portable hash of their id.
    * Ordering by a uniform hash is the distributed idiom for
    * without-replacement sampling: no RNG state, stable under re-runs and
    * repartitioning, and the per-stratum quota is a rank filter, not a
    * scan-order artifact.
    */
  def stratifiedSample(docs: DataFrame, perStratum: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = Window.partitionBy("lang")
      .orderBy(Sketches.phash60(col("doc_id")), col("doc_id"))
    docs.select(col("lang"), col("doc_id"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= perStratum)
      .orderBy("lang", "rnk")
  }

  /** q56: domain-mix sampling — the "what fraction of each source goes in
    * the mix" step of corpus assembly. Quotas are allocated across
    * domains (`lang` here) proportional to sqrt(domain size) — the
    * temperature-flattening that upsamples low-resource domains relative
    * to raw proportions — then filled deterministically with each domain's
    * smallest-hash documents (the q42 idiom).
    *
    * Two passes, both scale-safe: a domain-count aggregate (rows = #domains,
    * broadcast back), then the per-domain hash-rank filter
    * (WindowGroupLimit-pruned like q42). Weights are floor-scaled ints from
    * a correctly-rounded sqrt of an exact count, quota division is integer
    * `div` — every number in the output is exact, hence the plain-SQL
    * oracle.
    */
  def domainMixSample(docs: DataFrame, budget: Long = 200L): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_corpus"))
      .withColumn("w",
        floor(sqrt(col("n_corpus").cast("double")) * 1000).cast("long"))
    // total weight via a single-partition window over the (#domains-sized)
    // aggregate output — NOT a second aggregate of `counts`, which would
    // scan the corpus twice
    val quotas = counts
      .withColumn("tw", sum("w").over(Window.partitionBy()))
      .withColumn("quota",
        least(col("n_corpus"), expr(s"($budget * w) div tw")))
      .select("lang", "n_corpus", "quota")
    val byHash = Window.partitionBy("lang")
      .orderBy(Sketches.phash60(col("doc_id")), col("doc_id"))
    docs.select(col("lang"), col("doc_id"))
      .withColumn("rnk", row_number().over(byHash).cast("long"))
      // quota is a COLUMN, which WindowGroupLimit can't prune on — but no
      // quota can exceed the total budget, so this redundant LITERAL bound
      // lets the optimizer keep only `budget` candidates per domain per
      // partition before the join (the q42 pruning, preserved)
      .filter(col("rnk") <= budget)
      .join(broadcast(quotas), "lang")
      .filter(col("rnk") <= col("quota"))
      .groupBy("lang")
      .agg(max("n_corpus").as("n_corpus"), max("quota").as("quota"),
        count(lit(1)).as("n_sampled"), sum("doc_id").as("sum_sampled_ids"))
      .select("lang", "n_corpus", "quota", "n_sampled", "sum_sampled_ids")
      .orderBy("lang")
  }

  // ------------------------------------------------------- winnowing --

  private val WIN_K = 4  // tokens per k-gram
  private val WIN_W = 4  // k-gram hashes per winnowing window
  // fingerprint = 40 bits of phash60; position packs into the low 20 bits
  // so argmin-by-(hash, pos) is ONE BIGINT min — portable to any engine
  private val WIN_FP_MOD = 1L << 40
  private val WIN_POS_MOD = 1L << 20

  /** q82: winnowing fingerprint selection (Schleimer et al., SIGMOD'03 —
    * the MOSS algorithm) + cross-document fingerprint matching. From each
    * window of `WIN_W` consecutive k-gram hashes keep the minimal
    * (hash, pos) — giving the GUARANTEE that any shared token run of
    * length >= w + k - 1 produces at least one shared fingerprint, while
    * storing only ~2/(w+1) of all positions. This is the
    * fingerprint-volume reducer that makes corpus-scale substring
    * matching affordable: q80 matches every position; winnowing matches
    * a provably sufficient sample.
    *
    * Portability: the per-window argmin is min() over a packed BIGINT
    * (40-bit hash << 20 | pos) — no struct ordering, no tie ambiguity
    * (leftmost minimal hash wins), identical in any engine. Scale shape:
    * one tokenize pass, a per-document sliding window (partition = one
    * document's grams), distinct selected fingerprints, then the q52/q80
    * frequency-join idiom over the REDUCED fingerprint relation.
    */
  def winnowingFingerprints(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
    // posexplode: the 0-based array index IS the gram position —
    // deterministic under any physical layout
    val pos = tok.filter(size(col("l")) >= WIN_K)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(l) - ${WIN_K - 1}), " +
          s"i -> concat_ws(' ', slice(l, i, $WIN_K)))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("g"))
    val packed = pos.select(col("doc_id"), col("pos"),
      ((Sketches.phash60(col("g")) % WIN_FP_MOD) * WIN_POS_MOD + col("pos"))
        .as("v"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, WIN_W - 1)
    val sel = packed
      .withColumn("m", min("v").over(w))
      .withColumn("wn", count(lit(1)).over(w))
      .filter(col("wn") === WIN_W)             // full windows only
      // div, not `/`: packed values exceed 2^53, double division would
      // round — and Spark's / on longs IS double division
      .select(col("doc_id"), expr(s"m div $WIN_POS_MOD").as("fp"))
      .distinct()
    val freq = sel.groupBy("fp").agg(count(lit(1)).as("nd"))
    val perDoc = sel.join(freq, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_fp"))
    val counts = pos.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    docs.select("doc_id").join(counts, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
      .orderBy("doc_id")
  }

  /** q81: token-budget mixture planning — the arithmetic a training run
    * actually consumes after q56 picks the mix shape: per domain, the
    * TOKEN target under sqrt-temperature weights, the implied sampling
    * rate, and the repeat-epoch count when a low-resource domain must be
    * upsampled past 1.0 (rate and epochs are how data loaders are
    * configured; Chinchilla-style budget in, per-domain plan out).
    *
    * One aggregate over the corpus (map-side token counting inside the
    * scan projection — no token ever shuffles), then #domains-row window
    * arithmetic. Every output is exact integer math: floor-scaled sqrt
    * weights (the q56 contract), integer-division targets/rates/epochs —
    * the plan reproduces bit-for-bit anywhere.
    */
  def mixturePlan(docs: DataFrame,
                  budgetTokens: Long = MIX_BUDGET_TOKENS): DataFrame =
    mixturePlanFromStats(
      docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      budgetTokens)

  /** [[mixturePlan]] over a pre-tokenized `(doc_id, lang, n_tokens)`
    * relation — the SHARED kernel (the `Envelope.scd2Fold` convention):
    * the batch plan and the incremental release readout
    * ([[ReleaseStream.releaseState]], which re-plans over per-doc stats
    * it maintains on disk) both call this, so the two can never drift.
    */
  private[operators] def mixturePlanFromStats(stats: DataFrame,
                                              budgetTokens: Long): DataFrame = {
    val per = stats
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long"))
    per
      .withColumn("tw", sum("w").over(Window.partitionBy()))
      .withColumn("target_tokens", expr(s"($budgetTokens * w) div tw"))
      .withColumn("rate_x1e6",
        expr("(target_tokens * 1000000) div n_tokens"))
      .withColumn("epochs",
        expr("(target_tokens + n_tokens - 1) div n_tokens"))
      .select("lang", "n_docs", "n_tokens", "target_tokens", "rate_x1e6",
        "epochs")
      .orderBy("lang")
  }

  private[operators] val MIX_BUDGET_TOKENS = 100000L

  /** q144: COMPOSITION DRIFT — per (crawl batch, language), the batch's
    * token share against the whole corpus's share, signed ×1e6 (the
    * trend the mixture planner (q116/q120) alerts on: a crawl batch
    * whose language mix lurches away from the corpus-wide mix will bend
    * every downstream sampling plan the moment it lands — this relation
    * is where that shows up, per batch, before re-planning). Batches are
    * the q134 residue classes (`doc_id % 3`), the stand-in for crawl
    * snapshot ids the fixtures carry.
    *
    * Scale shape: ONE corpus pass — map-side token counting inside the
    * scan projection into a (batch, lang) partial aggregate (≤
    * #batches×#langs rows shuffle); every downstream term (per-batch
    * totals, global shares) derives from that tiny persisted relation,
    * broadcast back. Integer math throughout (floor-scaled shares,
    * integer division), so the relation reproduces bit-for-bit
    * cross-engine.
    */
  def compositionDrift(docs: DataFrame): DataFrame = {
    val perBatchLang = docs
      .select(pmod(col("doc_id"), lit(3L)).as("batch_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("batch_id", "lang")
      .agg(sum("n_tokens").as("lang_tokens"))
      .persist() // ≤ #batches×#langs rows — the one corpus pass
    val perBatch = perBatchLang.groupBy("batch_id")
      .agg(sum("lang_tokens").as("batch_tokens"))
    val global = perBatchLang.groupBy("lang")
      .agg(sum("lang_tokens").as("g_lang_tokens"))
    val gtot = global.agg(sum("g_lang_tokens").as("g_tokens"))
    perBatchLang
      .join(broadcast(perBatch), Seq("batch_id"))
      .join(broadcast(global), Seq("lang"))
      .crossJoin(broadcast(gtot)) // single-row corpus total
      .select(col("batch_id"), col("lang"), col("lang_tokens"),
        expr("(lang_tokens * 1000000) div batch_tokens").as("share_x1e6"),
        expr("(g_lang_tokens * 1000000) div g_tokens")
          .as("global_share_x1e6"))
      .withColumn("drift_x1e6",
        col("share_x1e6") - col("global_share_x1e6"))
      .orderBy("batch_id", "lang")
  }

  /** q120: MIXTURE MATERIALIZATION — turn the q81 plan into the per-doc
    * sampling multiplicities a data loader executes: every doc of a
    * domain appears `target DIV n_tokens` times (the full epochs), and
    * the fractional remainder pass selects each doc INDEPENDENTLY by
    * portable hash with probability remainder/n_tokens — the
    * deterministic Bernoulli-by-hash that loaders actually implement,
    * chosen over an exact greedy prefix on purpose: the prefix needs a
    * per-domain SORT (one reducer per domain at 100 TB — a skew trap),
    * the hash rule is a shuffle-free per-row predicate, reproducible
    * across runs/retries/layouts, and its token mass concentrates at the
    * remainder (one-epoch variance over millions of docs is negligible).
    * Output: (doc_id, lang, n_tokens, n_copies) for every doc with
    * n_copies > 0 — full-epoch domains emit every doc, over-budget
    * domains emit their sampled subset, each doc's multiplicity in
    * {floor(epochs), floor(epochs)+1}.
    *
    * 100 TB shape: the plan is a broadcast (#domains rows); the corpus
    * pays ONE scan with a per-row hash predicate. No window, no sort, no
    * shuffle beyond the plan aggregate.
    */
  def mixtureMaterialize(docs: DataFrame,
                         budgetTokens: Long = MIX_BUDGET_TOKENS): DataFrame =
    mixtureMaterializeFromStats(
      docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      budgetTokens)

  /** [[mixtureMaterialize]] over a pre-tokenized `(doc_id, lang,
    * n_tokens)` relation — the shared kernel twin of
    * [[mixturePlanFromStats]]; the incremental release readout re-plans
    * the mixture over its kept set through THIS, so stream and batch
    * multiplicities are one definition.
    */
  private[operators] def mixtureMaterializeFromStats(
      stats: DataFrame, budgetTokens: Long = MIX_BUDGET_TOKENS): DataFrame =
    mixtureAssign(stats, mixturePlanFromStats(stats, budgetTokens))

  /** The per-doc assignment half of [[mixtureMaterializeFromStats]],
    * against a caller-supplied plan relation `(lang, n_tokens,
    * target_tokens)` — the SINGLE definition of the epochs/remainder
    * arithmetic and the hash rule. Split out so the incremental release
    * readout ([[ReleaseStream.releaseStateAt]]) can assign against a
    * plan it materialized BY VALUE (a collected #langs-row literal),
    * while the batch path assigns against the live plan aggregate —
    * both through this one kernel, so the arithmetic cannot drift.
    */
  private[operators] def mixtureAssign(stats: DataFrame,
                                       plan: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(stats.sparkSession)
    val p = plan
      .select(col("lang"), col("n_tokens").as("lang_tokens"),
        col("target_tokens"))
      .withColumn("full_epochs", expr("target_tokens DIV lang_tokens"))
      .withColumn("rem_rate_x1e6", expr(
        "((target_tokens - (target_tokens DIV lang_tokens) * lang_tokens)" +
          " * 1000000) DIV lang_tokens"))
    stats
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        pmod(Sketches.phash60(
          concat(lit("mx42|"), col("doc_id").cast("string"))), lit(1000000L))
          .as("h"))
      .join(broadcast(p), "lang")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("full_epochs") +
          when(col("h") < col("rem_rate_x1e6"), 1L).otherwise(0L))
          .as("n_copies"))
      .filter(col("n_copies") > 0)
      .orderBy("doc_id")
  }

  /** q60: unigram language-model quality score — the in-container stand-in
    * for the perplexity filter of a training pipeline (KenLM et al. are not
    * in this environment; the MODEL is a stand-in, the Spark shape is the
    * real one). The corpus's own unigram distribution is the model: each
    * token scores ln(count(token)/N), a document scores the mean token
    * log-likelihood, and low-likelihood documents (rare-token-heavy) are
    * the flag candidates.
    *
    * Portability: per-token scores are floor-scaled to x1e6 BIGINTs at the
    * VOCABULARY level (ln on exact-integer-derived doubles — the q41/q44
    * precedent), and per-document aggregation sums those exact ints, so no
    * float-sum order dependence exists anywhere. Scale shape: the vocab
    * relation is small (it is a groupBy output), so the score lookup is a
    * broadcast join against the exploded corpus; per-doc reduction is one
    * partially-aggregated groupBy. No shuffle carries documents.
    */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val toksOf = split(col("text"), " ")
    val tokens = docs.select(col("doc_id"), explode(toksOf).as("tok"))
    val vocab = tokens.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").as("n_total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        floor((log(col("c").cast("double")) -
          log(col("n_total").cast("double"))) * 1000000 + lit(0.5))
          .cast("long").as("lp_x1e6"))
    tokens.join(broadcast(scored), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("lp_x1e6").as("sum_lp_x1e6"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("sum_lp_x1e6").cast("double") / col("n_tokens") + lit(0.5))
          .cast("long").as("avg_lp_x1e6"))
      .orderBy("doc_id")
  }

  /** q77: bigram language-model score — q60's model one order up, the
    * in-container stand-in for the CCNet-style perplexity gate. The corpus
    * is its own model: P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) with
    * Laplace smoothing over the corpus vocabulary V, a document scores the
    * mean bigram log-likelihood, and low scorers (incoherent word order,
    * even with common words) are the flag candidates — which is exactly
    * what the unigram model CANNOT see.
    *
    * Portability is q60's contract: per-bigram-TYPE scores quantize to
    * x1e6 BIGINTs at the model level (ln of exact-integer-valued doubles
    * only), per-document aggregation sums exact ints.
    *
    * Scale shape — the one way this differs from q60: a bigram model is
    * NOT broadcastable at corpus scale (|model| grows with corpus, unlike
    * the unigram vocab), so the lookup is a shuffled equi-join on
    * (w1, w2). The model side arrives hash-partitioned on w1 from the
    * context-count join, which satisfies the join's clustered
    * distribution, so only the probe side shuffles; per-doc reduction is
    * one partially-aggregated groupBy. Nothing vocabulary-sized ever sits
    * on the driver.
    */
  /** q121: PER-SOURCE KL DIVERGENCE — how far each source's unigram
    * distribution sits from the corpus-wide one, the signal behind "this
    * domain is distributionally weird" decisions (mixture weighting,
    * drift triage next to q83, DSIR-style selection next to q76). Summed
    * deterministically: each (source, token) contributes the EXACT
    * integer c_st * round(1e6 * (ln c_st + ln N - ln N_s - ln c_t))
    * (fixed ln term order — the q60/q116 idiom), the per-source BIGINT
    * sum divides by N_s at the end, so no float ever sums in engine
    * order. 100 TB shape: one tokenize pass, one (source, token) hash
    * aggregate, a shuffle join on the token key against the corpus-vocab
    * relation — the vocabulary of raw web text is billions of rows, so
    * it is NOT broadcast-hinted (AQE may still choose broadcast when the
    * measured size is small, which is the right call at fixture scale);
    * source totals and the single-row grand total stay broadcast.
    * Output is source-sized.
    */
  def sourceKl(docs: DataFrame): DataFrame = {
    val tok = docs.select(coalesce(col("source"), lit("")).as("source"),
      explode(split(col("text"), " ")).as("t"))
    val st = tok.groupBy("source", "t").agg(count(lit(1)).as("c_st")).persist()
    val srcTot = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val vocab = st.groupBy("t").agg(sum(col("c_st")).as("c_t"))
    val total = vocab.agg(sum(col("c_t")).as("n"))
    st.join(vocab, "t")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_s"),
        (col("c_st") *
          floor((log(col("c_st").cast("double")) + log(col("n").cast("double"))
            - log(col("n_s").cast("double")) - log(col("c_t").cast("double")))
            * 1000000 + lit(0.5)).cast("long")).as("term"))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"), sum(col("term")).as("s"))
      // KL >= 0 by definition; per-term rounding can leave a slightly
      // negative integer sum, clamped so the report never shows a
      // nonsense negative divergence (Spark DIV and DuckDB // both
      // truncate toward zero, but the clamp removes the question)
      .selectExpr("source", "n_tokens",
        "GREATEST(s, 0L) DIV n_tokens AS kl_x1e6")
      .orderBy("source")
  }

  /** q116: PMI-ranked bigram associations — pointwise mutual information
    * of adjacent token pairs, the collocation detector a tokenizer/
    * phrase-mining pass runs over a corpus (PMI finds "strongly
    * associated" pairs the raw bigram count can't: a frequent pair of
    * frequent words scores low, a pair that co-occurs far above chance
    * scores high). pmi = ln(P(ab)/(P(a)P(b))) with P(ab) = c_ab/N_bigrams
    * and P(w) = c_w/N_unigrams, scaled x1e6 and rounded half-up — the q60
    * integer-log idiom, so DuckDB replays the doubles bit-for-bit. A
    * minimum pair count keeps noise pairs (c=1 flukes maximize PMI) out.
    *
    * 100 TB shape: two hash aggregates over one tokenize pass (bigram
    * counts, unigram counts), two single-row totals broadcast, one
    * vocab²-sized join keyed on the words, TakeOrdered for the top-k —
    * nothing corpus-sized past the first aggregates.
    */
  def pmiBigrams(docs: DataFrame, minCount: Int = 5, k: Int = 100): DataFrame = {
    val tok = docs.select(split(col("text"), " ").as("l"))
    val bg = tok.filter(size(col("l")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(l) - 1), " +
          "i -> struct(element_at(l, i) AS w1, element_at(l, i + 1) AS w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).persist()
    val uni = tok.select(explode(col("l")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).persist()
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = bc.agg(sum(col("c12")).as("nb"))
    bc.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"),
        floor((log(col("c12").cast("double")) - log(col("nb").cast("double"))
          - log(col("c1").cast("double")) - log(col("c2").cast("double"))
          + lit(2.0) * log(col("nu").cast("double"))) * 1000000 + lit(0.5))
          .cast("long").as("pmi_x1e6"))
      .orderBy(col("pmi_x1e6").desc, col("w1"), col("w2"))
      .limit(k)
  }

  def bigramLogprob(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
    // 1-based positions; size>=2 guard because sequence(1, 0) DESCENDS
    val bg = tok.filter(size(col("l")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(l) - 1), " +
          "i -> struct(element_at(l, i) AS w1, element_at(l, i + 1) AS w2))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uc = bc.groupBy("w1").agg(sum("c12").as("c1"))
    val nv = tok.select(explode(col("l")).as("t"))
      .agg(countDistinct("t").as("nv"))
    val model = bc.join(uc, "w1").crossJoin(broadcast(nv))
      .select(col("w1"), col("w2"),
        floor((log((col("c12") + lit(1)).cast("double")) -
          log((col("c1") + col("nv")).cast("double"))) * 1000000 + lit(0.5))
          .cast("long").as("lp_x1e6"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("lp_x1e6").as("sum_lp_x1e6"))
      .select(col("doc_id"), col("n_bigrams"),
        floor(col("sum_lp_x1e6").cast("double") / col("n_bigrams") + lit(0.5))
          .cast("long").as("avg_lp_x1e6"))
      .orderBy("doc_id")
  }

  // q113: 10 nested hash slices; width = ceil(2^60 / 10) so every 60-bit
  // hash lands in slice 0..9 under pure integer division (no doubles — a
  // 60-bit value does not survive a double round-trip).
  private val GROWTH_SLICES = 10
  private val GROWTH_SLICE_W: Long =
    (1152921504606846976L + GROWTH_SLICES - 1) / GROWTH_SLICES

  /** q113: VOCABULARY-GROWTH curve (the Heaps-law measurement) over nested
    * hash slices — how many NEW distinct token types each additional tenth
    * of the corpus contributes. Because membership in slice `k` is
    * `phash60(doc_id) DIV sliceWidth == k`, the union of slices `0..k` is a
    * uniform without-replacement sample nested inside the union of
    * `0..k+1` — exactly the subset chain a scaling-law study draws — so
    * `cum_types` vs `cum_tokens` IS the type-growth curve, measured without
    * ever ordering the corpus. The curve is the decision input for "does
    * more of this source still add vocabulary, or only repetition"
    * (contrast q92, which scores novelty crawl-over-crawl rather than
    * within one corpus).
    *
    * 100 TB shape: one tokenize pass; a `(token -> min slice)` aggregate
    * whose state is vocabulary-sized (map-side partial mins, one shuffle
    * keyed by token — the same key the q41/q60 vocab aggregates already
    * shuffle on); then two 10-row relations and a window over 10 rows.
    * Nothing global-sorts, nothing is all-pairs, and the only wide columns
    * (token strings) exist for one exchange. Every output is an exact
    * BIGINT so the curve hash-checks against the naive oracle.
    */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    val d = vocabSlices(docs)
    vocabCurve(vocabCountPartials(d), vocabTypePartials(d))
  }

  /** The sliced-token relation the q113 partials derive from. */
  private[operators] def vocabSlices(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("h", Sketches.phash60(col("doc_id")))
      .selectExpr(s"h DIV $GROWTH_SLICE_W AS slice", "toks")
  }

  /** Per-slice (n_docs, n_tokens) — ADDITIVE, so per-batch partials merge
    * by plain sum (the q110 counts-index property).
    */
  private[operators] def vocabCountPartials(d: DataFrame): DataFrame =
    d.select(col("slice"), size(col("toks")).cast("long").as("n_tok"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))

  /** (token -> min slice) — mergeable by min, so per-batch partials
    * (each vocabulary-sized, never the token stream) merge exactly.
    */
  private[operators] def vocabTypePartials(d: DataFrame): DataFrame =
    d.select(col("slice"), explode(col("toks")).as("tok"))
      .groupBy("tok").agg(min("slice").as("slice"))

  /** The q113 tail over (possibly multi-batch) partials: re-aggregation
    * is idempotent for a single batch and the exact merge for many —
    * sum-of-sums and min-of-mins — so the batch query and the streaming
    * index report run the IDENTICAL code path.
    */
  private[operators] def vocabCurve(counts: DataFrame,
                                    firstSeen: DataFrame): DataFrame = {
    val perSlice = counts.groupBy("slice")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
    val newTypes = firstSeen.groupBy("tok").agg(min("slice").as("slice"))
      .groupBy("slice").agg(count(lit(1)).as("n_new_types"))
    // slice-cardinality window (<=10 rows) — single-partition by design
    val w = Window.orderBy("slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perSlice.join(newTypes, Seq("slice"), "left")
      .select(col("slice"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("cum_types", sum("n_new_types").over(w))
      .orderBy("slice")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q144: per-batch corpus composition drift (see [[compositionDrift]]).
    "q144_composition_drift" -> ((s, d) =>
      compositionDrift(Tables.documents(s, d))),

    // Q113: vocabulary-growth (Heaps-law) curve over nested hash slices.
    "q113_vocab_growth" -> ((s, d) => vocabGrowth(Tables.documents(s, d))),

    // Q60: unigram LM quality score (see [[unigramLogprob]]).
    "q60_unigram_logprob" -> ((s, d) =>
      unigramLogprob(Tables.documents(s, d))),

    // Q77: bigram LM quality score (see [[bigramLogprob]]).
    "q77_bigram_logprob" -> ((s, d) =>
      bigramLogprob(Tables.documents(s, d))),

    // Q116: PMI-ranked bigram associations (see [[pmiBigrams]]).
    "q116_pmi_bigrams" -> ((s, d) =>
      pmiBigrams(Tables.documents(s, d))),

    // Q121: per-source unigram KL divergence (see [[sourceKl]]).
    "q121_source_kl" -> ((s, d) =>
      sourceKl(Tables.documents(s, d))),

    // Q56: sqrt-temperature domain mixing (see [[domainMixSample]]).
    "q56_domain_mix" -> ((s, d) =>
      domainMixSample(Tables.documents(s, d))),

    // Q81: token-budget mixture planning (see [[mixturePlan]]).
    "q81_mixture_plan" -> ((s, d) =>
      mixturePlan(Tables.documents(s, d))),

    // Q120: the q81 plan materialized to per-doc multiplicities.
    "q120_mixture_materialize" -> ((s, d) =>
      mixtureMaterialize(Tables.documents(s, d))),

    // Q82: winnowing fingerprints (see [[winnowingFingerprints]]).
    "q82_winnowing" -> ((s, d) =>
      winnowingFingerprints(Tables.documents(s, d))),

    // Q19 (E-11): per-language top-10 token frequency. Two hash aggregates
    // plus a small window over 5 langs x vocab.
    "q19_token_top10" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("lang"), explode(toks).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
      tf.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 10)
        .select("lang", "token", "cnt", "rank")
        .orderBy("lang", "rank")
    }),

    // Q25: language ID by n-gram (token) frequency profile. Profiles are the
    // top-10 tokens per language (built from the labeled corpus); a document
    // scores each language by the total count of its tokens that appear in
    // that profile, argmax with deterministic tie-break. The profile table is
    // tiny -> broadcast; the doc-side is one explode + hash aggregate.
    "q25_langid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tokens = docs.select(col("doc_id"), col("lang"), explode(toks).as("tok"))
      // one explode + one (doc, tok) aggregate; corpus-level term counts
      // derive from it (sum of per-doc counts), so the corpus is tokenized
      // exactly once
      val dt = tokens.groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("dc"))
      val prof = dt.groupBy("lang", "tok").agg(sum("dc").as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("tok"))))
        .filter(col("rn") <= 10)
        .select(col("lang").as("p_lang"), col("tok"))
      val best = dt.join(broadcast(prof), Seq("tok"))
        .groupBy("doc_id", "p_lang").agg(sum("dc").as("s"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("s").desc, col("p_lang"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("p_lang"))
      docs.select("doc_id", "lang").join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("p_lang"), lit("unknown")).as("pred_lang"))
        .orderBy("doc_id")
    }),

    // Q26: quality scoring — type/token ratio and stopword ratio combined.
    // Pure per-row expression work, no shuffle at all.
    "q26_quality" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        nTokensCol.as("n_tokens"),
        nTypesCol.as("n_types"),
        ratioX(nTypesCol, nTokensCol, 1000.0).as("ttr_x1e3"),
        ratioX(nStopCol, nTokensCol, 1000.0).as("stop_x1e3"),
        qualityCol.as("quality_x1e3"))
        .orderBy("doc_id")),

    // Q27: token counting — whitespace tokens, regex word extraction (the
    // BPE-ish pre-tokenizer shape), character totals.
    "q27_token_stats" -> ((s, d) => {
      val nWs = size(toks).cast("long")
      val nAlpha = size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long")
      val tokChars = length(regexp_replace(col("text"), " ", "")).cast("long")
      Tables.documents(s, d).select(
        col("doc_id"),
        nWs.as("n_ws_tokens"),
        nAlpha.as("n_alpha_tokens"),
        length(col("text")).cast("long").as("n_chars_text"),
        col("n_chars"),
        ratioX(tokChars, nWs, 100.0).as("avg_tok_len_x100"))
        .orderBy("doc_id")
    }),

    // Q42: deterministic stratified sampling (see [[stratifiedSample]]).
    "q42_stratified_sample" -> ((s, d) =>
      stratifiedSample(Tables.documents(s, d), 20)),

    // Q48: deterministic train/val/test split — assignment by portable
    // hash of the id (90/5/5), reported as per-split doc and token counts.
    // Hash-based assignment is the only split that survives re-runs,
    // repartitioning, and incremental corpus growth (a new doc never moves
    // an old one between splits — membership is a pure function of id).
    "q48_split_assign" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val h = pmod(Sketches.phash60(col("doc_id")), lit(100L))
      val split = when(h < 90, lit("train"))
        .when(h < 95, lit("val")).otherwise(lit("test"))
      Tables.documents(s, d)
        .groupBy(split.as("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(nTokensCol).as("n_tokens"))
        .orderBy("split")
    }),

    // Q43: sensitive-token redaction — the scrub stage of a training-data
    // pipeline: flag-and-replace by regex (here: the 'customer' entity and
    // any 3+ digit run; the regex subset used works identically in Java
    // regex and RE2). Pure per-row expression work, no shuffle.
    "q43_redaction" -> ((s, d) => {
      val pat = "\\bcustomer\\b|\\d\\d\\d+"
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast("long").as("n_sensitive"),
        length(col("text")).cast("long").as("len_before"),
        length(regexp_replace(col("text"), pat, "[REDACTED]"))
          .cast("long").as("len_after"))
        .orderBy("doc_id")
    }),

    // Q28: document fingerprint — rolling polynomial hash over the token
    // stream (length*128 + first-char code per token), mod 1e9+7. A pure
    // fold inside codegen; the portable arithmetic makes it oracle-checkable.
    "q28_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), rollingFp(toks).as("fingerprint"))
        .orderBy("doc_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "q144_composition_drift" ->
      s"""WITH pbl AS (
         |  SELECT doc_id % 3 AS batch_id, lang,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS lang_tokens
         |  FROM documents GROUP BY 1, 2),
         |pb AS (SELECT batch_id, CAST(SUM(lang_tokens) AS BIGINT) AS batch_tokens
         |       FROM pbl GROUP BY 1),
         |g AS (SELECT lang, CAST(SUM(lang_tokens) AS BIGINT) AS g_lang_tokens
         |      FROM pbl GROUP BY 1),
         |gt AS (SELECT CAST(SUM(g_lang_tokens) AS BIGINT) AS g_tokens FROM g)
         |SELECT pbl.batch_id, pbl.lang, pbl.lang_tokens,
         |  (pbl.lang_tokens * 1000000) // pb.batch_tokens AS share_x1e6,
         |  (g.g_lang_tokens * 1000000) // gt.g_tokens AS global_share_x1e6,
         |  (pbl.lang_tokens * 1000000) // pb.batch_tokens -
         |    (g.g_lang_tokens * 1000000) // gt.g_tokens AS drift_x1e6
         |FROM pbl JOIN pb ON pbl.batch_id = pb.batch_id
         |JOIN g ON pbl.lang = g.lang CROSS JOIN gt
         |ORDER BY pbl.batch_id, pbl.lang""".stripMargin,

    "q113_vocab_growth" ->
      s"""WITH d AS (SELECT string_split(text, ' ') AS toks,
         |        ${Sketches.phash60Sql("doc_id")} // $GROWTH_SLICE_W AS slice
         |      FROM documents),
         |per AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |          CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
         |        FROM d GROUP BY slice),
         |fs AS (SELECT tok, MIN(slice) AS slice
         |       FROM (SELECT slice, unnest(toks) AS tok FROM d)
         |       GROUP BY tok),
         |nt AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_new_types
         |       FROM fs GROUP BY slice)
         |SELECT per.slice, per.n_docs, per.n_tokens,
         |       COALESCE(nt.n_new_types, 0) AS n_new_types,
         |       CAST(SUM(per.n_tokens) OVER
         |         (ORDER BY per.slice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cum_tokens,
         |       CAST(SUM(COALESCE(nt.n_new_types, 0)) OVER
         |         (ORDER BY per.slice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cum_types
         |FROM per LEFT JOIN nt USING (slice)
         |ORDER BY slice""".stripMargin,

    "q82_winnowing" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |pos AS (SELECT doc_id, i - 1 AS pos,
         |          array_to_string(l[i:i+${WIN_K - 1}], ' ') AS g
         |        FROM t, unnest(range(1, len(l) - ${WIN_K - 2})) AS u(i)
         |        WHERE len(l) >= $WIN_K),
         |packed AS (SELECT doc_id, pos,
         |             (${Sketches.phash60Sql("g")} % $WIN_FP_MOD) * $WIN_POS_MOD + pos AS v
         |           FROM pos),
         |win AS (SELECT doc_id, pos,
         |          MIN(v) OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS BETWEEN CURRENT ROW AND ${WIN_W - 1} FOLLOWING) AS m,
         |          COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS BETWEEN CURRENT ROW AND ${WIN_W - 1} FOLLOWING) AS wn
         |        FROM packed),
         |sel AS (SELECT DISTINCT doc_id, m // $WIN_POS_MOD AS fp
         |        FROM win WHERE wn = $WIN_W),
         |f AS (SELECT fp, COUNT(*) AS nd FROM sel GROUP BY fp),
         |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
         |        CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_fp
         |      FROM sel JOIN f USING (fp) GROUP BY doc_id),
         |c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM pos GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(c.n_grams, 0) AS n_grams,
         |       COALESCE(d.n_fp, 0) AS n_fp,
         |       COALESCE(d.n_shared_fp, 0) AS n_shared_fp
         |FROM t LEFT JOIN c USING (doc_id) LEFT JOIN d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q81_mixture_plan" ->
      s"""WITH per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |      FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs, n_tokens,
         |        CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS w
         |      FROM per),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
         |q AS (SELECT lang, n_docs, n_tokens,
         |        ($MIX_BUDGET_TOKENS * w) // tw AS target_tokens
         |      FROM w, t)
         |SELECT lang, n_docs, n_tokens, target_tokens,
         |       (target_tokens * 1000000) // n_tokens AS rate_x1e6,
         |       (target_tokens + n_tokens - 1) // n_tokens AS epochs
         |FROM q ORDER BY lang""".stripMargin,

    // q120 twin: the q81 plan chain extended with the per-doc hash rule.
    "q120_mixture_materialize" ->
      s"""WITH per AS (SELECT lang,
         |        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS lang_tokens
         |      FROM documents GROUP BY lang),
         |w AS (SELECT lang, lang_tokens,
         |        CAST(FLOOR(sqrt(CAST(lang_tokens AS DOUBLE)) * 1000) AS BIGINT) AS w
         |      FROM per),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
         |plan AS (SELECT lang, lang_tokens,
         |           ($MIX_BUDGET_TOKENS * w) // tw AS target_tokens
         |         FROM w, t),
         |p2 AS (SELECT lang, lang_tokens,
         |         target_tokens // lang_tokens AS full_epochs,
         |         ((target_tokens - (target_tokens // lang_tokens) * lang_tokens)
         |           * 1000000) // lang_tokens AS rem_rate_x1e6
         |       FROM plan),
         |d AS (SELECT doc_id, lang,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |        ${Sketches.phash60Sql("'mx42|' || CAST(doc_id AS VARCHAR)")} % 1000000 AS h
         |      FROM documents)
         |SELECT doc_id, d.lang, n_tokens,
         |       full_epochs + CASE WHEN h < rem_rate_x1e6 THEN 1 ELSE 0 END AS n_copies
         |FROM d JOIN p2 ON d.lang = p2.lang
         |WHERE full_epochs + CASE WHEN h < rem_rate_x1e6 THEN 1 ELSE 0 END > 0
         |ORDER BY doc_id""".stripMargin,

    "q77_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |bg AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
        |       FROM toks, unnest(range(1, len(l))) AS t(i)
        |       WHERE len(l) >= 2),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
        |uc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS nv
        |      FROM (SELECT unnest(l) AS t FROM toks)),
        |m AS (SELECT w1, w2,
        |        CAST(FLOOR((ln(CAST(c12 + 1 AS DOUBLE)) - ln(CAST(c1 + nv AS DOUBLE))) * 1000000
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lp
        |      FROM bc JOIN uc USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(FLOOR(CAST(CAST(SUM(lp) AS BIGINT) AS DOUBLE) / COUNT(*)
        |         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS avg_lp_x1e6
        |FROM bg JOIN m USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q121 twin: per-term integer rounding then BIGINT sums — no float
    // ever sums in engine order.
    "q121_source_kl" ->
      """WITH tok AS (SELECT COALESCE(source, '') AS source,
        |             unnest(string_split(text, ' ')) AS t FROM documents),
        |st AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c_st
        |       FROM tok GROUP BY 1, 2),
        |srct AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s
        |         FROM st GROUP BY 1),
        |v AS (SELECT t, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM v),
        |terms AS (SELECT st.source, n_s,
        |    c_st * CAST(FLOOR((ln(CAST(c_st AS DOUBLE)) + ln(CAST(n AS DOUBLE))
        |      - ln(CAST(n_s AS DOUBLE)) - ln(CAST(c_t AS DOUBLE))) * 1000000
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS term
        |  FROM st JOIN v USING (t) JOIN srct USING (source), tot)
        |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
        |       GREATEST(CAST(SUM(term) AS BIGINT), 0) // MAX(n_s) AS kl_x1e6
        |FROM terms GROUP BY source
        |ORDER BY source""".stripMargin,

    // q116 twin: identical ln-expression term order (float addition is
    // non-associative; both engines must evaluate the same tree).
    "q116_pmi_bigrams" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS l FROM documents),
        |bg AS (SELECT l[i] AS w1, l[i+1] AS w2
        |       FROM tok, unnest(range(1, len(l))) AS t(i)
        |       WHERE len(l) >= 2),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM (SELECT unnest(l) AS w FROM tok) GROUP BY w),
        |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni),
        |nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM bc)
        |SELECT bc.w1, bc.w2, bc.c12,
        |       CAST(FLOOR((ln(CAST(c12 AS DOUBLE)) - ln(CAST(nb AS DOUBLE))
        |         - ln(CAST(u1.c AS DOUBLE)) - ln(CAST(u2.c AS DOUBLE))
        |         + 2.0 * ln(CAST(nu AS DOUBLE))) * 1000000
        |         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS pmi_x1e6
        |FROM bc JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w, nu, nb
        |WHERE c12 >= 5
        |ORDER BY pmi_x1e6 DESC, w1, w2
        |LIMIT 100""".stripMargin,

    "q60_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM v),
        |s AS (SELECT tok,
        |        CAST(FLOOR((ln(CAST(c AS DOUBLE)) - ln(CAST(n_total AS DOUBLE))) * 1000000
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lp
        |      FROM v, t),
        |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |        CAST(SUM(lp) AS BIGINT) AS slp
        |      FROM tok JOIN s USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |       CAST(FLOOR(CAST(slp AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT) AS avg_lp_x1e6
        |FROM d ORDER BY doc_id""".stripMargin,

    "q56_domain_mix" ->
      s"""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_corpus,
         |        CAST(FLOOR(sqrt(CAST(n_corpus AS DOUBLE)) * 1000) AS BIGINT) AS w
         |      FROM c),
         |q AS (SELECT lang, n_corpus,
         |        LEAST(n_corpus, (200 * w) // (SELECT CAST(SUM(w) AS BIGINT) FROM w)) AS quota
         |      FROM w),
         |r AS (SELECT lang, doc_id,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY ${Sketches.phash60Sql("doc_id")}, doc_id) AS rnk
         |      FROM documents)
         |SELECT q.lang, q.n_corpus, q.quota,
         |       CAST(COUNT(*) AS BIGINT) AS n_sampled,
         |       CAST(SUM(r.doc_id) AS BIGINT) AS sum_sampled_ids
         |FROM r JOIN q ON r.lang = q.lang AND r.rnk <= q.quota
         |GROUP BY q.lang, q.n_corpus, q.quota
         |ORDER BY q.lang""".stripMargin,
    "q19_token_top10" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT lang, token, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rank FROM tf)
        |SELECT lang, token, cnt, rank FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

    "q25_langid" ->
      """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT lang, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
        |prof AS (SELECT lang AS p_lang, tok FROM (
        |    SELECT lang, tok, row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rn FROM tf)
        |    WHERE rn <= 10),
        |dt AS (SELECT doc_id, tok, COUNT(*) AS dc FROM t GROUP BY 1, 2),
        |score AS (SELECT doc_id, p_lang, SUM(dc) AS s FROM dt JOIN prof USING (tok) GROUP BY 1, 2),
        |best AS (SELECT doc_id, p_lang FROM (
        |    SELECT doc_id, p_lang, row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, p_lang) AS rn FROM score)
        |    WHERE rn = 1)
        |SELECT d.doc_id, d.lang, COALESCE(b.p_lang, 'unknown') AS pred_lang
        |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q26_quality" ->
      s"""SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
         |    CAST(FLOOR(CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000.0
         |      / len(string_split(text, ' ')) + 0.5) AS BIGINT) AS ttr_x1e3,
         |    CAST(FLOOR(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) * 1000.0
         |      / len(string_split(text, ' ')) + 0.5) AS BIGINT) AS stop_x1e3,
         |    $QUALITY_SQL AS quality_x1e3
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "q27_token_stats" ->
      """SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |    CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars_text,
        |    n_chars,
        |    CAST(FLOOR(length(replace(text, ' ', '')) * 100.0 / len(string_split(text, ' ')) + 0.5) AS BIGINT) AS avg_tok_len_x100
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q42_stratified_sample" ->
      s"""SELECT lang, doc_id, rnk FROM (
         |  SELECT lang, doc_id, CAST(row_number() OVER
         |    (PARTITION BY lang ORDER BY ${Sketches.phash60Sql("doc_id")}, doc_id) AS INT) AS rnk
         |  FROM documents)
         |WHERE rnk <= 20
         |ORDER BY lang, rnk""".stripMargin,

    "q48_split_assign" ->
      s"""SELECT CASE WHEN ${Sketches.phash60Sql("doc_id")} % 100 < 90 THEN 'train'
         |            WHEN ${Sketches.phash60Sql("doc_id")} % 100 < 95 THEN 'val'
         |            ELSE 'test' END AS split,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |FROM documents
         |GROUP BY 1
         |ORDER BY split""".stripMargin,

    "q43_redaction" ->
      """SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\bcustomer\b|\d\d\d+')) AS BIGINT) AS n_sensitive,
        |    CAST(length(text) AS BIGINT) AS len_before,
        |    CAST(length(regexp_replace(text, '\bcustomer\b|\d\d\d+', '[REDACTED]', 'g')) AS BIGINT) AS len_after
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q28_fingerprint" ->
      s"""SELECT doc_id,
         |    ${rollingFpSql("string_split(text, ' ')")} AS fingerprint
         |FROM documents
         |ORDER BY doc_id""".stripMargin
  )
}
