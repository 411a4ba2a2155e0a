package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Connected-components equivalence: the large-star/small-star contraction
  * (the 100 TB path behind nearDupClusters) must produce the SAME labels as
  * plain min-label propagation on every graph shape, while its round count
  * is bounded by O(log n) instead of the graph diameter.
  */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelsOf(pairs: Seq[(Long, Long)],
                       cc: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame, Int))
  : (Set[(Long, Long)], Int) = {
    import spark.implicits._
    val (df, rounds) = cc(pairs.toDF("d1", "d2"))
    (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, rounds)
  }

  private def assertSameLabels(pairs: Seq[(Long, Long)], hint: String): (Int, Int) = {
    val (prop, pr) = labelsOf(pairs, Dedup.ccPropagate)
    // force the DISTRIBUTED alternation (gate -1) so its labels stay
    // pinned, then pin the driver union-find fast path against it
    val (star, sr) = labelsOf(pairs, Dedup.ccStarContract(_, -1L))
    assert(star == prop, s"$hint: star-contraction labels diverge from propagation")
    val (local, lr) = labelsOf(pairs, Dedup.ccStarContract(_, Long.MaxValue))
    assert(local == prop, s"$hint: local union-find labels diverge from propagation")
    assert(lr === 0, s"$hint: forced-local path must not iterate")
    (pr, sr)
  }

  test("empty graph: both algorithms return no labels") {
    assertSameLabels(Seq.empty, "empty")
  }

  test("single pair and a two-pair chain") {
    assertSameLabels(Seq((2L, 1L)), "pair")
    assertSameLabels(Seq((1L, 2L), (2L, 3L)), "chain-3")
  }

  test("clique, star, and two disjoint components") {
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assertSameLabels(clique, "clique-5")
    assertSameLabels((2L to 8L).map(i => (1L, i)), "star-8")
    assertSameLabels(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)), "two-components")
  }

  test("seeded random graphs: labels identical across algorithms") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter(p => p._1 != p._2)
      assertSameLabels(pairs, s"random-$n")
    }
  }

  test("planted long chain: star-contraction needs far fewer rounds than propagation") {
    // a 48-node path: min-label propagation moves the minimum one hop per
    // iteration (diameter-bound); the contraction halves path lengths each
    // alternation (log-bound). Descending ids make it adversarial for the
    // min's travel direction.
    val chain = (1L until 48L).map(i => (48L - i, 48L - i + 1))
    val (propRounds, starRounds) = assertSameLabels(chain, "chain-48")
    assert(propRounds > 20,
      s"propagation on a 47-edge path should be diameter-bound, took $propRounds")
    assert(starRounds <= 10,
      s"star contraction should be log-bound, took $starRounds rounds")
    assert(starRounds * 2 < propRounds,
      s"contraction ($starRounds) must beat propagation ($propRounds) decisively")
  }

  test("q86: a planted cross-split near-dup pair is reported; " +
    "driver-side recomputation from q22 pairs + split map agrees") {
    import org.apache.spark.sql.functions._
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    graft.functions.GraftFunctions.register(spark2)
    // find two ids in different splits by evaluating the split hash
    val splits = spark2.range(1, 200)
      .select(col("id"),
        pmod(graft.functions.GraftFunctions.phash60(col("id")), lit(100L))
          .as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = splits.collectFirst { case (i, h) if h < 90 => i }.get
    val testId = splits.collectFirst { case (i, h) if h >= 95 => i }.get
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (trainId, text), (testId, text + " w11"),
      (9999L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsLshVerified(docs, 800)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((math.min(trainId, testId), math.max(trainId, testId))))

    // fixture-scale: q86 output == q22 pairs filtered by differing splits
    val D = graft.TestSpark.SF001
    val pairSplits = Dedup.queries("q22_minhash_lsh")(spark2, D)
      .select("d1", "d2", "jaccard_x1e3").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def splitOf(id: Long): String = {
      val h = spark2.range(id, id + 1)
        .select(pmod(graft.functions.GraftFunctions.phash60(col("id")),
          lit(100L))).collect()(0).getLong(0)
      if (h < 90) "train" else if (h < 95) "val" else "test"
    }
    val expected = pairSplits.collect {
      case (d1, d2, j) if splitOf(d1) != splitOf(d2) => (d1, d2, j)
    }.toSet
    val q86 = Dedup.queries("q86_split_leakage")(spark2, D)
      .select("d1", "d2", "jaccard_x1e3").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q86 === expected)
    assert(q86.nonEmpty, "fixture must exercise at least one leak")
  }

  test("q87: an embedded excerpt is containment-caught and Jaccard-" +
    "missed; symmetric twins are excluded") {
    import org.apache.spark.sql.functions._
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (1 to 12).map(i => s"w$i").mkString(" ")   // prefix excerpt
    val docs = Seq(
      (1L, big), (2L, quote),                 // asymmetric inclusion
      (3L, big + " tail"), (4L, big + " fin") // symmetric near-identical
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set((1L, 2L), (2L, 3L), (2L, 4L)),
      s"excerpt must pair with each containing doc and nothing else: $got")
    val (jac, cont) = got((1L, 2L))
    assert(cont === 1000L, s"full inclusion must score containment 1.0: $got")
    assert(jac < 800L, s"the same pair must sit below the Jaccard gate: $got")
    // the symmetric near-identical pair (3,4) is high-Jaccard — excluded
    assert(!got.contains((3L, 4L)))
  }

  test("q87: prefix-filtered candidates lose NOTHING vs the brute-force " +
    "shingle self-join on the fixture corpus") {
    // the scale rewrite (rarest-first prefix filter) must be output-equal
    // to the all-pairs reference — the prefix filter is exact by theorem,
    // this pins the implementation to it on real data incl. planted excerpts
    import org.apache.spark.sql.functions._
    val spark2 = graft.TestSpark.spark
    val docs = Dedup.withPlantedExcerpts(
      graft.sources.Tables.documents(spark2, graft.TestSpark.SF0001))
    val fast = Dedup.containmentPairs(docs, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute-force reference: full inverted self-join, same scoring tail
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - 3), i =>
          concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3))))).as("shingle"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("nboth"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jac = floor(col("nboth") * lit(1000.0) /
      (col("c1.n") + col("c2.n") - col("nboth")) + lit(0.5)).cast("long")
    val cont = floor(col("nboth") * lit(1000.0) /
      least(col("c1.n"), col("c2.n")) + lit(0.5)).cast("long")
    val brute = inter
      .join(cnt.as("c1"), col("d1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("d2") === col("c2.doc_id"))
      .select(col("d1"), col("d2"), jac.as("jaccard_x1e3"),
        cont.as("containment_x1e3"))
      .filter(col("containment_x1e3") >= 900 && col("jaccard_x1e3") < 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fast === brute,
      s"prefix-filtered output diverged: missing=${brute -- fast} extra=${fast -- brute}")
    assert(brute.nonEmpty, "fixture must exercise at least one containment pair")
  }

  test("q87: a corpus-hot shingle generates ZERO candidates (the df^2 " +
    "explosion the prefix filter exists to kill), true containment still found") {
    import org.apache.spark.sql.functions._
    val spark2 = TestSpark.spark
    import spark2.implicits._
    // 200 docs all sharing the trigram "hot hot hot" + 10 unique tokens
    // each; a full inverted self-join would emit C(200,2) = 19900 candidate
    // rows from the hot shingle alone. Rarest-first prefixes never admit a
    // df=200 shingle, so those pairs must not materialize.
    val base = (1 to 200).map { i =>
      (i.toLong, "hot hot hot " + (1 to 10).map(j => s"u${i}x$j").mkString(" "))
    }
    // planted true containment: a 7-token prefix excerpt of doc 1
    val excerpt = (1000L, "hot hot hot u1x1 u1x2 u1x3 u1x4")
    val docs = (base :+ excerpt).toDF("doc_id", "text")
    val sh = Dedup.hashedShingles(docs)
    val cand = Dedup.containmentCandidates(sh, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 1000L)),
      s"the true containment pair must survive pruning: $cand")
    assert(cand.size <= 5,
      s"hot-shingle pairs must be pruned (got ${cand.size} candidates; " +
        "a full self-join would emit 19900)")
    val got = Dedup.containmentPairs(docs, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.keySet === Set((1L, 1000L)) && got((1L, 1000L)) === 1000L,
      s"only the planted inclusion qualifies, at containment 1.0: $got")
  }

  test("q89: containment-aware repair closes the quote-in-document leak " +
    "q88's Jaccard-only components miss") {
    import org.apache.spark.sql.functions._
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def splitOf(id: Long): String = {
      val h = spark2.range(id, id + 1)
        .select(pmod(graft.functions.GraftFunctions.phash60(col("id")),
          lit(100L))).collect()(0).getLong(0)
      if (h < 90) "train" else if (h < 95) "val" else "test"
    }
    // deterministic straddle: first source id whose planted-excerpt id
    // (id + 2e6, the withPlantedExcerpts convention) hashes to a DIFFERENT
    // split — guaranteed to exist in the scan range, fixed by the hash
    val src = (1L to 500L).find(a => splitOf(a) != splitOf(a + 2000000L)).get
    val exc = src + 2000000L
    val big = (1 to 60).map(i => s"t$i").mkString(" ")
    val quote = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq((src, big), (exc, quote)).toDF("doc_id", "text")
    // q88: J = 10/58 ~ 0.17 < 0.8 — no edge, the pair keeps its straddle
    val q88 = Dedup.leakFreeSplit(docs, 800)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q88.size == 2 && q88.values.forall(_ == 1L),
      s"Jaccard-only repair must leave the quote pair straddling two splits: $q88")
    // q89: the containment edge merges them onto the source's split
    val q89 = Dedup.leakFreeSplitContainment(docs, cache = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(q89.toSeq == Seq((splitOf(src), 2L, if (splitOf(exc) == splitOf(src)) 0L else 1L)),
      s"containment-aware repair must co-locate quote and source: ${q89.toSeq}")
  }

  test("q89: zero straddling edges on the fixture corpus with planted excerpts") {
    import org.apache.spark.sql.functions._
    val spark2 = TestSpark.spark
    val docs = Dedup.withPlantedExcerpts(
      graft.sources.Tables.documents(spark2, TestSpark.SF0001))
    val edges = Dedup.jaccardPairsLshVerified(docs, 800, cache = false)
      .select("d1", "d2")
      .unionAll(Dedup.containmentPairs(docs, cache = false).select("d1", "d2"))
      .distinct()
    val (comps, _) = Dedup.ccStarContract(edges)
    graft.functions.GraftFunctions.register(spark2)
    def splitCol(c: org.apache.spark.sql.Column) = {
      val h = pmod(graft.functions.GraftFunctions.phash60(c), lit(100L))
      when(h < 90, "train").when(h < 95, "val").otherwise("test")
    }
    val assigned = docs.select("doc_id")
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        splitCol(coalesce(col("cluster_id"), col("doc_id"))).as("split"))
    val straddles = edges
      .join(assigned.as("s1"), col("d1") === col("s1.doc_id"))
      .join(assigned.as("s2"), col("d2") === col("s2.doc_id"))
      .filter(col("s1.split") =!= col("s2.split"))
      .count()
    assert(straddles == 0L,
      s"containment-aware assignment must leave no near-dup or containment edge straddling splits")
    assert(edges.count() > 0, "fixture must exercise at least one edge")
  }

  test("prefix length is the EXACT n - ceil(tEff*n) + 1 at a double-rounding " +
    "boundary (contMin=613, n=80: float math yields 31, the theorem needs 32)") {
    import org.apache.spark.sql.functions._
    val spark2 = TestSpark.spark
    import spark2.implicits._
    // adversarial boundary: two docs, 80 distinct shingles each, exactly 49
    // shared. containment = round(49*1000/80) = round(612.5) = 613 — right AT
    // the threshold. Misses per doc = 31, so the exact prefix-filter length
    // is 32; floor((1 - (613-0.5)/1000)*80)+1 computed in doubles gives 31
    // because 0.3875 isn't representable, and with the 31 df=1 unique
    // shingles sorting rarest-first BOTH prefixes would then hold only
    // non-shared shingles — the qualifying pair would silently vanish.
    val shared = (1L to 49L).map(s => Seq((1L, s), (2L, s))).flatten
    val uniq = (1L to 31L).flatMap(u => Seq((1L, 1000L + u), (2L, 2000L + u)))
    val sh = (shared ++ uniq).toDF("doc_id", "shingle")
    val pref = Dedup.rarestPrefix(sh, 613)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert(pref(1L).size == 32 && pref(2L).size == 32,
      s"prefix must be 32 shingles (31 misses + 1): ${pref.view.mapValues(_.size).toMap}")
    assert(pref(1L).exists(_ <= 49L) && pref(2L).exists(_ <= 49L),
      "each 32-element prefix must reach at least one shared shingle")
    val got = Dedup.containmentPairsFromHashed(sh, 613, 800, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 613L)),
      s"the rounding-boundary pair must be found at exactly containment 613: ${got.toSeq}")
  }

  test("q95: the canonical keeper is the (quality DESC, doc_id ASC) argmax " +
    "of every cluster, and singletons never appear") {
    val spark = TestSpark.spark
    import spark.implicits._
    // two near-dup clusters (trigram Jaccard >= 0.8) + one unpaired doc
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today extra"),
      (3L, "completely unrelated standalone document with its own words"),
      (4L, "pack my box with five dozen liquor jugs promptly now"),
      (5L, "pack my box with five dozen liquor jugs promptly now indeed")
    ).toDF("doc_id", "text")
    val labels = Dedup.nearDupClusters(docs, 800, cache = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.map(_._2).distinct.length == 2, s"two clusters: ${labels.toSeq}")
    val quality = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        TextAnalysis.qualityCol.as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Dedup.clusterCanonical(docs, 800, cache = false).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    assert(out.keySet == byCluster.keySet, "one output row per cluster")
    byCluster.foreach { case (cid, members) =>
      val bestId = members.map(d => (quality(d), d))
        .sortBy { case (q, d) => (-q, d) }.head._2
      val (keepId, keepQ, n) = out(cid)
      assert(keepId == bestId, s"cluster $cid keeper $keepId, want $bestId")
      assert(keepQ == quality(bestId), s"cluster $cid keeper quality")
      assert(n == members.length.toLong, s"cluster $cid member count")
    }
    assert(!out.values.exists(_._3 < 2L), "no singleton clusters in output")
  }
}

