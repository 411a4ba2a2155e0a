package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Semantic checks for the data-prep transforms (q46/q47) beyond the
  * DuckDB oracle: quantization must actually bound reconstruction error,
  * and chunking must actually tile the documents.
  */
class PrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  test("q46: int8 codes stay in range and reconstruct within half a step") {
    val emb = Tables.embeddings(spark, D)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble)).toMap
    val rows = Prep.queries("q46_quantize_embeddings")(spark, D).collect()
    assert(rows.length == emb.size)
    rows.foreach { r =>
      val (id, scaleX, qSum) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (qMin, qMax) = (r.getLong(3), r.getLong(4))
      assert(qMin >= -127 && qMax <= 127, s"vec $id codes out of range")
      val xs = emb(id)
      val scale = 127.0 / xs.map(math.abs).max
      assert(scaleX == math.floor(scale * 1e6 + 0.5).toLong, s"vec $id scale")
      // per-element |x - q/scale| <= 0.5/scale => the code sum reconstructs
      // the value sum within n/2 quantization steps
      val err = math.abs(qSum / scale - xs.sum)
      assert(err <= xs.length * 0.5 / scale + 1e-9,
        s"vec $id reconstruction error $err")
    }
  }

  test("q47: chunks tile every document at stride 32 with 64-token windows") {
    val lens = Tables.documents(spark, D)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Prep.queries("q47_chunk_documents")(spark, D)
      .collect().groupBy(_.getLong(0))
    assert(chunks.keySet == lens.keySet, "every doc must chunk")
    chunks.foreach { case (doc, cs) =>
      val n = lens(doc)
      val expected = (n - 1) / 32 + 1
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks, want $expected")
      cs.sortBy(_.getInt(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i)
        assert(r.getLong(2) == i * 32L + 1, s"doc $doc chunk $i start")
        assert(r.getLong(3) == math.min(64, n - i * 32).toLong,
          s"doc $doc chunk $i length")
      }
    }
  }

  test("q53: packing equals the sequential prefix-sum semantics") {
    import graft.operators.Sketches
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, D)
    // driver-side sequential re-derivation in the same canonical order
    val ordered = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"),
        Sketches.phash60(col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var cum = 0L
    val expected = ordered.zipWithIndex.map { case ((id, n, _), i) =>
      val row = (id, i.toLong, n, cum / 256L, cum % 256L)
      cum += n
      row
    }
    val got = Prep.queries("q53_pack_sequences")(spark, TestSpark.SF0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected.toSeq,
      "two-pass distributed packing must equal the sequential fold")
    assert(got.map(_._4).distinct.length > 1, "fixture should span several bins")
    got.foreach { case (id, _, _, _, off) =>
      assert(off >= 0 && off < 256, s"doc $id off_in_bin out of range")
    }
  }

  test("q47: a single-chunk document's fingerprint equals its q28 fingerprint") {
    val fps = graft.operators.TextAnalysis.queries("q28_fingerprint")(spark, D)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val short = Tables.documents(spark, D)
      .filter(size(split(col("text"), " ")) <= 64)
      .select("doc_id").collect().map(_.getLong(0))
    assert(short.nonEmpty, "fixture should contain <=64-token docs")
    val chunk0 = Prep.queries("q47_chunk_documents")(spark, D)
      .filter(col("chunk_idx") === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    short.foreach { doc =>
      assert(chunk0(doc) == fps(doc), s"doc $doc chunk-0 fp != q28 fp")
    }
  }

  test("q85: snapshot diff reports exactly the planted adds/removes/" +
    "changes and nothing for identical docs") {
    import spark.implicits._
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"),
      (5L, "epsilon")).toDF("doc_id", "text")
    val got = Prep.snapshotDiff(a, b)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("q91: engagement aggregates planted events exactly and weights " +
    "sum to ~1e6 over the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val events = Seq(
      (10L, 100L, "click", 2.50, """{"k": 1}"""),
      (11L, 100L, "click", 1.50, """{"k": 1}"""),
      (12L, 200L, "view", 6.00, """{"k": 2}"""),
      (13L, 300L, "view", 1.00, null.asInstanceOf[String]), // no k: dropped
      (14L, 400L, "click", 9.99, """{"k": 77}""")           // k outside corpus
    ).toDF("event_id", "user_id", "event_type", "value", "props")
    val got = Prep.engagementWeights(events, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 2 events, 1 user, 400 cents; doc 2: 1 event, 1 user, 600
    // cents; doc 3: nothing. total over the CORPUS join = 1000 cents.
    assert(got === Map(
      1L -> (2L, 1L, 400L, 400000L),
      2L -> (1L, 1L, 600L, 600000L),
      3L -> (0L, 0L, 0L, 0L)))
    val weights = Prep.engagementWeights(
      Tables.events(spark, D), Tables.documents(spark, D))
      .agg(org.apache.spark.sql.functions.sum("weight_x1e6"))
      .collect()(0).getLong(0)
    assert(weights > 990000L && weights < 1010000L,
      s"weights must sum to ~1e6 (rounding slack): $weights")
  }

  test("q92: an unchanged doc scores 0 novelty, a fully new doc 1000, " +
    "a revision in between") {
    import spark.implicits._
    val a = Seq(
      (1L, "one two three four five"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val b = Seq(
      (1L, "one two three four five"),            // unchanged -> 0
      (2L, "alpha beta gamma delta EXTRA"),        // one new trigram window
      (3L, "wholly novel text never seen before")) // all new -> 1000
      .toDF("doc_id", "text")
    val got = Prep.ngramNovelty(a, b)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got(1L) === ((3L, 0L)))
    assert(got(3L)._2 === 1000L)
    // doc 2 gained "gamma delta EXTRA" and "beta gamma delta" stays: 1 of
    // 3 shingles is novel (the new last window)
    assert(got(2L) === ((3L, 333L)), s"got ${got(2L)}")
  }

  test("q93: the shuffle is deterministic, seed-sensitive, and positions " +
    "tile each shard contiguously") {
    val docs = Tables.documents(spark, D)
    def rows(seed: String) = Prep.globalShuffle(docs, seed = seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val r1 = rows("s42")
    assert(r1 === rows("s42"), "same seed must reproduce the order exactly")
    val r2 = rows("other-epoch")
    assert(r1 !== r2, "a different seed must produce a different order")
    assert(r1.map(_._3).toSet === r2.map(_._3).toSet,
      "every doc appears exactly once under any seed")
    // per shard: positions are 1..n with no gaps
    r1.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted === (1L to rs.length).toSeq,
        s"shard $shard positions must tile 1..n")
    }
  }

  test("q85: the synthetic snapshot exercises every status and the diff " +
    "is layout-invariant") {
    val docs = Tables.documents(spark, D)
    val diff = Prep.snapshotDiff(docs, Prep.syntheticNextSnapshot(docs))
    val rows = diff.collect()
    val byStatus = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byStatus.keySet === Set("added", "removed", "changed"), byStatus)
    val shuffled = Prep.snapshotDiff(docs.repartition(11),
        Prep.syntheticNextSnapshot(docs.repartition(7)))
      .collect().map(_.toSeq).toSeq
    assert(shuffled === rows.map(_.toSeq).toSeq)
  }

  test("q94: bloom crawl dedup equals the plain anti-join on the fixture") {
    val docs = Tables.documents(spark, D)
    val crawl = Prep.syntheticNextSnapshot(docs)
    val got = Prep.crawlDedupBloom(docs, crawl)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = crawl
      .join(docs.select("text").distinct(), Seq("text"), "left_anti")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    assert(got === expected)
    assert(got.nonEmpty, "revised docs must survive as new text")
  }

  test("q94: exact copies are dropped, revisions and novel docs survive") {
    import spark.implicits._
    val hist = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val crawl = Seq(
      (10L, "a b c d"),     // exact copy of history -> dropped
      (11L, "e f g h rev"), // revision -> kept
      (12L, "x y z")        // novel -> kept
    ).toDF("doc_id", "text")
    val got = Prep.crawlDedupBloom(hist, crawl)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((11L, 5L), (12L, 3L)))
  }

  test("q103: heavy weights dominate, doubling a weight only improves its " +
    "priority, and the sample is layout-invariant") {
    import spark.implicits._
    def corpus(wOf: Long => Long) = (1L to 50L)
      .map(i => (i, "txt", "en", "src", wOf(i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // one planted heavyweight: priority = h DIV 1e9 ~ 0-ish, always wins
    val heavy = corpus(i => if (i == 17L) 1000000000L else 50L)
    val top = Prep.weightedSample(heavy, k = 5).collect()
    assert(top.map(_.getLong(0)).contains(17L), "1e9-weight doc must be sampled")
    // monotonicity: doubling doc 3's weight cannot worsen its priority
    val p1 = Prep.weightedSample(corpus(_ => 50L), k = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p2 = Prep.weightedSample(corpus(i => if (i == 3L) 100L else 50L), k = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(p2(3L) <= p1(3L), "doubled weight must not raise the priority key")
    assert((1L to 50L).filter(_ != 3L).forall(i => p1(i) == p2(i)))
    // layout invariance on the fixture + weights actually matter there
    val a = Prep.weightedSample(Tables.documents(spark, D)).collect().toSeq
    val b = Prep.weightedSample(Tables.documents(spark, D).repartition(7))
      .collect().toSeq
    assert(a === b, "repartition must not change the sample")
    val unweighted = Prep.weightedSample(
      Tables.documents(spark, D).withColumn("n_chars", lit(1L))).collect()
      .map(_.getLong(0)).toSet
    assert(a.map(_.getLong(0)).toSet != unweighted,
      "the weighted sample must differ from plain hash order on the fixture")
  }

  test("q104: power-of-two bucket boundaries and exact waste accounting") {
    import spark.implicits._
    val docs = Seq(1, 2, 3, 4, 5, 8, 9, 64, 65).zipWithIndex.map {
      case (n, i) => (i.toLong, (1 to n).map(t => s"w$t").mkString(" "),
        "en", "src", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Prep.lengthBuckets(docs, batchSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // buckets: 1->1; 2->2; 3,4->4; 5,8->8; 9->16; 64->64; 65->128
    assert(rows.keySet === Set(1L, 2L, 4L, 8L, 16L, 64L, 128L))
    assert(rows(4L)._1 === 2L && rows(4L)._2 === 7L, "n=3,4 share bucket 4")
    assert(rows(8L)._1 === 2L && rows(8L)._2 === 13L, "n=5,8 share bucket 8")
    // waste for bucket 4: padded 8, tokens 7 -> 1000/8 = 125
    assert(rows(4L)._4 === 8L && rows(4L)._5 === 125L)
    // batch count at size 2: 2 docs -> 1 batch; singletons -> 1
    assert(rows(4L)._3 === 1L && rows(128L)._3 === 1L)
    // zero waste when every doc exactly fills its bucket
    assert(rows(1L)._5 === 0L && rows(2L)._5 === 0L && rows(64L)._5 === 0L)
  }

  test("q111: routed source cap equals the naive single-window plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    // mixed corpus: one over-cap source (30 docs), one exactly-at-cap (20),
    // one under-cap (5) -- both routing branches populated in one run
    val docs = ((1 to 30).map(i => (i.toLong, "big")) ++
        (31 to 50).map(i => (i.toLong, "edge")) ++
        (51 to 55).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val routed = Prep.sourceCap(docs, cap = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // naive reference: every row through one window, rank filter
    val h = Sketches.phash60(concat(lit("sc42|"), col("doc_id").cast("string")))
    val w = Window.partitionBy("source").orderBy(h, col("doc_id"))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
    val naive = docs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .join(counts, Seq("source"))
      .select(col("doc_id"), col("source"), col("n_source"),
        when(col("n_source") > 20, lit(1L)).otherwise(lit(0L)).as("capped"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(routed.toSet == naive.toSet, "routed plan must equal the naive window plan")
    // per-source keeps: min(n, cap); at- and under-cap sources keep everything
    val bySrc = routed.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("big" -> 20, "edge" -> 20, "small" -> 5))
    assert(routed.filter(_._2 == "big").forall(_._4 == 1L))
    assert(routed.filter(_._2 != "big").forall(_._4 == 0L))
    // layout invariance: the keep-set is a pure function of (seed, doc_id)
    val re = Prep.sourceCap(docs.repartition(7), cap = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(re.toSet == routed.toSet)
  }

  test("q111: NULL-source docs form one capped pseudo-domain, never vanish") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // 30 sourceless docs (over cap) + a normal under-cap source
    val docs = ((1 to 30).map(i => (i.toLong, null: String)) ++
        (31 to 35).map(i => (i.toLong, "web")))
      .toDF("doc_id", "source")
    val out = Prep.sourceCap(docs, cap = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nullDomain = out.filter(_._2 == "")
    assert(nullDomain.length === 20, "null domain must be capped, not dropped")
    assert(nullDomain.forall(r => r._3 == 30L && r._4 == 1L))
    assert(out.count(_._2 == "web") === 5)
  }
}
