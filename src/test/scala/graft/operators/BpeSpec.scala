package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The distributed BPE trainer must reproduce the sequential reference
  * algorithm merge-for-merge — including greedy non-overlapping rewrites
  * inside runs ("a a a" merges once), the case the window-algebra
  * formulation exists for.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Sequential reference: overlapping pair counts, (count desc, pair asc)
    * selection, left-to-right non-overlapping merge.
    */
  private def refTrain(words: Map[String, Long], k: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab = words.map { case (w, c) => w -> (w.map(_.toString).toList, c) }
    (1 to k).flatMap { it =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) None
      else {
        val best = counts.values.max
        val (a, b) = counts.collect { case (p, n) if n == best => p }.toSeq.min
        vocab = vocab.map { case (w, (syms, c)) =>
          val out = collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.toList, c)
        }
        Some((it.toLong, a, b, a + b, best))
      }
    }
  }

  private def trainOn(words: Map[String, Long], k: Int) = {
    import spark.implicits._
    val text = words.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .mkString(" ")
    Bpe.trainBpe(Seq(text).toDF("text"), k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
  }

  test("classic corpus: merge-for-merge equality with the reference") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(trainOn(words, 5) === refTrain(words, 5))
  }

  test("run-heavy corpus: greedy non-overlap inside aaaa runs") {
    // (a,a) counts overlaps (aaaa -> 3) but merges non-overlapping (one
    // 'aa aa'); subsequent iterations then see the merged symbols
    val words = Map("aaaa" -> 3L, "aaa" -> 2L, "baaab" -> 4L)
    assert(trainOn(words, 3) === refTrain(words, 3))
  }

  test("applyMerges encodes new words with the trained segmentation") {
    import spark.implicits._
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = refTrain(words, 5).map(m => (m._2, m._3))
    val enc = Bpe.applyMerges(Seq("lowest", "low").toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    // merges learned: es, est, lo, low, ew -> "lowest" = [low, est]
    assert(enc("lowest") === List("low", "est"))
    assert(enc("low") === List("low"))
  }

  test("applyMerge plan: the island window reuses the word exchange") {
    import spark.implicits._
    val v = Bpe.vocab(Seq("aab aab abab low lower").toDF("text"))
    val merged = Bpe.applyMerge(v, "a", "b")
    merged.write.format("noop").mode("overwrite").save()
    val plan = merged.queryExecution.executedPlan.toString
    // expected exchanges: vocab groupBy(w) + the w-partitioned window
    // stage; the (w, grp) island window and the rebuild groupBy(w, cnt)
    // must be satisfied by hash(w) colocation, not new shuffles
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n <= 2, s"per-iteration rewrite should shuffle twice, got $n:\n$plan")
  }

  test("q65 runs on the fixture corpus and yields N_MERGES ordered merges") {
    val out = Bpe.queries("q65_bpe_merges")(spark, TestSpark.SF0001)
      .collect()
    assert(out.length === Bpe.N_MERGES)
    assert(out.map(_.getLong(0)).toSeq === (1L to Bpe.N_MERGES))
    // each merged symbol is the concatenation of its parts
    out.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
  }

  test("q97: encoded token mass conserves characters and reflects the merges") {
    import spark.implicits._
    val docs = Seq("low low low low low lower lower newest newest newest " +
      "newest newest newest widest widest widest").toDF("text")
    val merges = Bpe.trainBpe(docs).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val stats = Bpe.encodeCorpusStats(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // character mass is invariant under merging: sum(len(token) * n_occ)
    // must equal the total non-space characters of the corpus
    val charMass = stats.map { case (t, n) => t.length * n }.sum
    val expected = docs.collect().map(_.getString(0).replace(" ", "").length).sum
    assert(charMass === expected, s"char mass $charMass != $expected")
    // every trained merged symbol appears in the encoded vocabulary (it
    // won its iteration, so some word still contains it or a successor;
    // with 3 merges over this corpus the final merge survives verbatim)
    val lastMerged = merges.last._3
    assert(stats.contains(lastMerged),
      s"final merged symbol $lastMerged missing from ${stats.keySet}")
    // driver-side cross-check: re-encode with applyMerges and re-count
    val enc = Bpe.applyMerges(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt")),
      merges.map(m => (m._1, m._2)).toSeq)
      .collect()
      .flatMap(r => r.getSeq[String](2).map(_ -> r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(stats === enc)
  }
}
