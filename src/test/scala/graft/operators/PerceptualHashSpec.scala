package graft.operators

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** q73 beyond the oracle: (1) every planted BMP re-encode twin pairs with
  * its PNG original at Hamming 0; (2) aHash survives LOSSY JPEG
  * recompression — the robustness byte-sha dedup lacks, and the one
  * property the SQL oracle cannot replay (JPEG pixels change); (3) the
  * banded join finds exactly the pairs a brute-force Hamming scan finds
  * (pigeonhole completeness at the default threshold).
  */
class PerceptualHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = TestSpark.SF0001

  private def fixtureHashes() = {
    val media = PerceptualHash.synthesizeImages(Tables.documents(spark, D))
    PerceptualHash.imageAHash(spark, media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("every BMP re-encode twin hashes identically to its PNG original") {
    val hashes = fixtureHashes()
    val twins = hashes.keys.filter(_ >= 1000L).toSeq.sorted
    assert(twins.size === 50, "fixture must plant 50 twins")
    twins.foreach { t =>
      assert(hashes(t) === hashes(t - 1000L),
        s"twin $t must hash identically to original ${t - 1000L}")
    }
  }

  test("q73 reports all twin pairs at hamming 0") {
    val got = PerceptualHash.queries("q73_perceptual_neardup")(spark, D)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val twinPairs = got.filter { case (d1, d2, _) => d2 === d1 + 1000L }
    assert(twinPairs.length === 50)
    assert(twinPairs.forall(_._3 == 0), "re-encode twins are hamming 0")
  }

  test("banded join equals a brute-force Hamming scan (pigeonhole " +
    "completeness at threshold 3)") {
    val hashes = fixtureHashes()
    val brute = (for {
      (d1, (lo1, hi1)) <- hashes.toSeq
      (d2, (lo2, hi2)) <- hashes.toSeq
      if d1 < d2
      hd = java.lang.Long.bitCount(lo1 ^ lo2) + java.lang.Long.bitCount(hi1 ^ hi2)
      if hd <= 3
    } yield (d1, d2, hd)).toSet
    val media = PerceptualHash.synthesizeImages(Tables.documents(spark, D))
    val banded = PerceptualHash
      .perceptualNearDup(PerceptualHash.imageAHash(spark, media))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)
  }

  test("aHash survives lossy JPEG recompression within a small Hamming " +
    "distance") {
    // a smooth 64x64 gradient — the content class perceptual hashing is
    // built for; JPEG at default quality perturbs pixels but not block
    // structure
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val p = (x * 2 + y * 2) % 256
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val png = ImageCodec.encodePng(img)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert(!java.util.Arrays.equals(png, jpeg))
    val Some((plo, phi)) = PerceptualHash.aHash64(png)
    val Some((jlo, jhi)) = PerceptualHash.aHash64(jpeg)
    val hd = java.lang.Long.bitCount(plo ^ jlo) + java.lang.Long.bitCount(phi ^ jhi)
    assert(hd <= 6, s"JPEG recompression moved the aHash by $hd bits")
  }

  /** Per-seed frame: a white rectangle on black at a block-aligned,
    * seed-specific position (seeds >= 20 use a 2x-bigger rectangle at
    * offset positions) — structurally distinct content, so pairwise aHash
    * distances are large, and flat regions make the hash JPEG-robust.
    * (A constant-shifted gradient would NOT work: aHash is invariant to
    * uniform brightness shifts by construction.)
    */
  private def jpegOf(seed: Int): Array[Byte] = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    val small = Seq((0, 0), (48, 0), (0, 48), (48, 48), (24, 24), (24, 0))
    val (rx, ry, rs) =
      if (seed < 20) { val (a, b) = small(seed % 6); (a, b, 16) }
      else { val (a, b) = small(seed % 6); ((a + 8) % 32, (b + 16) % 32, 32) }
    for (y <- 0 until 64; x <- 0 until 64) {
      val p = if (x >= rx && x < rx + rs && y >= ry && y < ry + rs) 255 else 0
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("video near-dup: re-mux, frame subset, and recompression all pair; " +
    "disjoint videos never do") {
    import spark.implicits._
    val frames = (0 until 6).map(jpegOf)
    // recompress: decode each frame and JPEG-encode again (new bytes,
    // near-identical pixels)
    val recompressed = frames.map { f =>
      val img = ImageCodec.decode(f).get
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val videos = Seq(
      Multimodal.MediaRecord(1L, "video/avi",
        VideoCodec.synthesize(frames, 64, 64)),
      // re-mux: same JPEG payloads, frames reversed
      Multimodal.MediaRecord(2L, "video/avi",
        VideoCodec.synthesize(frames.reverse, 64, 64)),
      // subset copy: every other frame
      Multimodal.MediaRecord(3L, "video/avi",
        VideoCodec.synthesize(frames.zipWithIndex.collect {
          case (f, i) if i % 2 == 0 => f
        }, 64, 64)),
      // recompressed copy
      Multimodal.MediaRecord(4L, "video/avi",
        VideoCodec.synthesize(recompressed, 64, 64)),
      // disjoint content
      Multimodal.MediaRecord(5L, "video/avi",
        VideoCodec.synthesize((20 until 26).map(jpegOf), 64, 64)))
    val media = spark.createDataset(videos).toDF()
    val got = PerceptualHash.videoNearDup(spark, media, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 1<->2 re-mux: all 6 frames match, both sides report 6 frames
    assert(got((1L, 2L)) === ((6L, 6L, 6L)))
    // 1<->3 subset: the 3 kept frames match
    assert(got((1L, 3L))._1 === 3L)
    assert(got((1L, 3L))._3 === 3L)
    // 1<->4 recompression: at least 5 of 6 frames within Hamming 6
    assert(got((1L, 4L))._1 >= 5L)
    // disjoint video 5 pairs with nothing
    assert(!got.keys.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("incremental ingest: batch-union equals the whole-corpus pair set, " +
    "in either ingest order") {
    val hashes = PerceptualHash.imageAHash(spark,
      PerceptualHash.synthesizeImages(Tables.documents(spark, D)))
    val whole = PerceptualHash.perceptualNearDup(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b1 = hashes.filter(col("doc_id") % 3 === 0)
    val b2 = hashes.filter(col("doc_id") % 3 =!= 0)
    def ingest(first: org.apache.spark.sql.DataFrame,
               second: org.apache.spark.sql.DataFrame) =
      PerceptualHash.incrementalPerceptualPairs(first.limit(0), first)
        .unionByName(PerceptualHash.incrementalPerceptualPairs(first, second))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ingest(b1, b2) === whole)
    assert(ingest(b2, b1) === whole, "ingest order must not matter")
  }

  test("incremental pairs touch the delta only") {
    val hashes = PerceptualHash.imageAHash(spark,
      PerceptualHash.synthesizeImages(Tables.documents(spark, D)))
    val b1 = hashes.filter(col("doc_id") % 3 === 0)
    val b2 = hashes.filter(col("doc_id") % 3 =!= 0)
    val deltaIds = b2.select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = PerceptualHash.incrementalPerceptualPairs(b1, b2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (d1, d2) =>
      deltaIds.contains(d1) || deltaIds.contains(d2)
    }, "no pair may be internal to the pre-existing index")
  }

  test("decoded fixture pixels are exactly the synthesized ones (PNG and " +
    "BMP round-trip)") {
    val media = PerceptualHash.synthesizeImages(Tables.documents(spark, D))
      .filter(col("doc_id").isin(0L, 1000L))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content")).toMap
    val png = ImageCodec.decode(media(0L)).get
    val bmp = ImageCodec.decode(media(1000L)).get
    for (y <- 0 until 16; x <- 0 until 16) {
      val p = png.getRGB(x, y) & 0xFF
      assert(bmp.getRGB(x, y) === png.getRGB(x, y),
        s"BMP twin pixel ($x,$y) differs")
      assert((png.getRGB(x, y) >> 8 & 0xFF) === p, "gray channels must agree")
    }
  }
}
