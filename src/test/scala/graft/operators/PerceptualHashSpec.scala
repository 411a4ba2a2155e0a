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
