package graft.operators

import java.awt.image.BufferedImage
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden-image tests for the REAL javax.imageio codec path: exact feature
  * values on constructed images, true resize bounds, quarantine of
  * undecodable payloads, and the Spark mapPartitions integration.
  */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 64x32 golden image: left half pure red, right half pure white — every
    * feature value is computable by hand. */
  private def goldenPng(): Array[Byte] = {
    val img = new BufferedImage(64, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0xFF0000 else 0xFFFFFF)
    ImageCodec.encodePng(img)
  }

  test("decodeFeatures: exact means and quadrant luminances on the golden image") {
    val Some((w, h, f)) = ImageCodec.decodeFeatures(goldenPng())
    assert(w == 64 && h == 32)
    val lumaRed = 0.299 // luminance of (255,0,0) / 255
    assert(math.abs(f(0) - 1.0f) < 1e-4, s"meanR: ${f(0)}")       // red everywhere
    assert(math.abs(f(1) - 0.5f) < 1e-4, s"meanG: ${f(1)}")       // green only in white half
    assert(math.abs(f(2) - 0.5f) < 1e-4, s"meanB: ${f(2)}")
    assert(math.abs(f(3) - (lumaRed + 1.0) / 2) < 1e-3, s"meanLuma: ${f(3)}")
    assert(math.abs(f(4) - lumaRed) < 1e-3 && math.abs(f(6) - lumaRed) < 1e-3,
      s"left quadrants should be red luma: ${f.toSeq}")
    assert(math.abs(f(5) - 1.0) < 1e-3 && math.abs(f(7) - 1.0) < 1e-3,
      s"right quadrants should be white: ${f.toSeq}")
  }

  test("decodeFeatures: large images are stride-sampled but still correct") {
    // 256x256 solid mid-gray: any sampling gives the same means.
    val img = new BufferedImage(256, 256, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 256; x <- 0 until 256) img.setRGB(x, y, 0x808080)
    val Some((w, h, f)) = ImageCodec.decodeFeatures(ImageCodec.encodePng(img))
    assert(w == 256 && h == 256)
    (0 to 3).foreach(i => assert(math.abs(f(i) - 128f / 255f) < 1e-3, s"f($i)=${f(i)}"))
  }

  test("resize: scales to fit maxDim with aspect ratio, PNG re-encode decodes back") {
    val img = new BufferedImage(200, 100, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 100; x <- 0 until 200) img.setRGB(x, y, 0x336699)
    val bytes = ImageCodec.encodePng(img)
    val Some(thumb) = ImageCodec.resize(bytes, maxDim = 50)
    val Some(back) = ImageCodec.decode(thumb)
    assert(back.getWidth == 50 && back.getHeight == 25)
    assert((back.getRGB(25, 12) & 0xFFFFFF) == 0x336699) // solid color survives bilinear
    assert(thumb.length < bytes.length)
  }

  test("resize: already-within-bounds returns the ORIGINAL bytes, no re-encode") {
    val bytes = goldenPng()
    val Some(out) = ImageCodec.resize(bytes, maxDim = 512)
    assert(out eq bytes)
  }

  test("undecodable payloads: decode None, resize None") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(ImageCodec.decode(junk).isEmpty)
    assert(ImageCodec.resize(junk, 64).isEmpty)
  }

  test("extractFeatures dispatches image/* through the real codec; junk quarantines") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image/png", goldenPng()),
      Multimodal.MediaRecord(2L, "image/png", "junk".getBytes("UTF-8")),
      Multimodal.MediaRecord(3L, "text/plain", "hello".getBytes("UTF-8")),
    ).toDF()
    val feats = Multimodal.extractFeatures(spark, rows, partitions = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 64 && feats(1L).height == 32)
    assert(math.abs(feats(1L).feature(0) - 1.0f) < 1e-4)        // real pixels, not stub
    assert(feats(2L).width == -1 && feats(2L).height == -1)     // quarantined, kept
    assert(feats(2L).feature.forall(_ == 0f))
    assert(feats(3L).width == 1 + "hello".length % 64)          // non-image: stub path
  }

  test("resizeImages bounds every decodable payload; junk passes through") {
    import spark.implicits._
    val big = {
      val img = new BufferedImage(300, 120, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 120; x <- 0 until 300) img.setRGB(x, y, 0xAA5500)
      ImageCodec.encodePng(img)
    }
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image/png", big),
      Multimodal.MediaRecord(2L, "image/png", "junk".getBytes("UTF-8")),
    ).toDF()
    val thumbs = Multimodal.resizeImages(spark, rows, maxDim = 64)
      .collect().map(t => t.doc_id -> t).toMap
    val Some(dec) = ImageCodec.decode(thumbs(1L).thumb)
    assert(math.max(dec.getWidth, dec.getHeight) == 64)
    assert(thumbs(2L).thumb.sameElements("junk".getBytes("UTF-8"))) // untouched pass-through
  }
}
