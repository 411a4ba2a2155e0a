package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden-container tests for the REAL AVI/MJPEG path: synthesized
  * container round-trip, frame sampling cadence, per-frame pixel decode
  * through the image codec, quarantine, and the Spark generator shape.
  */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Solid-color 32x16 JPEG frame. */
  private def jpegFrame(rgb: Int): Array[Byte] = {
    val img = new BufferedImage(32, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private def goldenAvi(): Array[Byte] = {
    // 6 frames sweeping dark to light gray
    val frames = (0 until 6).map(i => jpegFrame(0x010101 * (40 * i + 20)))
    VideoCodec.synthesize(frames, 32, 16, microSecPerFrame = 40000)
  }

  test("synthesize -> decode round-trip: frame count and timing") {
    val Some(avi) = VideoCodec.decode(goldenAvi())
    assert(avi.frames.length === 6)
    assert(avi.microSecPerFrame === 40000) // 25 fps
    // every payload is a decodable JPEG of the declared geometry
    avi.frames.foreach { f =>
      val Some((w, h, _)) = ImageCodec.decodeFeatures(f)
      assert(w === 32 && h === 16)
    }
  }

  test("sampleFrames keeps every k-th frame with rising luminance") {
    val sampled = VideoCodec.sampleFrames(goldenAvi(), everyKth = 2)
    assert(sampled.map(_._1) === Vector(0, 2, 4))
    // luminance (feature bin 3) must rise with the gray sweep
    val lumas = sampled.map(_._3._3(3))
    assert(lumas === lumas.sorted, s"not rising: $lumas")
    assert(lumas.last - lumas.head > 0.4f)
  }

  test("malformed containers quarantine") {
    assert(VideoCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.decode(goldenAvi().take(60)).isEmpty) // no movi yet
    val wav = AudioCodec.synthesize(8000, 100, 440.0) // RIFF but not AVI
    assert(VideoCodec.decode(wav).isEmpty)
  }

  test("sampleVideoFrames: real frames for video/avi, stub windows otherwise") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "video/avi", goldenAvi()),
      Multimodal.MediaRecord(2L, "video/avi", Array[Byte](9, 9)), // garbage
      Multimodal.MediaRecord(3L, "application/octet-stream", new Array[Byte](200))
    ).toDF()
    val out = Multimodal.sampleVideoFrames(spark, media, everyKth = 2)
      .collect().groupBy(_.doc_id)
    assert(out(1L).map(_.frame_no).sorted.toSeq === Seq(0, 2, 4))
    out(1L).foreach(f => assert(ImageCodec.decodeFeatures(f.frame).isDefined))
    assert(!out.contains(2L)) // quarantined: no rows
    assert(out(3L).length === 2) // 200 bytes / 64-byte windows, every 2nd
  }
}
