package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real pure-JVM image codec over `javax.imageio` (readers for PNG, BMP,
  * GIF, JPEG, WBMP ship with every JDK — no external library). Used by
  * [[Multimodal]] for the image branch of decode/feature-extract/resize;
  * closes the reference-coverage gap where the decode step was previously a
  * stub for all media types.
  *
  * Determinism note: pixel access goes through `getRGB` (sRGB-converted
  * ints), so features are bit-stable for a given payload across JVMs — the
  * property the ScalaTest golden-image spec pins.
  */
object ImageCodec {

  /** Per-partition decoder initialization: disable imageio's temp-file disk
    * cache so decode is pure CPU+heap (on an executor, /tmp churn across
    * thousands of tasks is real I/O). Cheap and idempotent.
    */
  def initPartition(): Unit = ImageIO.setUseCache(false)

  /** Decode bytes to an image; None when no installed reader can parse them
    * (malformed payloads quarantine rather than fail, O-12 policy).
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Decode + fixed-shape pixel features:
    * `[meanR, meanG, meanB, meanLuma, q1Luma, q2Luma, q3Luma, q4Luma]`,
    * each in [0,1]; quadrants are (top-left, top-right, bottom-left,
    * bottom-right) mean luminance. Pixels are sampled on a stride that caps
    * work at ~4096 samples per image, so feature cost is bounded no matter
    * the resolution — decode, not sampling, dominates.
    */
  def decodeFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decode(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val stride = math.max(1, math.sqrt(w.toLong * h / 4096.0).toInt)
      var sumR, sumG, sumB = 0.0
      val quadSum = new Array[Double](4)
      val quadN = new Array[Long](4)
      var n = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          sumR += r; sumG += g; sumB += b
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quadSum(q) += luma; quadN(q) += 1
          n += 1
          x += stride
        }
        y += stride
      }
      val f = new Array[Float](8)
      f(0) = (sumR / n / 255.0).toFloat
      f(1) = (sumG / n / 255.0).toFloat
      f(2) = (sumB / n / 255.0).toFloat
      f(3) = ((0.299 * sumR + 0.587 * sumG + 0.114 * sumB) / n / 255.0).toFloat
      var q = 0
      while (q < 4) {
        f(4 + q) = if (quadN(q) == 0) 0f else (quadSum(q) / quadN(q) / 255.0).toFloat
        q += 1
      }
      (w, h, f)
    }

  /** Scale to fit `maxDim` on the longest side (aspect preserved, bilinear)
    * and re-encode as PNG. Returns None for undecodable input; returns the
    * ORIGINAL bytes when already within bounds — re-encoding a compliant
    * image would burn CPU to change nothing.
    */
  def resize(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      if (math.max(w, h) <= maxDim) bytes
      else {
        val scale = maxDim.toDouble / math.max(w, h)
        val nw = math.max(1, math.round(w * scale).toInt)
        val nh = math.max(1, math.round(h * scale).toInt)
        val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        encodePng(out)
      }
    }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
