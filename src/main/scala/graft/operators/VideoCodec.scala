package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM video codec for AVI/MJPEG: an AVI file is a RIFF container
  * whose `movi` list carries one JPEG payload per frame (`00dc`/`00db`
  * chunks), so frame extraction is a chunk walk and per-frame decode is
  * the existing `ImageCodec` (javax.imageio ships a JPEG reader) — no
  * JNI, no deps. This puts one real format on the video path next to
  * images (imageio) and audio (WAV/PCM); inter-frame-compressed codecs
  * (H.264 etc.) have no pure-JVM decoder and stay on the stub/quarantine
  * path.
  *
  * `synthesize` writes a structurally complete AVI (avih + strh/strf
  * headers + movi) and doubles as the fixture generator.
  */
object VideoCodec {

  /** Extracted container content: frame payloads are the raw JPEG bytes. */
  case class Avi(microSecPerFrame: Int, frames: Vector[Array[Byte]])

  private val RIFF = 0x46464952 // "RIFF"
  private val AVI_ = 0x20495641 // "AVI "
  private val LIST = 0x5453494c // "LIST"
  private val AVIH = 0x68697661 // "avih"
  private val F00DC = 0x63643030 // "00dc" (compressed frame, stream 00)
  private val F00DB = 0x62643030 // "00db" (uncompressed-flagged, same walk)

  /** Chunk-walking parse; malformed containers or containers with no
    * frames decode to None (quarantine-don't-fail, O-12 policy).
    */
  def decode(bytes: Array[Byte]): Option[Avi] = try {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != RIFF || bb.getInt(8) != AVI_) return None
    var microSecPerFrame = 0
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = bb.getInt(pos)
        val sz = bb.getInt(pos + 4)
        if (sz < 0 || pos + 8 + sz > end) return
        if (id == LIST && sz >= 4) walk(pos + 12, pos + 8 + sz)
        else if (id == AVIH && sz >= 4) microSecPerFrame = bb.getInt(pos + 8)
        else if ((id == F00DC || id == F00DB) && sz > 0)
          frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)
        pos += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
      }
    }
    walk(12, math.min(bytes.length, 8 + bb.getInt(4)))
    val fs = frames.result()
    if (fs.isEmpty) None else Some(Avi(microSecPerFrame, fs))
  } catch { case _: Exception => None }

  /** Every-k-th frame with its decoded (width, height, feature) via the
    * real image codec; frames whose JPEG payload fails to decode are
    * skipped (they carry no usable pixels for a feature pipeline).
    */
  def sampleFrames(bytes: Array[Byte], everyKth: Int)
      : Vector[(Int, Array[Byte], (Int, Int, Array[Float]))] =
    decode(bytes) match {
      case None => Vector.empty
      case Some(avi) =>
        avi.frames.zipWithIndex
          .filter { case (_, i) => i % math.max(1, everyKth) == 0 }
          .flatMap { case (jpeg, i) =>
            ImageCodec.decodeFeatures(jpeg).map(f => (i, jpeg, f))
          }
    }

  /** Structurally complete MJPEG AVI from JPEG frame payloads:
    * RIFF(AVI (LIST hdrl(avih, LIST strl(strh, strf)), LIST movi(00dc*))).
    */
  def synthesize(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
                 microSecPerFrame: Int = 40000): Array[Byte] = {
    def pad(n: Int) = n + (n & 1)
    val moviBody = 4 + jpegFrames.map(f => 8 + pad(f.length)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val bb = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = s.foreach(c => bb.put(c.toByte))
    fourcc("RIFF"); bb.putInt(riffBody); fourcc("AVI ")
    // LIST hdrl
    fourcc("LIST"); bb.putInt(hdrlBody); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(microSecPerFrame); bb.putInt(0); bb.putInt(0); bb.putInt(0x10)
    bb.putInt(jpegFrames.length); bb.putInt(0); bb.putInt(1); bb.putInt(0)
    bb.putInt(width); bb.putInt(height); (0 until 4).foreach(_ => bb.putInt(0))
    // LIST strl(strh, strf)
    fourcc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(1); bb.putInt(1000000 / math.max(1, microSecPerFrame)) // scale, rate
    bb.putInt(0); bb.putInt(jpegFrames.length); bb.putInt(0); bb.putInt(-1)
    bb.putInt(0)
    bb.putShort(0); bb.putShort(0)
    bb.putShort(width.toShort); bb.putShort(height.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24); fourcc("MJPG")
    bb.putInt(width * height * 3); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0)
    // LIST movi
    fourcc("LIST"); bb.putInt(moviBody); fourcc("movi")
    jpegFrames.foreach { f =>
      fourcc("00dc"); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }
}
