package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV codec: canonical RIFF/WAVE with PCM 16-bit samples, mono
  * or interleaved multi-channel — parsed directly off the byte payload
  * (ByteBuffer, no JNI, no external libs), so `audio/wav` joins images on
  * the REAL-decode path of the multimodal pipeline. Compressed audio
  * (MP3/AAC) has no JDK codec and stays on the quarantine path, exactly
  * like an image format imageio lacks a reader for.
  *
  * Everything is deterministic: the same bytes always produce the same
  * features, so specs can assert exact values and replays are idempotent.
  */
object AudioCodec {

  /** Decoded PCM: `samples` are interleaved across channels. */
  case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  private val RIFF = 0x46464952 // "RIFF" as a little-endian int
  private val WAVE = 0x45564157 // "WAVE"
  private val FMT = 0x20746d66  // "fmt "
  private val DATA = 0x61746164 // "data"

  /** Strict chunk-walking parse; anything malformed, compressed, or not
    * 16-bit PCM decodes to None (quarantine-don't-fail, O-12 policy).
    */
  def decode(bytes: Array[Byte]): Option[Wav] = try {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != RIFF || bb.getInt(8) != WAVE) return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var ok16bitPcm = false
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val id = bb.getInt(pos)
      val sz = bb.getInt(pos + 4)
      if (sz < 0 || pos + 8 + sz > bytes.length) return None
      if (id == FMT && sz >= 16) {
        val audioFormat = bb.getShort(pos + 8) & 0xFFFF
        channels = bb.getShort(pos + 10) & 0xFFFF
        sampleRate = bb.getInt(pos + 12)
        val bits = bb.getShort(pos + 22) & 0xFFFF
        ok16bitPcm = audioFormat == 1 && bits == 16
      } else if (id == DATA) {
        dataOff = pos + 8
        dataLen = sz
      }
      pos += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    if (!ok16bitPcm || sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = bb.getShort(dataOff + 2 * i); i += 1 }
    Some(Wav(sampleRate, channels, samples))
  } catch { case _: Exception => None }

  /** Feature extraction into the shared MediaFeatures shape:
    * (duration_ms, channels, 8-bin feature) where the bins are per-eighth
    * RMS energy of the normalized signal — the audio analogue of
    * ImageCodec's grayscale grid feature.
    */
  def decodeFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decode(bytes).map { w =>
      val frames = w.samples.length / math.max(1, w.channels)
      val durMs = ((frames.toLong * 1000L) / w.sampleRate).toInt
      val f = new Array[Float](8)
      val n = w.samples.length
      if (n > 0) {
        val acc = new Array[Double](8)
        val cnt = new Array[Int](8)
        var i = 0
        while (i < n) {
          val b = (i.toLong * 8 / n).toInt
          val s = w.samples(i) / 32768.0
          acc(b) += s * s
          cnt(b) += 1
          i += 1
        }
        var b = 0
        while (b < 8) {
          if (cnt(b) > 0) f(b) = math.sqrt(acc(b) / cnt(b)).toFloat
          b += 1
        }
      }
      (durMs, w.channels, f)
    }

  /** Synthesize a mono PCM16 sine-wave WAV — the fixture generator, and
    * executable documentation of the exact layout `decode` expects.
    */
  def synthesize(sampleRate: Int, durMs: Int, freqHz: Double,
                 amplitude: Double = 0.5): Array[Byte] = {
    val frames = (sampleRate.toLong * durMs / 1000L).toInt
    val dataLen = frames * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RIFF); bb.putInt(36 + dataLen); bb.putInt(WAVE)
    bb.putInt(FMT); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.putInt(DATA); bb.putInt(dataLen)
    var i = 0
    while (i < frames) {
      val v = (math.sin(2 * math.Pi * freqHz * i / sampleRate) *
        amplitude * 32767.0).toInt
      bb.putShort(v.toShort)
      i += 1
    }
    bb.array()
  }
}
