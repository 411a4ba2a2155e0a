package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden-signal tests for the REAL WAV/PCM16 codec path: exact header
  * round-trip, hand-computable RMS features on a synthesized sine,
  * quarantine of malformed payloads, and the mapPartitions dispatch.
  */
class AudioCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("synthesize -> decode round-trip: rate, channels, frames, duration") {
    val bytes = AudioCodec.synthesize(8000, 500, 440.0)
    val Some(w) = AudioCodec.decode(bytes)
    assert(w.sampleRate === 8000 && w.channels === 1)
    assert(w.samples.length === 4000) // 8000 Hz * 0.5 s
    val Some((durMs, ch, _)) = AudioCodec.decodeFeatures(bytes)
    assert(durMs === 500 && ch === 1)
  }

  test("sine RMS: every eighth-bin reads amplitude/sqrt(2)") {
    // 440 Hz over 500 ms = 220 full periods; each eighth holds 27.5
    // periods, so per-bin RMS ~ A/sqrt(2) with only fractional-period error
    val Some((_, _, f)) =
      AudioCodec.decodeFeatures(AudioCodec.synthesize(8000, 500, 440.0, 0.5))
    val expected = 0.5 / math.sqrt(2.0)
    f.foreach(v => assert(math.abs(v - expected) < 0.01, s"bin $v != $expected"))
  }

  test("silence decodes to zero energy") {
    val Some((_, _, f)) =
      AudioCodec.decodeFeatures(AudioCodec.synthesize(8000, 100, 440.0, 0.0))
    assert(f.forall(_ == 0.0f))
  }

  test("malformed payloads quarantine: garbage, truncation, non-PCM bits") {
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decode(new Array[Byte](100)).isEmpty) // zeros: no RIFF
    val good = AudioCodec.synthesize(8000, 100, 440.0)
    assert(AudioCodec.decode(good.take(40)).isEmpty) // truncated header
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float, not PCM
    assert(AudioCodec.decode(nonPcm).isEmpty)
  }

  test("extractFeatures dispatches audio/wav through the real codec") {
    import spark.implicits._
    val wav = AudioCodec.synthesize(8000, 250, 440.0)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", wav),
      Multimodal.MediaRecord(2L, "audio/wav", Array[Byte](9, 9, 9)), // garbage
      Multimodal.MediaRecord(3L, "text/plain", "hello world".getBytes)
    ).toDF()
    val out = Multimodal.extractFeatures(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width === 250 && out(1L).height === 1) // duration_ms, channels
    assert(out(1L).feature.forall(_ > 0.3f)) // sine energy in every bin
    assert(out(2L).width === -1 && out(2L).height === -1) // quarantined
    assert(out(3L).width > 0) // stub path untouched
  }
}
