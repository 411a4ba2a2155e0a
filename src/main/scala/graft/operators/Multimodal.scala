package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling (training-data-pipeline surface): media as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted in
  * batches per partition.
  *
  * Image decode is REAL: `ImageCodec` decodes every format the JDK's
  * `javax.imageio` ships readers for (PNG, BMP, GIF, JPEG, WBMP) and
  * computes pixel features and true resizes — no external codec needed.
  * Audio decode is REAL for WAV/PCM16: `AudioCodec` parses RIFF directly
  * off the bytes (duration, channels, per-eighth RMS feature). Video
  * frame sampling is REAL for AVI/MJPEG: `VideoCodec` chunk-walks the
  * container and each sampled frame is a JPEG the image codec decodes.
  * Inter-frame-compressed a/v (H.264, AAC, MP3) has no pure-JVM codec,
  * so `decodeStub` remains its honest stand-in (STUB — swap for a
  * JNI/FFM binding in production). Everything around the codecs — the schema, the
  * typed Dataset plumbing, the per-partition batching (one decoder
  * initialization per partition, the reason this is mapPartitions and not a
  * per-row UDF), the balanced repartition before the CPU-heavy stage — is
  * the real 100 TB shape.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                           feature: Array[Float])

  /** Attach a binary media column. In production this is the raw bytes
    * column of an image/audio table; here it is synthesized from `text` so
    * the plumbing is exercised with real data flow.
    */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** STUB decoder: deterministic fake "decode" of a byte payload into
    * (width, height, 8-dim feature). Replace with a real codec; the
    * signature (bytes in, fixed-shape features out) is the contract.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 1 + (n % 64)
    val height = 1 + (n / 64)
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) { feature(i % 8) += (bytes(i) & 0xFF).toFloat / 255f; i += 1 }
    (width, height, feature)
  }

  /** Per-partition batched decode. `repartition` first: decode cost is
    * proportional to payload bytes, not row count, so balance by shuffling
    * on doc_id before the expensive stage.
    *
    * Dispatch: `image/<star>` payloads go through the REAL `ImageCodec`
    * (javax.imageio) as (width, height, grayscale-grid feature);
    * `audio/<star>` through the REAL `AudioCodec` as (duration_ms,
    * channels, RMS-energy feature) in the same columns — the shared shape
    * is (two ints of typed metadata, fixed-width feature). A payload its
    * codec cannot decode is quarantined with `width = height = -1` and a
    * zero feature (kept, not dropped — O-12's skip-don't-fail policy, but
    * visible downstream). Other media types use the deterministic stub.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val quarantined = (rec: MediaRecord) =>
      MediaFeatures(rec.doc_id, rec.content.length, -1, -1, new Array[Float](8))
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("doc_id")) else media
    balanced.as[MediaRecord].mapPartitions { it =>
      ImageCodec.initPartition() // one decoder init per partition
      it.map { rec =>
        if (rec.media_type.startsWith("image/")) {
          ImageCodec.decodeFeatures(rec.content) match {
            case Some((w, h, f)) => MediaFeatures(rec.doc_id, rec.content.length, w, h, f)
            case None => quarantined(rec)
          }
        } else if (rec.media_type.startsWith("audio/")) {
          AudioCodec.decodeFeatures(rec.content) match {
            case Some((durMs, ch, f)) =>
              MediaFeatures(rec.doc_id, rec.content.length, durMs, ch, f)
            case None => quarantined(rec)
          }
        } else {
          val (w, h, f) = decodeStub(rec.content)
          MediaFeatures(rec.doc_id, rec.content.length, w, h, f)
        }
      }
    }
  }

  /** STUB resize: deterministic byte-level downsample standing in for an
    * image resize (real impl: decode -> scale -> re-encode). The contract —
    * bytes in, bounded-size bytes out, run per partition — is what matters
    * for the pipeline shape: output payloads shrink to <= maxBytes, so the
    * downstream shuffle carries thumbnails, never originals.
    */
  def resizeStub(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
    if (bytes.length <= maxBytes) bytes
    else {
      val out = new Array[Byte](maxBytes)
      val stride = bytes.length.toDouble / maxBytes
      var i = 0
      while (i < maxBytes) { out(i) = bytes((i * stride).toInt); i += 1 }
      out
    }

  case class MediaThumb(doc_id: Long, n_bytes_in: Int, n_bytes_out: Int,
                        thumb: Array[Byte])

  def resizeAll(spark: SparkSession, media: DataFrame,
                maxBytes: Int): Dataset[MediaThumb] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { rec =>
      val t = resizeStub(rec.content, maxBytes)
      MediaThumb(rec.doc_id, rec.content.length, t.length, t)
    })
  }

  /** REAL image resize: decode → bilinear scale to fit `maxDim` → re-encode
    * PNG, per partition. Undecodable payloads pass through untouched (the
    * quarantine-don't-fail policy); images already within bounds keep their
    * original bytes (no useless re-encode). Downstream shuffles carry
    * thumbnails, never originals — the property that matters at 100 TB.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   maxDim: Int): Dataset[MediaThumb] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageCodec.initPartition()
      it.map { rec =>
        val out = ImageCodec.resize(rec.content, maxDim).getOrElse(rec.content)
        MediaThumb(rec.doc_id, rec.content.length, out.length, out)
      }
    }
  }

  /** STUB frame sampling: every-k-th fixed-size window of the payload
    * stands in for video frame extraction. One input row explodes to
    * `n_frames` rows — the generator shape (flatMap, not map) is the real
    * plumbing: frame rows inherit the parent key for downstream grouping.
    */
  case class MediaFrame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, everyKth: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { rec =>
      rec.content.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % everyKth == 0 }
        .map { case (chunk, i) => MediaFrame(rec.doc_id, i, chunk) }
    }
  }

  /** REAL frame sampling for `video/<star>` payloads: AVI/MJPEG containers
    * are chunk-walked (`VideoCodec`) and every k-th JPEG frame emitted as
    * its own row — same generator shape as the stub (one input row
    * flatMaps to n frame rows inheriting the parent key), but the frame
    * bytes are actual decodable images; undecodable containers emit
    * nothing (quarantine). Non-video payloads keep the stub byte-window
    * behavior so the operator is total over mixed media tables.
    */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
                        everyKth: Int, stubFrameBytes: Int = 64)
      : Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageCodec.initPartition() // frames decode via the image codec
      it.flatMap { rec =>
        if (rec.media_type.startsWith("video/"))
          VideoCodec.sampleFrames(rec.content, everyKth)
            .map { case (i, jpeg, _) => MediaFrame(rec.doc_id, i, jpeg) }
        else
          rec.content.grouped(stubFrameBytes).zipWithIndex
            .filter { case (_, i) => i % everyKth == 0 }
            .map { case (chunk, i) => MediaFrame(rec.doc_id, i, chunk) }
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q29: the SQL-expressible slice of the media pipeline — byte length and
    // content digest of the binary column (deterministic; the decode stub's
    // outputs are asserted in ScalaTest instead, since a fake decoder has no
    // oracle).
    "q29_multimodal_meta" -> ((s, d) => {
      val media = withMediaColumn(Tables.documents(s, d))
      media.select(col("doc_id"), col("media_type"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        sha2(col("content"), 256).as("content_sha256"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q29_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS content_sha256
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
