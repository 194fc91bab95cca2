package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column handling (driver north star): image/audio/video
  * as opaque binary columns with typed metadata, batch-decoded inside
  * the executors.
  *
  * The real Spark-side plumbing — schema (`binary` + metadata struct),
  * per-partition micro-batching (`iterator.grouped`, the reference's
  * DataLoader batch shape, `with_colpali_v1.3/...py:220-238`), and a
  * typed decode signature — is genuine; only the pixel decode itself
  * is a deterministic stub (no image libraries in this environment;
  * SURVEY.md §7.3 applies the same stance to the GPU encoders).
  *
  * Scale: decode runs in `mapPartitions`, so each task holds one
  * micro-batch of blobs at a time (bounded memory); no shuffle is
  * introduced, and the binary column never leaves the executor.
  */
object Multimodal {

  /** Decoded media features. Stub decode: dimensions derived
    * deterministically from the blob header/length — stands in for a
    * real PNG/JPEG header parse with identical plumbing. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Attach the opaque binary column (fixture texts play the blobs). */
  def withBlob(docs: DataFrame): DataFrame =
    docs.withColumn("content", col("text").cast("binary"))

  /** Batched executor-side decode: grouped(batchSize) inside
    * mapPartitions — the model-batch shape of the reference's
    * DataLoader, without materializing the partition. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real decoder would run vectorized
          batch.map { r =>
            val n = r.content.length
            // first CODE POINT, not first byte: the oracle states
            // ascii(substr(text,1,1)) — a code point — and the blob is
            // the text's UTF-8 bytes (withBlob), so a first-byte read
            // would silently diverge on a multibyte-leading document
            // (195 for 'é' where both ascii()s say 233). Latent on the
            // ASCII fixture; pinned here so a unicode regen can't
            // split the engines.
            val first =
              if (n > 0)
                new String(r.content, java.nio.charset.StandardCharsets.UTF_8)
                  .codePointAt(0)
              else 0
            MediaFeatures(
              doc_id = r.doc_id,
              byte_len = n,
              width = 32 + n % 64,
              height = 32 + first % 64,
              n_frames = 1 + n % 4)
          }
        }
      }
  }

  /** Video frame sampling: one row per SAMPLED frame — every
    * `stride`-th frame, capped at `maxFrames` per clip — with the
    * frame's clip timestamp and a deterministic frame signature (the
    * key a per-frame embedding stage joins back on). The clip length
    * is a stub container-metadata read (derived from the blob, like
    * [[decodeFeatures]]); the explode/stride/cap plumbing — the part
    * that shapes the downstream embed workload — is real. Narrow
    * end-to-end: explode fans rows out inside the partition, no
    * shuffle, and the cap bounds the fan-out at `maxFrames`× rows
    * regardless of clip length (a 2-hour video contributes the same
    * rows as a 10-second clip — the property that keeps the stage
    * skew-free at scale). */
  def sampleFrames(
      media: DataFrame,
      stride: Int = 5,
      maxFrames: Int = 6,
      msPerFrame: Int = 40): DataFrame = {
    // BYTE length (like decodeFeatures) — the oracle's octet_length;
    // character length would diverge on multibyte text
    val clip = (length(col("text").cast("binary")) % 120 + 8).cast("long")
    media.select(col("doc_id"), clip.as("clip_frames"))
      .select(col("doc_id"), col("clip_frames"),
        explode(transform(
          sequence(lit(0L),
            least(expr(s"(clip_frames - 1) div $stride"), lit(maxFrames - 1).cast("long"))),
          i => i * stride)).as("frame_idx"))
      .select(col("doc_id"), col("clip_frames"), col("frame_idx"),
        (col("frame_idx") * msPerFrame).as("ts_ms"),
        graft.index.Embedder.stringHash64(
          concat(col("doc_id"), lit(":"), col("frame_idx"))).as("frame_sig"))
  }

  /** Audio window segmentation: fixed-length overlapping analysis
    * windows over a PCM stream — one row per (clip, window) with
    * sample offsets and a deterministic window signature, the unit a
    * per-window audio-embedding stage consumes (speech/music feature
    * extractors all run on windows, not whole files). The sample count
    * is a stub container-metadata read like [[decodeFeatures]]; the
    * windowing math — start offsets every `hop` samples, last partial
    * window dropped (a real STFT's behavior), fan-out capped at
    * `maxWindows` — is the real workload-shaping plumbing. Narrow
    * end-to-end like [[sampleFrames]]: no shuffle, bounded fan-out
    * regardless of clip length. */
  def audioWindows(
      media: DataFrame,
      windowSamples: Int = 400,
      hop: Int = 160,
      maxWindows: Int = 8): DataFrame = {
    // stub "sample count" from the blob bytes (≈ seconds * rate scale)
    val nSamples = (length(col("text").cast("binary")) * 7 + 300).cast("long")
    media.select(col("doc_id"), nSamples.as("n_samples"))
      .filter(col("n_samples") >= windowSamples)
      .select(col("doc_id"), col("n_samples"),
        explode(transform(
          sequence(lit(0L),
            least(expr(s"(n_samples - $windowSamples) div $hop"),
              lit(maxWindows - 1).cast("long"))),
          i => i * hop)).as("start_sample"))
      .select(col("doc_id"), col("n_samples"), col("start_sample"),
        (col("start_sample") + windowSamples).as("end_sample"),
        graft.index.Embedder.stringHash64(
          concat(col("doc_id"), lit("@"), col("start_sample"))).as("win_sig"))
  }

  /** Aspect-preserving resize planning — the dimension arithmetic of
    * an image-resize stage (the reference resizes rendered PDF pages
    * before embedding, `shared/convert_pdf_to_image.py`): fit the
    * longer side to `maxSide`, never upscale, floor to integer pixels,
    * and report the output byte volume (RGB) a capacity planner sums.
    * Source dims come from the same stub header-read as
    * [[decodeFeatures]]; the resample itself would run in the
    * mapPartitions micro-batch that stage already demonstrates. All
    * arithmetic is integer (w·maxSide div longest) — exact in both
    * engines, no float rounding to drift. Pure narrow map: no shuffle,
    * no state. */
  def resizePlan(media: DataFrame, maxSide: Int = 224): DataFrame = {
    val byteLen = length(col("text").cast("binary")).cast("long")
    media.select(col("doc_id"),
        (lit(32L) + byteLen % 64).as("width"),
        (lit(32L) + ascii(substring(col("text"), 1, 1)).cast("long") % 64)
          .as("height"))
      .withColumn("longest", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("longest") <= maxSide, col("width"))
          .otherwise(expr(s"(width * $maxSide) div longest")).as("dst_w"),
        when(col("longest") <= maxSide, col("height"))
          .otherwise(expr(s"(height * $maxSide) div longest")).as("dst_h"))
      .withColumn("out_bytes", col("dst_w") * col("dst_h") * 3L)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_resize_plan" -> ((s, dir) =>
      resizePlan(t(s, dir, "documents"), maxSide = 64)
        .orderBy(col("doc_id"))),
    "m_audio_windows" -> ((s, dir) =>
      audioWindows(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("start_sample"))),
    "m_media_features" -> ((s, dir) =>
      decodeFeatures(withBlob(t(s, dir, "documents"))).toDF()
        .orderBy(col("doc_id"))),
    "m_frame_sample" -> ((s, dir) =>
      sampleFrames(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("frame_idx")))
  )

  /** Oracle mirrors the stub decode arithmetic over the blob bytes. */
  def oracles: Map[String, String] = Map(
    "m_resize_plan" ->
      """WITH m AS (SELECT doc_id,
        |    (32 + octet_length(encode(text)) % 64)::BIGINT AS width,
        |    (32 + ascii(substr(text, 1, 1)) % 64)::BIGINT AS height
        |  FROM documents),
        |g AS (SELECT doc_id, width, height,
        |    greatest(width, height) AS longest FROM m)
        |SELECT doc_id, width, height,
        |  (CASE WHEN longest <= 64 THEN width
        |        ELSE (width * 64) // longest END)::BIGINT AS dst_w,
        |  (CASE WHEN longest <= 64 THEN height
        |        ELSE (height * 64) // longest END)::BIGINT AS dst_h,
        |  ((CASE WHEN longest <= 64 THEN width
        |         ELSE (width * 64) // longest END) *
        |   (CASE WHEN longest <= 64 THEN height
        |         ELSE (height * 64) // longest END) * 3)::BIGINT AS out_bytes
        |FROM g ORDER BY doc_id""".stripMargin,
    "m_audio_windows" ->
      s"""WITH m AS (SELECT doc_id,
         |    (octet_length(encode(text)) * 7 + 300)::BIGINT AS n_samples FROM documents),
         |w AS (SELECT doc_id, n_samples,
         |    unnest(list_transform(range(0, least((n_samples - 400) // 160, 7) + 1),
         |      i -> i * 160))::BIGINT AS start_sample
         |  FROM m WHERE n_samples >= 400)
         |SELECT doc_id, n_samples, start_sample,
         |  (start_sample + 400)::BIGINT AS end_sample,
         |  ${graft.index.Embedder.duckStringHash64("doc_id::VARCHAR || '@' || start_sample::VARCHAR")} AS win_sig
         |FROM w ORDER BY doc_id, start_sample""".stripMargin,

    "m_media_features" ->
      """SELECT doc_id, octet_length(encode(text))::INT AS byte_len,
        |  (32 + octet_length(encode(text)) % 64)::INT AS width,
        |  (32 + ascii(substr(text, 1, 1)) % 64)::INT AS height,
        |  (1 + octet_length(encode(text)) % 4)::INT AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m_frame_sample" ->
      s"""WITH m AS (SELECT doc_id,
         |    (octet_length(encode(text)) % 120 + 8)::BIGINT AS clip_frames FROM documents),
         |f AS (SELECT doc_id, clip_frames,
         |    unnest(list_transform(range(0, least((clip_frames - 1) // 5, 5) + 1),
         |      i -> i * 5))::BIGINT AS frame_idx FROM m)
         |SELECT doc_id, clip_frames, frame_idx, (frame_idx * 40)::BIGINT AS ts_ms,
         |  ${graft.index.Embedder.duckStringHash64("doc_id::VARCHAR || ':' || frame_idx::VARCHAR")} AS frame_sig
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  )
}
