package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/BMP/GIF via `javax.imageio` — [[decodeImage]] /
  * [[imageFeatures]]), and audio decode is REAL for PCM containers
  * (WAV/AIFF/AU via `javax.sound.sampled` — [[decodeAudio]] /
  * [[audioFeatures]]). Video codecs are NOT available in this
  * environment, so that decode step is a clearly-marked deterministic
  * STUB (`fakeDecode*` / [[sampleFrames]]); the Spark-side plumbing —
  * schema, batch shape, partitioning, feature extraction over the decoded
  * buffer — is real and tested. Swapping the stub for a JNI/FFmpeg
  * decoder changes one function.
  */
object Multimodal {

  /** Decoded raster: dimensions + row-major luminance plane (0-255). */
  final case class DecodedImage(width: Int, height: Int, gray: Seq[Int])

  /** REAL image decode (PNG/JPEG/BMP/GIF — whatever `javax.imageio` has a
    * reader for): BINARY payload → struct(width, height, gray) with gray
    * the Rec.601 luminance plane. Non-image payloads decode to null (the
    * caller filters or falls back). Executor-side, one decode per row.
    */
  val decodeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) null
          else {
            val w = img.getWidth
            val h = img.getHeight
            val gray = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                gray(y * w + x) = (((rgb >> 16) & 0xff) * 299 +
                  ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                x += 1
              }
              y += 1
            }
            DecodedImage(w, h, gray.toSeq)
          }
        } catch { case _: Exception => null }
    })

  /** Image feature columns over real decode: dimensions, aspect ratio,
    * mean brightness, and a 16-bin L1-normalized luminance histogram —
    * the pooled-feature shape a vision-model preprocessor emits. Rows
    * whose payload is not a decodable image get null features.
    */
  def imageFeatures(df: DataFrame, binCol: String): DataFrame = {
    val decoded = df.withColumn("_img", decodeImage(col(binCol)))
    val g = col("_img.gray")
    decoded
      .withColumn("img_width", col("_img.width"))
      .withColumn("img_height", col("_img.height"))
      .withColumn("img_aspect",
        when(col("_img.height") > 0,
          round(col("_img.width").cast("double") / col("_img.height"), 4)))
      .withColumn("img_mean_brightness",
        when(size(g) > 0, round(aggregate(g, lit(0L), _ + _)
          .cast("double") / size(g), 4)))
      .withColumn("img_histogram",
        when(size(g) > 0, transform(
          aggregate(g, array_repeat(lit(0.0), 16),
            (acc, v) => zip_with(acc, sequence(lit(0), lit(15)),
              (a, i) => a + when(v.divide(16).cast("int") === i, 1.0)
                .otherwise(0.0))),
          c => round(c / size(g), 6))))
      .drop("_img")
  }

  /** Decoded audio summary: container format facts + signal features. */
  final case class DecodedAudio(sample_rate: Double, channels: Int,
      bits: Int, n_frames: Long, duration_s: Double, rms: Double,
      peak: Double)

  /** Minimal RIFF/WAVE writer: 16-bit signed little-endian PCM, mono —
    * the deterministic synthesis side of the audio tests (and a generally
    * useful "PCM buffer → playable bytes" utility).
    */
  def wavPcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** REAL audio decode (WAV/AIFF/AU PCM — whatever `javax.sound.sampled`
    * has a reader for): BINARY payload → format facts (sample rate,
    * channels, bit depth, frame count, duration) + signal features (RMS
    * and peak amplitude in raw sample units, channel-interleaved).
    * Supports 8-bit and 16-bit PCM, signed or unsigned, either
    * endianness. Undecodable payloads → null (the caller filters).
    */
  val decodeAudio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val signed = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!(signed || unsigned) || (bits != 8 && bits != 16)) null
          else {
            val data = in.readAllBytes()
            val n = data.length / (bits / 8)
            var i = 0
            var sumSq = 0.0
            var peak = 0.0
            while (i < n) {
              val v: Double =
                if (bits == 8) {
                  val b = data(i)
                  if (signed) b.toDouble else (b & 0xff) - 128.0
                } else {
                  val (lo, hi) =
                    if (fmt.isBigEndian) (data(2 * i + 1), data(2 * i))
                    else (data(2 * i), data(2 * i + 1))
                  val s = ((hi << 8) | (lo & 0xff)).toShort
                  if (signed) s.toDouble else ((s & 0xffff) - 32768).toDouble
                }
              sumSq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            val frames = in.getFrameLength
            DecodedAudio(fmt.getSampleRate.toDouble, fmt.getChannels, bits,
              frames, frames / fmt.getSampleRate.toDouble,
              if (n > 0) math.sqrt(sumSq / n) else 0.0, peak)
          }
        } catch { case _: Exception => null }
    })

  /** Audio feature columns over real decode — the audio analog of
    * [[imageFeatures]]. Rows whose payload no installed reader handles
    * get null features.
    */
  def audioFeatures(df: DataFrame, binCol: String): DataFrame = {
    val decoded = df.withColumn("_aud", decodeAudio(col(binCol)))
    decoded
      .withColumn("audio_sample_rate", col("_aud.sample_rate"))
      .withColumn("audio_channels", col("_aud.channels"))
      .withColumn("audio_bits", col("_aud.bits"))
      .withColumn("audio_frames", col("_aud.n_frames"))
      .withColumn("audio_duration_s", round(col("_aud.duration_s"), 6))
      .withColumn("audio_rms", round(col("_aud.rms"), 4))
      .withColumn("audio_peak", col("_aud.peak"))
      .drop("_aud")
  }

  /** Canonical multimodal schema fragment: payload + typed metadata. */
  def withMediaMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(binCol)).as("n_bytes"),
      lit("application/octet-stream").as("mime"),
      xxhash64(col(binCol)).as("content_hash")))

  // =================================================================
  // STUB decoders — deterministic fakes standing in for video codecs
  // (the container has no ffmpeg). Real implementations replace the
  // body, signatures stay.
  // =================================================================

  /** STUB image decode: "pixels" = raw bytes reinterpreted as unsigned
    * ints. Real impl: JPEG/PNG decode to H×W×C.
    */
  def fakeDecodePixels(bin: Column): Column =
    transform(split(base64(bin), ""),
      c => when(length(c) > 0, ascii(c)).otherwise(0))

  /** Byte-histogram features over the decoded buffer (16 buckets,
    * L1-normalized) — the shape of a pooled CNN feature vector, computed
    * deterministically from bytes.
    */
  def byteHistogramFeatures(bin: Column, buckets: Int = 16): Column = {
    val px = fakeDecodePixels(bin)
    val counts = aggregate(px,
      array_repeat(lit(0.0), buckets),
      (acc, b) => zip_with(acc, sequence(lit(0), lit(buckets - 1)),
        (a, i) => a + when(pmod(b, lit(buckets)) === i, 1.0).otherwise(0.0)))
    transform(counts, c => round(c / greatest(size(px), lit(1)), 6))
  }

  /** STUB frame sampling: split the payload into fixed-size "frames" and
    * keep every `stride`-th — the plumbing of video frame extraction
    * (batch shape: one row in, `ceil(n/frameBytes/stride)` rows out).
    */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int,
                   stride: Int): DataFrame =
    df.select(col("*"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor((length(col(binCol)) - 1) / lit(frameBytes)),
              lit(0)).cast("int")),
          i => col(binCol).substr((i * frameBytes + 1).cast("int"),
            lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)

  /** STUB resize: truncate/pad the payload to `targetBytes` (plumbing for
    * image resize — constant output size per row).
    */
  def fakeResize(bin: Column, targetBytes: Int): Column =
    substring(bin, 1, targetBytes)

  /** End-to-end multimodal feature pass: treat a binary column as media,
    * attach metadata, extract stub features. One scan, no shuffle.
    */
  def extractFeatures(df: DataFrame, binCol: String): DataFrame =
    withMediaMetadata(df, binCol)
      .withColumn("features", byteHistogramFeatures(col(binCol)))
      .withColumn("n_frames",
        (floor(greatest(length(col(binCol)) - 1, lit(0)) / lit(256)) + 1)
          .cast("int"))
}
