package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/BMP/GIF via `javax.imageio` — [[decodeImage]] /
  * [[imageFeatures]]). Audio/video codecs are NOT available in this
  * environment, so those decode steps are clearly-marked deterministic
  * STUBs (`fakeDecode*`); the Spark-side plumbing — schema, batch shape,
  * partitioning, feature extraction over the decoded buffer — is real and
  * tested. Swapping a stub for a JNI/FFmpeg decoder changes one function.
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

  /** Canonical multimodal schema fragment: payload + typed metadata. */
  def withMediaMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(binCol)).as("n_bytes"),
      lit("application/octet-stream").as("mime"),
      xxhash64(col(binCol)).as("content_hash")))

  // =================================================================
  // STUB decoders — deterministic fakes standing in for image/audio
  // codecs (the container has no libjpeg/ffmpeg). Real implementations
  // replace the body, signatures stay.
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
