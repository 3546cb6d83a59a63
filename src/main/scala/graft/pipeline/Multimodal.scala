package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`fakeDecode*`); the
  * Spark-side plumbing — schema, batch shape, partitioning, feature
  * extraction over the decoded buffer — is real and tested. Swapping the
  * stub for a real JNI/FFmpeg decoder changes one function.
  */
object Multimodal {

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
