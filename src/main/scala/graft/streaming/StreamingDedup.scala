package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for continuous ingest pipelines — the
  * stream-side counterpart of [[graft.pipeline.Dedup]].
  *
  * Exact dedup keys on the 256-bit content digest, so state is one small
  * hash per distinct document, partitioned by Spark's state store across
  * executors. The watermark bounds state: duplicates are suppressed if
  * they arrive within `delay` of the first copy's event time — the only
  * sound contract for an infinite stream (unbounded-lookback dedup would
  * grow state forever; run the batch [[graft.pipeline.Dedup.exact]] over
  * the materialized corpus for exactness beyond the window).
  */
object StreamingDedup {

  /** Keep the first-arriving copy of each distinct `textCol` within the
    * watermark window. `tsCol` must be a TimestampType event-time column.
    */
  def exact(stream: DataFrame, textCol: String = "text",
            tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("_content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_content_hash")
      .drop("_content_hash")

  /** Near-dup candidate suppression on a stream: keys on the SimHash
    * 16-bit block signature instead of the exact digest, so textually
    * near-identical documents (same simhash) collapse too. Coarser than
    * the batch LSH pipeline — a streaming pre-filter, not a replacement.
    */
  def simhash(stream: DataFrame, textCol: String = "text",
              tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("_simhash",
        graft.pipeline.Dedup.simhash(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_simhash")
      .drop("_simhash")
}
