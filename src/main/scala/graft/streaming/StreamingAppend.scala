package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.repo.Repository

/** Structured-Streaming sink: commit one engine snapshot per micro-batch —
  * the Spark-native form of the reference's incremental append workflow
  * (`append_dim` region writes, xarray.py:253-276; SURVEY §2.9).
  *
  * Each micro-batch runs `stage` (typically `session.stageChunkRefs` or
  * `TensorPlane.writeValues`) and then the normal commit CAS loop, so
  * concurrent writers rebase exactly as batch commits do — the
  * commit-per-micro-batch protocol Delta popularized, on this engine's
  * pointer chain.
  */
object StreamingAppend {

  /** Wire a streaming DataFrame into the repo: `stage(session, batchDf,
    * batchId)` stages edits; the session commits per batch. Returns the
    * started query (caller owns lifecycle).
    */
  def start(stream: DataFrame, repo: Repository, branch: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second"))(
      stage: (graft.repo.Session, DataFrame, Long) => Unit): StreamingQuery =
    writer(stream, repo, branch, checkpointDir, trigger)(stage).start()

  def writer(stream: DataFrame, repo: Repository, branch: String,
             checkpointDir: String, trigger: Trigger)(
      stage: (graft.repo.Session, DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val session = repo.writableSession(branch)
          stage(session, batch, batchId)
          session.commit(s"stream batch $batchId")
          ()
        }
      }
}
