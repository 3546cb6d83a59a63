package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the stateful twin of
  * [[graft.pipeline.Events.funnel]]: as events arrive, each user walks
  * the stage list IN ORDER (stage k's event strictly after their
  * stage-(k-1) arrival, optional horizon from the stage-1 arrival), and
  * every ADVANCE emits one append-mode row `(user_id, stage_idx, stage,
  * sec)` — the live "user reached checkout" feed that the batch
  * operator can only report after the fact.
  *
  * State per user is three numbers (stage index, stage-1 arrival, last
  * arrival) in the state store, keyed like any aggregation. A COMPLETED
  * user keeps a sentinel state (so a later stage-1 event cannot
  * silently restart the funnel and double-count the conversion), and
  * every state — mid-funnel or completed — expires via an event-time
  * timeout `expireAfterSeconds` past its last arrival, so the store is
  * bounded by users active within the expiry window, not users ever
  * seen. Timestamps compare at SECOND granularity with the exact
  * arithmetic of the batch twin (same strict-after and horizon
  * decisions on sub-second data). In-batch events fold in timestamp
  * order; cross-batch out-of-order events are best-effort (an event
  * older than the user's current progress cannot rewind the walk; no
  * emitted advance is ever retracted).
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String,
                               ts: java.sql.Timestamp)
  final case class FunnelState(k: Int, t1: Long, last: Long)
  final case class StageReached(user_id: Long, stage_idx: Int,
                                stage: String, sec: Long)

  /** `stream` needs (`user_id` long, `event_type` string, `ts`
    * timestamp). `withinSeconds` bounds the whole funnel to a horizon
    * after the stage-1 arrival, like the batch operator;
    * `expireAfterSeconds` bounds state lifetime past a user's last
    * qualifying event (watermark-driven).
    */
  def progress(stream: DataFrame, stages: Seq[String],
               withinSeconds: Long = Long.MaxValue,
               expireAfterSeconds: Long = 86400L,
               watermarkDelay: String = "10 seconds"): DataFrame = {
    require(stages.nonEmpty && stages.size <= 16,
      s"funnel: 1..16 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      "funnel: stages must be distinct")
    require(expireAfterSeconds > 0, "funnel: expireAfterSeconds > 0")
    val spark = stream.sparkSession
    import spark.implicits._

    def fold(user: Long, events: Iterator[FunnelEvent],
             state: GroupState[FunnelState]): Iterator[StageReached] = {
      if (state.hasTimedOut) { // abandoned or aged-out completed user
        state.remove()
        return Iterator.empty
      }
      var s = state.getOption.getOrElse(FunnelState(0, 0L, Long.MinValue))
      if (s.k >= stages.size) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer[StageReached]()
      events.toArray.sortBy(e => (e.ts.getTime, e.event_type))
        .foreach { e =>
          if (s.k < stages.size && e.event_type == stages(s.k)) {
            val t = e.ts.getTime / 1000
            val strictlyAfter = s.k == 0 || t > s.last
            val inHorizon = s.k == 0 || t - s.t1 <= withinSeconds
            if (strictlyAfter && inHorizon) {
              s = FunnelState(s.k + 1, if (s.k == 0) t else s.t1, t)
              out += StageReached(user, s.k, stages(s.k - 1), t)
            }
          }
        }
      // Only materialize state on an actual advance: a user whose first
      // batch holds no stage-1 event must NOT get state at last=MinValue
      // (its timeout would be ~epoch-1970, behind any real watermark, and
      // Spark fails the whole query on such a timestamp). No advance → no
      // state to expire; existing state keeps its previous timeout.
      if (out.nonEmpty) {
        state.update(s) // completed users keep a sentinel (no restarts)
        state.setTimeoutTimestamp((s.last + expireAfterSeconds) * 1000L)
      }
      out.iterator
    }

    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF()
  }
}
