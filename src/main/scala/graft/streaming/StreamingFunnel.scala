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
  * arrival) in the state store, keyed like any aggregation; state is
  * REMOVED the moment a user completes the last stage, so steady-state
  * size is bounded by users mid-funnel, not users ever seen. In-batch
  * events fold in timestamp order; cross-batch out-of-order events are
  * best-effort (an event older than the user's current progress cannot
  * rewind the walk — the watermarkless design means no emitted advance
  * is ever retracted, matching the batch strict-ordering semantics for
  * in-order delivery).
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String,
                               ts: java.sql.Timestamp)
  final case class FunnelState(k: Int, t1: Long, last: Long)
  final case class StageReached(user_id: Long, stage_idx: Int,
                                stage: String, sec: Long)

  /** `stream` needs (`user_id` long, `event_type` string, `ts`
    * timestamp). `withinSeconds` bounds the whole funnel to a horizon
    * after the stage-1 arrival, like the batch operator.
    */
  def progress(stream: DataFrame, stages: Seq[String],
               withinSeconds: Long = Long.MaxValue): DataFrame = {
    require(stages.nonEmpty && stages.size <= 16,
      s"funnel: 1..16 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      "funnel: stages must be distinct")
    val spark = stream.sparkSession
    import spark.implicits._

    def fold(user: Long, events: Iterator[FunnelEvent],
             state: GroupState[FunnelState]): Iterator[StageReached] = {
      var s = state.getOption.getOrElse(FunnelState(0, 0L, Long.MinValue))
      if (s.k >= stages.size) return Iterator.empty // already completed
      val out = scala.collection.mutable.ArrayBuffer[StageReached]()
      events.toArray.sortBy(_.ts.getTime).foreach { e =>
        if (s.k < stages.size && e.event_type == stages(s.k)) {
          val t = e.ts.getTime
          val strictlyAfter = s.k == 0 || t > s.last
          val inHorizon = s.k == 0 ||
            (t - s.t1) / 1000 <= withinSeconds
          if (strictlyAfter && inHorizon) {
            s = FunnelState(s.k + 1, if (s.k == 0) t else s.t1, t)
            out += StageReached(user, s.k, stages(s.k - 1), t / 1000)
          }
        }
      }
      if (s.k >= stages.size) state.remove() // done: free the state
      else if (out.nonEmpty) state.update(s) // only advances change it
      out.iterator
    }

    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
      .toDF()
  }
}
