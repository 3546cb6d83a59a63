package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` member of the streaming family (the batch
  * windowed aggregations and watermark dedup cover the declarative
  * operators; gap-based sessions genuinely need per-key state the
  * built-ins cannot express, because a session's end is known only when
  * the watermark passes lastEvent + gap).
  *
  * State per user is three numbers (start, last, count) in the state
  * store, partitioned by the grouping key across executors exactly like
  * any keyed aggregation — the 100 TB-stream shape. Event-time timeouts
  * are driven by the watermark, so sessions CLOSE deterministically:
  * once no event within `gap` of the last one can still arrive, the
  * completed session is emitted (append mode) and the state freed.
  * In-batch events fold in timestamp order; a batch that itself contains
  * a gap emits the earlier session(s) immediately.
  */
object StreamingSessions {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class CompletedSession(user_id: Long, start_sec: Long,
                                    end_sec: Long, n_events: Int,
                                    duration_sec: Long)

  /** `stream` needs (`user_id` long, `ts` timestamp). `watermarkDelay`
    * bounds late data; `gapSeconds` is the inactivity gap that closes a
    * session. Output: one row per COMPLETED session.
    */
  def sessions(stream: DataFrame, gapSeconds: Long,
               watermarkDelay: String = "10 seconds"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def fold(user: Long, events: Iterator[SessionEvent],
             state: GroupState[SessionState]): Iterator[CompletedSession] = {
      def completed(s: SessionState) = CompletedSession(user,
        s.start / 1000, s.last / 1000, s.n, (s.last - s.start) / 1000)
      if (state.hasTimedOut) {
        // watermark passed last + gap: the session is closed for good
        val out = state.getOption.map(completed).iterator
        state.remove()
        return out
      }
      val sorted = events.map(_.ts.getTime).toArray.sorted
      var cur = state.getOption
      val out = scala.collection.mutable.ArrayBuffer[CompletedSession]()
      sorted.foreach { t =>
        cur match {
          // touches the open session at either end (a cross-batch
          // late-but-in-watermark event may precede the stored start —
          // extend the START too, not just the end)
          case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
            cur = Some(SessionState(math.min(s.start, t),
              math.max(s.last, t), s.n + 1))
          case Some(s) if t > s.last => // in-batch gap: close and restart
            out += completed(s)
            cur = Some(SessionState(t, t, 1))
          case Some(_) => // isolated event a full gap BEFORE the open
            // session: its own session, already closed (best-effort for
            // multi-inversion late data — the watermark bounds how late)
            out += completed(SessionState(t, t, 1))
          case None => cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      out.iterator
    }

    stream
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, CompletedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF()
  }
}
