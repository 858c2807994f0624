package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the custom-state path of §2.12
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`) — per-user session
  * state carried across micro-batches, sessions emitted when the gap
  * timeout fires or a later event closes them. The batch twin is
  * `queries.Sessions.sessionize` (same gap rule), which pins the
  * semantics the stream must converge to.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Int, sum_value: Double)

  val GapMs: Long = 30 * 60 * 1000

  def updateState(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toVector.sortBy(_.ts.getTime)
    var cur = state.getOption
    val closed = Vector.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.end <= GapMs =>
          cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed += Session(userId, s.start, s.end, s.n, s.sum)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    if (state.hasTimedOut) {
      val out = cur.map(s => Session(userId, s.start, s.end, s.n, s.sum))
      state.remove()
      cur = None
      return (closed.result() ++ out).iterator
    }
    cur match {
      case Some(s) =>
        state.update(s)
        state.setTimeoutDuration(GapMs)
      case None => ()
    }
    closed.result().iterator
  }

  /** Streaming query over an event stream; emits sessions as they close. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(updateState)
  }

  /** Watermarked exact stream dedup by event id ALONE (a re-extraction of
    * the same id at a different timestamp is still a duplicate);
    * `dropDuplicatesWithinWatermark` bounds the id state to the watermark
    * horizon instead of keeping it forever. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
}
