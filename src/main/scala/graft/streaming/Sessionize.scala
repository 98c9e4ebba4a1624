package graft.streaming

import java.time.Instant
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * "streaming state beyond the reference" operator (SURVEY.md §7.3
  * stage 4). The reference had checkpoint plumbing but never a stateful
  * operator (SURVEY.md §2.2); this is the canonical one: group events by
  * user, close a session when `gapMs` passes without activity.
  *
  * All arithmetic is in epoch MICROseconds (`Instant`, not
  * `java.sql.Timestamp.getTime` which truncates to millis — the events
  * table carries microsecond timestamps and the DuckDB oracle compares
  * them exactly).
  *
  * Scale notes: state is one small fixed-size record per active user key,
  * hash-partitioned by the groupBy shuffle across executors and persisted
  * in the checkpointed state store; event-time timeout + watermark bound
  * state growth (idle keys are evicted when the watermark passes
  * last+gap). Semantics match the built-in `session_window` (end = last
  * event + gap), cross-checked by the oracle-backed batch queries.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Instant, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Instant,
                     session_end: Instant, n_events: Long, sum_value: Double)

  private def us(t: Instant): Long = t.getEpochSecond * 1000000L + t.getNano / 1000L
  private def instant(u: Long): Instant = Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L)

  /** Split a user's events into gap-separated sessions (input sorted here). */
  private[streaming] def split(events: Seq[Event], gapUs: Long): Vector[SessionState] =
    events.sortBy(e => us(e.ts)).foldLeft(Vector.empty[SessionState]) { (acc, e) =>
      val t = us(e.ts)
      acc.lastOption match {
        case Some(s) if t - s.lastUs < gapUs =>
          acc.init :+ s.copy(lastUs = t, n = s.n + 1, sum = s.sum + e.value)
        case _ => acc :+ SessionState(t, t, 1, e.value)
      }
    }

  private[streaming] def toSession(uid: Long, s: SessionState, gapUs: Long): Session =
    Session(uid, instant(s.startUs), instant(s.lastUs + gapUs), s.n, s.sum)

  /** Interval-merge a recovered open session with a batch's sessions,
    * ordered by start time (shared by the flatMapGroupsWithState and
    * transformWithState implementations — see the in-line rationale at
    * the call site in [[sessions]]).
    */
  private[streaming] def mergeSessions(prior: Seq[SessionState], batch: Seq[Event],
                                       gapUs: Long): Vector[SessionState] = {
    val all = (prior ++ split(batch, gapUs)).sortBy(_.startUs)
    all.tail.foldLeft(Vector(all.head)) { (acc, s) =>
      val prev = acc.last
      if (s.startUs - prev.lastUs < gapUs)
        acc.init :+ prev.copy(lastUs = math.max(prev.lastUs, s.lastUs),
                              n = prev.n + s.n, sum = prev.sum + s.sum)
      else acc :+ s
    }
  }

  /** Streaming sessionize. Call on a dataset that already has
    * `withWatermark("ts", ...)`; a user's session closes and emits when
    * the event-time timeout fires (watermark passes last event + gap).
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession(uid, _, gapUs))
            state.remove()
            out.iterator
          } else {
            val batch = it.toSeq
            if (batch.isEmpty) Iterator.empty
            else {
              // Interval-merge the recovered open session with the batch's
              // sessions, ordered by start time. A plain "does the first
              // batch session extend the state" test breaks on late (but
              // within-watermark) events that precede the open session:
              // it would drag lastUs backwards and emit a session that
              // ends before it starts. Sorting + gap-merging with
              // max(lastUs) handles any arrival order.
              val merged = mergeSessions(state.getOption.toSeq, batch, gapUs)
              // The latest session stays open; everything earlier is closed
              // (any future event that could extend one would be behind the
              // watermark once the timeout for the open session fires).
              val (closed, open) = (merged.init, merged.last)
              state.update(open)
              state.setTimeoutTimestamp((open.lastUs + gapUs) / 1000L)
              closed.iterator.map(toSession(uid, _, gapUs))
            }
          }
      }
  }

  /** Batch-mode sessionize. `flatMapGroupsWithState` never fires
    * timeouts under batch execution, which would swallow each user's
    * final open session — so batch uses a plain `flatMapGroups` over
    * the same `split` logic.
    */
  def sessionsBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[Event]) =>
      split(it.toSeq, gapUs).map(toSession(uid, _, gapUs)).iterator
    }
  }
}
