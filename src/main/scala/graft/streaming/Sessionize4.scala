package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Sessionization on Spark 4's `transformWithState` — the successor of
  * `flatMapGroupsWithState` (SURVEY.md §2.2's "or Spark 4
  * transformWithState"). Same semantics as [[Sessionize.sessions]]
  * (session closes `gap` after the last event; late-but-in-watermark
  * events interval-merge), held to the same assertions in
  * StreamingDepthSpec, but expressed in the new API's vocabulary:
  *
  *  - state is a named, typed `ValueState` on the processor handle
  *    (instead of the single implicit GroupState value);
  *  - session expiry is an explicit registered EVENT-TIME TIMER with a
  *    `handleExpiredTimer` callback (instead of
  *    `setTimeoutTimestamp` + a hasTimedOut branch in the one handler);
  *  - the runtime requires the RocksDB state store provider, which is
  *    also the provider you'd run at scale (changelog checkpointing,
  *    bounded memory via off-heap blocks).
  *
  * Scale notes are identical to [[Sessionize]]: one small record per
  * active key, hash-partitioned by the groupBy, persisted in the
  * checkpointed store; the watermark bounds both state and timers.
  */
object Sessionize4 {

  import Sessionize.{Event, Session, SessionState, mergeSessions, toSession}

  class SessionProcessor(gapMs: Long) extends StatefulProcessor[Long, Event, Session] {
    private val gapUs = gapMs * 1000L
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.product[SessionState], TTLConfig.NONE)

    private def expiryMs(s: SessionState): Long = (s.lastUs + gapUs) / 1000L

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] = {
      val batch = rows.toSeq
      if (batch.isEmpty) Iterator.empty
      else {
        val prior = if (open.exists()) Seq(open.get()) else Nil
        prior.foreach(s => getHandle.deleteTimer(expiryMs(s)))
        val merged = mergeSessions(prior, batch, gapUs)
        val (closed, live) = (merged.init, merged.last)
        open.update(live)
        getHandle.registerTimer(expiryMs(live))
        closed.iterator.map(toSession(key, _, gapUs))
      }
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      // A stale timer (session was extended after this timer was set,
      // e.g. across a restart) must not close the live session early.
      if (open.exists() && expiryMs(open.get()) <= info.getExpiryTimeInMs) {
        val out = toSession(key, open.get(), gapUs)
        open.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  /** Streaming sessionize; call on a dataset with `withWatermark("ts", ...)`.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState's state-v2 backend).
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
