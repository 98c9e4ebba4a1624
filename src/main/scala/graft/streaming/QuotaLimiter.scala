package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key event-time quota limiting — admit at most `maxPerWindow`
  * events per (user, event_type) per tumbling event-time hour, drop
  * the rest. The ingest-side rate control every collection pipeline
  * runs in front of expensive sinks (alert fan-out, enrichment
  * calls, per-event model scoring); the COUNTING sibling of the
  * dedup family (StreamDedup admits by novelty, CooldownDedup by
  * elapsed time, this by budget).
  *
  * State per key is ONE (windowStart, count) pair — the current
  * tumbling window's budget. Batches replay in (ts, event_id) order;
  * an event in a LATER window resets the counter (tumbling, not
  * sliding — budget does not carry over). Late events from an
  * ALREADY-PASSED window are dropped even if that window's budget
  * had room (the state only knows the newest window — conservative,
  * like CooldownDedup's frontier contract; with a watermark such
  * events are beyond-watermark anyway). State expires via an
  * event-time timer one full window after the tracked window's end:
  * once the watermark passes that, nothing the state could meter
  * remains admissible.
  *
  * Spark-4 `transformWithState` (RocksDB provider): named typed
  * ValueState + explicit timers — the third processor in the
  * Sessionize4 / CooldownDedup family.
  */
object QuotaLimiter {

  case class Admitted(user_id: Long, event_type: String, event_id: Long,
                      ts: Instant, n_in_window: Long)
  /** `timerMs` is the expiry timestamp ACTUALLY registered for this
    * key — carried in state because it cannot be recomputed from
    * `windowStartUs` alone (registration takes the max with the
    * then-current watermark + 1, which later batches don't know).
    * Tracking it lets each batch delete the superseded timer instead
    * of accumulating one stale no-op timer per (key, batch).
    */
  case class WindowBudget(windowStartUs: Long, count: Long, timerMs: Long)

  private def us(t: Instant): Long = t.getEpochSecond * 1000000L + t.getNano / 1000L

  class QuotaProcessor(maxPerWindow: Int, windowMs: Long)
      extends StatefulProcessor[(Long, String), CooldownDedup.KeyedEvent, Admitted] {
    private val windowUs = windowMs * 1000L
    @transient private var budget: ValueState[WindowBudget] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      budget = getHandle.getValueState("budget", Encoders.product[WindowBudget], TTLConfig.NONE)

    private def windowStart(eventUs: Long): Long = eventUs - eventUs % windowUs

    override def handleInputRows(key: (Long, String),
                                 rows: Iterator[CooldownDedup.KeyedEvent],
                                 tv: TimerValues): Iterator[Admitted] = {
      val batch = rows.toVector.sortBy(e => (us(e.ts), e.event_id))
      val prior = if (budget.exists()) Some(budget.get()) else None
      var state = prior
      val out = Vector.newBuilder[Admitted]
      batch.foreach { e =>
        val w = windowStart(us(e.ts))
        state match {
          case Some(b) if w < b.windowStartUs => // late, window already advanced: drop
          case Some(b) if w == b.windowStartUs =>
            if (b.count < maxPerWindow) {
              val nb = b.copy(count = b.count + 1)
              state = Some(nb)
              out += Admitted(e.user_id, e.event_type, e.event_id, e.ts, nb.count)
            } // else: budget exhausted, drop
          case _ => // first event ever, or a newer window: reset the budget
            state = Some(WindowBudget(w, 1, 0L))
            out += Admitted(e.user_id, e.event_type, e.event_id, e.ts, 1)
        }
      }
      state.foreach { b =>
        // inert once wm passes window end + one window of lateness slack
        val newTimer = math.max(
          (b.windowStartUs + 2 * windowUs) / 1000L, tv.getCurrentWatermarkInMs() + 1)
        // delete the timer the PREVIOUS batch registered (its actual
        // registered timestamp, from state) so per-key timer state
        // stays O(1) instead of growing one stale entry per batch
        prior.filter(p => p.timerMs != 0L && p.timerMs != newTimer)
          .foreach(p => getHandle.deleteTimer(p.timerMs))
        if (!prior.exists(_.timerMs == newTimer)) getHandle.registerTimer(newTimer)
        budget.update(b.copy(timerMs = newTimer))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Long, String), tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Admitted] = {
      // only clear if this firing is the timer current state registered
      // (superseded timers are deleted eagerly; the guard keeps a
      // just-in-case race from wiping a live window's budget)
      if (budget.exists() && budget.get().timerMs <= info.getExpiryTimeInMs)
        budget.clear()
      Iterator.empty
    }
  }

  /** Admit ≤ `maxPerWindow` events per key per tumbling `windowMs`
    * event-time window. Call on a watermarked dataset; requires the
    * RocksDB state store provider (state-v2 runtime).
    */
  def admitted(events: Dataset[CooldownDedup.KeyedEvent], maxPerWindow: Int,
               windowMs: Long): Dataset[Admitted] = {
    implicit val enc: org.apache.spark.sql.Encoder[Admitted] = Encoders.product[Admitted]
    events
      .groupByKey(e => (e.user_id, e.event_type))(
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .transformWithState(new QuotaProcessor(maxPerWindow, windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
