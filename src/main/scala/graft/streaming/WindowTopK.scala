package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key sliding-window streaming TOP-K — the collection-state
  * (`ListState`) sibling of the Sessionize4 / CooldownDedup /
  * QuotaLimiter `transformWithState` family (round 10, VERDICT item 5).
  *
  * Two admission semantics over one processor (round 11, ADVICE r10 —
  * the r10 doc claimed exact live-window semantics for the O(k)
  * buffer, which is unimplementable: a rejected event is forgotten, so
  * after a stronger entry expires the buffer under-fills vs the true
  * in-window top-k):
  *
  *  - EXACT (`exact = true`, the default): an event is admitted iff
  *    its value ranks among the `k` largest of the LIVE sliding window
  *    (`windowMs` ending at the event's own timestamp) — i.e. fewer
  *    than k live events (admitted OR rejected) beat it. This requires
  *    retaining every live event, so state is O(events-in-window) per
  *    key — bounded by rate x window, the same bound every windowed
  *    streaming aggregate carries, and pruned per event + by the
  *    cleanup timer.
  *  - ADMISSION-BUFFER (`exact = false`): the O(k)-state approximation
  *    — an event is admitted iff it beats the weakest RETAINED entry
  *    (the at-most-k previously admitted, still-live entries; rejected
  *    events are forgotten). A monotone filter that can over-admit
  *    after expiries deplete the buffer (e.g. k=2: A=10,B=9 admitted,
  *    C=5 rejected; A expires → D=1 is admitted though the live top-2
  *    is {B,C}). The right trade when k-state-per-key is the hard
  *    constraint and "roughly the strongest events" is the need.
  *
  * Admission emits the event with its rank-at-admission (1 + number of
  * live ranked-above entries, capped at k) and `topk_size` = the
  * number of live top-k slots occupied after admission (min(k, live
  * count)); non-admissions emit nothing (append mode).
  *
  * A ValueState tracks the registered cleanup timer (the QuotaLimiter
  * bookkeeping contract): once the watermark passes newest-entry +
  * window, nothing the retained entries could influence remains
  * admissible and the key's state clears.
  *
  * Determinism: batches replay in (ts, event_id) order; expiry is
  * evaluated against EACH event's own timestamp (entries with
  * ts <= e.ts − window are evicted before e competes), so the
  * admission sequence is a pure fold over the event sequence —
  * StreamingDepthSpec replays both modes sequentially and requires
  * parity, and re-splitting the same events across different
  * micro-batches cannot change the outcome. Late events compete
  * against the already-advanced buffer (conservative, the family's
  * frontier contract).
  */
object WindowTopK {

  case class ValuedEvent(user_id: Long, event_id: Long, ts: Instant, value: Double)
  case class TopEntry(event_id: Long, tsUs: Long, value: Double)
  case class Admitted(user_id: Long, event_id: Long, ts: Instant,
                      value: Double, rank_at_admission: Int, topk_size: Int)
  // NOT private: Encoders.product codegen (Janino) can't call accessors on a
  // private case class and silently falls back to interpreted serialization
  // (one compilerError stack per micro-batch).
  case class TimerBook(timerMs: Long)

  private def us(t: Instant): Long = t.getEpochSecond * 1000000L + t.getNano / 1000L

  class TopKProcessor(k: Int, windowMs: Long, exact: Boolean)
      extends StatefulProcessor[Long, ValuedEvent, Admitted] {
    private val windowUs = windowMs * 1000L
    @transient private var top: ListState[TopEntry] = _
    @transient private var book: ValueState[TimerBook] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState("top", Encoders.product[TopEntry], TTLConfig.NONE)
      book = getHandle.getValueState("book", Encoders.product[TimerBook], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ValuedEvent],
                                 tv: TimerValues): Iterator[Admitted] = {
      var buf = top.get().toVector
      val out = Vector.newBuilder[Admitted]
      rows.toVector.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
        val now = us(e.ts)
        buf = buf.filter(_.tsUs > now - windowUs)
        if (exact) {
          // buf holds EVERY live event; admit iff < k of them beat e
          val beaten = buf.count(_.value > e.value)
          val admit = beaten < k
          buf = buf :+ TopEntry(e.event_id, now, e.value)
          if (admit)
            out += Admitted(e.user_id, e.event_id, e.ts, e.value,
              1 + beaten, math.min(k, buf.size))
        } else {
          // buf holds at most k previously ADMITTED live entries
          val admit = buf.size < k || buf.exists(_.value < e.value)
          if (admit) {
            if (buf.size >= k) {
              // evict the weakest: min value, oldest then smallest id as
              // tie-breaks (deterministic across replays)
              val weakest = buf.minBy(t => (t.value, t.tsUs, t.event_id))
              buf = buf.filterNot(_ == weakest)
            }
            val rank = 1 + buf.count(_.value > e.value)
            buf = buf :+ TopEntry(e.event_id, now, e.value)
            out += Admitted(e.user_id, e.event_id, e.ts, e.value, rank, buf.size)
          }
        }
      }
      if (buf.isEmpty) { top.clear() } else { top.put(buf.toArray) }
      // cleanup timer: inert once the watermark passes newest + window
      val prior = if (book.exists()) Some(book.get()) else None
      if (buf.nonEmpty) {
        val newTimer = math.max(
          (buf.map(_.tsUs).max + windowUs) / 1000L + 1, tv.getCurrentWatermarkInMs() + 1)
        prior.filter(p => p.timerMs != 0L && p.timerMs != newTimer)
          .foreach(p => getHandle.deleteTimer(p.timerMs))
        if (!prior.exists(_.timerMs == newTimer)) getHandle.registerTimer(newTimer)
        book.update(TimerBook(newTimer))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Admitted] = {
      if (book.exists() && book.get().timerMs <= info.getExpiryTimeInMs) {
        top.clear(); book.clear()
      }
      Iterator.empty
    }
  }

  /** Admit events ranking in the live sliding top-`k` per user —
    * exact (full in-window retention) by default, `exact = false` for
    * the O(k)-state admission-buffer approximation (semantics above).
    * Call on a watermarked dataset; requires the RocksDB state store
    * provider (state-v2 runtime).
    */
  def admitted(events: Dataset[ValuedEvent], k: Int, windowMs: Long,
               exact: Boolean = true): Dataset[Admitted] = {
    implicit val enc: org.apache.spark.sql.Encoder[Admitted] = Encoders.product[Admitted]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TopKProcessor(k, windowMs, exact),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
