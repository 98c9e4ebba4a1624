package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key sliding-window streaming TOP-K — the collection-state
  * (`ListState`) sibling of the Sessionize4 / CooldownDedup /
  * QuotaLimiter `transformWithState` family (round 10, VERDICT item 5).
  *
  * Semantics: per user, admit an event iff its value ranks among the
  * `k` largest of the LIVE sliding window (`windowMs` ending at the
  * event's own timestamp) at the moment it is processed — the
  * streaming leaderboard / "top offers per user" shape. Admission
  * emits the event with its rank-at-admission and the buffer size;
  * non-admissions emit nothing (append mode).
  *
  * State per key is a `ListState[TopEntry]` holding at most k live
  * entries — the current top-k candidates — NOT the window's full
  * history: an event that can't beat the k-th best now never can
  * later (values don't change; entries only expire, which can only
  * make room). So state is O(k) per active key at any scale. A
  * ValueState tracks the registered cleanup timer (the QuotaLimiter
  * bookkeeping contract): once the watermark passes newest-entry +
  * window, nothing the buffer could outrank remains admissible and
  * the key's state clears.
  *
  * Determinism: batches replay in (ts, event_id) order; expiry is
  * evaluated against EACH event's own timestamp (entries with
  * ts <= e.ts − window are evicted before e competes), so the
  * admission sequence is a pure fold over the event sequence —
  * StreamingDepthSpec replays it sequentially and requires parity,
  * and re-splitting the same events across different micro-batches
  * cannot change the outcome. Late events compete against the
  * already-advanced buffer (conservative, the family's frontier
  * contract).
  */
object WindowTopK {

  case class ValuedEvent(user_id: Long, event_id: Long, ts: Instant, value: Double)
  case class TopEntry(event_id: Long, tsUs: Long, value: Double)
  case class Admitted(user_id: Long, event_id: Long, ts: Instant,
                      value: Double, rank_at_admission: Int, topk_size: Int)
  private case class TimerBook(timerMs: Long)

  private def us(t: Instant): Long = t.getEpochSecond * 1000000L + t.getNano / 1000L

  class TopKProcessor(k: Int, windowMs: Long)
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

  /** Admit events ranking in the live sliding top-`k` per user. Call
    * on a watermarked dataset; requires the RocksDB state store
    * provider (state-v2 runtime).
    */
  def admitted(events: Dataset[ValuedEvent], k: Int, windowMs: Long): Dataset[Admitted] = {
    implicit val enc: org.apache.spark.sql.Encoder[Admitted] = Encoders.product[Admitted]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TopKProcessor(k, windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
