package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream click↔impression attribution join — the canonical
  * Structured Streaming two-stream operator (the reference's DStream
  * surface has no analog; SURVEY §2.2 C4's streaming row).
  *
  * Semantics: a click attributes to every impression of the same user
  * whose timestamp is within `[imp_ts, imp_ts + horizon]`. Both sides
  * carry watermarks, and the join condition bounds BOTH event times,
  * which is exactly what lets Spark derive state-cleanup predicates:
  * impression state is evicted once the click watermark passes
  * `imp_ts + horizon`, click state once the impression watermark
  * passes `click_ts` — state is bounded by (delay + horizon) of
  * event-time per key, never by history. Without the range condition
  * a stream-stream join keeps both sides forever; this shape is the
  * difference between a pipeline that survives a week and one that
  * OOMs on day two.
  *
  * Two output modes over one join body (no fork):
  *  - [[attributed]]: INNER — matched (impression, click) pairs only,
  *    emitted as soon as both sides have arrived.
  *  - [[attributedLeftOuter]]: LEFT OUTER — additionally emits each
  *    unmatched impression exactly once, with null click columns, but
  *    only after the watermark PROVES no in-horizon click can still
  *    arrive (the null row is a certified "this impression never
  *    converted", not a guess — which is why outer results trail the
  *    inner ones by the watermark delay).
  *
  * Input contracts: `imps` has (imp_id, user_id, imp_ts timestamp),
  * `clicks` has (click_id, user_id, click_ts timestamp).
  */
object Attribution {

  private def joined(imps: DataFrame, clicks: DataFrame,
                     horizonSec: Long, delaySec: Long, mode: String): DataFrame = {
    // batch inputs run the SAME body (q262's oracle-judged twin):
    // watermarks only exist on streams, the join itself is mode-blind
    def marked(df: DataFrame, tsCol: String): DataFrame =
      if (df.isStreaming) df.withWatermark(tsCol, s"$delaySec seconds") else df
    val i = marked(imps, "imp_ts")
    val c = marked(clicks.withColumnRenamed("user_id", "click_user_id"), "click_ts")
    i.join(c,
        expr(s"""user_id = click_user_id
                 AND click_ts >= imp_ts
                 AND click_ts <= imp_ts + INTERVAL $horizonSec SECONDS"""),
        mode)
      .select(col("user_id"), col("imp_id"), col("imp_ts"),
              col("click_id"), col("click_ts"),
              (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts")))
                .as("lag_sec"))
  }

  /** Matched pairs only (inner). */
  def attributed(imps: DataFrame, clicks: DataFrame,
                 horizonSec: Long, delaySec: Long): DataFrame =
    joined(imps, clicks, horizonSec, delaySec, "inner")

  /** Matched pairs + watermark-certified unconverted impressions with
    * null click columns (left outer).
    */
  def attributedLeftOuter(imps: DataFrame, clicks: DataFrame,
                          horizonSec: Long, delaySec: Long): DataFrame =
    joined(imps, clicks, horizonSec, delaySec, "leftOuter")
}
