package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryGroup, Tables}
import graft.streaming.Sessionize

/** Sessionization in batch form — two implementations of the same
  * semantics (session end = last event + gap), both held to the same
  * gaps-and-islands DuckDB oracle:
  *
  *  - q29: Spark's built-in `session_window` (declarative; Catalyst
  *    plans a single hash-partitioned aggregation — the scale path).
  *  - q30: the custom stateful `Sessionize` used by the streaming
  *    pipeline, run through its batch entry point — proving the
  *    streaming operator's logic against SQL semantics.
  *  - q60: as-of join (click → latest view at-or-before it, per user).
  *    Spark has no ASOF JOIN; the scalable form is the union+window
  *    plan — tag both sides, one shuffle by key, sort by (ts, side),
  *    carry the last view forward — never a per-pair range join. The
  *    oracle is DuckDB's native ASOF LEFT JOIN, an independent
  *    implementation of the same semantics.
  *  - q75: interval-containment join with NO equi key (each purchase
  *    counted against every 5-minute error window containing it).
  *    Written naively this is a cartesian/BNLJ — the q36/q42 disease.
  *    The scale plan is TIME-BIN BLOCKING: bin width == window width,
  *    so a window covers at most 2 bins; explode windows to their
  *    distinct covered bins, equi-join on the bin (one shuffle keyed
  *    by time bin — AQE's skew split handles hot bins), then apply
  *    the exact containment predicate. Lossless (a probe's single bin
  *    always appears among its containing window's bins, and distinct
  *    bins mean no double-match), so the oracle is the plain
  *    range-predicate LEFT JOIN.
  */
object Sessions extends QueryGroup {

  private val gapMinutes = 30
  private val gapMs = gapMinutes * 60 * 1000L
  private val windowMinutes = 5

  private val oracle: String = s"""
    WITH marked AS (
      SELECT user_id, ts::TIMESTAMP AS ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL $gapMinutes MINUTE THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
  """.trim

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"),
                col("session_window.start").as("session_start"),
                col("session_window.end").as("session_end"),
                col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    }),
    "q30_sessionize_stateful" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("value"))
        .as[Sessionize.Event]
      Sessionize.sessionsBatch(ev, gapMs).toDF()
        .withColumn("sum_value", round(col("sum_value"), 2))
        .orderBy("user_id", "session_start")
    }),
    "q60_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // one view per (user_id, ts): keep max event_id so ties are deterministic
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts")).agg(max("event_id").as("view_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"), col("value"))
      // union+window as-of: views sort before clicks at equal ts, so a
      // same-instant view is matched ("at or before"); last(ignoreNulls)
      // carries the most recent view forward within each user.
      val u = views.select(col("user_id"), col("ts"), lit(0).as("side"),
            col("view_id"), lit(null).cast("long").as("click_id"),
            lit(null).cast("double").as("value"))
        .unionByName(clicks.select(col("user_id"), col("ts"), lit(1).as("side"),
            lit(null).cast("long").as("view_id"), col("click_id"), col("value")))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("asof_view_id", last(col("view_id"), ignoreNulls = true).over(w))
        .withColumn("asof_view_ts",
          last(when(col("view_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("click_id"), col("user_id"), col("ts").as("click_ts"), col("value"),
                col("asof_view_id").as("view_id"), col("asof_view_ts").as("view_ts"))
        .orderBy("click_id")
    }),
    "q75_interval_join" -> ((s, d) => {
      val binMicros = windowMinutes * 60L * 1000000L
      val ev = Tables.events(s, d)
      // each error opens a [ts, ts+5min) incident window; explode to
      // its (≤2, distinct) covered time bins — the blocking key
      val windows = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
        .withColumn("bin", explode(expr(
          s"array_distinct(array(unix_micros(err_ts) DIV $binMicros," +
          s" (unix_micros(err_ts) + $binMicros - 1) DIV $binMicros))")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("bin", expr(s"unix_micros(ts) DIV $binMicros"))
      purchases.join(windows,
          purchases("bin") === windows("bin") &&
          col("ts") >= col("err_ts") &&
          col("ts") < col("err_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
          "left")
        .groupBy(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
        .agg(count(col("err_id")).as("n_overlapping_errors"))
        .orderBy("event_id")
    })
  )

  override val oracleSql: Map[String, String] = Map(
    "q29_session_window" -> oracle,
    "q30_sessionize_stateful" -> oracle,
    "q60_asof_join" -> """
      WITH v AS (
        SELECT user_id, ts::TIMESTAMP AS ts, max(event_id) AS view_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
      ),
      c AS (
        SELECT user_id, ts::TIMESTAMP AS ts, event_id AS click_id, value
        FROM events WHERE event_type = 'click'
      )
      SELECT c.click_id, c.user_id, c.ts AS click_ts, c.value,
             v.view_id, v.ts AS view_ts
      FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
      ORDER BY click_id
    """.trim,
    "q75_interval_join" -> s"""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'purchase'),
      w AS (SELECT event_id AS err_id, ts::TIMESTAMP AS ts
            FROM events WHERE event_type = 'error')
      SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
             count(w.err_id) AS n_overlapping_errors
      FROM p LEFT JOIN w
        ON p.ts >= w.ts AND p.ts < w.ts + INTERVAL $windowMinutes MINUTE
      GROUP BY p.event_id, p.user_id, p.ts
      ORDER BY p.event_id
    """.trim)
}
