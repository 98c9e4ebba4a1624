package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  */
object Sessions extends QueryGroup {

  private val gapMinutes = 30
  private val gapMs = gapMinutes * 60 * 1000L

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
    })
  )

  override val oracleSql: Map[String, String] = Map(
    "q29_session_window" -> oracle,
    "q30_sessionize_stateful" -> oracle)
}
