package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryGroup, Tables}
import graft.Tables.GraftCheckpointOps

/** Data-quality profiling + event-sequence analytics (round 3):
  *
  *  - q82 table profile: per-column null count, exact distinct count,
  *    min/max — over ANY DataFrame ([[profile]] is schema-driven, the
  *    judged query applies it to `orders`). ONE scan: all per-column
  *    aggregates run in a single wide aggregation and `stack` unpivots
  *    the 1-row result. The exact multi-distinct forces Catalyst's
  *    Expand (×|columns| rows); [[profileApprox]] is the 100 TB form —
  *    HLL distinct counts, no Expand — held to the exact profile by a
  *    spec instead of the oracle (sketches differ across engines).
  *  - q83 event transition counts: (prev_type → type) Markov counts
  *    per user via `lag` over (ts, event_id) — funnels' raw material.
  *    One shuffle by user_id, then a small keyed aggregation.
  *  - q84 funnel: strict view → click → purchase ordering per user,
  *    computed from per-user min event times (single aggregation — no
  *    self-joins per stage, the naive funnel shape).
  */
object Profiling extends QueryGroup {

  /** Single-pass exact profile of `df`; columns sorted by name.
    * Supported: flat columns of atomic (orderable, equatable) types
    * with identifier-safe names — validated up front so a map column
    * or a quote-bearing name fails fast here, not as a parse error
    * inside the generated `stack` call.
    */
  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(col(c)))

  /** Scale form: approx_count_distinct (mergeable HLL, no Expand);
    * rsd 2% — the profile's distinct count is an estimate by contract.
    */
  def profileApprox(df: DataFrame): DataFrame =
    profileWith(df, c => approx_count_distinct(col(c), 0.02))

  private def profileWith(df: DataFrame, distinctAgg: String => Column): DataFrame = {
    df.schema.fields.foreach { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"profile: unsupported column name '${f.name}' (identifier-safe names only)")
      require(!Seq(classOf[org.apache.spark.sql.types.ArrayType],
                   classOf[org.apache.spark.sql.types.MapType],
                   classOf[org.apache.spark.sql.types.StructType])
                .exists(_.isInstance(f.dataType)),
        s"profile: column '${f.name}' has non-atomic type ${f.dataType.simpleString}")
    }
    val fields = df.schema.fields.map(_.name)
    val aggs = fields.flatMap { c => Seq(
      // coalesce: conditional sum over ZERO rows is NULL, but an empty
      // table has 0 nulls, not unknown
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}__nulls"),
      distinctAgg(c).as(s"${c}__distinct"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val stackArgs = fields.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`").mkString(", ")
    wide.selectExpr("__n AS n_rows",
        s"stack(${fields.length}, $stackArgs) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
      .select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
      .orderBy("column_name")
  }

  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(

    // fanOut: the exact-distinct Expand multiplies rows ×|columns|+1
    // and a single-row-group scan would run that partial agg on one
    // core (3.5 s CPU at sf0.1 vs ~0.5 s fanned out)
    ("q82_table_profile", (s, d) => profile(Tables.fanOut(Tables.orders(s, d))), Some {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
               count(*) - count($c) AS n_nulls,
               count(DISTINCT $c) AS n_distinct,
               min($c)::VARCHAR AS min_value, max($c)::VARCHAR AS max_value
            FROM orders"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    }),

    // The 100 TB profile form, judged under the driver's rows-only
    // check (HLL estimates differ across engines, so no value oracle;
    // CorpusSpec holds it to the exact profile within HLL error): same
    // single scan, mergeable sketches instead of the ×|columns| Expand.
    ("q88_table_profile_approx", (s, d) => profileApprox(Tables.fanOut(Tables.orders(s, d))), None),

    ("q83_transition_counts", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "event_type")
    }, Some("""
      WITH t AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS prev_type
        FROM events)
      SELECT prev_type, event_type, count(*) AS n
      FROM t WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
      ORDER BY prev_type, event_type
    """)),

    // Weekly cohort retention: users grouped by first-seen week, then
    // distinct-active counts at week offsets 0..3. ONE events scan and
    // ONE user-keyed shuffle: the per-user distinct-week set is built
    // with collect_set (map-side partial dedup), the cohort is its
    // minimum, and the explode re-emits exactly one row per
    // (user, week) — so the final count per (cohort, k) is a plain
    // count, no distinct Expand. (The previous form scanned events
    // twice — first-seen agg + active distinct — and joined the halves
    // back by user.) Weeks-per-user is bounded by the corpus timespan,
    // so the set state is small at any scale.
    ("q86_cohort_retention", (s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .groupBy("user_id")
        .agg(sort_array(collect_set(col("week"))).as("weeks"))
        .select(col("user_id"), element_at(col("weeks"), 1).as("cohort"),
          explode(col("weeks")).as("week"))
        .withColumn("k", expr("datediff(week, cohort) DIV 7").cast("long"))
        .filter(col("k") <= 3)
        .groupBy("cohort", "k")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "k")
    }, Some("""
      WITH f AS (SELECT user_id, min(date_trunc('week', ts::TIMESTAMP)) AS cohort
                 FROM events GROUP BY 1),
      a AS (SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP) AS week FROM events),
      j AS (SELECT a.user_id, f.cohort,
                   datediff('day', f.cohort, a.week) // 7 AS k
            FROM a JOIN f USING (user_id))
      SELECT cohort, k, count(DISTINCT user_id) AS n_users
      FROM j WHERE k <= 3
      GROUP BY cohort, k
      ORDER BY cohort, k
    """)),

    ("q84_funnel", (s, d) => {
      val stage = Tables.events(s, d).groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("v"),
        min(when(col("event_type") === "click", col("ts"))).as("c"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      stage.select(
        count(lit(1)).as("n_users"),
        sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("viewed"),
        sum(when(col("v").isNotNull && col("c").isNotNull && col("c") > col("v"), 1L)
          .otherwise(0L)).as("clicked_after_view"),
        sum(when(col("v").isNotNull && col("c").isNotNull && col("p").isNotNull &&
                 col("c") > col("v") && col("p") > col("c"), 1L)
          .otherwise(0L)).as("purchased_after_click"))
    }, Some("""
      WITH stage AS (
        SELECT user_id,
               min(ts::TIMESTAMP) FILTER (event_type = 'view') AS v,
               min(ts::TIMESTAMP) FILTER (event_type = 'click') AS c,
               min(ts::TIMESTAMP) FILTER (event_type = 'purchase') AS p
        FROM events GROUP BY user_id)
      SELECT count(*) AS n_users,
             count(*) FILTER (v IS NOT NULL) AS viewed,
             count(*) FILTER (v IS NOT NULL AND c IS NOT NULL AND c > v) AS clicked_after_view,
             count(*) FILTER (v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL
                              AND c > v AND p > c) AS purchased_after_click
      FROM stage
    """)),

    // ------------------------------------------------- equi-width histogram (round 4)
    // The distribution companion to q82's min/max profile: one scan,
    // bin assignment is a per-row floor (map-side), the aggregate is 20
    // groups, and the bin grid joins back so EMPTY bins appear as zero
    // rows (a histogram with silent gaps misreads as continuous). The
    // unpartitioned pct window runs over the 20-row aggregate, never
    // the data (the q66 rule). floor(x / width) is exactly portable;
    // the overflow bin clamps with least().
    ("q104_histogram", (s, d) => {
      val binW = 30000L; val nBins = 20
      val binned = Tables.orders(s, d)
        .select(least(lit(nBins - 1L), floor(col("o_totalprice") / binW)).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
      val grid = s.range(nBins).select(col("id").as("bin"))
      grid.join(binned, Seq("bin"), "left")
        .select(col("bin"), (col("bin") * binW).as("lo"), ((col("bin") + 1) * binW).as("hi"),
                coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("pct", col("n").cast("double") /
          sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .orderBy("bin")
    }, Some("""
      WITH b AS (
        SELECT least(19, floor(o_totalprice / 30000))::BIGINT AS bin, count(*) AS n
        FROM orders GROUP BY 1),
      g AS (SELECT i AS bin FROM generate_series(0, 19) t(i))
      SELECT g.bin, g.bin * 30000 AS lo, (g.bin + 1) * 30000 AS hi,
             coalesce(b.n, 0)::BIGINT AS n,
             coalesce(b.n, 0)::DOUBLE / sum(coalesce(b.n, 0)) OVER () AS pct
      FROM g LEFT JOIN b USING (bin)
      ORDER BY bin
    """)),

    // ------------------------------------------------------------ cooldown dedup (round 6)
    // Time-horizon event deduplication: suppress repeats of the same
    // (user, event_type) within a 12-hour cooldown of the PREVIOUS
    // occurrence — the alerting/notification dedup every event
    // pipeline runs (and the time-aware form of exact dedup: q31
    // collapses identical payloads forever; this collapses them only
    // while they arrive in bursts). One lag() over the key-partitioned
    // timeline — a single key shuffle, each group's history streamed
    // through one sorted pass regardless of length. Kept = first event
    // ever, or gap from the previous SAME-KEY event > cooldown
    // (equivalently: the first event of each 12-hour gap-session —
    // session_window in a dedup role). WARNING — gap-session, not
    // sliding-cooldown semantics: the cooldown measures from the
    // previous OCCURRENCE (kept or suppressed), NOT from the last
    // KEPT event, so a steady drip of sub-12h events stays suppressed
    // after the first (one alert per burst). Alerting pipelines that
    // want "re-emit every 12h during a sustained burst" need
    // last-emitted state (streaming form: mapGroupsWithState keeping
    // last_kept_ts, cf. streaming/StreamDedup.scala); this batch form
    // is the windowable one — lag() is a single pass, while
    // last-KEPT-event is a running recurrence no window frame
    // expresses. The (ts, event_id) sort makes same-microsecond
    // bursts deterministic.
    ("q121_cooldown_dedup", (s, d) => {
      val cooldownUs = 12L * 3600L * 1000000L
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("prev_us").isNull ||
                unix_micros(col("ts")) - col("prev_us") > cooldownUs)
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    }, Some("""
      WITH t AS (
        SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts,
               lag(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS prev_us
        FROM events)
      SELECT event_id, user_id, event_type, ts
      FROM t
      WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 43200000000
      ORDER BY event_id
    """)),

    // ------------------------------------------------------------ sliding-cooldown dedup (round 7; oracle round 8)
    // q121's missing sibling, made explicit: suppress only while
    // within the cooldown of the last EMITTED event (re-alert every
    // 12 h during a sustained burst), not the last occurrence. The
    // recurrence (kept_i depends on which earlier events were kept)
    // is not expressible as a window frame — but it IS replayable in
    // DuckDB as a recursive CTE that walks each (user, event_type)
    // timeline one row per iteration, carrying the kept-frontier
    // (recursion depth = max events per key: ≤ 29 at sf0.1, bounded
    // by the generator not the corpus). Hash-matched oracle since
    // round 8; StreamingDepthSpec's sequential reference and the
    // q121-divergence property (steady sub-cooldown drip: q121 keeps
    // 1 event, this re-emits every cooldown) still hold the batch ↔
    // streaming parity. Implementation is the batch twin of
    // streaming/CooldownDedup (flatMapGroups, one sorted pass per
    // (user, event_type) group, single key shuffle); the streaming
    // form persists the kept-frontier in the state store across
    // restarts.
    ("q136_sliding_cooldown", (s, d) => {
      import s.implicits._
      import graft.streaming.CooldownDedup
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
                col("ts").cast("timestamp").as("ts"))
        .as[CooldownDedup.KeyedEvent]
      CooldownDedup.keptBatch(ev, 12L * 3600L * 1000L).toDF()
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    }, Some("""
      WITH RECURSIVE ordered AS (
        SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts,
               epoch_us(ts::TIMESTAMP) AS us,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS rn
        FROM events),
      walk AS (
        SELECT user_id, event_type, event_id, ts, us, rn,
               TRUE AS is_kept, us AS last_kept_us
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_type, o.event_id, o.ts, o.us, o.rn,
               o.us - w.last_kept_us > 43200000000 AS is_kept,
               CASE WHEN o.us - w.last_kept_us > 43200000000
                    THEN o.us ELSE w.last_kept_us END AS last_kept_us
        FROM walk w JOIN ordered o ON o.user_id = w.user_id
          AND o.event_type = w.event_type AND o.rn = w.rn + 1)
      SELECT event_id, user_id, event_type, ts
      FROM walk WHERE is_kept
      ORDER BY event_id
    """)),

    // ------------------------------------------------------------ drift detection: PSI (round 7)
    // Population Stability Index between a reference window (first half
    // of the corpus timespan) and the current window, per event_type —
    // the standard production check for "did this feature's
    // distribution move?". Fixed-width value bins (not quantile bins:
    // quantile edges computed on one engine would not reproduce on the
    // other, and at 100 TB fixed edges need no pre-pass) and Laplace
    // smoothing (+1 per bin) so empty bins contribute finitely. Bins
    // empty in BOTH windows all contribute the SAME smoothing-only
    // term ((1/(Nc+B)) − (1/(Nr+B)))·ln((Nr+B)/(Nc+B)), so instead of
    // materializing a type×bin grid (which costs a second
    // distinct-types pass over events — Catalyst rewrites
    // binned.select(type).distinct() into a fresh scan, measured), the
    // missing-bin mass is added in closed form: ONE events scan, one
    // (type, bin) shuffle, and everything after the first aggregate
    // runs on ≤ |types|×|bins| rows (bounded by the schema, not the
    // data).
    ("q126_drift_psi", (s, d) => {
      val binW = 50.0; val nBins = 10
      val binned = Tables.events(s, d)
        .select(col("event_type"),
          (col("ts") < lit("2024-01-16").cast("timestamp")).as("is_ref"),
          least(lit(nBins - 1L), floor(col("value") / binW)).cast("long").as("bin"))
        .groupBy("event_type", "bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
             sum(when(!col("is_ref"), 1L).otherwise(0L)).as("nc"))
      val wType = Window.partitionBy("event_type")
      binned
        .withColumn("tr", (sum("nr").over(wType) + nBins).cast("double"))
        .withColumn("tc", (sum("nc").over(wType) + nBins).cast("double"))
        .withColumn("pr", (col("nr") + 1).cast("double") / col("tr"))
        .withColumn("pc", (col("nc") + 1).cast("double") / col("tc"))
        .groupBy("event_type")
        .agg(sum("nr").as("n_ref"), sum("nc").as("n_cur"),
             round(
               sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))) +
               (lit(nBins) - count(lit(1))) *
                 (lit(1.0) / first("tc") - lit(1.0) / first("tr")) *
                 log(first("tr") / first("tc")),
               6).as("psi"))
        .orderBy("event_type")
    }, Some("""
      WITH b AS (
        SELECT event_type, least(9, floor(value / 50))::BIGINT AS bin,
               count(*) FILTER (ts::TIMESTAMP < TIMESTAMP '2024-01-16') AS nr,
               count(*) FILTER (ts::TIMESTAMP >= TIMESTAMP '2024-01-16') AS nc
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT event_type, nr, nc,
               (sum(nr) OVER (PARTITION BY event_type) + 10)::DOUBLE AS tr,
               (sum(nc) OVER (PARTITION BY event_type) + 10)::DOUBLE AS tc,
               (nr + 1)::DOUBLE / (sum(nr) OVER (PARTITION BY event_type) + 10)::DOUBLE AS pr,
               (nc + 1)::DOUBLE / (sum(nc) OVER (PARTITION BY event_type) + 10)::DOUBLE AS pc
        FROM b)
      SELECT event_type, sum(nr)::BIGINT AS n_ref, sum(nc)::BIGINT AS n_cur,
             round(sum((pc - pr) * ln(pc / pr)) +
                   (10 - count(*)) * (1.0 / any_value(tc) - 1.0 / any_value(tr))
                                   * ln(any_value(tr) / any_value(tc)),
                   6) AS psi
      FROM p GROUP BY event_type
      ORDER BY event_type
    """)),

    // ------------------------------------------------------------ time-decayed engagement (round 7)
    // Exponentially time-decayed engagement score per user — the
    // recency-weighted aggregate every ranking/retention system keeps
    // (recent activity counts fully, week-old activity counts half):
    // score(u) = Σ value·exp(−λ·(T − t)) with λ = ln2 / 7-day
    // half-life, T = corpus max timestamp. NOT the EWMA recurrence
    // (s_i = αx + (1−α)s_{i−1} — sequential, unexpressible as a window
    // frame): anchoring the decay at a global T makes each term
    // independent, so the score is a plain SUM — map-side partial,
    // mergeable, ONE user shuffle after a broadcast of the 1-row T.
    // λ is computed ONCE driver-side and interpolated into both
    // engines' plans via Double.toString (shortest round-trip repr —
    // both parse the identical IEEE double; computing ln(2)/hl
    // independently per engine risks a ulp of libm skew in the
    // EXPONENT, which exp() amplifies).
    ("q133_decayed_engagement", (s, d) => {
      val lambda = math.log(2.0) / (7L * 24 * 3600 * 1000000L).toDouble
      val tmax = Tables.events(s, d).agg(max(unix_micros(col("ts"))).as("tmax"))
      Tables.events(s, d)
        .crossJoin(broadcast(tmax))
        .select(col("user_id"),
          (col("value") *
            exp(lit(-lambda) * (col("tmax") - unix_micros(col("ts"))).cast("double"))).as("w"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), round(sum("w"), 6).as("score"))
        .orderBy("user_id")
    }, Some {
      val lambda = math.log(2.0) / (7L * 24 * 3600 * 1000000L).toDouble
      s"""
      WITH t AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS tmax FROM events)
      SELECT user_id, count(*) AS n_events,
             round(sum(value * exp(-$lambda * (t.tmax - epoch_us(ts::TIMESTAMP))::DOUBLE)), 6) AS score
      FROM events, t
      GROUP BY user_id
      ORDER BY user_id
    """}),

    // ------------------------------------------------------------ robust outliers: median/MAD (round 7)
    // Per-group robust anomaly flagging: median + MAD (median absolute
    // deviation), outlier = |x - med| > 3 · 1.4826 · MAD — the
    // z-score's robust cousin (mean/stddev move with the outliers
    // they're supposed to flag; the median doesn't). Exact medians need
    // a sorted pass per statistic, so this is deliberately 3 scans of
    // the (projected, 2-column) input: median → MAD → outlier count,
    // each group-aggregated and the tiny per-type stats BROADCAST back
    // (never a shuffle of events by a stats join key). The 100 TB form
    // swaps `percentile` for `approx_percentile` (one scan, mergeable
    // GK sketches — cf. q59) at 1–2% edge error; exact is judged here
    // because the oracle can reproduce it bit-for-bit.
    ("q128_robust_outliers", (s, d) => {
      val ev = Tables.events(s, d).select("event_type", "value")
      val meds = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = ev.join(broadcast(meds), "event_type")
      val stats = withMed.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             expr("percentile(abs(value - med), 0.5)").as("mad"),
             first("med").as("med"))
      withMed.join(broadcast(stats.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(sum(when(abs(col("value") - col("med")) > lit(3 * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
        .join(broadcast(stats), "event_type")
        .select(col("event_type"), col("n"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    }, Some("""
      WITH meds AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1),
      stats AS (
        SELECT e.event_type, count(*) AS n, m.med,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN meds m USING (event_type)
        GROUP BY e.event_type, m.med)
      SELECT s.event_type, s.n, round(s.med, 6) AS med, round(s.mad, 6) AS mad,
             count(*) FILTER (abs(e.value - s.med) > 3 * 1.4826 * s.mad) AS n_outliers
      FROM events e JOIN stats s USING (event_type)
      GROUP BY s.event_type, s.n, s.med, s.mad
      ORDER BY s.event_type
    """)),

    // ------------------------------------------------------------ last-touch attribution (round 7)
    // Marketing-style conversion attribution: each purchase credits the
    // most recent preceding view/click by the same user within a 24 h
    // lookback, else counts as "direct". The touch is carried by an
    // IGNORE-NULLS last_value over the user timeline (ROWS … 1
    // PRECEDING excludes the purchase itself) — ONE user-keyed shuffle
    // and a single sorted pass per user, not a per-purchase self-join
    // (the naive form is a range join that re-scans each user's history
    // per conversion). Touch ts and type ride in two parallel windows
    // with identical frames (null together, so they stay consistent)
    // because windowed struct IGNORE-NULLS is not portable SQL.
    ("q130_attribution", (s, d) => {
      val lookbackUs = 24L * 3600L * 1000000L
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type").isin("view", "click")
      Tables.events(s, d)
        .withColumn("touch_us", last(when(isTouch, unix_micros(col("ts"))), ignoreNulls = true).over(w))
        .withColumn("touch_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("touch_us").isNotNull &&
               unix_micros(col("ts")) - col("touch_us") <= lookbackUs, col("touch_type"))
            .otherwise(lit("direct")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("revenue"))
        .orderBy("channel")
    }, Some("""
      WITH t AS (
        SELECT event_id, user_id, event_type, value, epoch_us(ts::TIMESTAMP) AS us,
               last_value(CASE WHEN event_type IN ('view','click')
                               THEN epoch_us(ts::TIMESTAMP) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us,
               last_value(CASE WHEN event_type IN ('view','click')
                               THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
        FROM events)
      SELECT CASE WHEN touch_us IS NOT NULL AND us - touch_us <= 86400000000
                  THEN touch_type ELSE 'direct' END AS channel,
             count(*) AS n_purchases, round(sum(value), 2) AS revenue
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1
      ORDER BY channel
    """)),

    // ------------------------------------------------------------ multi-touch attribution comparison (round 11)
    // q130 answers "who gets the credit under LAST-touch"; the question
    // marketing actually argues about is how much the answer CHANGES
    // under first-touch and linear credit — this emits all three models
    // side by side per channel (credit counts + revenue credit;
    // purchases with no in-window touch are 'direct' under every
    // model). Scale shape: the touch set per purchase comes from the
    // q76-style BUCKETED interval join — both sides keyed by (user,
    // 24h-bucket), each touch exploded to its 2 candidate buckets — an
    // equi-join at any scale, never a per-purchase history re-scan;
    // the per-purchase rollups are purchase-keyed aggregates. Credit
    // fractions are exact small rationals quantized once at output.
    ("q244_attribution_models", (s, d) => {
      val lookbackUs = 24L * 3600L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
                unix_micros(col("ts")).as("us"))
        .graftCheckpoint() // purchase and touch legs both read it
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("us").as("pus"),
                col("value").as("rev"))
        .withColumn("b", expr(s"pus DIV $lookbackUs"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"),
                col("us").as("tus"), col("event_id").as("tid"))
        .withColumn("b", explode(array(expr(s"tus DIV $lookbackUs"),
                                       expr(s"tus DIV $lookbackUs") + 1)))
      // strictly-preceding contract, q130's (us, event_id) order
      val joined = purchases.join(touches, Seq("user_id", "b"), "left")
        .withColumn("hit",
          col("tus").isNotNull &&
          (col("tus") < col("pus") || (col("tus") === col("pus") && col("tid") < col("pid"))) &&
          col("pus") - col("tus") <= lookbackUs)
      val perTouch = joined.filter(col("hit"))
        .select(col("pid"), col("rev"), col("channel"), col("tus"), col("tid"))
      val totals = perTouch.groupBy("pid").agg(
        count(lit(1)).as("n_touch"),
        min(struct(col("tus"), col("tid"), col("channel"))).getField("channel").as("first_ch"),
        max(struct(col("tus"), col("tid"), col("channel"))).getField("channel").as("last_ch"))
      val linear = perTouch.join(totals.select("pid", "n_touch"), "pid")
        .groupBy(col("channel")).agg(
          sum(lit(1.0) / col("n_touch")).as("credit"),
          sum(col("rev") / col("n_touch")).as("revenue"))
        .withColumn("model", lit("linear"))
      def oneTouch(chCol: String, name: String) = totals
        .join(purchases.select("pid", "rev"), "pid")
        .groupBy(col(chCol).as("channel"))
        .agg(count(lit(1)).cast("double").as("credit"), sum("rev").as("revenue"))
        .withColumn("model", lit(name))
      import s.implicits._
      val models = Seq("first", "last", "linear").toDF("model")
      val direct = purchases.join(
          perTouch.select("pid").distinct(), Seq("pid"), "left_anti")
        .agg(count(lit(1)).cast("double").as("credit"), sum("rev").as("revenue"))
        .filter(col("credit") > 0) // no direct purchases ⇒ no rows (oracle's GROUP BY shape)
        .select(lit("direct").as("channel"), col("credit"), col("revenue"))
        .crossJoin(models)
      linear.unionByName(oneTouch("first_ch", "first"))
        .unionByName(oneTouch("last_ch", "last"))
        .select("channel", "model", "credit", "revenue")
        .unionByName(direct.select("channel", "model", "credit", "revenue"))
        .select(col("channel"), col("model"),
                Quant.quant6(col("credit")).as("credit"),
                Quant.quant6(col("revenue")).as("revenue"))
        .orderBy("model", "channel")
    }, Some("""
      WITH ev AS (
        SELECT event_id, user_id, event_type, value, epoch_us(ts::TIMESTAMP) AS us
        FROM events),
      p AS (SELECT user_id, event_id AS pid, us AS pus, value AS rev
            FROM ev WHERE event_type = 'purchase'),
      t AS (SELECT user_id, event_type AS channel, us AS tus, event_id AS tid
            FROM ev WHERE event_type IN ('view', 'click')),
      per_touch AS (
        SELECT p.pid, p.rev, t.channel, t.tus, t.tid
        FROM p JOIN t ON t.user_id = p.user_id
         AND (t.tus < p.pus OR (t.tus = p.pus AND t.tid < p.pid))
         AND p.pus - t.tus <= 86400000000),
      tot AS (SELECT pid, count(*) AS n_touch FROM per_touch GROUP BY pid),
      fst_pick AS (
        SELECT pid, channel FROM per_touch
        QUALIFY row_number() OVER (PARTITION BY pid ORDER BY tus, tid) = 1),
      lst_pick AS (
        SELECT pid, channel FROM per_touch
        QUALIFY row_number() OVER (PARTITION BY pid ORDER BY tus DESC, tid DESC) = 1),
      lin AS (
        SELECT pt.channel, 'linear' AS model,
               sum(1.0 / tot.n_touch) AS credit,
               sum(pt.rev / tot.n_touch) AS revenue
        FROM per_touch pt JOIN tot USING (pid) GROUP BY pt.channel),
      fst AS (
        SELECT f.channel, 'first' AS model,
               count(*)::DOUBLE AS credit, sum(p.rev) AS revenue
        FROM fst_pick f JOIN p USING (pid) GROUP BY f.channel),
      lst AS (
        SELECT l.channel, 'last' AS model,
               count(*)::DOUBLE AS credit, sum(p.rev) AS revenue
        FROM lst_pick l JOIN p USING (pid) GROUP BY l.channel),
      dir AS (
        SELECT 'direct' AS channel, m.model,
               count(*)::DOUBLE AS credit, sum(p.rev) AS revenue
        FROM p, (SELECT unnest(['first', 'last', 'linear']) AS model) m
        WHERE p.pid NOT IN (SELECT pid FROM per_touch)
        GROUP BY m.model),
      unioned AS (
        SELECT * FROM lin UNION ALL SELECT * FROM fst
        UNION ALL SELECT * FROM lst UNION ALL SELECT * FROM dir)
      SELECT channel, model,
             floor(credit * 1000000.0 + 0.5) / 1000000.0 AS credit,
             floor(revenue * 1000000.0 + 0.5) / 1000000.0 AS revenue
      FROM unioned
      ORDER BY model, channel
    """)),

    // ------------------------------------------------------------ decile mobility matrix (round 11)
    // Do heavy spenders stay heavy? Users active in BOTH halves of the
    // event range are ranked into spend deciles per period and the
    //10×10 transition matrix counted — the loyalty/churn mobility
    // report (mass on the diagonal = stable tiers; mass below = decay).
    // Exactness discipline: spend is summed in integer CENTS (q236's
    // trick — float sums would make near-tie rank ORDER engine-
    // dependent), deciles come from ((rank−1)·10) DIV n on exact
    // integer ranks, and the ranks themselves are two-pass PrefixSum
    // ranks per period — the user dimension is unbounded, so a global
    // ntile/row_number window would serialize on one task at scale.
    ("q245_decile_mobility", (s, d) => {
      val cut = lit("2024-01-30 00:00:00").cast("timestamp")
      val spend = Tables.events(s, d)
        .select(col("user_id"), (col("ts") >= cut).as("p2"),
                floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy("user_id", "p2").agg(sum("cents").as("spend"))
      val both = spend.groupBy("user_id").agg(count(lit(1)).as("np"))
        .filter(col("np") === 2).select("user_id")
      val sp = spend.join(both, "user_id").graftCheckpoint() // rank pass + n both read it
      val n = sp.agg((count(lit(1)) / 2).cast("long").as("n"))
      val ranked = PrefixSum.grouped(sp, Seq("p2"),
          Seq(col("spend"), col("user_id")), Seq(lit(1L) -> "rank"))
        .crossJoin(broadcast(n))
        .select(col("user_id"), col("p2"),
                expr("(rank - 1) * 10 DIV n").as("dec"))
      ranked.filter(!col("p2")).select(col("user_id"), col("dec").as("decile_p1"))
        .join(ranked.filter(col("p2")).select(col("user_id"), col("dec").as("decile_p2")),
              "user_id")
        .groupBy("decile_p1", "decile_p2").agg(count(lit(1)).as("n_users"))
        .orderBy("decile_p1", "decile_p2")
    }, Some("""
      WITH sp AS (
        SELECT user_id, ts >= TIMESTAMP '2024-01-30 00:00:00' AS p2,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS spend
        FROM events GROUP BY 1, 2),
      b AS (SELECT user_id FROM sp GROUP BY user_id HAVING count(*) = 2),
      s2 AS (SELECT sp.* FROM sp JOIN b USING (user_id)),
      n AS (SELECT count(*) AS n FROM b),
      r AS (SELECT user_id, p2,
                   row_number() OVER (PARTITION BY p2 ORDER BY spend, user_id) AS rk
            FROM s2),
      dd AS (SELECT user_id, p2, ((rk - 1) * 10) // n.n AS dec FROM r, n)
      SELECT a.dec AS decile_p1, b2.dec AS decile_p2, count(*)::BIGINT AS n_users
      FROM dd a JOIN dd b2 ON a.user_id = b2.user_id AND NOT a.p2 AND b2.p2
      GROUP BY 1, 2
      ORDER BY 1, 2
    """)),

    // ------------------------------------------------------------ correlation matrix (round 7)
    // Pairwise Pearson correlation of lineitem's numeric measures in
    // ONE scan and ONE 1-row aggregate: all C(4,2) corr() aggregates
    // run in the same wide agg (each keeps (n, Σx, Σy, Σxy, Σx², Σy²)
    // running state — mergeable, map-side partial, no Expand), and
    // `stack` unpivots the single row into the matrix's upper
    // triangle. The profiling companion to q105's per-column moments:
    // q105 says how each column is shaped, this says how they move
    // together (feature-selection / leakage screening raw material).
    ("q131_corr_matrix", (s, d) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val aggs = pairs.map { case (a, b) => round(corr(col(a), col(b)), 4).as(s"${a}__${b}") }
      val wide = Tables.lineitem(s, d).agg(count(lit(1)).as("__n"), aggs: _*)
      val stackArgs = pairs.map { case (a, b) => s"'$a', '$b', `${a}__${b}`" }.mkString(", ")
      wide.selectExpr("__n AS n_rows",
          s"stack(${pairs.length}, $stackArgs) AS (col_a, col_b, pearson_r)")
        .select("col_a", "col_b", "n_rows", "pearson_r")
        .orderBy("col_a", "col_b")
    }, Some("""
      WITH s AS (
        SELECT count(*) AS n,
               round(corr(l_quantity, l_extendedprice), 4) AS c_qe,
               round(corr(l_quantity, l_discount), 4)      AS c_qd,
               round(corr(l_quantity, l_tax), 4)           AS c_qt,
               round(corr(l_extendedprice, l_discount), 4) AS c_ed,
               round(corr(l_extendedprice, l_tax), 4)      AS c_et,
               round(corr(l_discount, l_tax), 4)           AS c_dt
        FROM lineitem)
      SELECT col_a, col_b, n AS n_rows, pearson_r FROM (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n, c_qe AS pearson_r FROM s
        UNION ALL SELECT 'l_quantity', 'l_discount', n, c_qd FROM s
        UNION ALL SELECT 'l_quantity', 'l_tax', n, c_qt FROM s
        UNION ALL SELECT 'l_extendedprice', 'l_discount', n, c_ed FROM s
        UNION ALL SELECT 'l_extendedprice', 'l_tax', n, c_et FROM s
        UNION ALL SELECT 'l_discount', 'l_tax', n, c_dt FROM s)
      ORDER BY col_a, col_b
    """)),

    // ------------------------------------------------------------ key & functional-dependency discovery (round 9)
    // Schema-inference profiling: verify candidate UNIQUE KEYS and
    // FUNCTIONAL DEPENDENCIES (A→B) on the events table from distinct
    // counts alone — `A determines B` iff |distinct(A,B)| =
    // |distinct(A)|, and `K is a key` iff |distinct(K)| = |rows|.
    // Everything reduces to ONE scan feeding multi-distinct
    // aggregates (Catalyst's Expand multiplies the scan by the
    // distinct-group count — the exact-answer cost; the 100 TB form
    // swaps each count for approx_count_distinct exactly as q88 does
    // for the profile, turning Expand into mergeable HLL sketches).
    // The declared candidates are the profiling CONTRACT a downstream
    // pipeline asserts before keying a join or dedup on a column.
    ("q201_fd_discovery", (s, d) => {
      // Pair distincts run over a NULL-SAFE composite key, because
      // Spark's multi-column countDistinct DROPS a row when any column
      // is NULL while DuckDB's count(DISTINCT (a,b)) keeps it — the
      // encodings below make both engines count (NULL, x) pairs. The
      // key is injective per engine (cast-to-string of longs /
      // timestamps / type tags never contains the separator), so each
      // engine's own distinct count equals the distinct pair count.
      def nsk(a: Column, b: Column): Column =
        concat(coalesce(a.cast("string"), lit("\u0001")), lit("\u0002"),
               coalesce(b.cast("string"), lit("\u0001")))
      // fanOut (q82 discipline): the multi-distinct Expand multiplies
      // the scan ×8 and events is a single-row-group file locally —
      // without it the whole 100k→409k Expand ran partial-agg in one
      // task (r17 profile, 0.7 s single-task stage)
      val agg = Tables.fanOut(Tables.events(s, d)).agg(
        count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("nd_eid"),
        countDistinct(col("user_id")).as("nd_uid"),
        countDistinct(col("event_type")).as("nd_et"),
        countDistinct(nsk(col("user_id"), col("ts"))).as("nd_uid_ts"),
        countDistinct(nsk(col("event_id"), col("user_id"))).as("nd_eid_uid"),
        countDistinct(nsk(col("event_id"), col("event_type"))).as("nd_eid_et"),
        countDistinct(nsk(col("user_id"), col("event_type"))).as("nd_uid_et"))
      agg.select(expr("""stack(8,
          'key', 'event_id',             nd_eid,     n,          nd_eid = n,
          'key', 'user_id',              nd_uid,     n,          nd_uid = n,
          'key', 'event_type',           nd_et,      n,          nd_et = n,
          'key', 'user_id,ts',           nd_uid_ts,  n,          nd_uid_ts = n,
          'fd',  'event_id->user_id',    nd_eid,     nd_eid_uid, nd_eid_uid = nd_eid,
          'fd',  'event_id->event_type', nd_eid,     nd_eid_et,  nd_eid_et = nd_eid,
          'fd',  'user_id->event_type',  nd_uid,     nd_uid_et,  nd_uid_et = nd_uid,
          'fd',  'event_type->user_id',  nd_et,      nd_uid_et,  nd_uid_et = nd_et
        ) AS (check_type, subject, n_lhs, n_rhs, holds)"""))
        .orderBy("check_type", "subject")
    }, Some("""
      WITH s AS (
        SELECT count(*)::BIGINT AS n,
               count(DISTINCT event_id)::BIGINT AS nd_eid,
               count(DISTINCT user_id)::BIGINT AS nd_uid,
               count(DISTINCT event_type)::BIGINT AS nd_et,
               count(DISTINCT (user_id, ts))::BIGINT AS nd_uid_ts,
               count(DISTINCT (event_id, user_id))::BIGINT AS nd_eid_uid,
               count(DISTINCT (event_id, event_type))::BIGINT AS nd_eid_et,
               count(DISTINCT (user_id, event_type))::BIGINT AS nd_uid_et
        FROM events)
      SELECT check_type, subject, n_lhs, n_rhs, holds FROM (
        SELECT 'key' AS check_type, 'event_id' AS subject,
               nd_eid AS n_lhs, n AS n_rhs, nd_eid = n AS holds FROM s
        UNION ALL SELECT 'key', 'user_id', nd_uid, n, nd_uid = n FROM s
        UNION ALL SELECT 'key', 'event_type', nd_et, n, nd_et = n FROM s
        UNION ALL SELECT 'key', 'user_id,ts', nd_uid_ts, n, nd_uid_ts = n FROM s
        UNION ALL SELECT 'fd', 'event_id->user_id', nd_eid, nd_eid_uid, nd_eid_uid = nd_eid FROM s
        UNION ALL SELECT 'fd', 'event_id->event_type', nd_eid, nd_eid_et, nd_eid_et = nd_eid FROM s
        UNION ALL SELECT 'fd', 'user_id->event_type', nd_uid, nd_uid_et, nd_uid_et = nd_uid FROM s
        UNION ALL SELECT 'fd', 'event_type->user_id', nd_et, nd_uid_et, nd_uid_et = nd_et FROM s)
      ORDER BY check_type, subject
    """)),

    // ------------------------------------------------------------ join-skew diagnostic (round 10)
    // The pre-flight a q95-style salted join DECIDES from: per join
    // key, its row count and skew ratio vs the mean key, top-15 —
    // the report that says WHICH keys need salting and how many
    // buckets. One scan → keyed count → TakeOrderedAndProject top-15;
    // the mean rides a 1-row broadcast. At 100 TB this is exactly the
    // histogram a shuffle-planner samples; computing it exactly costs
    // one aggregation.
    ("q224_skew_diagnostic", (s, d) => {
      val cnt = Tables.fanOut(Tables.lineitem(s, d))
        .groupBy(col("l_partkey").as("join_key"))
        .agg(count(lit(1)).as("n_rows"))
        .graftCheckpoint() // top-15 + mean both read it
      val tot = cnt.agg(count(lit(1)).cast("double").as("n_keys"),
                        sum("n_rows").cast("double").as("n_total"))
      cnt.orderBy(col("n_rows").desc, col("join_key")).limit(15)
        .crossJoin(broadcast(tot))
        .select(col("join_key"), col("n_rows"),
          round(col("n_rows") / (col("n_total") / col("n_keys")), 6).as("skew_ratio"),
          round(col("n_rows") / col("n_total"), 6).as("share_of_rows"))
        .orderBy(col("n_rows").desc, col("join_key"))
    }, Some("""
      WITH c AS (SELECT l_partkey AS join_key, count(*)::BIGINT AS n_rows
                 FROM lineitem GROUP BY 1),
      t AS (SELECT count(*)::DOUBLE AS n_keys, sum(n_rows)::DOUBLE AS n_total FROM c)
      SELECT join_key, n_rows,
             round(n_rows / (t.n_total / t.n_keys), 6) AS skew_ratio,
             round(n_rows / t.n_total, 6) AS share_of_rows
      FROM c, t
      ORDER BY n_rows DESC, join_key
      LIMIT 15
    """)),

    // ------------------------------------------------------------ join-cardinality estimator (round 10)
    // Predict |A ⋈ B| from per-key histograms — Σ_k cnt_A(k)·cnt_B(k),
    // the number a cost-based planner needs BEFORE running the join —
    // and verify it against the actually-executed join count in the
    // same result (two algorithms, one answer, self-validating).
    // Integer-exact. The histogram join is keyed (aggregate-sized
    // relations); at 100 TB the exact histograms are what q88's HLL
    // sketches approximate — this is the exact-form sibling.
    ("q225_join_cardinality", (s, d) => {
      def predictedAndActual(name: String, a: DataFrame, b: DataFrame,
                             key: String): DataFrame = {
        val ca = a.groupBy(key).agg(count(lit(1)).as("na"))
        val cb = b.groupBy(key).agg(count(lit(1)).as("nb"))
        val pred = ca.join(cb, key)
          .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("predicted_rows"),
               count(lit(1)).as("n_matching_keys"))
        val act = a.join(b, key).agg(count(lit(1)).as("actual_rows"))
        pred.crossJoin(act).select(lit(name).as("join_name"),
          col("n_matching_keys"), col("predicted_rows"), col("actual_rows"),
          (col("predicted_rows") === col("actual_rows")).as("estimate_exact"))
      }
      val oc = predictedAndActual("orders_x_customer",
        Tables.orders(s, d).select(col("o_custkey").as("k")),
        Tables.customer(s, d).select(col("c_custkey").as("k")), "k")
      val lo = predictedAndActual("lineitem_x_orders",
        Tables.lineitem(s, d).select(col("l_orderkey").as("k")),
        Tables.orders(s, d).select(col("o_orderkey").as("k")), "k")
      oc.unionByName(lo).orderBy("join_name")
    }, Some("""
      WITH oc_a AS (SELECT o_custkey AS k, count(*)::BIGINT AS na FROM orders GROUP BY 1),
      oc_b AS (SELECT c_custkey AS k, count(*)::BIGINT AS nb FROM customer GROUP BY 1),
      oc AS (
        SELECT 'orders_x_customer' AS join_name,
               count(*)::BIGINT AS n_matching_keys,
               coalesce(sum(na * nb), 0)::BIGINT AS predicted_rows
        FROM oc_a JOIN oc_b USING (k)),
      oc_act AS (SELECT count(*)::BIGINT AS actual_rows
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      lo_a AS (SELECT l_orderkey AS k, count(*)::BIGINT AS na FROM lineitem GROUP BY 1),
      lo_b AS (SELECT o_orderkey AS k, count(*)::BIGINT AS nb FROM orders GROUP BY 1),
      lo AS (
        SELECT 'lineitem_x_orders' AS join_name,
               count(*)::BIGINT AS n_matching_keys,
               coalesce(sum(na * nb), 0)::BIGINT AS predicted_rows
        FROM lo_a JOIN lo_b USING (k)),
      lo_act AS (SELECT count(*)::BIGINT AS actual_rows
                 FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT join_name, n_matching_keys, predicted_rows, actual_rows,
             predicted_rows = actual_rows AS estimate_exact
      FROM (SELECT oc.*, oc_act.actual_rows FROM oc, oc_act
            UNION ALL
            SELECT lo.*, lo_act.actual_rows FROM lo, lo_act)
      ORDER BY join_name
    """)),

    // ------------------------------------------------------------ snapshot diff / reconciliation (round 10)
    // Table-diff between two snapshot versions — the reconciliation
    // report every incremental pipeline (CDC apply, backfill, rewrite)
    // runs to prove what actually changed: FULL OUTER join on the key,
    // rows classified added / removed / changed / unchanged by
    // null-safe value comparison. The "new" snapshot is derived
    // in-query with deterministic slices (removed: key%131=0; changed:
    // key%37=0 price bump; added: a key-shifted copy of the %97
    // slice), so both engines diff identical inputs. ONE key-keyed
    // shuffle pair; counts and key checksums are integer-exact. At
    // 100 TB both sides are bucketed by key (q96) and the diff is
    // bucket-local.
    ("q227_snapshot_diff", (s, d) => {
      val oldT = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
                col("o_totalprice").as("pr"))
      val newT = oldT.filter(col("k") % 131 =!= 0)
        .withColumn("pr", when(col("k") % 37 === 0, col("pr") + lit(5.0)).otherwise(col("pr")))
        .unionByName(oldT.filter(col("k") % 97 === 0)
          .select((col("k") + 100000000L).as("k"), col("st"), col("pr")))
      val joined = oldT.select(col("k"), col("st").as("st_a"), col("pr").as("pr_a"))
        .join(newT.select(col("k"), col("st").as("st_b"), col("pr").as("pr_b")),
              Seq("k"), "full_outer")
      joined.withColumn("change_type",
          when(col("st_a").isNull, "added")
            .when(col("st_b").isNull, "removed")
            .when(col("st_a") === col("st_b") && col("pr_a") === col("pr_b"), "unchanged")
            .otherwise("changed"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_rows"),
             min("k").as("min_key"), max("k").as("max_key"),
             sum("k").as("key_checksum"))
        .orderBy("change_type")
    }, Some("""
      WITH old_t AS (
        SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr FROM orders),
      new_t AS (
        SELECT k, st, CASE WHEN k % 37 = 0 THEN pr + 5.0 ELSE pr END AS pr
        FROM old_t WHERE k % 131 <> 0
        UNION ALL
        SELECT k + 100000000, st, pr FROM old_t WHERE k % 97 = 0),
      j AS (
        SELECT coalesce(a.k, b.k) AS k, a.st AS st_a, a.pr AS pr_a,
               b.st AS st_b, b.pr AS pr_b
        FROM old_t a FULL OUTER JOIN new_t b ON a.k = b.k)
      SELECT CASE WHEN st_a IS NULL THEN 'added'
                  WHEN st_b IS NULL THEN 'removed'
                  WHEN st_a = st_b AND pr_a = pr_b THEN 'unchanged'
                  ELSE 'changed' END AS change_type,
             count(*)::BIGINT AS n_rows,
             min(k) AS min_key, max(k) AS max_key,
             sum(k)::BIGINT AS key_checksum
      FROM j
      GROUP BY 1
      ORDER BY change_type
    """)),

    // ------------------------------------------------------------ broadcast advisor (round 10)
    // Completes the planner-diagnostic trio (q224 skew, q225 join
    // cardinality): per-table row counts and schema-derived size
    // estimates — fixed widths for numeric/timestamp columns, actual
    // string lengths for varchars — with the ≤10 MB broadcast verdict
    // a join planner (or an engineer setting
    // autoBroadcastJoinThreshold) reads. One column-pruned aggregate
    // per table, integer-exact across engines. The Spark side derives
    // the width expression FROM THE SCHEMA, so it works on any
    // relation, not just these seven.
    ("q235_broadcast_advisor", (s, d) => {
      import org.apache.spark.sql.types.{IntegerType, StringType}
      val tables = Seq("region", "nation", "customer", "supplier",
                       "part", "orders", "lineitem")
      val perTable = tables.map { t =>
        val df = Tables(s, d, t)
        val rowBytes = df.schema.fields.map { f =>
          f.dataType match {
            case StringType  => length(col(f.name)).cast("long")
            case IntegerType => lit(4L)
            case _           => lit(8L) // long / double / timestamp
          }
        }.reduce(_ + _)
        df.agg(count(lit(1)).as("n_rows"),
               coalesce(sum(rowBytes), lit(0L)).as("est_bytes"))
          .select(lit(t).as("table_name"), col("n_rows"), col("est_bytes"),
            round(col("est_bytes") / 1048576.0, 3).as("est_mb"),
            (col("est_bytes") <= 10L * 1024 * 1024).as("broadcastable_10mb"))
      }
      perTable.reduce((a, b) => a.unionByName(b)).orderBy("table_name")
    }, Some("""
      WITH est AS (
        SELECT 'region' AS table_name, count(*)::BIGINT AS n_rows,
               coalesce(sum(4 + length(r_name)), 0)::BIGINT AS est_bytes FROM region
        UNION ALL SELECT 'nation', count(*)::BIGINT, coalesce(sum(8 + length(n_name)), 0)::BIGINT FROM nation
        UNION ALL SELECT 'customer', count(*)::BIGINT,
               coalesce(sum(20 + length(c_name) + length(c_mktsegment)), 0)::BIGINT FROM customer
        UNION ALL SELECT 'supplier', count(*)::BIGINT, coalesce(sum(20 + length(s_name)), 0)::BIGINT FROM supplier
        UNION ALL SELECT 'part', count(*)::BIGINT,
               coalesce(sum(20 + length(p_name) + length(p_brand) + length(p_type)), 0)::BIGINT FROM part
        UNION ALL SELECT 'orders', count(*)::BIGINT,
               coalesce(sum(32 + length(o_orderstatus) + length(o_orderpriority)), 0)::BIGINT FROM orders
        UNION ALL SELECT 'lineitem', count(*)::BIGINT,
               coalesce(sum(68 + length(l_returnflag) + length(l_linestatus)), 0)::BIGINT FROM lineitem)
      SELECT table_name, n_rows, est_bytes,
             round(est_bytes / 1048576.0, 3) AS est_mb,
             est_bytes <= 10485760 AS broadcastable_10mb
      FROM est
      ORDER BY table_name
    """)),

    // ------------------------------------------------------------ cohort LTV curve (round 10)
    // Revenue lifetime-value by acquisition cohort: customers grouped
    // by first-order month, cumulative revenue tracked over their
    // first 6 months — the k-month LTV table growth/finance reads
    // (q86 is the USER-count retention sibling; this is money).
    // Revenue is held in integer CENTS end-to-end (per-row
    // floor(price·100+0.5) — prices are 2dp, so exact), making every
    // sum and the cumulative association-order-free and bit-portable.
    // The cumulative window runs over the cohort×6 GRID (months² rows,
    // calendar-bounded at any data scale); the only data-sized work is
    // the first-order aggregate and one cohort-stamped revenue
    // aggregate.
    ("q236_cohort_ltv", (s, d) => {
      val horizon = 6
      val firstM = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(date_trunc("month", min(col("o_orderdate"))).as("cohort"))
        .graftCheckpoint() // cohort sizes + the revenue stamp both read it
      val cohortSize = firstM.groupBy("cohort").agg(count(lit(1)).as("n_customers"))
      val rev = Tables.orders(s, d).join(firstM, "o_custkey")
        .withColumn("k", months_between(
          date_trunc("month", col("o_orderdate")), col("cohort")).cast("long"))
        .filter(col("k") < horizon)
        .groupBy("cohort", "k")
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      val grid = cohortSize.crossJoin(
          Tables.orders(s, d).sparkSession.range(horizon).select(col("id").as("k")))
        .join(rev, Seq("cohort", "k"), "left")
        .na.fill(0L, Seq("cents"))
      val wCum = Window.partitionBy("cohort").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.withColumn("cum_cents", sum("cents").over(wCum))
        .select(col("cohort"), col("k"), col("n_customers"),
          round(col("cents") / 100.0, 2).as("revenue"),
          round(col("cum_cents") / 100.0, 2).as("cum_ltv"),
          round(col("cum_cents") / 100.0 / col("n_customers"), 2).as("ltv_per_customer"))
        .orderBy("cohort", "k")
    }, Some("""
      WITH fm AS (
        SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey),
      cs AS (SELECT cohort, count(*)::BIGINT AS n_customers FROM fm GROUP BY cohort),
      rev AS (
        SELECT fm.cohort,
               datediff('month', fm.cohort, date_trunc('month', o.o_orderdate))::BIGINT AS k,
               sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM orders o JOIN fm USING (o_custkey)
        WHERE datediff('month', fm.cohort, date_trunc('month', o.o_orderdate)) < 6
        GROUP BY 1, 2),
      grid AS (
        SELECT cs.cohort, g.k, cs.n_customers, coalesce(rev.cents, 0) AS cents
        FROM cs CROSS JOIN (SELECT unnest(generate_series(0, 5))::BIGINT AS k) g
        LEFT JOIN rev ON rev.cohort = cs.cohort AND rev.k = g.k),
      cum AS (
        SELECT *, sum(cents) OVER (PARTITION BY cohort ORDER BY k
                 ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM grid)
      SELECT cohort, k, n_customers,
             round(cents / 100.0, 2) AS revenue,
             round(cum_cents / 100.0, 2) AS cum_ltv,
             round(cum_cents / 100.0 / n_customers, 2) AS ltv_per_customer
      FROM cum
      ORDER BY cohort, k
    """)),

    // ------------------------------------------------------------ equi-depth histogram (round 10)
    // q104 is equi-WIDTH (fixed bin edges); the planner/monitoring
    // histogram is equi-DEPTH — deciles holding equal row counts,
    // edges wherever the data puts them. Bin assignment is pure
    // integer arithmetic on the global rank, and the rank comes from
    // the two-pass PrefixSum (round 10) — no single-partition sort of
    // the unbounded orders dimension, and bit-exact across engines
    // (both sides compute floor((rank−1)·B / n), NOT ntile(), whose
    // remainder placement is engine-defined).
    ("q226_equidepth_histogram", (s, d) => {
      val nBins = 10
      val ranked = PrefixSum.cumSums(
        Tables.fanOut(Tables.orders(s, d))
          .select(col("o_totalprice"), col("o_orderkey")),
        Seq(col("o_totalprice"), col("o_orderkey")),
        Seq(lit(1L) -> "rank"))
      val tot = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("bin", expr(s"((rank - 1) * $nBins) DIV n"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"),
             round(min("o_totalprice"), 2).as("lo"),
             round(max("o_totalprice"), 2).as("hi"),
             round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("bin")
    }, Some("""
      WITH r AS (
        SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rank,
               count(*) OVER () AS n
        FROM orders)
      SELECT ((rank - 1) * 10 // n)::BIGINT AS bin,
             count(*)::BIGINT AS n_rows,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi,
             round(sum(o_totalprice), 2) AS sum_price
      FROM r
      GROUP BY 1
      ORDER BY bin
    """)),

    // ------------------------------------------------------------ k-anonymity audit (round 12)
    // Data-governance profile before a dataset leaves the pipeline:
    // group rows into equivalence classes on their quasi-identifiers
    // (nation + account-balance band — the columns a re-identifier
    // would join on), then report the class-size (k) distribution and
    // the worst-case l-diversity (min distinct sensitive values per
    // class, sensitive = market segment) per size bucket. Rows in
    // k=1 classes are unique on their QIs — directly re-identifiable;
    // min_l = 1 means an entire class shares one sensitive value, so
    // membership alone leaks it. Scale shape: ONE shuffle on the QI
    // tuple; the class relation is bounded by the QI domain (|nations|
    // × |balance bands| ≈ 275), so the bucket rollup and the 1-row
    // total broadcast never touch data-sized input.
    ("q254_k_anonymity_audit", (s, d) => {
      val classes = Tables.fanOut(Tables.customer(s, d))
        .groupBy(col("c_nationkey"), floor(col("c_acctbal") / 1000.0).as("bal_band"))
        .agg(count(lit(1)).as("k"), countDistinct(col("c_mktsegment")).as("l"))
      val bucketed = classes
        .withColumn("k_bucket",
          when(col("k") === 1, "1").when(col("k") < 5, "2-4")
            .when(col("k") < 10, "5-9").otherwise("10+"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n_classes"), sum("k").as("n_rows"), min("l").as("min_l"))
        .graftCheckpoint() // ≤4 rows, read twice (total + final) — without
                           // the barrier DeduplicateRelations re-runs the
                           // whole customer aggregation per reference
      val tot = bucketed.agg(sum("n_rows").as("tot"))
      bucketed.crossJoin(broadcast(tot))
        .select(col("k_bucket"), col("n_classes"), col("n_rows"), col("min_l"),
          Quant.quant6(col("n_rows").cast("double") / col("tot")).as("row_share"))
        .orderBy("k_bucket")
    }, Some(s"""
      WITH cls AS (
        SELECT c_nationkey, floor(c_acctbal / 1000.0) AS bal_band,
               count(*)::BIGINT AS k, count(DISTINCT c_mktsegment)::BIGINT AS l
        FROM customer GROUP BY 1, 2),
      b AS (
        SELECT CASE WHEN k = 1 THEN '1' WHEN k < 5 THEN '2-4'
                    WHEN k < 10 THEN '5-9' ELSE '10+' END AS k_bucket,
               count(*)::BIGINT AS n_classes, sum(k)::BIGINT AS n_rows,
               min(l)::BIGINT AS min_l
        FROM cls GROUP BY 1),
      tot AS (SELECT sum(n_rows)::BIGINT AS tot FROM b)
      SELECT k_bucket, n_classes, n_rows, min_l,
             ${Quant.quant6Sql("n_rows::DOUBLE / tot")} AS row_share
      FROM b, tot ORDER BY k_bucket
    """)),

    // ------------------------------------------------------------ Theil–Sen robust trend (round 12)
    // Per-event-type daily-volume trend fit two ways: ordinary least
    // squares (regr_slope — one outlier day can drag it anywhere) and
    // the Theil–Sen estimator (median of all pairwise slopes — 29%
    // breakdown point), the robust-statistics cross-check a drift
    // monitor wants before alerting on a "trend". Determinism: the
    // daily counts are integers, so every pairwise slope is the same
    // exact double on both engines, and median interpolates the two
    // middle values identically; regr_slope's internal sums stay in
    // exact-integer double range. Scale shape: one shuffle aggregates
    // events to the (type × day) relation, which is CALENDAR-bounded,
    // not data-bounded — the O(days²) pairwise join never grows with
    // row count, only with elapsed time (~7k pairs per type per
    // decade; cap the window before the join if a century of days
    // ever accumulates).
    ("q257_theil_sen_trend", (s, d) => {
      val daily = Tables.fanOut(Tables.events(s, d))
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .graftCheckpoint() // self-joined + re-aggregated below
      val b = daily.select(col("event_type").as("et2"), col("day").as("d2"), col("cnt").as("c2"))
      val sen = daily.join(b, col("event_type") === col("et2") && col("day") < col("d2"))
        .select(col("event_type"),
          ((col("c2") - col("cnt")).cast("double") / (col("d2") - col("day"))).as("slope"))
        .groupBy("event_type")
        .agg(Quant.quant6(expr("median(slope)")).as("sen_slope"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             Quant.quant6(expr("regr_slope(cnt, day)")).as("ols_slope"))
        .join(sen, "event_type")
        .select("event_type", "n_days", "sen_slope", "ols_slope")
        .orderBy("event_type")
    }, Some(s"""
      WITH daily AS (
        SELECT event_type, datediff('day', DATE '2024-01-01', ts::DATE) AS day,
               count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2),
      sen AS (
        SELECT a.event_type,
               ${Quant.quant6Sql("median((b.cnt - a.cnt)::DOUBLE / (b.day - a.day))")} AS sen_slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY 1),
      ols AS (
        SELECT event_type, count(*)::BIGINT AS n_days,
               ${Quant.quant6Sql("regr_slope(cnt, day)")} AS ols_slope
        FROM daily GROUP BY 1)
      SELECT o.event_type, o.n_days, s.sen_slope, o.ols_slope
      FROM ols o JOIN sen s USING (event_type)
      ORDER BY event_type
    """)),

    // ------------------------------------------------------------ tail composition (round 12)
    // p99 pages the on-call; this says WHO lives up there — the
    // composition of the global top-1% of event values by type (share
    // of the tail) next to each type's own tail rate. The exact p99
    // threshold is a 1-row relation broadcast over the per-type
    // aggregate (sanctioned 1-row cross); the corpus is scanned once
    // for the threshold and once for the classification — at 100 TB
    // both are full-scan-shaped with nothing driver-side.
    ("q286_tail_composition", (s, d) => {
      val thr = Tables.fanOut(Tables.events(s, d))
        .agg(expr("percentile(value, 0.99)").as("p99"))
      val byType = Tables.fanOut(Tables.events(s, d))
        .crossJoin(broadcast(thr))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             sum(when(col("value") >= col("p99"), 1L).otherwise(0L)).as("n_tail"),
             max("p99").as("p99"))
      val wTot = Window.partitionBy(lit(1))
      byType
        .withColumn("tail_total", sum("n_tail").over(wTot))
        .select(col("event_type"), col("n_events"), col("n_tail"),
          Quant.quant6(col("p99")).as("p99_threshold"),
          Quant.quant6(col("n_tail").cast("double") / col("tail_total"))
            .as("share_of_tail"),
          Quant.quant6(col("n_tail").cast("double") / col("n_events"))
            .as("type_tail_rate"))
        .orderBy("event_type")
    }, Some(s"""
      WITH thr AS (SELECT quantile_cont(value, 0.99) AS p99 FROM events),
      bt AS (
        SELECT e.event_type, count(*)::BIGINT AS n_events,
               sum(CASE WHEN e.value >= t.p99 THEN 1 ELSE 0 END)::BIGINT AS n_tail,
               max(t.p99) AS p99
        FROM events e CROSS JOIN thr t
        GROUP BY 1),
      tt AS (SELECT sum(n_tail)::BIGINT AS tail_total FROM bt)
      SELECT b.event_type, b.n_events, b.n_tail,
             ${Quant.quant6Sql("b.p99")} AS p99_threshold,
             ${Quant.quant6Sql("b.n_tail::DOUBLE / t.tail_total")} AS share_of_tail,
             ${Quant.quant6Sql("b.n_tail::DOUBLE / b.n_events")} AS type_tail_rate
      FROM bt b CROSS JOIN tt t
      ORDER BY b.event_type
    """)),

    // ------------------------------------------------------------ retention half-life fit (round 12)
    // q86 tabulates the cohort retention matrix; growth teams quote
    // ONE number from it — the half-life of an exponential decay
    // fitted to the pooled curve. Grain matters on this corpus: every
    // user is active every WEEK (weekly retention ≡ 1.0, degenerate),
    // so the fit runs on DAILY purchase activity, ages 1..7.
    // Censoring-correct pooling: age k's rate only counts cohorts old
    // enough to observe k, or young cohorts drag the tail to zero.
    // The fit is log-linear OLS — ln(rate_k) ~ k on the ≤7-row age
    // relation; every corpus-side number is an exact integer count,
    // ln/division happen once per age row, and a slope of exactly 0
    // yields a NULL half-life on both engines (ANSI guard).
    ("q287_retention_halflife", (s, d) => {
      val active = Tables.fanOut(Tables.events(s, d))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), date_trunc("day", col("ts")).as("dd"))
        .distinct()
        .graftCheckpoint() // firsts, maxd, and the age join all read it
      val firsts = active.groupBy("user_id").agg(min("dd").as("cohort"))
      val maxD = active.agg(max("dd").as("maxd"))
      val aged = active.join(firsts, "user_id")
        .withColumn("k", expr("datediff(dd, cohort)").cast("long"))
        .filter(col("k").between(1, 7))
        .groupBy("cohort", "k").agg(count(lit(1)).as("n_k"))
      val base = firsts.crossJoin(broadcast(maxD))
        .withColumn("obs_k", expr("datediff(maxd, cohort)").cast("long"))
        .groupBy("cohort").agg(count(lit(1)).as("n_0"), max("obs_k").as("obs_k"))
      // the (cohort, k) grid comes from `base` (every k the cohort is old
      // enough to observe), NOT from `aged`: an inner aged⋈base join drops
      // a cohort from age k's DENOMINATOR whenever it retained zero users
      // at that k, biasing every rate — and the fitted half-life — upward
      // (ADVICE r12). LEFT JOIN + coalesce(n_k, 0) counts those cohorts'
      // eligibility with zero retention. grid is ≤7 rows per cohort.
      val grid = base.filter(col("obs_k") >= 1L)
        .withColumn("k", explode(sequence(lit(1L), least(lit(7L), col("obs_k")))))
      val rates = grid.join(aged, Seq("cohort", "k"), "left")
        .groupBy("k")
        .agg(sum(coalesce(col("n_k"), lit(0L))).as("retained"),
             sum("n_0").as("eligible"))
        // a k with zero retained pool-wide has no finite ln(rate); drop it
        // from the fit identically on both engines (DuckDB ln(0) errors,
        // Spark log(0) nulls — neither belongs in the OLS sums)
        .filter(col("retained") > 0L)
        .withColumn("lr", log(col("retained").cast("double") / col("eligible")))
      val slope = (col("n_pts") * col("sky") - col("sk") * col("sy")) /
        (col("n_pts") * col("skk") - col("sk") * col("sk")).cast("double")
      rates
        .agg(count(lit(1)).as("n_pts"), sum("k").as("sk"), sum("lr").as("sy"),
             sum(col("k") * col("lr")).as("sky"),
             sum(col("k") * col("k")).as("skk"))
        .select(col("n_pts"),
          Quant.quant6(slope).as("decay_slope"),
          Quant.quant6(when(slope =!= 0.0, lit(-math.log(2.0)) / slope))
            .as("half_life_days"))
    }, Some(s"""
      WITH active AS (
        SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP) AS dd
        FROM events WHERE event_type = 'purchase'),
      firsts AS (SELECT user_id, min(dd) AS cohort FROM active GROUP BY 1),
      maxd AS (SELECT max(dd) AS maxd FROM active),
      aged AS (
        SELECT f.cohort, datediff('day', f.cohort, a.dd) AS k,
               count(*)::BIGINT AS n_k
        FROM active a JOIN firsts f USING (user_id)
        WHERE datediff('day', f.cohort, a.dd) BETWEEN 1 AND 7
        GROUP BY 1, 2),
      base AS (
        SELECT f.cohort, count(*)::BIGINT AS n_0,
               max(datediff('day', f.cohort, m.maxd)) AS obs_k
        FROM firsts f CROSS JOIN maxd m
        GROUP BY 1),
      grid AS (
        SELECT b.cohort, gs.k, b.n_0
        FROM base b
        JOIN (SELECT unnest(generate_series(1, 7))::BIGINT AS k) gs
          ON gs.k <= b.obs_k
        WHERE b.obs_k >= 1),
      rates AS (
        SELECT g.k, sum(coalesce(a.n_k, 0))::BIGINT AS retained,
               sum(g.n_0)::BIGINT AS eligible,
               ln(sum(coalesce(a.n_k, 0))::DOUBLE / sum(g.n_0)) AS lr
        FROM grid g LEFT JOIN aged a ON a.cohort = g.cohort AND a.k = g.k
        GROUP BY 1
        HAVING sum(coalesce(a.n_k, 0)) > 0),
      fit AS (
        SELECT count(*)::BIGINT AS n_pts, sum(k)::BIGINT AS sk, sum(lr) AS sy,
               sum(k * lr) AS sky, sum(k * k)::BIGINT AS skk
        FROM rates),
      sl AS (
        SELECT n_pts,
               (n_pts * sky - sk * sy) / (n_pts * skk - sk * sk)::DOUBLE AS slope
        FROM fit)
      SELECT n_pts,
             ${Quant.quant6Sql("slope")} AS decay_slope,
             ${Quant.quant6Sql("CASE WHEN slope <> 0.0 THEN -ln(2.0) / slope END")}
               AS half_life_days
      FROM sl
    """)),

    // ------------------------------------------------------------ capture-recapture estimate (round 12)
    // Chao1 (q178) estimates richness from ONE sample's abundance;
    // the two-sample design — Lincoln–Petersen with Chapman's
    // bias-corrected form N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — is what you
    // use when the corpus arrives as distinct crawls/streams and you
    // want total population (users, entities, docs) without unioning
    // raw data: count each sample's marks and the overlap. One
    // per-user aggregate builds the presence flags (first half vs
    // second half of the observed span); the estimate is exact
    // integer arithmetic on a 1-row relation, reported next to the
    // true distinct count as the honest error check.
    ("q288_capture_recapture", (s, d) => {
      val sp = Tables.fanOut(Tables.events(s, d))
        .agg(expr("min(unix_micros(ts))").as("lo"), expr("max(unix_micros(ts))").as("hi"))
        .select(col("lo"), ((col("lo") + col("hi")) / lit(2L)).cast("long").as("mid"))
      Tables.fanOut(Tables.events(s, d))
        .crossJoin(broadcast(sp))
        .groupBy("user_id")
        .agg(max(when(unix_micros(col("ts")) < col("mid"), 1L).otherwise(0L)).as("in_a"),
             max(when(unix_micros(col("ts")) >= col("mid"), 1L).otherwise(0L)).as("in_b"))
        .agg(sum("in_a").as("n1"), sum("in_b").as("n2"),
             sum(col("in_a") * col("in_b")).as("m"),
             count(lit(1)).as("true_distinct"))
        .select(col("n1"), col("n2"), col("m"), col("true_distinct"),
          Quant.quant6(((col("n1") + 1) * (col("n2") + 1)).cast("double")
            / (col("m") + 1) - 1.0).as("chapman_estimate"),
          Quant.quant6((((col("n1") + 1) * (col("n2") + 1)).cast("double")
            / (col("m") + 1) - 1.0 - col("true_distinct"))
            / col("true_distinct")).as("rel_error"))
    }, Some(s"""
      WITH sp AS (
        SELECT min(epoch_us(ts)) AS lo,
               ((min(epoch_us(ts)) + max(epoch_us(ts))) // 2)::BIGINT AS mid
        FROM events),
      fl AS (
        SELECT e.user_id,
               max(CASE WHEN epoch_us(e.ts) < s.mid THEN 1 ELSE 0 END)::BIGINT AS in_a,
               max(CASE WHEN epoch_us(e.ts) >= s.mid THEN 1 ELSE 0 END)::BIGINT AS in_b
        FROM events e CROSS JOIN sp s
        GROUP BY 1),
      ag AS (
        SELECT sum(in_a)::BIGINT AS n1, sum(in_b)::BIGINT AS n2,
               sum(in_a * in_b)::BIGINT AS m, count(*)::BIGINT AS true_distinct
        FROM fl)
      SELECT n1, n2, m, true_distinct,
             ${Quant.quant6Sql("(n1 + 1) * (n2 + 1)::DOUBLE / (m + 1) - 1.0")}
               AS chapman_estimate,
             ${Quant.quant6Sql(
               "((n1 + 1) * (n2 + 1)::DOUBLE / (m + 1) - 1.0 - true_distinct) / true_distinct")}
               AS rel_error
      FROM ag
    """))
  )
}
