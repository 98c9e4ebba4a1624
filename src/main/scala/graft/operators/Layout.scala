package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}

/** Z-order (Morton-curve) data layout for multi-dimensional data
  * skipping — the write-side half of scan performance at 100 TB.
  * Sorting by one column clusters that column only: a predicate on any
  * OTHER column touches every file. Interleaving the bits of two key
  * columns and range-partitioning + sorting by the interleaved value
  * clusters BOTH dimensions at once, so parquet min/max stats prune
  * files for predicates on either column (what Delta's OPTIMIZE
  * ZORDER does; vanilla Spark has no built-in).
  *
  * Everything is built-in bit arithmetic (shiftright/and/or) —
  * whole-stage codegen'd, no UDF; the only shuffle is the range
  * partitioning the write needs anyway. LayoutSpec quantifies the
  * effect: a range predicate on the second dimension touches a small
  * fraction of z-ordered files vs ~all files of a singly-sorted
  * layout.
  */
object Layout extends QueryGroup {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * int keys (a even positions, b odd). 16+16 → one long.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Equal-width bucket rank of `c` over [lo, hi] into 2^bits buckets —
    * maps an arbitrary numeric/date-derived key onto the z-curve grid.
    */
  def bucketRank(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val buckets = (1 << bits) - 1
    least(lit(buckets), greatest(lit(0),
      floor((c.cast("double") - lo) / math.max(hi - lo, Double.MinPositiveValue) * buckets)))
      .cast("long")
  }

  /** Scratch dir q87 writes its z-ordered layout into. Single source of
    * truth for the naming scheme — LayoutSpec reads the same path, so a
    * rename here can't silently point the test at a stale directory.
    * Keyed by applicationId: two concurrent processes benchmarking the
    * same dataset must not overwrite each other's layout mid-read.
    */
  def zorderDir(spark: SparkSession): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-zorder-${spark.sparkContext.applicationId}").toString

  /** Write `df` z-ordered by (a, b) into `files` parquet files at
    * `path`: range-partition by z-value (equal-size files via range
    * boundaries sampling) and sort within each file so row-group
    * min/max stats are tight on both dimensions.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String, files: Int): Unit =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  // q87 judged query: write events z-ordered by (time, user) into a
  // scratch layout, read it back through a TWO-SIDED predicate — one
  // range per dimension, the access pattern z-order exists for — and
  // return the matching rows. Result values are layout-independent
  // (the oracle filters the raw table), so CORRECTNESS checks the
  // round trip while LayoutSpec keeps the quantitative
  // file-containment assert (both dimensions prune). The write is part
  // of the measured query: this is a write-side operator.
  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(
    ("q87_zorder_scan", (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      // grid bounds from one tiny 1-row aggregate (4 longs cross the
      // driver — same pattern as LayoutSpec; never data)
      val r = ev.agg(
        min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
        min("user_id"), max("user_id")).head
      val dir = zorderDir(s)
      zorderWrite(ev,
        bucketRank(unix_micros(col("ts")), r.getLong(0).toDouble, r.getLong(1).toDouble),
        bucketRank(col("user_id"), r.getLong(2).toDouble, r.getLong(3).toDouble),
        dir, 16)
      s.read.parquet(dir)
        .filter(col("user_id").between(3, 9) &&
          col("ts") >= lit("2024-01-08").cast("timestamp") &&
          col("ts") < lit("2024-01-15").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id")
    }, Some("""
      SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
      FROM events
      WHERE user_id BETWEEN 3 AND 9
        AND ts::TIMESTAMP >= TIMESTAMP '2024-01-08'
        AND ts::TIMESTAMP < TIMESTAMP '2024-01-15'
      ORDER BY event_id
    """)),

    // Bucketed co-located join — the OTHER write-side layout operator:
    // both fact tables are written bucketed (and sorted) 8 ways on the
    // join key, so the sort-merge join reads bucket i against bucket i
    // directly and NEITHER side shuffles or sorts at read time. At
    // 100 TB this converts the daily lineitem⋈orders shuffle (the
    // single largest exchange in the pipeline) into a pure map-side
    // join, paid once at write time. Result values are
    // layout-independent (oracle joins the raw parquet); PlanSpec pins
    // the no-Exchange plan. hint("merge") keeps the demo honest — at
    // bench scale the orders side would otherwise broadcast, which
    // bucketing is not about. External-table form (option("path")):
    // bucket METADATA lives in the session catalog, bytes in scratch.
    ("q96_bucketed_join", (s, d) => {
      // Cache key = canonical dataset path (hashCode collisions between
      // dataset dirs must not alias tables) + applicationId (concurrent
      // processes must not race on one scratch dir). Within a process
      // the bucketed layout is written once and reused — sound because
      // the key pins the exact input directory and the app; test data
      // is immutable for a session's lifetime.
      val canonical = new java.io.File(d).getCanonicalPath
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest((canonical + "|" + s.sparkContext.applicationId).getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft-bucketed-$tag").toString
      def bucketed(df: DataFrame, key: String, name: String): DataFrame = {
        val table = s"graft_${name}_$tag"
        // _SUCCESS through the Hadoop FS API — the write path
        // (option("path")) is FS-agnostic, so the completeness check
        // must be too, not a java.io.File local-disk assumption
        val success = new org.apache.hadoop.fs.Path(s"$dir/$name/_SUCCESS")
        val fs = success.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!s.catalog.tableExists(table) || !fs.exists(success)) {
          df.write.format("parquet")
            .bucketBy(8, key).sortBy(key)
            .option("path", s"$dir/$name")
            .mode("overwrite").saveAsTable(table)
        }
        s.table(table)
      }
      val li = bucketed(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity")),
        "l_orderkey", "lineitem")
      val ord = bucketed(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderkey", "orders")
      li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
             round(sum(col("l_extendedprice")), 2).as("revenue"),
             sum(col("l_quantity").cast("long")).as("total_qty"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_lines,
             round(sum(l_extendedprice), 2) AS revenue,
             sum(l_quantity)::BIGINT AS total_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))
  )
}
