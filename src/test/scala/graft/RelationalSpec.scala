package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity specs for the relational corpus at sf0.001. The authoritative
  * correctness gate is the driver's DuckDB hash-compare (Verify +
  * oracle_sql.json, locally mirrored by scripts/check_oracle.py); these
  * specs catch regressions fast without DuckDB.
  */
class RelationalSpec extends AnyFunSuite with SparkFixture {

  test("entry (flagship pricing summary) returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000L)
  }

  test("every registered query runs and returns a non-negative row count") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name returned negative count")
    }
  }

  test("every oracleSql key has a matching queries key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  test("q01 groups are the 6 returnflag/linestatus combos") {
    val got = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .select("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A","F"), ("A","O"), ("N","F"), ("N","O"), ("R","F"), ("R","O")))
  }

  test("q04 left join keeps all customers") {
    val n = SparkEntry.queries("q04_left_join_order_counts")(spark, sfDir).count()
    assert(n == Tables.customer(spark, sfDir).count())
  }

  test("q13 window top-k emits at most 3 rows per brand") {
    val df = SparkEntry.queries("q13_window_topk_per_brand")(spark, sfDir)
    val maxPerBrand = df.groupBy("p_brand").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPerBrand <= 3)
  }

  test("q15 global topk is sorted descending") {
    val prices = SparkEntry.queries("q15_global_topk")(spark, sfDir)
      .collect().map(_.getAs[Double]("l_extendedprice"))
    assert(prices.length == 20)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("registerViews exposes the whole corpus + custom functions to plain spark.sql") {
    Tables.registerViews(spark, sfDir)
    // cross-table join through views, custom function in the same statement
    val row = spark.sql("""
      SELECT count(*) AS n,
             sum(CASE WHEN nfc_normalize(d.text) = d.text THEN 1 ELSE 0 END) AS ascii_stable
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """).head()
    assert(row.getAs[Long]("n") > 0)
    assert(row.getAs[Long]("ascii_stable") == row.getAs[Long]("n"),
      "corpus text is ASCII; NFC must be identity on it")
    // events view carries the nanos normalization: ts must be a timestamp
    assert(spark.sql("SELECT date_trunc('hour', ts) FROM events LIMIT 1").head() != null)
    // view scans still push down (metadata-only indirection)
    val p = spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]") ||
           p.contains("EqualTo(o_orderkey,42)"), s"view scan lost pushdown:\n$p")
  }
}
