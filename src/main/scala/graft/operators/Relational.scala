package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryGroup, Tables}

/** Relational batch corpus.
  *
  * The reference (`/root/reference/src/main/java/.../Processor.java:118-147`)
  * has a single source→map→sink pipeline and no relational operators at all
  * (SURVEY.md §2.2); this group supplies the full standard taxonomy —
  * scan/filter/project, every join shape, aggregation variants, window
  * functions, sorts/top-k, set ops, scalar expressions, subquery patterns —
  * expressed declaratively so Catalyst handles pushdown, pruning, join
  * selection and AQE at scale.
  *
  * Determinism rules (DuckDB-oracle parity, SURVEY.md §5.2):
  * stable ORDER BY with unique tie-breakers, `round(agg, n)` on every
  * floating aggregate, explicit NULLS FIRST in oracle SQL (DuckDB default
  * is NULLS LAST; Spark's is NULLS FIRST for ASC), timestamps cast to DATE
  * in outputs where the value is day-grained.
  */
object Relational extends QueryGroup {

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** (name, spark query, oracle DuckDB SQL) — oracle None => rows-only check. */
  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(

    // ---------------------------------------------------------------- scan / filter / agg / sort
    ("q01_pricing_summary", (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(rev), 2).as("sum_disc_price"),
          round(sum(rev * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                                   AS sum_qty,
             round(sum(l_extendedprice), 2)                              AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2)         AS sum_disc_price,
             round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 2)                                   AS avg_qty,
             round(avg(l_extendedprice), 2)                              AS avg_price,
             round(avg(l_discount), 4)                                   AS avg_disc,
             count(*)                                                    AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)),

    // ---------------------------------------------------------------- projection + filter pushdown
    ("q02_filter_project", (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount").between(0.05, 0.07))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity > 45 AND l_discount BETWEEN 0.05 AND 0.07
      ORDER BY l_orderkey, l_linenumber
    """)),

    // ---------------------------------------------------------------- 3-way equi join + agg + top-k (TPC-H Q3 shape)
    ("q03_topk_order_revenue", (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some("""
      SELECT l_orderkey, o_orderdate::DATE AS o_orderdate,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate::DATE
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """)),

    // ---------------------------------------------------------------- left outer join keeping empty groups
    ("q04_left_join_order_counts", (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey,
             count(o_orderkey)                       AS n_orders,
             round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey
    """)),

    // ---------------------------------------------------------------- semi join (EXISTS)
    ("q05_semi_join_f_orders", (s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      Tables.customer(s, d)
        .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey
    """)),

    // ---------------------------------------------------------------- anti join (NOT EXISTS)
    ("q06_anti_join_no_orders", (s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey
    """)),

    // ---------------------------------------------------------------- star join over broadcast dims (TPC-H Q5 shape)
    ("q07_nation_revenue", (s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(rev), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }, Some("""
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """)),

    // ---------------------------------------------------------------- non-equi (range) join against literal bands
    ("q08_price_band_join", (s, d) => {
      val bands = s.createDataFrame(Seq(
        (900.0, 925.0, "b1_900_925"),
        (925.0, 950.0, "b2_925_950"),
        (950.0, 975.0, "b3_950_975"),
        (975.0, 1000.0, "b4_975_1000"))).toDF("lo", "hi", "band")
      Tables.part(s, d)
        .join(broadcast(bands),
              col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_parts"), round(avg("p_retailprice"), 2).as("avg_price"))
        .orderBy("band")
    }, Some("""
      SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
      FROM part
      JOIN (VALUES (900.0, 925.0, 'b1_900_925'),
                   (925.0, 950.0, 'b2_925_950'),
                   (950.0, 975.0, 'b3_950_975'),
                   (975.0, 1000.0, 'b4_975_1000')) AS bands(lo, hi, band)
        ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band
      ORDER BY band
    """)),

    // ---------------------------------------------------------------- distinct aggregation
    ("q09_agg_distinct", (s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus,
             count(DISTINCT o_custkey)    AS n_customers,
             count(*)                     AS n_orders,
             round(sum(o_totalprice), 2)  AS sum_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)),

    // ---------------------------------------------------------------- rollup
    ("q10_rollup", (s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls
    """)),

    // ---------------------------------------------------------------- cube
    ("q11_cube", (s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("n"), col("avg_price"))
        .orderBy("status", "priority")
    }, Some("""
      SELECT coalesce(o_orderstatus, 'ALL')   AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority
    """)),

    // ---------------------------------------------------------------- grouping sets
    ("q12_grouping_sets", (s, d) => {
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("n"), col("sum_price"))
        .orderBy("status", "priority")
    }, Some("""
      SELECT coalesce(o_orderstatus, 'ALL')   AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY status, priority
    """)),

    // ---------------------------------------------------------------- ranking window + per-group top-k
    ("q13_window_topk_per_brand", (s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("p_brand", "rn", "rk", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "rn")
    }, Some("""
      SELECT p_brand, rn, rk, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
                   rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
            FROM part) t
      WHERE rn <= 3
      ORDER BY p_brand, rn
    """)),

    // ---------------------------------------------------------------- analytic window: running frame + lag/lead
    ("q14_window_running_totals", (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
                col("o_orderdate").cast("date").as("o_orderdate"),
                round(sum("o_totalprice").over(
                  w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
                lag("o_orderkey", 1).over(w).as("prev_order"),
                lead("o_orderkey", 1).over(w).as("next_order"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_orderdate::DATE AS o_orderdate,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
             lag(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
             lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
      FROM orders
      WHERE o_custkey < 50
      ORDER BY o_custkey, o_orderdate, o_orderkey NULLS FIRST
    """)),

    // ---------------------------------------------------------------- global top-k (TakeOrderedAndProject)
    ("q15_global_topk", (s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 20
    """)),

    // ---------------------------------------------------------------- set ops: union distinct
    ("q16_union", (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp")).select("o_custkey")
      val b = o.filter(col("o_totalprice") > 400000).select("o_custkey")
      a.union(b).distinct().orderBy("o_custkey")
    }, Some("""
      SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      UNION
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      ORDER BY o_custkey
    """)),

    // ---------------------------------------------------------------- set ops: intersect
    ("q17_intersect", (s, d) => {
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.intersect(y96).orderBy("o_custkey")
    }, Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      ORDER BY o_custkey
    """)),

    // ---------------------------------------------------------------- set ops: except
    ("q18_except", (s, d) => {
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey"))
      c.except(o).orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY c_custkey
    """)),

    // ---------------------------------------------------------------- string functions
    ("q19_string_funcs", (s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
                upper(col("p_name")).as("up_name"),
                substring(col("p_name"), 1, 8).as("prefix"),
                length(col("p_name")).cast("long").as("name_len"),
                concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
                regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
                regexp_replace(col("p_type"), "[AEIOU]", "_").as("devowel"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             upper(p_name)                               AS up_name,
             substring(p_name, 1, 8)                     AS prefix,
             length(p_name)                              AS name_len,
             concat_ws('/', p_brand, p_type)             AS brand_type,
             regexp_extract(p_brand, 'Brand#(\d+)', 1)::INTEGER AS brand_num,
             regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel
      FROM part
      ORDER BY p_partkey
    """)),

    // ---------------------------------------------------------------- date functions
    ("q20_date_funcs", (s, d) => {
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
                month(col("o_orderdate")).cast("long").as("o_month"),
                date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
                datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).cast("long").as("age_days"),
                col("o_totalprice"))
        .groupBy("o_year", "o_month", "month_start")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("sum_price"),
             min("age_days").as("min_age_days"))
        .orderBy("o_year", "o_month")
    }, Some("""
      SELECT year(o_orderdate)                        AS o_year,
             month(o_orderdate)                       AS o_month,
             date_trunc('month', o_orderdate)::DATE   AS month_start,
             count(*)                                 AS n_orders,
             round(sum(o_totalprice), 2)              AS sum_price,
             min(datediff('day', o_orderdate::DATE, DATE '2002-01-01')) AS min_age_days
      FROM orders
      GROUP BY 1, 2, 3
      ORDER BY o_year, o_month
    """)),

    // ---------------------------------------------------------------- math + CASE bucketing
    ("q21_math_case", (s, d) => {
      Tables.lineitem(s, d)
        .withColumn("qty_bucket",
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "medium")
            .otherwise("large"))
        .groupBy("qty_bucket")
        .agg(count(lit(1)).as("n"),
             round(sqrt(sum("l_extendedprice")), 4).as("sqrt_sum_price"),
             round(log(sum("l_quantity")), 4).as("ln_sum_qty"),
             round(pow(avg("l_discount"), 2), 6).as("avg_disc_sq"),
             round(abs(min(col("l_tax") - lit(0.05))), 4).as("min_tax_dev"))
        .orderBy("qty_bucket")
    }, Some("""
      SELECT CASE WHEN l_quantity < 10 THEN 'small'
                  WHEN l_quantity < 30 THEN 'medium'
                  ELSE 'large' END                         AS qty_bucket,
             count(*)                                      AS n,
             round(sqrt(sum(l_extendedprice)), 4)          AS sqrt_sum_price,
             round(ln(sum(l_quantity)), 4)                 AS ln_sum_qty,
             round(pow(avg(l_discount), 2), 6)             AS avg_disc_sq,
             round(abs(min(l_tax - 0.05)), 4)              AS min_tax_dev
      FROM lineitem
      GROUP BY 1
      ORDER BY qty_bucket
    """)),

    // ---------------------------------------------------------------- scalar subquery (above global average)
    ("q22_scalar_subquery", (s, d) => {
      val c = Tables.customer(s, d)
      val avgBal = c.agg(avg("c_acctbal").as("avg_bal"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      ORDER BY c_custkey
    """)),

    // ---------------------------------------------------------------- correlated subquery (above per-nation average)
    ("q23_correlated_subquery", (s, d) => {
      val c = Tables.customer(s, d)
      val natAvg = c.groupBy("c_nationkey").agg(avg("c_acctbal").as("nation_avg"))
      c.join(broadcast(natAvg), Seq("c_nationkey"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey
    """)),

    // ---------------------------------------------------------------- IN subquery
    ("q24_in_subquery", (s, d) => {
      val building = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      Tables.orders(s, d)
        .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)),

    // ---------------------------------------------------------------- JSON extraction (events.props is a JSON string)
    ("q25_json_funcs", (s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("int").as("k"),
                col("value"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             round(avg("k"), 4).as("avg_k"),
             max("k").as("max_k"),
             round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type,
             count(*)                                             AS n,
             round(avg(json_extract_string(props, '$.k')::INTEGER), 4) AS avg_k,
             max(json_extract_string(props, '$.k')::INTEGER)      AS max_k,
             round(sum(value), 2)                                 AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """)),

    // ---------------------------------------------------------------- array (vector) columns: higher-order functions
    ("q26_array_funcs", (s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
                size(col("embedding")).cast("long").as("dim"),
                round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
                round(sqrt(aggregate(col("embedding"), lit(0.0),
                  (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2_norm"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id, label,
             len(embedding)                       AS dim,
             round(embedding[1]::DOUBLE, 4)       AS first_val,
             round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2_norm
      FROM embeddings
      ORDER BY vec_id
    """)),

    // ---------------------------------------------------------------- event-time tumbling window (batch form of the streaming agg)
    ("q27_event_hourly_window", (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour_start", "event_type")
    }, Some("""
      SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_start, event_type
    """)),

    // ---------------------------------------------------------------- event-time sliding window (2h window, 1h slide)
    ("q28_event_sliding_window", (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").getField("start").as("win_start"))
        // avg as round(sum)/count: bit-deterministic on both engines,
        // unlike round(avg(...), n) which can land on half-way decimal
        // boundaries where Spark and DuckDB round differently.
        .agg(count(lit(1)).as("n"),
             (round(sum("value"), 2) / count(lit(1))).as("avg_value"))
        .orderBy("win_start")
    }, Some("""
      SELECT win_start, count(*) AS n, round(sum(value), 2) / count(*) AS avg_value
      FROM (SELECT date_trunc('hour', ts)::TIMESTAMP AS win_start, value FROM events
            UNION ALL
            SELECT date_trunc('hour', ts)::TIMESTAMP - INTERVAL 1 HOUR, value FROM events) t
      GROUP BY win_start
      ORDER BY win_start
    """))
  )

}
