package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PrefixSum

/** Two-pass range-partitioned prefix sum (round 10, VERDICT item 4).
  *
  * Pins the operator to the single-partition-window semantics it
  * replaces in q219/q190/q99: exact equality for integer-valued sums
  * and ranks (association-order-free), last-ulp-tolerant equality for
  * float sums, and per-group restarts for the grouped form. Also
  * asserts the scale property the operator exists for: the windowed
  * pass runs over MANY partitions (keyed by partition id), never one.
  */
class PrefixSumSpec extends AnyFunSuite with SparkFixture {

  test("global integer cumsum + rank match the single-partition window exactly") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
              col("l_quantity").cast("long").as("q"))
    val got = PrefixSum.cumSums(li, Seq(col("k1"), col("k2")),
        Seq(col("q") -> "cum", lit(1L) -> "rank"))
      .select("k1", "k2", "cum", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    val w = Window.orderBy("k1", "k2")
    val want = li
      .withColumn("cum", sum("q").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("k1", "k2", "cum", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.length == want.length && got.sameElements(want),
      s"two-pass cumsum diverged from the sequential window (${got.length} rows)")
  }

  test("float cumsum matches the sequential window within relative 1e-12") {
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val got = PrefixSum.cumSum(rev, Seq(col("rev").desc, col("l_partkey")),
        col("rev"), "cum")
      .select("l_partkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = Window.orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = rev.withColumn("cum", sum("rev").over(w))
      .select("l_partkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) <= math.abs(v) * 1e-12,
        s"part $k: two-pass ${got(k)} vs sequential $v beyond float tolerance")
    }
  }

  test("grouped cumsum restarts per group and matches the per-group window exactly") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"), col("l_orderkey").as("k1"),
              col("l_linenumber").as("k2"), col("l_quantity").cast("long").as("q"))
    val got = PrefixSum.grouped(li, Seq("g"), Seq(col("k1"), col("k2")),
        Seq(col("q") -> "cw"))
      .select("g", "k1", "k2", "cw").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted
    val w = Window.partitionBy("g").orderBy("k1", "k2")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = li.withColumn("cw", sum("q").over(w))
      .select("g", "k1", "k2", "cw").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted
    assert(got.sameElements(want), "grouped two-pass diverged from per-group window")
  }

  test("grouped cumsum keeps rows whose group key is NULL (null-safe ledger join)") {
    // ADVICE r10: the ledger join-back used a plain equi-join on the
    // group columns, so NULL-keyed rows were silently dropped. The
    // join is now null-safe (<=>); NULL is just another group.
    import spark.implicits._
    val df = Seq(
      (Option("a"), 1L, 10L), (Option("a"), 2L, 5L),
      (Option.empty[String], 1L, 7L), (Option.empty[String], 3L, 2L),
      (Option("b"), 1L, 4L)
    ).toDF("g", "k", "q")
    val got = PrefixSum.grouped(df, Seq("g"), Seq(col("k")), Seq(col("q") -> "cw"))
      .select("g", "k", "cw").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (Option("a"), 1L, 10L), (Option("a"), 2L, 15L),
      (Option.empty[String], 1L, 7L), (Option.empty[String], 3L, 9L),
      (Option("b"), 1L, 4L))
    assert(got == want, s"null-group rows mishandled: $got")
  }

  test("the per-row windowed pass is keyed by partition id — never a global single partition") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
              col("l_quantity").cast("long").as("q"))
    val df = PrefixSum.cumSum(li, Seq(col("k1"), col("k2")), col("q"), "cum")
    // logical plan: AQE wraps the physical tree, so WindowExec nodes
    // are not reachable by a plain physical collect pre-execution
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // every WindowExec over DATA partitions by __pid; the only
    // empty-partition window the operator plans is the subtotal-ledger
    // prefix (recognizable by its ORDER BY __pid), which is bounded by
    // spark.sql.shuffle.partitions rows — config, not data — and is
    // broadcast back
    windows.foreach { w =>
      val ledgerPrefix = w.orderSpec.exists(_.child.toString.contains("__pid"))
      assert(w.partitionSpec.nonEmpty || ledgerPrefix,
        s"unexpected single-partition WindowExec over data:\n$w")
    }
  }
}
