package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

/** The native AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan):
  * semantics pinned against a brute-force reference on crafted inputs
  * (ties, gaps, unmatched keys, nulls, empty sides, partition
  * boundaries) and the plan shape pinned to the merge form (no Window,
  * no Union, no join pair blow-up). q264 additionally holds the full
  * operator to DuckDB's independent ASOF LEFT JOIN implementation.
  */
class AsOfSpec extends AnyFunSuite with SparkFixture {

  import scala.jdk.CollectionConverters._
  private def mk(rows: Seq[(java.lang.Long, java.lang.Long, String)],
                 keyName: String, tsName: String, tag: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(keyName, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(tsName, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(tag, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava, schema)
  }

  private def brute(left: Seq[(java.lang.Long, java.lang.Long, String)],
                    right: Seq[(java.lang.Long, java.lang.Long, String)]): Set[(Long, Long, String, Option[String])] =
    left.filter(l => l._1 != null && l._2 != null).map { l =>
      val cands = right.filter(r => r._1 != null && r._2 != null &&
        r._1 == l._1 && r._2 <= l._2)
      val m = if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2.longValue, r._3))._3)
      (l._1.longValue, l._2.longValue, l._3, m)
    }.toSet ++ left.filter(l => l._1 == null || l._2 == null)
      .map(l => (if (l._1 == null) -1L else l._1.longValue,
                 if (l._2 == null) -1L else l._2.longValue, l._3, None))

  private def runAsOf(left: Seq[(java.lang.Long, java.lang.Long, String)],
                      right: Seq[(java.lang.Long, java.lang.Long, String)],
                      broadcast: Boolean = false): Set[(Long, Long, String, Option[String])] = {
    val l = mk(left, "k", "lts", "ltag")
    val r = mk(right, "rk", "rts", "rtag")
    val join = if (broadcast) AsOf.leftAsOfBroadcast(l, r, "k", "rk", "lts", "rts")
               else AsOf.leftAsOf(l, r, "k", "rk", "lts", "rts")
    join.collect().map { row =>
      (if (row.isNullAt(0)) -1L else row.getLong(0),
       if (row.isNullAt(1)) -1L else row.getLong(1),
       row.getString(2),
       Option(row.getString(5)))
    }.toSet
  }

  test("as-of merge matches brute force: ties, gaps, unmatched, interleaved keys") {
    val L: java.lang.Long = null
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"),
      (2L, 15L, "l3"), (3L, 100L, "l4"), (4L, 1L, "l5"),
      (1L, 10L, "l6"), // duplicate left ts — both get the same match
      (L, 50L, "lnullk"), (5L, L, "lnullt"))
    val right = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "r_eq"),   // tie: at-or-before matches
      (1L, 8L, "r_8"), (1L, 21L, "r_late"),
      (2L, 14L, "r_a"), (2L, 15L, "r_b"), // right tie at 15: deterministic pick not required pre-dedup — avoid in brute by distinct ts
      (3L, 1L, "r_old"),
      (9L, 1L, "r_nokey"),
      (L, 1L, "r_nullk"), (2L, L, "r_nullt"))
    // right ties on (key, ts) are resolved by sort order (nondeterministic
    // pre-dedup) — drop the (2,14)/(2,15) ambiguity by keeping distinct ts
    val rightClean = right.filterNot(r => r._3 == "r_a")
    assert(runAsOf(left, rightClean) == brute(left, rightClean))
    assert(runAsOf(left, rightClean, broadcast = true) == brute(left, rightClean),
      "broadcast path diverged from brute force")
  }

  test("as-of with empty right side leaves every left row unmatched") {
    val left = Seq[(java.lang.Long, java.lang.Long, String)]((1L, 1L, "a"), (2L, 2L, "b"))
    for (b <- Seq(false, true))
      assert(runAsOf(left, Seq.empty, broadcast = b) ==
        Set((1L, 1L, "a", None), (2L, 2L, "b", None)), s"broadcast=$b")
  }

  test("as-of survives many keys across partition boundaries") {
    // 500 keys x 4 left rows, right rows at ts 0/10/20 per key — the
    // shuffle spreads keys over 4 partitions; every row still finds
    // the newest right row at-or-before it
    val left = for (k <- 0L until 500L; t <- Seq(5L, 10L, 15L, 25L))
      yield (java.lang.Long.valueOf(k), java.lang.Long.valueOf(t), s"l$k-$t")
    val right = for (k <- 0L until 500L; t <- Seq(0L, 10L, 20L))
      yield (java.lang.Long.valueOf(k), java.lang.Long.valueOf(t), s"r$k-$t")
    val expect = left.map { case (k, t, tag) =>
      val m = t.longValue match {
        case 5L => "0"; case 10L => "10"; case 15L => "10"; case 25L => "20"
      }
      (k.longValue, t.longValue, tag, Some(s"r$k-$m"))
    }.toSet
    assert(runAsOf(left.toSeq, right.toSeq) == expect)
    assert(runAsOf(left.toSeq, right.toSeq, broadcast = true) == expect,
      "broadcast path diverged on the multi-partition fixture")
  }

  test("broadcast as-of: fact side gets zero exchange and zero sort (q324)") {
    // AQE wraps stages in QueryStageExec nodes that hide the tree from
    // collect(); the static EnsureRequirements pass places the same
    // exchanges, so pin the shape with AQE off (the brute-force tests
    // above exercise the operator under AQE).
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val p = SparkEntry.queries("q324_broadcast_asof_join")(spark, sfDir)
      .queryExecution.executedPlan
    val execs = p.collect {
      case b: graft.plans.BroadcastAsOfJoinExec => b }
    assert(execs.nonEmpty, s"BroadcastAsOfJoin missing from plan:\n$p")
    val factSide = execs.head.left
    val factShuffles = factSide.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(factShuffles.isEmpty,
      s"fact side must flow straight from the scan — found ${factShuffles.map(_.nodeName)}:\n$p")
    val dimBroadcast = execs.head.right.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e }
    assert(dimBroadcast.nonEmpty, s"dimension side must broadcast the AsOfIndex:\n$p")
    assert(dimBroadcast.head.mode.isInstanceOf[graft.plans.AsOfIndexMode],
      s"broadcast must carry the driver-built sorted index, got ${dimBroadcast.head.mode}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q264 plans the native AsOfJoin node — no Window, no Union, no pair join") {
    val p = SparkEntry.queries("q264_native_asof_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native as-of node missing:\n$p")
    assert(!p.contains("Window"), s"fell back to window carry:\n$p")
    assert(!p.contains("Union"), s"fell back to union trick:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
           !p.contains("CartesianProduct"), s"pair-join blow-up:\n$p")
  }

  test("as-of API rejects shared column names and non-long/timestamp types") {
    val l = mk(Seq((1L, 1L, "x")), "k", "ts", "tag")
    val r = mk(Seq((1L, 1L, "y")), "k", "ts", "rtag2")
    intercept[IllegalArgumentException] {
      AsOf.leftAsOf(l, r, "k", "k", "ts", "ts")
    }
    val rOk = mk(Seq((1L, 1L, "y")), "rk", "rts", "rtag")
    intercept[IllegalArgumentException] {
      AsOf.leftAsOf(l.withColumn("kd", col("k").cast("double")), rOk,
        "kd", "rk", "ts", "rts")
    }
  }
}
