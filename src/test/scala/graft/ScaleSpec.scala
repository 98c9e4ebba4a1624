package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Salting

/** Scale-path mechanics that sf-sized data can't exercise by volume,
  * pinned by plan shape and result equivalence instead: bucketed
  * co-located joins (no shuffle), sort-merge fallback when broadcast is
  * off, salted skew joins (same result as plain), and partitioned
  * writes with partition-pruned reads.
  */
class ScaleSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("fanOut repartitions small file scans and leaves non-file plans untouched") {
    // sf parquet is far below one split per core → must fan out to the
    // session's shuffle parallelism (decision made from the file index,
    // without materializing df.rdd during query construction)
    val target = spark.sessionState.conf.numShufflePartitions
    val fanned = Tables.fanOut(Tables.documents(spark, sfDir))
    assert(fanned.queryExecution.analyzed.toString.contains("Repartition"),
      "small scan should gain a repartition")
    assert(fanned.rdd.getNumPartitions == target)
    // a projected scan (events adds a withColumn) still finds the relation
    assert(Tables.fanOut(Tables.events(spark, sfDir)).rdd.getNumPartitions == target)
    // non-file relation (range): estimate list is empty → untouched plan
    assert(!Tables.fanOut(spark.range(1000).toDF()).queryExecution.analyzed.toString.contains("Repartition"),
      "non-file plans must not gain a repartition")
  }

  test("bucketed tables join without a shuffle exchange") {
    val t1 = tmp("b-orders"); val t2 = tmp("b-cust")
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", t1).saveAsTable("b_orders")
    Tables.customer(spark, sfDir).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", t2).saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("with broadcast disabled the star join falls back to shuffle joins, same result") {
    val broadcastPlan = SparkEntry.queries("q07_nation_revenue")(spark, sfDir).collect()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // broadcast() hints in q07 still win for nation/region; supplier join degrades to SMJ/SHJ
      val df = Tables.lineitem(spark, sfDir)
        .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), s"no shuffle join:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(broadcastPlan.nonEmpty)
  }

  test("salted skew join returns exactly the plain join's rows") {
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .count()
    val salted = Salting.saltedEquiJoin(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      "l_orderkey", "o_orderkey", saltFactor = 4)
      .count()
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = tmp("part-events")
    Tables.events(spark, sfDir).write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    val clicks = spark.read.parquet(out).filter(col("event_type") === "click")
    val p = clicks.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      s"no partition pruning:\n$p")
    val expected = Tables.events(spark, sfDir).filter(col("event_type") === "click").count()
    assert(clicks.count() == expected)
  }
}
