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

  test("AQE splits a skewed join partition at runtime (OptimizeSkewedJoin)") {
    // q95's salting handles KNOWN-hot keys; AQE's skew-join is the
    // runtime net for skew nobody predicted. sf-sized shuffles sit far
    // below the production thresholds, so shrink them to prove the
    // mechanism actually engages and preserves the join result.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 90% of left rows share key 0 (with payload so the hot shuffle
      // partition crosses the shrunken threshold); right is tiny but
      // un-broadcastable by config, forcing a shuffled join
      val left = spark.range(200000).select(
        when(col("id") < 180000, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), lit(1).as("m"))
      // collect() drives joined's OWN QueryExecution (count() would
      // plan a separate aggregate query and leave this one unexecuted,
      // AQE never finalized). pad must survive projection pruning into
      // the output — it's what makes the hot partition's shuffle bytes
      // cross the skew threshold.
      val joined = left.join(right, "k").select("k", "pad")
      val n = joined.collect().length
      assert(n == 180000, s"unexpected join cardinality: $n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
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
