package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Results are materialized through the `noop` sink — a plain
  * `count()` would let Catalyst prune projections and skip most of
  * the work being measured. One tiny warmup action runs first so JVM /
  * codegen startup lands outside the per-query timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Interleaved passes revealed a harness artifact: the generated-
      // class cache defaults to 100 entries, so with 160+ queries
      // between a query's samples EVERY sample pays full Janino
      // recompilation (~+0.2-0.5 s/query uniformly, measured 104→144 s
      // on the common set). A long-running query service sizes this
      // cache to its workload; do the same so pass 2+ measures
      // execution, not compilation. Static conf — must be set before
      // the session is created.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    // Dev loop: SPARK_GRAFT_ONLY=q36,q58 times just those queries and
    // skips the streaming segment unless "stream" is in the list.
    // Unset for the full driver run.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(f => f.exists(SparkEntry.onlyMatches(n, _))) }
    // The streaming segment runs BEFORE the query corpus: 67 queries
    // leave GBs of shuffle spill whose dirty-page writeback competes
    // with the backlog scan and crushed the measured rate 10-20x.
    // stream fields appear ONLY when actually measured — fabricated
    // zeros would read as a throughput collapse to any JSON consumer.
    val streamJson =
      if (only.forall(_.contains("stream"))) {
        val (streamRows, streamSec) = streamingThroughput(spark)
        f""""stream_rows":$streamRows,"stream_sec":$streamSec%.3f,"stream_rows_per_sec":${streamRows / streamSec}%.0f,"""
      } else ""
    // Sampling discipline: N COMPLETE PASSES over the query list,
    // round-robin, per-query min taken ACROSS passes — not N
    // consecutive runs of each query. Three rounds running, the
    // committed artifact carried 3-7x contention spikes (r6
    // q87/q92-q95, r7 q89/q90) with unchanged code because a single
    // host-contention window covered all consecutive samples of one
    // query, so min-of-N never saw an uncontended run. Interleaved,
    // the samples of any one query are separated by a full ~100 s
    // pass: a spike would have to recur at the same query in every
    // pass to survive into the artifact. The first pass additionally
    // absorbs per-query one-time costs (Janino codegen, cold page
    // cache), so later passes measure steady state.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val samples = scala.collection.mutable.Map.empty[String, List[(Double, Boolean)]]
      .withDefaultValue(Nil)
    for (pass <- 1 to passes) {
      selected.zipWithIndex.foreach { case ((name, fn), qi) =>
        // ContextCleaner only removes dead shuffle files after a driver
        // GC; a 48g heap collects rarely, so 163 queries × passes
        // accumulate GBs of spill whose dirty-page writeback perturbs
        // the tail of the corpus. Collect explicitly every 10 queries —
        // OUTSIDE the timed region.
        if (qi % 10 == 9) { System.gc(); Thread.sleep(200) }
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed (pass $pass): ${e.getMessage}"); false
          }
        samples(name) = ((System.nanoTime() - t0) / 1e9, ok) :: samples(name)
      }
    }
    val results = selected.map { case (name, _) =>
      // min over SUCCESSFUL runs only — a run that dies 1 s in must not
      // masquerade as a 1 s steady state. All-failed: report the max
      // elapsed (never a flattering number) alongside the stderr lines.
      val times = samples(name)
      val good = times.collect { case (t, true) => t }
      (name, if (good.nonEmpty) good.min else times.map(_._1).max, good.nonEmpty)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // all-runs-failed queries, machine-readable: stderr alone would let
    // an automated bench comparison silently count a broken query's
    // elapsed time as a slow success
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs_per_query":$passes,"errors":$errs,"queries":$qs,$streamJson"sf":"$sfDir"}"""
    println(json)
    // stdout interleaves with Spark logging under some runners and the
    // round-3 artifact lost its head to truncation — persist the full
    // line as a file too. Dev-loop runs (SPARK_GRAFT_ONLY set) default
    // to a SEPARATE file: a filtered run writing bench_out.json has
    // twice replaced the committed full-surface artifact by accident
    // (r11's stream-only overwrite; r13's as-of/DSv2 spot-checks).
    val defaultOut = if (only.isDefined) "bench_only_out.json" else "bench_out.json"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    // The driver's round artifact keeps only the LAST ~2000 chars of
    // stdout; with 163 queries the full line above is ~6 KB, so every
    // prior round's artifact held a head-truncated (unparseable)
    // fragment. Print a compact summary line LAST — small enough to
    // sit entirely inside that tail window — carrying the headline
    // numbers plus a pointer to the committed full per-query map.
    val slowest = results.sortBy(-_._2).take(8)
      .map { case (k, v, _) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs_per_query":$passes,"n_queries":${results.size},"errors":$errs,"slowest":$slowest,${streamJson}"queries_full":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }

  /** Sustained-rate number for the streaming capability axis: the full
    * RecordStream pipeline (file-source envelope scan → from_json value
    * parse → sink) over a fixed pre-generated backlog, drained with
    * Trigger.AvailableNow in bounded micro-batches. Fixed work divided
    * by measured wall time — stable across runs, unlike a rate-source
    * sample window.
    */
  private def streamingThroughput(spark: SparkSession): (Long, Double) = {
    import org.apache.spark.sql.streaming.Trigger
    val rows = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "2000000").toLong
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-bench")

    def genBacklog(dir: String, n: Long, files: Int): Unit =
      spark.range(n).selectExpr(
          "cast(id as string) as key",
          "to_json(named_struct('name', concat('user', id % 1000), 'age', cast(id % 90 as int))) as value",
          "'bench' as topic",
          "cast(id % 32 as int) as `partition`",
          "id as offset",
          "timestamp_millis(1700000000000 + id) as `timestamp`")
        .repartition(files).write.mode("overwrite").json(dir)

    // Per-trigger file bound: fewer files than cores per batch caps
    // scan parallelism at that file count (8 of 32 cores idle 3/4 of
    // the backlog). Default = one file per core per micro-batch.
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "32").toInt
    def drain(dir: String, ck: String): Double = {
      val parsed = streaming.RecordStream.parseValues(
        streaming.RecordStream.jsonDirSource(spark, dir, maxFilesPerTrigger = filesPerTrigger),
        streaming.RecordStream.testschema)
      val t0 = System.nanoTime()
      val q = parsed.writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup drain compiles the streaming plan + codegen once so the
    // measured number is the sustained rate, not JIT startup
    genBacklog(tmp.resolve("warm").toString, 10000L, 2)
    drain(tmp.resolve("warm").toString, tmp.resolve("ck-warm").toString)
    genBacklog(tmp.resolve("in").toString, rows, 32)
    // same min-of-N discipline as the query corpus: the backlog
    // write's own dirty-page flush can contend with the FIRST drain's
    // scan (measured 1.06M vs 1.35M rows/s run-to-run); a second
    // drain over the now-cached backlog with a fresh checkpoint
    // measures the sustained rate
    val sec = (1 to 2).map(i =>
      drain(tmp.resolve("in").toString, tmp.resolve(s"ck$i").toString)).min
    // drop the ~hundreds of MB of backlog now — leftover dirty pages
    // otherwise contend with whatever runs next
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    (rows, sec)
  }
}
