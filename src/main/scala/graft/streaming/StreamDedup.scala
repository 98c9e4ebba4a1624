package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming dedup — the cross-batch counterpart of the batch dedup
  * family (q31/q32 exact, q68 incremental, q73 bloom-prefiltered).
  * The reference pipeline (`Processor.java:141-147`) forwards every
  * record; a real ingest pipeline drops re-deliveries and re-crawls
  * before they reach storage. Two forms, different state regimes:
  *
  *  - [[firstPerKey]]: state-store dedup. Exact "first occurrence
  *    wins" across ALL micro-batches; per-key state lives in the
  *    checkpointed state store, so a restarted query keeps rejecting
  *    keys it saw before the restart (asserted in StreamDedupSpec).
  *    State is unbounded by design here — when the key space grows
  *    without limit, use `dropDuplicatesWithinWatermark` (exercised
  *    in StreamingSpec) to bound retention by event time. At scale
  *    the state store shards by key across executors (RocksDB
  *    provider for large state).
  *
  *  - [[startIncremental]]: `foreachBatch` dedup against a persistent
  *    parquet seen-set — the regime where the dedup horizon must
  *    OUTLIVE the streaming query (re-deployments, multiple writers,
  *    batch+streaming sharing one corpus). Each micro-batch is
  *    prefiltered through a persistent bloom sketch of the seen keys
  *    (q73's pattern): keys the sketch rules out are definitely new
  *    and skip the seen-set entirely, so a steady-state batch with no
  *    suspected re-deliveries costs ZERO seen-set IO; only suspected
  *    dups (true dups + the sketch's ~1% false positives) pay the
  *    exact anti-join verify. Survivors append to the output, the
  *    seen-set, and the run's sketch. Per-run sketches live at
  *    `<seenDir>/_sketch/run=<ckId>` (the `_` prefix keeps them out
  *    of partition discovery), are written atomically (temp+rename)
  *    BEFORE the batch's data writes — so a sketch is always a
  *    SUPERSET of its run's committed keys and a miss is trustworthy
  *    at every crash point (extra keys only cause harmless verify
  *    joins). If any `run=` data directory lacks a sketch (a writer
  *    predating sketching), the prefilter is skipped for safety and
  *    every key takes the exact anti-join, as before.
  *
  * Write layout: `<dir>/run=<ckId>/batch=<batchId>`, where `ckId` is
  * derived from the checkpoint location. Within one checkpoint
  * lineage, a replayed micro-batch (failure between the two writes)
  * keeps its (run, batch) key and OVERWRITES its own previous attempt
  * — idempotent re-execution, exactly-once end to end. A redeployment
  * with a fresh checkpoint gets a new `run=` namespace, so it can
  * never clobber (or wrongly exclude) a previous deployment's
  * partitions — earlier runs' keys stay in the seen-set forever.
  * Writers with distinct checkpoints compose the same way; a batch
  * racing a concurrent writer's in-flight micro-batch may not see
  * keys that writer has not committed yet (cross-writer dedup is
  * eventual, per-writer dedup is exact).
  */
object StreamDedup {

  /** Exact cross-batch first-occurrence-wins dedup on `keys`. */
  def firstPerKey(parsed: DataFrame, keys: Seq[String]): DataFrame =
    parsed.dropDuplicates(keys)

  /** Incremental dedup against a parquet seen-set that outlives the
    * query; see the object scaladoc for the idempotency layout.
    *
    * Every `compactEvery` batches the run's accumulated
    * `batch=<id>` partitions are folded into one consolidated
    * `batch=c<id>` partition and the originals deleted, so the
    * seen-set stays at O(compactEvery) directories per run instead of
    * growing one directory per micro-batch forever (at a 100 ms
    * trigger that would be ~864k directories/day — the listing and
    * the anti-join's file-open cost would grow without bound).
    */
  def startIncremental(parsed: DataFrame, keyCol: String, outDir: String,
                       seenDir: String, checkpointDir: String,
                       batchPeriodMs: Long = 100L,
                       compactEvery: Int = 16): StreamingQuery = {
    // stable per-checkpoint-lineage namespace: same across restarts of
    // this checkpoint (replay idempotency), different for any other
    // deployment (no cross-run clobbering)
    val runId = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    parsed.writeStream
      .queryName("graft-stream-dedup")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(batchPeriodMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit, not, xxhash64}
        val spark = batch.sparkSession
        val withinBatch = batch.dropDuplicates(keyCol)
        // exclude THIS batch's own seen-partition: on replay after a
        // failure between the two writes, the previous attempt's keys
        // must not anti-join the batch against itself (empty output)
        val seenOpt = readSeen(spark, seenDir, keyCol, runId, batchId)
        val sketchOpt = if (seenOpt.isEmpty) None else loadMergedSketch(spark, seenDir)
        var flagged: Option[DataFrame] = None
        val fresh = (seenOpt, sketchOpt) match {
          case (None, _) => withinBatch
          case (Some(seen), None) => // a run predates sketching: exact path for every key
            withinBatch.join(seen, Seq(keyCol), "left_anti")
          case (Some(seen), Some(sketch)) =>
            // sketch miss ⇒ definitely new (sketches are supersets of
            // committed keys at every crash point); only suspected dups
            // — true dups + ~1% false positives — pay the seen-set
            // scan + anti-join. coalesce: a null might_contain result
            // must read as "not seen", not silently drop rows
            val fl = withinBatch.withColumn("__maybe",
              coalesce(graft.functions.SketchFunctions.mightContain(
                lit(serializeSketch(sketch)), xxhash64(col(keyCol))), lit(false)))
              .persist()
            flagged = Some(fl)
            if (fl.filter(col("__maybe")).isEmpty)
              fl.drop("__maybe") // ZERO seen-set IO this batch
            else fl.filter(not(col("__maybe"))).drop("__maybe")
              .unionByName(fl.filter(col("__maybe")).drop("__maybe")
                .join(seen, Seq(keyCol), "left_anti"))
        }
        // cache: fresh is written twice (plus the sketch aggregate);
        // recomputing would re-run the anti-join per action
        fresh.persist()
        try {
          // sketch FIRST: written before any data commit so it stays a
          // superset of this run's committed keys even if the data
          // writes crash mid-batch (replay then re-verifies exactly)
          updateSketch(spark, seenDir, runId, fresh, keyCol)
          fresh.write.mode(SaveMode.Overwrite).parquet(s"$outDir/run=$runId/batch=$batchId")
          fresh.select(keyCol).write.mode(SaveMode.Overwrite).parquet(s"$seenDir/run=$runId/batch=$batchId")
        } finally {
          fresh.unpersist()
          flagged.foreach(_.unpersist())
        }
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactSeen(spark, seenDir, keyCol, runId, batchId)
      }
      .start()
  }

  // Bloom sketch parameters — FIXED constants so sketches from any
  // batch or run are merge-compatible (merging requires identical bit
  // size and hash count). 2^23 bits = 1 MiB per run; ~1% fp at 1M keys.
  private val SketchItems = 1000000L
  private val SketchBits = 1L << 23

  private def sketchFile(seenDir: String, runName: String) =
    new org.apache.hadoop.fs.Path(s"$seenDir/_sketch/$runName")

  /** The OR of every run's sketch, or None when any `run=` data
    * directory lacks a sketch file (a writer predating sketching): a
    * miss would then not be trustworthy, so the caller disables the
    * prefilter and verifies every key exactly.
    */
  private def loadMergedSketch(spark: SparkSession,
                               seenDir: String): Option[org.apache.spark.util.sketch.BloomFilter] = {
    import org.apache.spark.util.sketch.BloomFilter
    val root = new org.apache.hadoop.fs.Path(seenDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val runs = fs.listStatus(root).map(_.getPath.getName).filter(_.startsWith("run="))
    if (runs.isEmpty || runs.exists(r => !fs.exists(sketchFile(seenDir, r)))) return None
    val merged = BloomFilter.create(SketchItems, SketchBits)
    runs.foreach { r =>
      val in = fs.open(sketchFile(seenDir, r))
      try merged.mergeInPlace(BloomFilter.readFrom(in)) finally in.close()
    }
    Some(merged)
  }

  /** `writeTo` bytes — the same wire form `BloomFilterAggregate`
    * produces and `BloomFilterMightContain` folds as a literal.
    */
  private def serializeSketch(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Fold `fresh`'s keys into this run's sketch (distributed aggregate
    * — sketch bytes cross the driver, never data) and replace the file
    * via temp-write + rename. A crash between the delete and the
    * rename leaves the run sketchless, which downgrades the NEXT batch
    * to the exact path (safe, slower) until this rewrite recurs.
    */
  private def updateSketch(spark: SparkSession, seenDir: String, runId: String,
                           fresh: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import org.apache.spark.util.sketch.BloomFilter
    val bytes = fresh
      .agg(graft.functions.SketchFunctions
        .bloomFilterAgg(xxhash64(col(keyCol)), SketchItems, SketchBits).as("bf"))
      .head.getAs[Array[Byte]]("bf") // null when the batch has no fresh keys
    val target = sketchFile(seenDir, s"run=$runId")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(target.getParent)
    val own =
      if (fs.exists(target)) {
        val in = fs.open(target)
        try BloomFilter.readFrom(in) finally in.close()
      } else BloomFilter.create(SketchItems, SketchBits)
    if (bytes != null)
      own.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
    val tmp = new org.apache.hadoop.fs.Path(target.getParent, s".run=$runId.tmp")
    val out = fs.create(tmp, true)
    try own.writeTo(out) finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(tmp, target)
  }

  /** Fold every seen-partition of THIS run except the current batch's
    * into one consolidated `batch=c<currentBatchId>` directory, then
    * delete the originals. Crash-safe at every point:
    *
    *  - the consolidated dir is complete iff its `_SUCCESS` marker
    *    exists; a partial write from a crashed attempt is deleted and
    *    redone (the originals are only removed AFTER a complete write,
    *    so no key is ever lost);
    *  - it contains only batches STRICTLY BEFORE the current one, so a
    *    replay of the current batch — which must not see its own
    *    previous attempt's keys — stays correct (`readSeen` excludes
    *    `batch=<id>` by name, which cannot un-exclude keys folded into
    *    a consolidated dir);
    *  - a crash between the write and the deletes leaves keys present
    *    twice (consolidated + original) — harmless to an anti-join,
    *    and the next compaction removes the leftovers.
    *
    * Only this run's namespace is touched: other runs may have LIVE
    * concurrent writers, and compacting their in-flight partitions
    * would race their replay logic. A retired run's directories stay
    * as its own compactions left them — already bounded.
    */
  private def compactSeen(spark: SparkSession, seenDir: String, keyCol: String,
                          runId: String, currentBatchId: Long): Unit = {
    val runPath = new org.apache.hadoop.fs.Path(s"$seenDir/run=$runId")
    val fs = runPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(runPath)) return
    val compactName = s"batch=c$currentBatchId"
    val compactPath = new org.apache.hadoop.fs.Path(runPath, compactName)
    if (fs.exists(compactPath) &&
        !fs.exists(new org.apache.hadoop.fs.Path(compactPath, "_SUCCESS")))
      fs.delete(compactPath, true) // partial write from a crashed attempt
    val olds = fs.listStatus(runPath)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
        p.getName != s"batch=$currentBatchId" && p.getName != compactName
      }
    if (!fs.exists(compactPath)) {
      if (olds.isEmpty) return
      spark.read.option("basePath", seenDir)
        .parquet(olds.map(_.toString).toSeq: _*)
        .select(keyCol)
        .write.mode(SaveMode.ErrorIfExists).parquet(compactPath.toString)
    }
    olds.foreach(p => fs.delete(p, true))
  }

  /** The seen-set scan (all runs, all batches) minus the current
    * (run, batch) partition, or None when nothing has been written.
    * Listed through the Hadoop FS API so `seenDir` may live on any
    * supported filesystem (HDFS/object store), not just local disk.
    * (`basePath` keeps the partition columns out of the join.)
    */
  private def readSeen(spark: SparkSession, seenDir: String, keyCol: String,
                       runId: String, excludeBatchId: Long): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(seenDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.Path]
      else for {
        run <- fs.listStatus(root) if run.getPath.getName.startsWith("run=")
        b <- fs.listStatus(run.getPath) if b.getPath.getName.startsWith("batch=")
        if !(run.getPath.getName == s"run=$runId" && b.getPath.getName == s"batch=$excludeBatchId")
      } yield b.getPath
    if (parts.isEmpty) None
    else Some(spark.read.option("basePath", seenDir)
      .parquet(parts.map(_.toString).toSeq: _*).select(keyCol))
  }
}
