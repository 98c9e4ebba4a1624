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
  *    batch+streaming sharing one corpus). Each micro-batch
  *    anti-joins the (small) batch against the seen-set scan and
  *    appends the survivors to both the output and the seen-set. At
  *    100 TB the seen-set side is pruned with a bloom prefilter
  *    exactly like q73 before the anti-join shuffle.
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
        val spark = batch.sparkSession
        val withinBatch = batch.dropDuplicates(keyCol)
        // exclude THIS batch's own seen-partition: on replay after a
        // failure between the two writes, the previous attempt's keys
        // must not anti-join the batch against itself (empty output)
        val fresh = readSeen(spark, seenDir, keyCol, runId, batchId) match {
          case Some(seen) => withinBatch.join(seen, Seq(keyCol), "left_anti")
          case None       => withinBatch
        }
        // cache: fresh is written twice; recomputing would re-run the
        // anti-join (and re-read the seen-set) per write
        fresh.persist()
        try {
          fresh.write.mode(SaveMode.Overwrite).parquet(s"$outDir/run=$runId/batch=$batchId")
          fresh.select(keyCol).write.mode(SaveMode.Overwrite).parquet(s"$seenDir/run=$runId/batch=$batchId")
        } finally fresh.unpersist()
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactSeen(spark, seenDir, keyCol, runId, batchId)
      }
      .start()
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
