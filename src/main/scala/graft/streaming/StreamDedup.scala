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
  *    exactly like q73 before the anti-join shuffle. Batch writes are
  *    keyed by `batchId` subdirectories, so a replayed micro-batch
  *    (failure between the two writes) overwrites its own previous
  *    attempt instead of double-appending — idempotent re-execution,
  *    preserving exactly-once end to end.
  */
object StreamDedup {

  /** Exact cross-batch first-occurrence-wins dedup on `keys`. */
  def firstPerKey(parsed: DataFrame, keys: Seq[String]): DataFrame =
    parsed.dropDuplicates(keys)

  /** Incremental dedup against a parquet seen-set that outlives the
    * query. Emits never-seen keys to `outDir/batch=<id>` and records
    * them in `seenDir/batch=<id>`; per-batch directories make the
    * foreachBatch body idempotent under replay.
    */
  def startIncremental(parsed: DataFrame, keyCol: String, outDir: String,
                       seenDir: String, checkpointDir: String,
                       batchPeriodMs: Long = 100L): StreamingQuery =
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
        val fresh = readSeen(spark, seenDir, keyCol, excludeBatchId = batchId) match {
          case Some(seen) => withinBatch.join(seen, Seq(keyCol), "left_anti")
          case None       => withinBatch
        }
        // cache: fresh is written twice; recomputing would re-run the
        // anti-join (and re-read the seen-set) per write
        fresh.persist()
        try {
          fresh.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
          fresh.select(keyCol).write.mode(SaveMode.Overwrite).parquet(s"$seenDir/batch=$batchId")
        } finally fresh.unpersist()
      }
      .start()

  /** The seen-set scan, or None before any batch has written one.
    * Listed through the Hadoop FS API so `seenDir` may live on any
    * supported filesystem (HDFS/object store), not just local disk.
    * (`basePath` keeps the `batch=` partition column out of the join.)
    */
  private def readSeen(spark: SparkSession, seenDir: String, keyCol: String,
                       excludeBatchId: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(seenDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(path)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(path).filter { st =>
        val n = st.getPath.getName
        n.startsWith("batch=") && n != s"batch=$excludeBatchId"
      }
    if (parts.isEmpty) None
    else Some(spark.read.option("basePath", seenDir)
      .parquet(parts.map(_.getPath.toString).toSeq: _*).select(keyCol))
  }
}
