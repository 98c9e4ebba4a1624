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
    // Closure-cached sketches (rebuilt from disk on restart): the run's
    // OWN sketch is single-writer, so the in-memory copy is exact and
    // never re-read; OTHER runs' sketches are re-read every
    // `compactEvery` batches — cross-writer dedup was already eventual
    // (a racing writer's in-flight keys are invisible), this bounds the
    // staleness window at compactEvery × trigger instead of one batch.
    // The run SET is re-listed every batch (one cheap listStatus): a
    // run that first appears after the cached load is a distinct case
    // from a known run's sketch growing — its keys would pass the
    // "sketch miss ⇒ definitely new" path for up to compactEvery
    // batches and be emitted as duplicates. An unknown run directory
    // forces an immediate reload; the compactEvery refresh covers only
    // staleness of known runs.
    var ownSketch: Option[org.apache.spark.util.sketch.BloomFilter] = None
    var othersSketch: Option[Array[org.apache.spark.util.sketch.BloomFilter]] = None
    var othersRuns: Set[String] = Set.empty
    var othersReadAt: Long = Long.MinValue
    parsed.writeStream
      .queryName("graft-stream-dedup")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(batchPeriodMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit, not, xxhash64}
        val spark = batch.sparkSession
        val compactDue = compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0
        val withinBatch = batch.dropDuplicates(keyCol).persist()
        try {
          if (!withinBatch.isEmpty) {
            // exclude THIS batch's own seen-partition: on replay after a
            // failure between the two writes, the previous attempt's keys
            // must not anti-join the batch against itself (empty output)
            val seenOpt = readSeen(spark, seenDir, keyCol, runId, batchId)
            if (ownSketch.isEmpty)
              ownSketch = Some(loadOrRebuildOwnSketch(spark, seenDir, keyCol, runId))
            val runsNow = listOtherRuns(spark, seenDir, runId)
            if (othersSketch.isEmpty || runsNow != othersRuns ||
                batchId - othersReadAt >= math.max(compactEvery, 1)) {
              othersSketch = loadOtherSketches(spark, seenDir, runId)
              othersRuns = runsNow
              othersReadAt = batchId
            }
            // coverage: prefilter only when EVERY other run has a sketch
            // (a miss is only trustworthy then); own is always in memory
            val sketchOpt = othersSketch.map { others =>
              val merged = org.apache.spark.util.sketch.BloomFilter.create(SketchItems, SketchBits)
              (others :+ ownSketch.get).foreach(merged.mergeInPlace)
              merged
            }
            var flagged: Option[DataFrame] = None
            val fresh = (seenOpt, sketchOpt) match {
              case (None, _) => withinBatch
              case (Some(seen), None) => // some run predates sketching: exact path for every key
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
              val freshBytes = fresh
                .agg(graft.functions.SketchFunctions
                  .bloomFilterAgg(xxhash64(col(keyCol)), SketchItems, SketchBits).as("bf"))
                .head.getAs[Array[Byte]]("bf") // null when no fresh keys
              if (freshBytes != null) {
                ownSketch.get.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
                  .readFrom(new java.io.ByteArrayInputStream(freshBytes)))
                writeSketchAtomic(spark, seenDir, runId, ownSketch.get)
              }
              fresh.write.mode(SaveMode.Overwrite).parquet(s"$outDir/run=$runId/batch=$batchId")
              fresh.select(keyCol).write.mode(SaveMode.Overwrite).parquet(s"$seenDir/run=$runId/batch=$batchId")
            } finally {
              fresh.unpersist()
              flagged.foreach(_.unpersist())
            }
          }
        } finally withinBatch.unpersist()
        if (compactDue) compactSeen(spark, seenDir, keyCol, runId, batchId)
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

  /** This run's sketch: the file if present, else REBUILT from the
    * run's committed seen partitions (one distributed aggregate —
    * covers a lost/deleted sketch file without ever violating the
    * superset invariant: seen partitions ARE the committed keys), else
    * empty. Including a crashed previous attempt's partition of the
    * current batch is harmless — supersets only cause verify joins.
    */
  private def loadOrRebuildOwnSketch(spark: SparkSession, seenDir: String, keyCol: String,
                                     runId: String): org.apache.spark.util.sketch.BloomFilter = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import org.apache.spark.util.sketch.BloomFilter
    val target = sketchFile(seenDir, s"run=$runId")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readSketch(fs, target).getOrElse {
      val runPath = new org.apache.hadoop.fs.Path(s"$seenDir/run=$runId")
      val parts =
        if (!fs.exists(runPath)) Array.empty[String]
        else fs.listStatus(runPath).map(_.getPath)
          .filter(_.getName.startsWith("batch=")).map(_.toString)
      if (parts.isEmpty) BloomFilter.create(SketchItems, SketchBits)
      else {
        val bytes = spark.read.option("basePath", seenDir).parquet(parts.toSeq: _*)
          .agg(graft.functions.SketchFunctions
            .bloomFilterAgg(xxhash64(col(keyCol)), SketchItems, SketchBits).as("bf"))
          .head.getAs[Array[Byte]]("bf")
        if (bytes == null) BloomFilter.create(SketchItems, SketchBits)
        else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      }
    }
  }

  /** The set of other runs' `run=` directory names — re-listed every
    * batch so a newly appeared run (fresh deployment, concurrent
    * writer) invalidates the cached sketch merge immediately.
    */
  private def listOtherRuns(spark: SparkSession, seenDir: String,
                            runId: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(seenDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("run=") && n != s"run=$runId").toSet
  }

  /** Every OTHER run's sketch, or None when any other `run=` data
    * directory lacks a readable sketch (a writer predating sketching,
    * or a replacement racing this read): a miss would then not be
    * trustworthy, so the caller disables the prefilter and verifies
    * every key exactly — degrade, never corrupt.
    */
  private def loadOtherSketches(spark: SparkSession, seenDir: String,
                                runId: String): Option[Array[org.apache.spark.util.sketch.BloomFilter]] = {
    val root = new org.apache.hadoop.fs.Path(seenDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Some(Array.empty)
    val others = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("run=") && n != s"run=$runId")
    val sketches = others.map(r => readSketch(fs, sketchFile(seenDir, r)))
    if (sketches.exists(_.isEmpty)) None else Some(sketches.map(_.get))
  }

  /** TOCTOU-safe sketch read: any failure (missing file, a concurrent
    * writer mid-replace) reads as "no sketch", which callers treat as
    * prefilter-off — safe, just slower for one batch.
    */
  private def readSketch(fs: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path): Option[org.apache.spark.util.sketch.BloomFilter] =
    try {
      val in = fs.open(p)
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in)) finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** `writeTo` bytes — the same wire form `BloomFilterAggregate`
    * produces and `BloomFilterMightContain` folds as a literal.
    */
  private def serializeSketch(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Replace the run's sketch file via temp write + ATOMIC overwrite
    * rename (FileContext.rename(OVERWRITE) — no delete-then-rename
    * window in which a crash could orphan the run's sketch).
    */
  private def writeSketchAtomic(spark: SparkSession, seenDir: String, runId: String,
                                bf: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val target = sketchFile(seenDir, s"run=$runId")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(target.getParent)
    val tmp = new org.apache.hadoop.fs.Path(target.getParent, s".run=$runId.tmp")
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(target),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
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
