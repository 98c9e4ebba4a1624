package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate over a frame table (round 14) —
  * the consumer the change data feed exists for: a `(key, cnt, sum)`
  * rollup of a source table, maintained by reading ONLY the change
  * units minted since the last refresh and MERGE-ing the signed deltas
  * into the target. Every piece is the engine's own machinery
  * composed: [[FrameChanges]] supplies exact insert/delete rows per
  * version, the delta is one small groupBy over the changes, and the
  * apply is SQL `MERGE INTO` through the catalog's group-based
  * row-level operation — so refresh cost is O(changed segments) +
  * O(affected target groups), never O(source table). At 100 TB that is
  * the difference between a nightly full recompute of a trillion-row
  * rollup and merging one day of deltas.
  *
  * Exactness: counts are integer-exact by construction (inserts minus
  * deletes). Sums are float-additive — the incrementally maintained
  * sum equals the full recompute up to double-addition reassociation,
  * the same tolerance any distributed sum already carries.
  *
  * The refresh watermark (`_matview.json` in the target's directory —
  * underscore-prefixed, invisible to the scan) records the source
  * version the target reflects; a crash between MERGE and watermark
  * write re-applies the same change range, so the watermark is only
  * advanced AFTER the merge commits — re-running a completed refresh
  * is detected as a no-op range. (Like the maintenance manifest, one
  * maintainer per view; the MERGE itself is atomic via the commit
  * protocol.)
  */
object FrameMatView {

  val MarkerFile = "_matview.json"

  case class RefreshResult(fromVersion: Int, toVersion: Int, deltaKeys: Long)

  private def readWatermark(dstDir: File): Int = {
    val f = new File(dstDir, MarkerFile)
    if (!f.isFile) return 0
    val p = new com.fasterxml.jackson.core.JsonFactory()
      .createParser(java.nio.file.Files.readString(f.toPath))
    import com.fasterxml.jackson.core.JsonToken._
    var v = 0
    p.nextToken()
    while (p.nextToken() != END_OBJECT) {
      p.currentName() match {
        case "srcVersion" => p.nextToken(); v = p.getIntValue
        case _            => p.nextToken()
      }
    }
    v
  }

  private def writeWatermark(dstDir: File, srcVersion: Int): Unit = {
    val tmp = new File(dstDir, MarkerFile + ".tmp")
    java.nio.file.Files.writeString(tmp.toPath, s"""{"srcVersion":$srcVersion}""")
    java.nio.file.Files.move(tmp.toPath, new File(dstDir, MarkerFile).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Refresh `<catalog>.<dst>` (schema: keyCol, `cnt` BIGINT, `sum_v`
    * DOUBLE) from `<catalog>.<src>`'s changes since the last refresh.
    * The first refresh (watermark 0) IS the initial build through the
    * same path. Returns the applied version range and delta-key count;
    * a zero-length range is a no-op.
    */
  def refresh(spark: SparkSession, catalog: String, src: String, dst: String,
              keyCol: String, valueCol: String): RefreshResult = {
    val cat = spark.sessionState.catalogManager.catalog(catalog) match {
      case c: FrameCatalog => c
      case other => throw new IllegalArgumentException(
        s"catalog '$catalog' is not a FrameCatalog: ${other.getClass.getName}")
    }
    val srcDir = cat.resolveTableDir(src)
    val dstDir = cat.resolveTableDir(dst)
    val (schemaJson, schemaId) = cat.wireSchemaOf(src)

    val from = readWatermark(dstDir)
    val to = FrameMaintenance.totalVersions(srcDir)
    require(to >= from,
      s"matview watermark v$from is ahead of source $src at v$to — was the source " +
        "truncated? Drop and rebuild the view")
    if (to == from) return RefreshResult(from, to, 0L)

    // signed per-key delta over exactly the new change units
    val changes = FrameChanges.read(spark, srcDir.getAbsolutePath,
      schemaJson, schemaId, from, Some(to), cat.historyJsonOf(src))
    val sign = when(col(FrameChanges.ChangeTypeCol) === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = changes
      .groupBy(col(keyCol).as("k"))
      .agg(sum(sign).as("d_cnt"),
           sum(sign.cast("double") * col(valueCol)).as("d_sum"))
      // group rewrites emit delete+reinsert pairs: keys they leave
      // untouched net to (0, 0.0) and need no merge at all
      .filter(col("d_cnt") =!= 0L || col("d_sum") =!= 0.0)

    val view = s"graft_mv_delta_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // cache across the two consumers (key count + MERGE source): the
    // change units are read ONCE, not once per job
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    delta.createOrReplaceTempView(view)
    val deltaKeys = delta.count()
    try {
      spark.sql(s"""
        MERGE INTO $catalog.$dst t
        USING $view s
        ON t.$keyCol = s.k
        WHEN MATCHED AND t.cnt + s.d_cnt = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.d_cnt, sum_v = t.sum_v + s.d_sum
        WHEN NOT MATCHED AND s.d_cnt > 0 THEN
          INSERT ($keyCol, cnt, sum_v) VALUES (s.k, s.d_cnt, s.d_sum)
      """)
    } finally {
      spark.catalog.dropTempView(view)
      delta.unpersist()
    }

    writeWatermark(dstDir, to)
    RefreshResult(from, to, deltaKeys)
  }

  /** Continuous maintenance: a streaming query that tails the source's
    * change feed and MERGEs each micro-batch's signed deltas into the
    * view — the same algebra as [[refresh]], driven by the engine's own
    * streaming CDC ([[FrameChangesMicroBatchStream]]) instead of a
    * manual watermark: Spark's checkpoint offset log IS the watermark,
    * so restarts resume exactly where the last committed batch ended
    * and every insert/delete is applied exactly once. foreachBatch is
    * the right sink shape because the apply is a MERGE (arbitrary
    * writer), the standard Structured Streaming upsert pattern.
    */
  def continuous(spark: SparkSession, catalog: String, src: String, dst: String,
                 keyCol: String, valueCol: String,
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val cat = spark.sessionState.catalogManager.catalog(catalog) match {
      case c: FrameCatalog => c
      case other => throw new IllegalArgumentException(
        s"catalog '$catalog' is not a FrameCatalog: ${other.getClass.getName}")
    }
    val srcDir = cat.resolveTableDir(src)
    cat.resolveTableDir(dst) // existence check
    val (schemaJson, schemaId) = cat.wireSchemaOf(src)

    val reader = spark.readStream.format("graft.sources.AvroFrameDataSource")
      .option("path", srcDir.getAbsolutePath)
      .option("avroSchema", schemaJson)
      .option("schemaId", schemaId.toString)
      .option("changeFeed", "true")
    cat.historyJsonOf(src).foreach(h => reader.option("avroSchemaHistory", h))

    reader.load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (changes: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val sign = when(col(FrameChanges.ChangeTypeCol) === "insert", lit(1L))
          .otherwise(lit(-1L))
        val delta = changes
          .groupBy(col(keyCol).as("k"))
          .agg(sum(sign).as("d_cnt"),
               sum(sign.cast("double") * col(valueCol)).as("d_sum"))
          .filter(col("d_cnt") =!= 0L || col("d_sum") =!= 0.0)
        val view = s"graft_mv_stream_delta_$batchId"
        delta.createOrReplaceTempView(view)
        try {
          delta.sparkSession.sql(s"""
            MERGE INTO $catalog.$dst t
            USING $view s
            ON t.$keyCol = s.k
            WHEN MATCHED AND t.cnt + s.d_cnt = 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.d_cnt, sum_v = t.sum_v + s.d_sum
            WHEN NOT MATCHED AND s.d_cnt > 0 THEN
              INSERT ($keyCol, cnt, sum_v) VALUES (s.k, s.d_cnt, s.d_sum)
          """)
        } finally delta.sparkSession.catalog.dropTempView(view)
        ()
      }
      .start()
  }
}
