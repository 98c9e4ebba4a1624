package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryGroup, Tables}

/** Judged queries for the engine's own DataSource V2 connector
  * ([[AvroFrameDataSource]]). The fixture step re-encodes the events
  * table as framed-Avro segment files (executor-side, one segment per
  * input partition — no driver collect), once per scale factor; the
  * judged relation is then read back THROUGH the connector with a
  * filter + projection that must reach the source, and aggregated.
  * The DuckDB oracle runs the equivalent SQL over the original parquet
  * — so the whole encode → frame → scan → pushdown → decode loop has
  * to be lossless and the pushed filters exactly SQL-semantics.
  */
object SourceQueries extends QueryGroup {

  /** Avro writer schema for an events record — the "registry entry"
    * for schema id 7. Timestamps travel as epoch micros (Avro long),
    * the same Long the engine's as-of/atribution operators key on.
    */
  val EventsAvroSchema: String =
    """{"type":"record","name":"event","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"ts_us","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"}
      |]}""".stripMargin
  val EventsSchemaId = 7

  /** Materialize the events table as framed-Avro segments under a
    * per-sfDir fixture directory; idempotent via a marker carrying the
    * row count (re-encodes if absent or stale). Encoding runs on
    * executors with `foreachPartition` — each task writes one segment,
    * the exact shape a log-dump job on a cluster would produce (there
    * a task writes to DFS; locally java.io.tmpdir stands in).
    */
  def ensureFixture(s: SparkSession, d: String): String = {
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft-avro-frames-" + d.replaceAll("[^A-Za-z0-9]", "_"))
    val ev = Tables.events(s, d)
    val n = ev.count()
    val marker = new java.io.File(dir, "_SUCCESS")
    if (marker.isFile &&
        scala.util.Try(java.nio.file.Files.readString(marker.toPath).trim.toLong)
          .toOption.contains(n)) return dir.getAbsolutePath
    if (dir.exists()) dir.listFiles().foreach(_.delete()) else dir.mkdirs()
    val schemaJson = EventsAvroSchema
    val schemaId = EventsSchemaId
    val path = dir.getAbsolutePath
    ev.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        // partition-id names keep segments unique without driver state
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val frames = rows.map { r =>
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("event_id", r.getLong(0))
          rec.put("ts_us", r.getLong(1))
          rec.put("user_id", r.getLong(2))
          rec.put("event_type", r.getString(3))
          rec.put("value", r.getDouble(4))
          AvroFrames.frameRecord(schemaId, rec)
        }
        AvroFrames.writeSegment(
          new java.io.File(path, f"segment-$pid%05d.bin"), frames)
      }
    java.nio.file.Files.writeString(marker.toPath, n.toString)
    dir.getAbsolutePath
  }

  /** Read events through the connector. */
  def frames(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.AvroFrameDataSource")
      .option("path", ensureFixture(s, d))
      .option("avroSchema", EventsAvroSchema)
      .option("schemaId", EventsSchemaId.toString)
      .load()

  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(

    // ------------------------------------------------------------ DSv2 frame source (round 13)
    // The connector end-to-end: the click-purchase value rollup per
    // user, where `event_type = 'click' AND value >= 100` and the
    // 3-column projection are pushed INTO AvroFrameScan (SourcesSpec
    // asserts both from the scan description and counts what crosses
    // the reader boundary) — frames failing the filter never allocate
    // a Spark row. At 100 TB the same plan fans one task per segment
    // and ships only the 3 projected columns of the matching frames.
    ("q325_avro_frame_source", (s, d) => {
      frames(s, d)
        .filter(col("event_type") === "click" && col("value") >= 100.0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"),
             sum("value").as("sum_value"),
             max("ts_us").as("last_ts_us"))
        .orderBy("user_id")
    }, Some("""
      SELECT user_id, count(*)::BIGINT AS n_clicks, sum(value) AS sum_value,
             max(epoch_us(ts::TIMESTAMP)) AS last_ts_us
      FROM events
      WHERE event_type = 'click' AND value >= 100.0
      GROUP BY user_id
      ORDER BY user_id
    """))
  )
}
