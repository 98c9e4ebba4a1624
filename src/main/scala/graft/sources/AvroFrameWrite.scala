package graft.sources

import java.io.File

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._

/** DSv2 WRITE path for the framed-Avro segment log (round 13) — the
  * sink half of the connector, with the commit protocol that makes a
  * distributed write exactly-once:
  *
  *  - each task writes to a HIDDEN temp file (`.inprogress-…`, which
  *    [[AvroFrames.listSegments]] never lists), so a failed or
  *    speculatively-duplicated task leaves no visible data;
  *  - the task's `commit()` returns the temp name + gathered segment
  *    STATISTICS (row count, per-field min/max/null-count) as the
  *    [[WriterCommitMessage]];
  *  - the driver's job-level `commit(messages)` renames every temp to
  *    its visible `segment-…` name and writes the `….stats` sidecar —
  *    nothing becomes readable unless the WHOLE job succeeded;
  *    `abort()` deletes the temps. `mode("overwrite")` truncates
  *    (deletes existing segments) inside the same driver commit.
  *
  * The sidecars are the manifest-statistics pattern (parquet row-group
  * stats / Iceberg manifests): the read side uses them to PRUNE whole
  * segments whose min/max prove a pushed filter can never match —
  * at 100 TB that's the difference between scanning a shard and
  * skipping it. Segments without a sidecar (foreign writers) are
  * simply never pruned; pruning is strictly conservative.
  */
object AvroFrameWrite {

  /** Per-field stats gathered at write: nulls + min/max for orderable
    * primitives (binary fields carry nulls only).
    */
  final class FieldStats {
    var nulls: Long = 0L
    var min: Any = null // Long | Double | String | Boolean
    var max: Any = null
    def observe(v: Any): Unit =
      if (v == null) nulls += 1
      else {
        val c = v match {
          case i: java.lang.Integer => i.longValue: java.lang.Long
          case f: java.lang.Float   => f.doubleValue: java.lang.Double
          case o                    => o
        }
        if (min == null || AvroFrameStats.compare(c, min) < 0) min = c
        if (max == null || AvroFrameStats.compare(c, max) > 0) max = c
      }
  }

  /** JSON for a segment's stats sidecar. `blooms` (round 14) carries
    * optional per-field serialized Bloom filters (base64) — the
    * point-lookup pruning index for high-cardinality columns whose
    * min/max spans everything (see [[AvroFrameStats.prune]]). Readers
    * that predate the field skip it (unknown-key tolerance).
    */
  def statsJson(frames: Long, fields: Seq[(String, FieldStats)],
                blooms: Map[String, String] = Map.empty): String = {
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject()
    gen.writeNumberField("frames", frames)
    gen.writeObjectFieldStart("fields")
    fields.foreach { case (name, st) =>
      gen.writeObjectFieldStart(name)
      gen.writeNumberField("nulls", st.nulls)
      def writeVal(k: String, v: Any): Unit = v match {
        case null                  => ()
        case l: java.lang.Long     => gen.writeNumberField(k, l.longValue)
        case d: java.lang.Double   => gen.writeNumberField(k, d.doubleValue)
        case b: java.lang.Boolean  => gen.writeBooleanField(k, b.booleanValue)
        case s                     => gen.writeStringField(k, s.toString)
      }
      writeVal("min", st.min); writeVal("max", st.max)
      blooms.get(name).foreach(b64 => gen.writeStringField("bloom", b64))
      gen.writeEndObject()
    }
    gen.writeEndObject(); gen.writeEndObject(); gen.close()
    sw.toString
  }

  /** Serialize a Bloom filter to the sidecar's base64 form. */
  def bloomToB64(b: org.apache.spark.util.sketch.BloomFilter): String = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  /** Default expected-items sizing for write-time Bloom filters. ONE
    * fixed size per table (not per segment) keeps every segment's
    * filter bit-compatible, so compaction can merge them by OR instead
    * of dropping them.
    */
  val DefaultBloomExpectedItems = 100000
  val BloomFpp = 0.01
}

class AvroFrameWriteBuilder(info: LogicalWriteInfo,
                            tableOpts: org.apache.spark.sql.util.CaseInsensitiveStringMap =
                              org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsOverwrite {
  private var doTruncate = false
  private var overwriteFilters: Array[Filter] = Array.empty
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** Filter-based overwrite (`INSERT INTO t REPLACE WHERE cond …` /
    * `df.writeTo(t).overwrite(cond)`): matching rows are deleted
    * through [[FrameMaintenance.deleteWhere]] — metadata-only where
    * sidecars prove whole segments match, executor rewrite for
    * straddlers — inside the SAME job commit that publishes the new
    * segments, so the replace slice swaps in one command. The delete
    * mints one version and each appended segment mints one, so
    * `TIMESTAMP AS OF` still reaches the pre-replace state until
    * expiry. An always-true condition degrades to the physical
    * TRUNCATE (new lineage), exactly like `INSERT OVERWRITE`.
    */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val real = filters.filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (real.isEmpty) { doTruncate = true; return this }
    val schema = AvroFrames.sparkSchema(
      new Schema.Parser().parse(Option(opt("avroSchema")).getOrElse(
        throw new IllegalArgumentException("option `avroSchema` is required to write"))))
    val unsupported = real.filterNot(AvroFrames.supported(schema, _))
    require(unsupported.isEmpty,
      s"REPLACE WHERE condition not supported by the frame source: " +
        s"${unsupported.mkString(", ")} (comparisons/null tests on top-level " +
        "orderable columns only)")
    overwriteFilters = real
    this
  }

  // per-write options win; catalog writes (INSERT INTO) carry none, so
  // the owning table's options supply path/avroSchema/schemaId
  private def opt(k: String): String =
    Option(info.options().get(k)).getOrElse(tableOpts.get(k))

  private def checkedSchema(): String = {
    val schemaJson = opt("avroSchema")
    require(schemaJson != null, "option `avroSchema` is required to write")
    val expected = AvroFrames.sparkSchema(new Schema.Parser().parse(schemaJson))
    val got = info.schema()
    require(got.fields.map(f => (f.name, f.dataType)).toSeq ==
            expected.fields.map(f => (f.name, f.dataType)).toSeq,
      s"write schema must match the Avro writer schema field-for-field:\n" +
        s"  got      $got\n  expected $expected")
    schemaJson
  }

  private def schemaId: Int =
    Option(opt("schemaId")).map(_.toInt).getOrElse(AvroFrames.DefaultSchemaId)

  private def bucketSpec: Option[(String, Int)] =
    for { k <- Option(opt("bucketKey")); n <- Option(opt("buckets")) } yield (k, n.toInt)

  private def sortedBy: Option[String] = Option(opt("sortedBy"))

  private def timePart: Option[FrameTimePart] =
    for { c <- Option(opt("partitionCol")); u <- Option(opt("partitionUnit")) }
      yield FrameTimePart(c, u)

  private def bloomSpec: Option[BloomSpec] =
    Option(opt("bloomColumns")).map { csv =>
      val cols = csv.split(',').map(_.trim).filter(_.nonEmpty)
      val schema = AvroFrames.sparkSchema(new Schema.Parser().parse(opt("avroSchema")))
      cols.foreach { c =>
        require(schema.fieldNames.contains(c), s"unknown bloom column $c")
        require(Set[DataType](IntegerType, LongType, StringType)
            .contains(schema(c).dataType),
          s"bloom column $c must be INT/BIGINT/STRING, got ${schema(c).dataType}")
      }
      BloomSpec(cols,
        Option(opt("bloomExpectedItems")).map(_.toLong)
          .getOrElse(AvroFrameWrite.DefaultBloomExpectedItems.toLong))
    }

  override def build(): Write = bucketSpec match {
    case Some((key, n)) =>
      // bucketed table: ask Spark to CLUSTER the incoming rows by the
      // bucket key into exactly n partitions (HashPartitioning →
      // partition id = pmod(murmur3(key), n), the same function the
      // scan's reported bucket(n, key) transform computes), so task
      // partitionId IS the bucket and each segment holds one bucket —
      // the storage-partitioned-join write discipline. A `sortedBy`
      // table additionally sorts within each bucket task, so every
      // segment is individually ordered (the scan's reported ordering
      // contract, [[AvroFrameScan.outputOrdering]]).
      new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions.clustered(
            Array(org.apache.spark.sql.connector.expressions.Expressions.column(key)))
        override def requiredNumPartitions(): Int = n
        override def distributionStrictlyRequired(): Boolean = true
        override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          AvroFrameWriteBuilder.sortOrderFor(sortedBy)
        override def toBatch: BatchWrite =
          new AvroFrameBatchWrite(opt("path"), checkedSchema(), schemaId,
            info.queryId(), doTruncate, overwriteFilters, bloomSpec,
            opt("avroSchemaHistory"), opt("deleteMode"),
            Option(opt("dvFoldThreshold")).map(_.toDouble)
              .getOrElse(FrameMaintenance.DefaultDvFoldThreshold), timePart)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          throw new UnsupportedOperationException(
            "streaming writes to a BUCKETED frame table are unsupported: the epoch " +
              "write path does not bucket-route rows, which would break the " +
              "reported KeyGroupedPartitioning")
      }
    case None if sortedBy.isDefined =>
      // unbucketed sorted table: no distribution requirement, but each
      // task's rows sort on the column before writing
      new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          AvroFrameWriteBuilder.sortOrderFor(sortedBy)
        override def toBatch: BatchWrite =
          new AvroFrameBatchWrite(opt("path"), checkedSchema(), schemaId,
            info.queryId(), doTruncate, overwriteFilters, bloomSpec,
            opt("avroSchemaHistory"), opt("deleteMode"),
            Option(opt("dvFoldThreshold")).map(_.toDouble)
              .getOrElse(FrameMaintenance.DefaultDvFoldThreshold), timePart)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          throw new UnsupportedOperationException(
            "streaming writes to a SORTED frame table are unsupported: the epoch " +
              "write path does not sort rows, which would break the scan's " +
              "reported per-segment ordering")
      }
    case None => new Write {
      override def toBatch: BatchWrite =
        new AvroFrameBatchWrite(opt("path"), checkedSchema(), schemaId,
          info.queryId(), doTruncate, overwriteFilters, bloomSpec,
          opt("avroSchemaHistory"), opt("deleteMode"),
          Option(opt("dvFoldThreshold")).map(_.toDouble)
            .getOrElse(FrameMaintenance.DefaultDvFoldThreshold), timePart)

      override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
        // the log is append-only: complete/update output modes would need
        // per-epoch truncation, which breaks the tailing reader's offsets
        require(!doTruncate && overwriteFilters.isEmpty,
          "frame-log streaming writes are append-only " +
          "(use outputMode(\"append\"))")
        new AvroFrameStreamingWrite(opt("path"), checkedSchema(), schemaId,
          info.queryId(), bloomSpec, timePart)
      }
    }
  }
}

object AvroFrameWriteBuilder {
  /** ASC/NULLS FIRST sort order for a sorted-table write — Spark's
    * default sort semantics, matched by the scan's reported ordering.
    */
  def sortOrderFor(sortedBy: Option[String]): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    sortedBy.map(c => Array(
      org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.column(c),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)))
      .getOrElse(Array.empty)
}

/** One task's publishable files. Unpartitioned tasks fill the three
  * head fields (empty tmpName = empty task); a TIME-PARTITIONED task
  * (round 16) may emit several per-partition files, carried in `more`.
  * Commit sites iterate [[parts]], which normalizes both shapes.
  */
case class AvroFrameCommitMessage(tmpName: String, finalName: String,
                                  statsJson: String,
                                  more: Seq[(String, String, String)] = Nil)
    extends WriterCommitMessage {
  def parts: Seq[(String, String, String)] =
    (if (tmpName.nonEmpty) Seq((tmpName, finalName, statsJson)) else Nil) ++ more
}

/** Write-time Bloom filter config: which columns get one, and the
  * fixed expected-items sizing (one size per table keeps segment
  * filters bit-compatible for compaction merge).
  */
case class BloomSpec(cols: Array[String], expectedItems: Long) extends Serializable

class AvroFrameBatchWrite(path: String, avroSchemaJson: String, schemaId: Int,
                          queryId: String, truncate: Boolean,
                          overwriteFilters: Array[Filter] = Array.empty,
                          bloom: Option[BloomSpec] = None,
                          historyJson: String = null,
                          deleteMode: String = null,
                          dvFoldThreshold: Double =
                            FrameMaintenance.DefaultDvFoldThreshold,
                          part: Option[FrameTimePart] = None) extends BatchWrite {
  require(path != null, "option `path` is required")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // visible names must increase lexicographically in APPEND order —
    // the tailing reader's and the version cut's contract. A bare
    // query UUID sorts arbitrarily between jobs, so batch publishes
    // under a zero-padded job timestamp (one stamp per job, driver
    // side: segments of one insert stay adjacent, later inserts sort
    // after). The stamp is derived MONOTONICALLY from the log itself —
    // max(existing stamp + 1, wall clock) — so a clock regression
    // between jobs (NTP step, different driver host) cannot make a
    // later insert sort before an earlier one. Streaming keeps
    // deterministic epoch names instead — replay dedup needs them
    // stable across re-runs.
    val stamp = f"${AvroFrames.nextBatchStampMs(path)}%013d-${queryId.take(8)}"
    new AvroFrameWriterFactory(path, avroSchemaJson, schemaId, stamp, bloom, part)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    if (truncate) {
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("segment-") || f.getName.endsWith(".stats"))
        .foreach(_.delete())
      // physical truncate starts a NEW table lineage: drop the
      // maintenance manifest, retained history, the stats ledger, and
      // version TAGS too — stale entries/tags referencing the wiped
      // lineage would corrupt snapshot replay / pruning / tag reads
      // (a surviving tag would silently address the NEW lineage's
      // version numbers)
      new File(dir, FrameMaintenance.ManifestFile).delete()
      FrameStatsLedger.drop(dir)
      new File(dir, FrameTags.TagsFile).delete()
      val hist = new File(dir, FrameMaintenance.HistoryDirName)
      Option(hist.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      hist.delete()
    }
    // REPLACE WHERE: retire the matching slice first (metadata-only /
    // rewrite per segment on copy-on-write tables; metadata-only /
    // deletion-vector on merge-on-read), then publish the replacement
    // segments below — one command, both halves in this driver commit
    if (overwriteFilters.nonEmpty) {
      if ("merge-on-read".equalsIgnoreCase(deleteMode))
        FrameMaintenance.deleteWhereMoR(org.apache.spark.sql.SparkSession.active,
          dir, avroSchemaJson, schemaId, overwriteFilters, historyJson,
          dvFoldThreshold)
      else
        FrameMaintenance.deleteWhere(org.apache.spark.sql.SparkSession.active,
          dir, avroSchemaJson, schemaId, overwriteFilters, historyJson)
    }
    // one publish instant for the whole job: TIMESTAMP AS OF cuts on
    // segment mtime, and POSIX rename PRESERVES the temp file's mtime
    // (task write time) — without restamping, a timestamp falling
    // between two tasks' write times would tear one committed job in
    // half. Set explicitly after the rename so mtime IS the commit.
    val publish = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())
    // empty partitions commit a no-op message (tmpName empty): nothing
    // to publish — filtering them here, not just at the writer, keeps
    // a sparse dataframe write from minting phantom files
    val published = messages.collect {
      case m: AvroFrameCommitMessage => m }.flatMap(_.parts)
    published.foreach { case (tmpName, finalName, statsJson) =>
      // sidecar lands first; readers tolerate a missing sidecar but a
      // visible segment must never precede job commit
      java.nio.file.Files.writeString(
        new File(dir, finalName + ".stats").toPath, statsJson)
      val target = new File(dir, finalName)
      val ok = FrameCommitIo.impl.publish(new File(dir, tmpName), target)
      require(ok, s"commit rename failed for $tmpName -> $finalName")
      java.nio.file.Files.setLastModifiedTime(target.toPath, publish)
    }
    // fold the new segments' stats into the table ledger (round 16):
    // entries come from the very statsJson the tasks returned, so O(1)
    // planning metadata costs zero extra I/O here — segments land
    // FIRST, so a crash before the fold leaves them merely unledgered
    // (reads fall back to their sidecars, never miss them)
    if (published.nonEmpty) FrameMaintenance.withDirLock(dir) {
      FrameStatsLedger.fold(dir, add = published.map { case (_, fin, json) =>
        fin -> FrameStatsLedger.entryFromJsonOrBare(json)
          .copy(publishMs = publish.toMillis) }.toMap)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AvroFrameCommitMessage => m }.flatMap(_.parts)
      .foreach { case (tmpName, _, _) => new File(new File(path), tmpName).delete() }
}

/** Streaming write into the segment log — the sink half of the Kafka
  * analog, so a Structured Streaming query can APPEND to the same log
  * another query tails ([[AvroFrameMicroBatchStream]]). Exactly-once
  * across restarts without a transaction service: segment names embed
  * the stable streaming query id and the epoch
  * (`segment-<queryId>-e<epoch>-p<part>`), so a replayed epoch (sink
  * re-commit after a crash between sink commit and offset-log commit)
  * finds its segment names already present and drops the replacement
  * temps — idempotent re-commit, the same dedup-by-(queryId, batchId)
  * contract Spark's own sinks implement. Zero-padded epoch numbers
  * keep names lexicographically increasing in append order, which is
  * exactly the reader's segment-ordering contract (one writer query
  * per log, like one producer per partition for ordering).
  */
class AvroFrameStreamingWrite(path: String, avroSchemaJson: String, schemaId: Int,
                              queryId: String, bloom: Option[BloomSpec] = None,
                              part: Option[FrameTimePart] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  require(path != null, "option `path` is required")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new AvroFrameStreamingWriterFactory(path, avroSchemaJson, schemaId, queryId, bloom, part)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    // publish instant for the epoch (TIMESTAMP AS OF contract — rename
    // preserves the temp's task-write mtime, so restamp explicitly)
    val publish = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())
    val fresh = Array.newBuilder[(String, String, String)]
    messages.collect { case m: AvroFrameCommitMessage => m }.flatMap(_.parts)
      .foreach { case (tmpName, finalName, statsJson) =>
        val target = new File(dir, finalName)
        if (target.isFile) {
          // replayed epoch: the first commit's segment stands — dropping
          // the re-run's temp is what makes the sink exactly-once (and
          // the first commit's publish mtime stands with it)
          new File(dir, tmpName).delete()
        } else {
          java.nio.file.Files.writeString(
            new File(dir, finalName + ".stats").toPath, statsJson)
          val ok = FrameCommitIo.impl.publish(new File(dir, tmpName), target)
          require(ok, s"epoch $epochId commit rename failed for $tmpName -> $finalName")
          java.nio.file.Files.setLastModifiedTime(target.toPath, publish)
          fresh += ((tmpName, finalName, statsJson))
        }
      }
    // ledger fold for the FIRST publish of each name only (a replayed
    // epoch's entry is already present and identical)
    val adds = fresh.result()
    if (adds.nonEmpty) FrameMaintenance.withDirLock(dir) {
      FrameStatsLedger.fold(dir, add = adds.map { case (_, fin, json) =>
        fin -> FrameStatsLedger.entryFromJsonOrBare(json)
          .copy(publishMs = publish.toMillis) }.toMap)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AvroFrameCommitMessage => m }.flatMap(_.parts)
      .foreach { case (tmpName, _, _) => new File(new File(path), tmpName).delete() }
}

class AvroFrameStreamingWriterFactory(path: String, avroSchemaJson: String,
                                      schemaId: Int, queryId: String,
                                      bloom: Option[BloomSpec] = None,
                                      part: Option[FrameTimePart] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    // epoch baked into the name tag: the final name is stable per
    // (queryId, epoch, partition, partition-value), which is what
    // replay dedup keys on
    new AvroFrameDataWriter(path, avroSchemaJson, schemaId,
      f"$queryId-e$epochId%09d", partitionId, taskId, bloom, part)
}

class AvroFrameWriterFactory(path: String, avroSchemaJson: String,
                             schemaId: Int, queryId: String,
                             bloom: Option[BloomSpec] = None,
                             part: Option[FrameTimePart] = None) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroFrameDataWriter(path, avroSchemaJson, schemaId, queryId, partitionId, taskId,
      bloom, part)
}

/** Task-side writer: length-prefixed framed-Avro records into hidden
  * temp files, stats gathered inline. Empty partitions emit no file.
  *
  * Time-partitioned tables (round 16, `part` defined): each row routes
  * to its partition's own file — one task may emit several, each named
  * with the `-T<value>` token the scan's partition pruning parses. The
  * per-file state (stream, stats, blooms) lives in one [[Sink]] per
  * partition value; unpartitioned tasks use a single sink keyed 0.
  */
class AvroFrameDataWriter(path: String, avroSchemaJson: String, schemaId: Int,
                          queryId: String, partitionId: Int, taskId: Long,
                          bloom: Option[BloomSpec] = None,
                          part: Option[FrameTimePart] = None)
    extends DataWriter[InternalRow] {

  private val writerSchema = new Schema.Parser().parse(avroSchemaJson)
  private val sparkSchema = AvroFrames.sparkSchema(writerSchema)
  private val fieldTypes: Array[DataType] = sparkSchema.fields.map(_.dataType)
  private val fieldNames: Array[String] = sparkSchema.fieldNames
  private val partPos: Int = part.map { tp =>
    val i = fieldNames.indexOf(tp.col)
    require(i >= 0 && fieldTypes(i) == LongType,
      s"partition column ${tp.col} must be a BIGINT field of the table")
    i
  }.getOrElse(-1)

  /** Per-output-file state. `token` is "" (unpartitioned) or the
    * partition's `-T<value>` name token.
    */
  private final class Sink(token: String) {
    // temp is dot-prefixed: invisible to listSegments until job commit;
    // taskId in the name keeps speculative attempts from colliding
    val tmpName = f".inprogress-$queryId-p$partitionId%05d-t$taskId$token"
    val finalName = f"segment-$queryId-p$partitionId%05d$token.bin"
    val stats: Array[AvroFrameWrite.FieldStats] =
      fieldNames.map(_ => new AvroFrameWrite.FieldStats)
    // bloom builders: position -> filter, fixed-size per the table spec
    val blooms: Array[org.apache.spark.util.sketch.BloomFilter] = {
      val out = new Array[org.apache.spark.util.sketch.BloomFilter](fieldNames.length)
      bloom.foreach(spec => spec.cols.foreach { c =>
        out(fieldNames.indexOf(c)) = org.apache.spark.util.sketch.BloomFilter
          .create(spec.expectedItems, AvroFrameWrite.BloomFpp)
      })
      out
    }
    var frames = 0L
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(new File(path, tmpName)), 1 << 16))
    def statsJson: String = {
      val bloomB64 = fieldNames.indices.collect {
        case i if blooms(i) != null => fieldNames(i) -> AvroFrameWrite.bloomToB64(blooms(i))
      }.toMap
      AvroFrameWrite.statsJson(frames, fieldNames.zip(stats).toSeq, bloomB64)
    }
  }

  private val sinks = scala.collection.mutable.LinkedHashMap.empty[Long, Sink]

  private def sinkFor(row: InternalRow): Sink = {
    val key = if (partPos < 0) 0L else {
      require(!row.isNullAt(partPos),
        s"partition column ${part.get.col} is NULL — time-partitioned tables " +
          "require a NOT NULL routing value")
      part.get.value(row.getLong(partPos))
    }
    sinks.getOrElseUpdate(key,
      new Sink(if (partPos < 0) "" else FrameTimePart.token(key)))
  }

  override def write(row: InternalRow): Unit = {
    val sink = sinkFor(row)
    val rec = new GenericData.Record(writerSchema)
    var i = 0
    while (i < fieldTypes.length) {
      val v = if (row.isNullAt(i)) null else fieldTypes(i) match {
        case StringType  => row.getUTF8String(i).toString
        case IntegerType => Int.box(row.getInt(i))
        case LongType    => Long.box(row.getLong(i))
        case FloatType   => Float.box(row.getFloat(i))
        case DoubleType  => Double.box(row.getDouble(i))
        case BooleanType => Boolean.box(row.getBoolean(i))
        case BinaryType  => java.nio.ByteBuffer.wrap(row.getBinary(i))
        case other => throw new IllegalStateException(s"unwritable type $other")
      }
      sink.stats(i).observe(if (v.isInstanceOf[java.nio.ByteBuffer]) null else v)
      if (sink.blooms(i) != null && v != null) v match {
        case x: java.lang.Long    => sink.blooms(i).putLong(x.longValue)
        case x: java.lang.Integer => sink.blooms(i).putLong(x.longValue) // stats-domain widening
        case s: String            => sink.blooms(i).putString(s)
        case _                    => ()
      }
      rec.put(i, v)
      i += 1
    }
    sink.frames += 1
    val frame = AvroFrames.frameRecord(schemaId, rec)
    sink.out.writeInt(frame.length)
    sink.out.write(frame)
  }

  override def commit(): WriterCommitMessage = {
    sinks.values.foreach(_.out.close())
    val parts = sinks.values.filter(_.frames > 0L)
      .map(s => (s.tmpName, s.finalName, s.statsJson)).toSeq
    sinks.values.filter(_.frames == 0L)
      .foreach(s => new File(path, s.tmpName).delete())
    parts match {
      case Seq() => AvroFrameCommitMessage("", "", "") // empty: nothing to publish
      case (t, f, j) +: rest => AvroFrameCommitMessage(t, f, j, rest)
    }
  }

  override def abort(): Unit = {
    sinks.values.foreach { s =>
      s.out.close()
      new File(path, s.tmpName).delete()
    }
  }

  override def close(): Unit = ()
}

/** Sidecar parsing + conservative segment pruning against pushed
  * filters — the read-side consumer of the write path's statistics.
  */
object AvroFrameStats {

  /** (frames, fieldName -> (nulls, min, max)); min/max typed Long /
    * Double / String / Boolean as written. None if the sidecar is
    * absent or unreadable (⇒ never prune).
    */
  def read(segment: File): Option[(Long, Map[String, (Long, Any, Any)])] =
    readFull(segment).map { case (frames, fields, _) => (frames, fields) }

  /** Sidecar FILE opens performed by this JVM — the observability hook
    * the round-16 O(1)-planning-metadata spec counts: on a ledgered
    * table, planning a query must not move this by more than a small
    * constant however many segments are live.
    */
  private[graft] val sidecarOpens = new java.util.concurrent.atomic.AtomicLong(0)

  /** Full sidecar including the per-field Bloom filter base64 payloads
    * (round 14) — kept as strings here; [[blooms]] deserializes on
    * demand so callers that only need min/max never pay the decode.
    */
  def readFull(segment: File): Option[(Long, Map[String, (Long, Any, Any)], Map[String, String])] = {
    val f = new File(segment.getParentFile, segment.getName + ".stats")
    if (!f.isFile) return None
    sidecarOpens.incrementAndGet()
    try parseStatsJson(java.nio.file.Files.readString(f.toPath))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parse a stats sidecar's JSON body (shared with the ledger, which
    * folds commit-message statsJson in without any file read). None on
    * malformed input.
    */
  def parseStatsJson(json: String): Option[(Long, Map[String, (Long, Any, Any)], Map[String, String])] = {
    try {
      val p = new com.fasterxml.jackson.core.JsonFactory().createParser(json)
      var frames = 0L
      val fields = scala.collection.mutable.Map.empty[String, (Long, Any, Any)]
      val bloomB64 = scala.collection.mutable.Map.empty[String, String]
      import com.fasterxml.jackson.core.JsonToken._
      p.nextToken() // {
      while (p.nextToken() != END_OBJECT) {
        p.currentName() match {
          case "frames" => p.nextToken(); frames = p.getLongValue
          case "fields" =>
            p.nextToken() // {
            while (p.nextToken() != END_OBJECT) {
              val name = p.currentName()
              var nulls = 0L; var min: Any = null; var max: Any = null
              p.nextToken() // {
              while (p.nextToken() != END_OBJECT) {
                val k = p.currentName()
                val t = p.nextToken()
                val v: Any = t match {
                  case VALUE_NUMBER_INT   => Long.box(p.getLongValue)
                  case VALUE_NUMBER_FLOAT => Double.box(p.getDoubleValue)
                  case VALUE_TRUE         => Boolean.box(true)
                  case VALUE_FALSE        => Boolean.box(false)
                  case _                  => p.getText
                }
                k match {
                  case "nulls" => nulls = v.asInstanceOf[java.lang.Long].longValue
                  case "min"   => min = v
                  case "max"   => max = v
                  case "bloom" => bloomB64(name) = v.asInstanceOf[String]
                  case _       => ()
                }
              }
              fields(name) = (nulls, min, max)
            }
          case _ => p.nextToken()
        }
      }
      Some((frames, fields.toMap, bloomB64.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deserialize a sidecar's Bloom payloads. Unreadable filters are
    * dropped (⇒ that column just never bloom-prunes).
    */
  def blooms(b64: Map[String, String]): Map[String, org.apache.spark.util.sketch.BloomFilter] =
    b64.flatMap { case (c, s) =>
      try Some(c -> org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(java.util.Base64.getDecoder.decode(s))))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Can any row satisfy `f`, judged by the segment's Bloom filters
    * alone? Conservative-true; only equality shapes consult a filter
    * (EqualTo / IN, recursively through AND/OR — NOT never prunes).
    * The value domain matches the write side exactly: ints widened to
    * long, strings as-is; other types are never bloom-indexed.
    */
  def bloomMayMatch(blooms: Map[String, org.apache.spark.util.sketch.BloomFilter],
                    f: Filter): Boolean = {
    def contains(c: String, v: Any): Boolean = blooms.get(c) match {
      case None => true
      case Some(b) => v match {
        case x: java.lang.Long    => b.mightContainLong(x.longValue)
        case x: java.lang.Integer => b.mightContainLong(x.longValue)
        case s: String            => b.mightContainString(s)
        case _                    => true
      }
    }
    f match {
      case EqualTo(c, v) => v != null && contains(c, v)
      case In(c, vs)     => vs.exists(v => v != null && contains(c, v))
      case org.apache.spark.sql.sources.And(l, r) =>
        bloomMayMatch(blooms, l) && bloomMayMatch(blooms, r)
      case org.apache.spark.sql.sources.Or(l, r) =>
        bloomMayMatch(blooms, l) || bloomMayMatch(blooms, r)
      case _ => true
    }
  }

  /** Executor-side bloom gate (round 16): judged from the segment's
    * OWN sidecar, can any row satisfy the pushed filters' equality
    * shapes? Readers call this BEFORE opening the data file, so a
    * point lookup on a bloom-indexed table costs each task one small
    * sidecar read instead of a full-segment decode — the distributed
    * half of bloom pruning, complementing the driver-side residual
    * check (which is capped at [[FrameStatsView.MaxDriverBloomOpens]]
    * per plan; beyond the cap, THIS gate still catches every
    * non-matching segment, just executor-side). Conservative-false:
    * no blooms / no equality filters / unreadable sidecar = not
    * blocked.
    */
  def bloomBlocked(file: String, pushed: Array[Filter]): Boolean =
    pushed.nonEmpty && pushed.exists(bloomRelevant) && {
      bloomProbeReads.incrementAndGet()
      readFull(new File(file)) match {
        case Some((_, _, b64)) if b64.nonEmpty =>
          val bf = blooms(b64)
          !pushed.forall(bloomMayMatch(bf, _))
        case _ => false
      }
    }

  /** Sidecar reads performed by [[bloomBlocked]] in this JVM — the
    * observability hook for the split-level probe hint (round 17):
    * a plan whose splits carry `probeBloom = false` (the ledger knows
    * no relevant bloom payload exists) must not move this at all.
    */
  private[graft] val bloomProbeReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Could `f` possibly consult a Bloom filter? (Gates the bloom
    * decode — sidecars without equality-shaped filters never pay it.)
    */
  def bloomRelevant(f: Filter): Boolean = f match {
    case EqualTo(_, _) | In(_, _) => true
    case org.apache.spark.sql.sources.And(l, r) => bloomRelevant(l) || bloomRelevant(r)
    case org.apache.spark.sql.sources.Or(l, r)  => bloomRelevant(l) || bloomRelevant(r)
    case _ => false
  }

  /** Columns whose Bloom filter `f` could consult (the equality-shaped
    * leaves [[bloomMayMatch]] probes). Drives the split-level probe
    * hint: a segment whose ledger entry records no bloom payload on
    * any of these columns can never be gate-blocked, so its task
    * skips the sidecar probe entirely.
    */
  def bloomColumns(f: Filter): Set[String] = f match {
    case EqualTo(c, _) => Set(c)
    case In(c, _)      => Set(c)
    case org.apache.spark.sql.sources.And(l, r) => bloomColumns(l) ++ bloomColumns(r)
    case org.apache.spark.sql.sources.Or(l, r)  => bloomColumns(l) ++ bloomColumns(r)
    case _ => Set.empty
  }

  /** Stats-domain value → Catalyst internal value at the column's
    * Spark type (narrowing the write path's Int→Long / Float→Double
    * widening back — exact, the widened value originated at the
    * narrower width). Shared by the pushed-aggregation reader and the
    * scan's reported column statistics.
    */
  def toCatalyst(v: Any, t: DataType): Any = (v, t) match {
    case (null, _)                           => null
    case (x: java.lang.Long, IntegerType)    => Int.box(x.intValue)
    case (x: java.lang.Long, LongType)       => x
    case (x: java.lang.Double, FloatType)    => Float.box(x.floatValue)
    case (x: java.lang.Double, DoubleType)   => x
    case (s: String, StringType)             => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case (b: java.lang.Boolean, BooleanType) => b
    case (x, tt) => throw new IllegalStateException(
      s"stats value ${x.getClass} does not fit column type $tt")
  }

  /** Exact comparison on the stats domain: longs compared as longs
    * (never through double — a lossy compare could WRONGLY prune near
    * 2^53), mixed numeric as double, strings/booleans natively.
    */
  def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long)       => java.lang.Long.compare(x, y)
    case (x: java.lang.Long, y: java.lang.Integer)    => java.lang.Long.compare(x, y.longValue)
    case (x: java.lang.Integer, y: java.lang.Long)    => java.lang.Long.compare(x.longValue, y)
    case (x: java.lang.Integer, y: java.lang.Integer) => java.lang.Integer.compare(x, y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
  }

  /** Can any frame in a segment with these stats satisfy the filter?
    * Conservative: unknown field / missing bound ⇒ true.
    */
  def mayMatch(frames: Long, fields: Map[String, (Long, Any, Any)], f: Filter): Boolean = {
    def bounds(c: String): Option[(Long, Any, Any)] = fields.get(c)
    f match {
      case EqualTo(c, v) => bounds(c).forall { case (_, mn, mx) =>
        mn == null || mx == null || (compare(v, mn) >= 0 && compare(v, mx) <= 0) }
      case GreaterThan(c, v) => bounds(c).forall { case (_, _, mx) =>
        mx == null || compare(mx, v) > 0 }
      case GreaterThanOrEqual(c, v) => bounds(c).forall { case (_, _, mx) =>
        mx == null || compare(mx, v) >= 0 }
      case LessThan(c, v) => bounds(c).forall { case (_, mn, _) =>
        mn == null || compare(mn, v) < 0 }
      case LessThanOrEqual(c, v) => bounds(c).forall { case (_, mn, _) =>
        mn == null || compare(mn, v) <= 0 }
      case IsNotNull(c) => bounds(c).forall { case (nulls, _, _) => nulls < frames }
      case IsNull(c)    => bounds(c).forall { case (nulls, _, _) => nulls > 0 }
      // IN arrives pushed or via runtime (DPP-style) filtering: the
      // segment survives iff ANY set member can fall inside [min,max]
      case In(c, vs) => bounds(c).forall { case (_, mn, mx) =>
        mn == null || mx == null ||
          vs.exists(v => v != null && compare(v, mn) >= 0 && compare(v, mx) <= 0) }
      // prefix pruning (round 15): a string whose prefix-length
      // truncation falls outside [min.take(p), max.take(p)] cannot
      // exist in the segment — the parquet StartsWith stats rule
      case org.apache.spark.sql.sources.StringStartsWith(c, v) =>
        bounds(c).forall { case (_, mn, mx) =>
          mn == null || mx == null || !mn.isInstanceOf[String] || !mx.isInstanceOf[String] || {
            val p = v.length
            mn.asInstanceOf[String].take(p) <= v &&
              v <= mx.asInstanceOf[String].take(p)
          }
        }
      // boolean compositions (round 14): AND prunes if either side
      // proves impossible, OR only if both do; NOT is unbounded here
      case org.apache.spark.sql.sources.And(l, r) =>
        mayMatch(frames, fields, l) && mayMatch(frames, fields, r)
      case org.apache.spark.sql.sources.Or(l, r) =>
        mayMatch(frames, fields, l) || mayMatch(frames, fields, r)
      case _ => true
    }
  }

  /** Segments surviving stat-pruning under ALL pushed filters: min/max
    * bounds first, then — for equality-shaped filters on segments that
    * carry Bloom payloads — the Bloom filters (round 14). Both rungs
    * strictly conservative; a point lookup on a high-cardinality
    * column whose min/max spans everything prunes on the blooms alone.
    */
  def prune(segments: Array[File], pushed: Array[Filter]): Array[File] =
    if (pushed.isEmpty) segments
    else {
      val wantBloom = pushed.exists(bloomRelevant)
      segments.filter { seg =>
        readFull(seg) match {
          case None => true // no sidecar: never prune
          case Some((frames, fields, bloomB64)) =>
            pushed.forall(mayMatch(frames, fields, _)) && {
              !wantBloom || bloomB64.isEmpty || {
                val bf = blooms(bloomB64)
                pushed.forall(bloomMayMatch(bf, _))
              }
            }
        }
      }
    }
}

/** Group-based row-level operation over the segment log — the DSv2
  * machinery behind SQL `UPDATE`, `MERGE INTO`, and non-translatable
  * `DELETE` conditions (`AvroFrameTable.newRowLevelOperationBuilder`).
  * Copy-on-write at SEGMENT granularity:
  *
  *  1. Spark plans a [[org.apache.spark.sql.connector.read.Scan]]
  *     through [[newScanBuilder]]. The command's condition reaches it
  *     in PRUNE-ONLY mode — affected groups must be read WHOLE (their
  *     unmatched rows are preserved verbatim by the rewrite), so the
  *     condition may drop segments but never rows. Spark's runtime
  *     group filtering then injects `_segment IN (<matched groups>)`,
  *     narrowing the read-and-replace set to segments actually
  *     containing matches; the scan reports the FINAL planned set back
  *     here ([[plannedGroups]]).
  *  2. Spark computes the new contents of those groups and writes them
  *     through [[newWriteBuilder]]'s [[AvroFrameReplaceGroupsWrite]]:
  *     the job commit retires exactly the scanned segments (ONE delete
  *     version, originals to `_history/` — pre-op snapshots stay
  *     addressable) and publishes the rewritten rows as ordinary
  *     appends. Bucketed tables keep their invariant: the write
  *     requires the same clustered-by-bucket distribution as a normal
  *     insert, so rewritten segments stay one-bucket-per-file.
  *
  * At 100 TB the cost is proportional to the AFFECTED segments (read
  * whole, rewritten whole), never the table — the standard
  * copy-on-write trade; translatable DELETEs dodge even that via the
  * metadata-only fast path (OptimizeMetadataOnlyDeleteFromTable).
  */
class FrameRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    schema: StructType,
    tableOpts: org.apache.spark.sql.util.CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** Absolute paths of the segments the operation's scan planned —
    * null until planInputPartitions ran; the write refuses to commit
    * without it (the replaced set must be EXACTLY what was read).
    */
  @volatile private[sources] var plannedGroups: Array[String] = _

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(AvroFrames.SegmentMetaCol))

  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new AvroFrameScanBuilder(schema, tableOpts,
      onPlanned = segs => plannedGroups = segs.map(_.getAbsolutePath),
      filtersPruneOnly = true)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    private def opt(k: String): String = tableOpts.get(k)
    override def build(): Write = {
      val schemaJson = opt("avroSchema")
      require(schemaJson != null, "option `avroSchema` is required to write")
      val schemaId = Option(opt("schemaId")).map(_.toInt)
        .getOrElse(AvroFrames.DefaultSchemaId)
      val bucket = for { k <- Option(opt("bucketKey")); n <- Option(opt("buckets")) }
        yield (k, n.toInt)
      val bloomSpec = Option(opt("bloomColumns")).map(csv => BloomSpec(
        csv.split(',').map(_.trim).filter(_.nonEmpty),
        Option(opt("bloomExpectedItems")).map(_.toLong)
          .getOrElse(AvroFrameWrite.DefaultBloomExpectedItems.toLong)))
      val sortedBy = Option(opt("sortedBy"))
      val timePart = for { c <- Option(opt("partitionCol")); u <- Option(opt("partitionUnit")) }
        yield FrameTimePart(c, u)
      bucket match {
        case Some((key, n)) =>
          new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
            override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions.clustered(
                Array(org.apache.spark.sql.connector.expressions.Expressions.column(key)))
            override def requiredNumPartitions(): Int = n
            override def distributionStrictlyRequired(): Boolean = true
            override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              AvroFrameWriteBuilder.sortOrderFor(sortedBy)
            override def toBatch: BatchWrite = new AvroFrameReplaceGroupsWrite(
              opt("path"), schemaJson, schemaId, info.queryId(),
              FrameRowLevelOperation.this, bloomSpec, timePart)
          }
        case None if sortedBy.isDefined =>
          new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
            override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions.unspecified()
            override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              AvroFrameWriteBuilder.sortOrderFor(sortedBy)
            override def toBatch: BatchWrite = new AvroFrameReplaceGroupsWrite(
              opt("path"), schemaJson, schemaId, info.queryId(),
              FrameRowLevelOperation.this, bloomSpec, timePart)
          }
        case None => new Write {
          override def toBatch: BatchWrite = new AvroFrameReplaceGroupsWrite(
            opt("path"), schemaJson, schemaId, info.queryId(),
            FrameRowLevelOperation.this, bloomSpec, timePart)
        }
      }
    }
  }
}

/** The write half of a group rewrite: tasks write replacement segments
  * exactly like a batch insert (hidden temps, stats, monotonic stamp);
  * the driver commit retires the operation's scanned groups and then
  * publishes — replace-by-retire-and-append, so every maintenance
  * invariant (versions, history, stream offsets) holds by construction.
  */
class AvroFrameReplaceGroupsWrite(path: String, avroSchemaJson: String, schemaId: Int,
                                  queryId: String, op: FrameRowLevelOperation,
                                  bloom: Option[BloomSpec] = None,
                                  part: Option[FrameTimePart] = None)
    extends BatchWrite {
  require(path != null, "option `path` is required")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val stamp = f"${AvroFrames.nextBatchStampMs(path)}%013d-${queryId.take(8)}"
    new AvroFrameWriterFactory(path, avroSchemaJson, schemaId, stamp, bloom, part)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val groups = Option(op.plannedGroups).getOrElse(
      throw new IllegalStateException(
        "replace-groups write committed before the operation's scan planned its groups"))
    FrameMaintenance.retireSegments(dir, groups.toSeq.map(p => new File(p).getName))
    val publish = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())
    val published = messages.collect {
      case m: AvroFrameCommitMessage => m }.flatMap(_.parts)
    published.foreach { case (tmpName, finalName, statsJson) =>
      java.nio.file.Files.writeString(
        new File(dir, finalName + ".stats").toPath, statsJson)
      val target = new File(dir, finalName)
      val ok = FrameCommitIo.impl.publish(new File(dir, tmpName), target)
      require(ok, s"group-rewrite rename failed for $tmpName -> $finalName")
      java.nio.file.Files.setLastModifiedTime(target.toPath, publish)
    }
    // retires already left the ledger (inside retireSegments); fold the
    // rewritten groups' replacement appends in
    if (published.nonEmpty) FrameMaintenance.withDirLock(dir) {
      FrameStatsLedger.fold(dir, add = published.map { case (_, fin, json) =>
        fin -> FrameStatsLedger.entryFromJsonOrBare(json)
          .copy(publishMs = publish.toMillis) }.toMap)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AvroFrameCommitMessage => m }.flatMap(_.parts)
      .foreach { case (tmpName, _, _) => new File(new File(path), tmpName).delete() }
}
