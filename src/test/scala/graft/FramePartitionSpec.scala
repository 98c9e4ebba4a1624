package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFrames, FrameMaintenance, FrameStatsLedger, FrameTimePart}

/** Round-16 hidden time-partition transforms (VERDICT r15 item 2):
  * `PARTITIONED BY (days(ts_us))` routes writes into per-partition
  * segments, prunes partitions from NAMES + pushed filters on the
  * SOURCE column (hidden partitioning — queries never mention the
  * transform), and scopes maintenance to partition grain.
  */
class FramePartitionSpec extends AnyFunSuite with SparkFixture {

  private val DayUs = 86400000000L

  private def freshCatalog(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"frame-part-$tag").toString
    val cat = s"fpart_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    (cat, base)
  }

  /** 4 days × 25 rows, inserted as ONE statement — the writer must
    * split them into per-day segments by itself.
    */
  private def loadDays(cat: String): Unit = {
    spark.range(0, 100)
      .selectExpr("id", s"id % 4 * $DayUs + id * 1000000 AS ts_us",
        "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("part_src")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM part_src")
  }

  test("days(ts_us): write splits per day, scan prunes partitions from names alone") {
    val (cat, base) = freshCatalog("days")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))""")
    loadDays(cat)
    val dir = base + "/corpus/t"
    val names = AvroFrames.listSegments(dir).map(_.getName).toSeq
    // every segment carries a partition token; 4 distinct days exist
    val pvs = names.flatMap(FrameTimePart.valueOf)
    assert(pvs.length == names.length, s"every segment must carry -T<pv>: $names")
    assert(pvs.toSet == Set(0L, 1L, 2L, 3L))

    // DESCRIBE surfaces the transform
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.corpus.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.exists { case (k, v) => k.startsWith("Part") && v.contains("days(ts_us)") } ||
      spark.table(s"$cat.corpus.t").queryExecution.analyzed.toString.nonEmpty)

    // hidden partition pruning: a ts range covering one day plans only
    // that day's segments — visible in the scan description — and the
    // answer is exact
    val q = spark.sql(s"""SELECT count(*) AS n, sum(id) AS s FROM $cat.corpus.t
      WHERE ts_us >= $DayUs AND ts_us < ${2 * DayUs}""")
    val r = q.collect()(0)
    val expected = (0L until 100L).filter(_ % 4 == 1)
    assert(r.getLong(0) == expected.length && r.getLong(1) == expected.sum)
    val day1Segs = names.count(n => FrameTimePart.valueOf(n).contains(1L))
    val plan = spark.sql(s"""SELECT id FROM $cat.corpus.t
      WHERE ts_us >= $DayUs AND ts_us < ${2 * DayUs}""")
      .queryExecution.executedPlan.toString
    // round 17: in-window partitions are pruned at the ledger-SHARD
    // level, before their metadata is even parsed — the scan's loaded
    // universe is already day 1's segments alone
    assert(plan.contains(s"Segments=$day1Segs/$day1Segs after stat-pruning"),
      s"partition pruning must narrow the plan to day 1's segments:\n$plan")

    // pruning works even WITHOUT stats: drop all sidecars and the
    // ledger — names alone still prune, rows still exact
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".stats"))
      .foreach(_.delete())
    FrameStatsLedger.drop(new java.io.File(dir))
    val q2 = spark.sql(s"""SELECT count(*) AS n FROM $cat.corpus.t
      WHERE ts_us >= $DayUs AND ts_us < ${2 * DayUs}""")
    assert(q2.collect()(0).getLong(0) == expected.length)
    val plan2 = spark.sql(s"""SELECT id FROM $cat.corpus.t
      WHERE ts_us >= $DayUs AND ts_us < ${2 * DayUs}""")
      .queryExecution.executedPlan.toString
    // with the ledger dropped the universe is the full listing again;
    // name-token pruning still narrows the planned set
    assert(plan2.contains(s"Segments=$day1Segs/${names.length}"),
      s"name-only partition pruning must hold with zero metadata:\n$plan2")
  }

  test("partition-scoped maintenance: compact one day, others untouched; delete by time") {
    val (cat, base) = freshCatalog("maint")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))""")
    // two inserts -> at least two segments per day
    loadDays(cat); loadDays(cat)
    val dir = base + "/corpus/t"
    val before = AvroFrames.listSegments(dir).map(_.getName).toSeq
    assert(before.count(n => FrameTimePart.valueOf(n).contains(2L)) >= 2)

    // compact ONLY day 2
    val res = spark.sql(
      s"CALL $cat.sys.compact(table => 'corpus.t', partition => 2)").collect()(0)
    assert(res.getInt(0) >= 1, "day 2 must compact at least one bin")
    val after = AvroFrames.listSegments(dir).map(_.getName).toSeq
    // day 2 now one segment (still carrying its token); other days untouched
    val day2 = after.filter(n => FrameTimePart.valueOf(n).contains(2L))
    assert(day2.size == 1 && day2.head.matches(".*\\.c\\d+$"), s"day2: $day2")
    (Seq(0L, 1L, 3L)).foreach { d =>
      assert(after.filter(n => FrameTimePart.valueOf(n).contains(d)) ==
        before.filter(n => FrameTimePart.valueOf(n).contains(d)),
        s"day $d must be untouched by a day-2-scoped compaction")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 200L)

    // unscoped compact groups BY partition: never merges across days
    spark.sql(s"CALL $cat.sys.compact(table => 'corpus.t')")
    val folded = AvroFrames.listSegments(dir).map(_.getName).toSeq
    assert(folded.size == 4 &&
      folded.flatMap(FrameTimePart.valueOf).toSet == Set(0L, 1L, 2L, 3L),
      s"per-partition compaction must yield one segment per day: $folded")

    // partition-grain retention: DELETE by time range is metadata-only
    // (per-day segments' stats prove all rows match)
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE ts_us < $DayUs")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 150L)
    assert(AvroFrames.listSegments(dir).map(_.getName)
      .forall(n => !FrameTimePart.valueOf(n).contains(0L)),
      "day 0 must retire whole (metadata-only delete)")
  }

  test("days + bucket compose: SPJ partitioning preserved, rows route by both") {
    val (cat, base) = freshCatalog("combo")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us), bucket(4, id))""")
    loadDays(cat)
    val dir = base + "/corpus/t"
    val names = AvroFrames.listSegments(dir).map(_.getName).toSeq
    assert(names.forall(n => FrameTimePart.valueOf(n).isDefined &&
      AvroFrames.bucketOf(n).exists(b => b >= 0 && b < 4)),
      s"segments must carry bucket ordinal AND partition token: $names")
    // exactness through the combined layout
    assert(spark.sql(s"SELECT sum(id) FROM $cat.corpus.t").collect()(0).getLong(0) ==
      (0L until 100L).sum)
    // time filter still partition-prunes on the combined names
    val plan = spark.sql(s"SELECT id FROM $cat.corpus.t WHERE ts_us < $DayUs")
      .queryExecution.executedPlan.toString
    val day0 = names.count(n => FrameTimePart.valueOf(n).contains(0L))
    assert(plan.contains(s"Segments=$day0/$day0"), plan) // shard-level prune
  }

  test("CALL drop_partitions: metadata-only retention, CDC row-exact, time travel intact (round 17)") {
    val (cat, base) = freshCatalog("retain")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))""")
    loadDays(cat) // 4 days × 25 rows; day = id % 4
    val dir = new java.io.File(base, "corpus/t")
    val before = AvroFrames.listSegments(dir.getAbsolutePath)
      .map(f => f.getName -> f.length()).toMap
    val victims = before.keySet.filter(n => FrameTimePart.valueOf(n).exists(_ < 2L))
    val preVersions = FrameMaintenance.totalVersions(dir)

    // unpartitioned tables are refused
    spark.sql(s"CREATE TABLE $cat.corpus.flat (id BIGINT NOT NULL)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.corpus.drop_partitions(table => 'corpus.flat', older_than => 2)")
    }
    assert(e.getMessage.contains("not time-partitioned"))

    // drop days 0 and 1: ONE call, one minted version
    val res = spark.sql(
      s"CALL $cat.corpus.drop_partitions(table => 'corpus.t', older_than => 2)")
      .collect()(0)
    assert(res.getInt(0) == 2, s"2 partitions dropped, got $res")
    assert(res.getInt(1) == victims.size, s"segment count must match: $res")
    assert(FrameMaintenance.totalVersions(dir) == preVersions + 1)

    // live set: exactly days 2..3, survivors untouched; rows exact
    val names = AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    assert(names.flatMap(FrameTimePart.valueOf(_)).toSet == Set(2L, 3L))
    val kept = spark.sql(s"SELECT id FROM $cat.corpus.t").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 100L).filter(_ % 4 >= 2).toSet)

    // metadata-only: every dropped segment sits in _history BYTE-IDENTICAL
    // (moved, never rewritten) and no replacement segment was minted
    victims.foreach { n =>
      val h = new java.io.File(dir, s"_history/$n")
      assert(h.isFile && h.length() == before(n), s"$n must retire byte-identical")
    }
    assert(names.forall(before.contains), "retention must not mint segments")

    // the minted version's change feed is exactly the dropped rows as deletes
    val feed = spark.sql(s"""SELECT id, _change_type FROM $cat.corpus.t.changes
      WHERE _commit_version = ${preVersions + 1}""").collect()
    assert(feed.forall(_.getString(1) == "delete"))
    assert(feed.map(_.getLong(0)).toSet == (0L until 100L).filter(_ % 4 < 2).toSet,
      "CDC must report exactly the dropped rows")

    // time travel to the pre-retention version still serves the dropped days
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t VERSION AS OF $preVersions")
      .collect()(0).getLong(0) == 100L)

    // t.partitions reflects the drop
    val parts = spark.sql(s"SELECT partition FROM $cat.corpus.t.partitions")
      .collect().map(_.getLong(0)).toSet
    assert(parts == Set(2L, 3L), s"t.partitions must drop days 0-1: $parts")

    // idempotent: nothing older remains
    val res2 = spark.sql(
      s"CALL $cat.corpus.drop_partitions(table => 'corpus.t', older_than => 2)")
      .collect()(0)
    assert(res2.getInt(0) == 0 && res2.getInt(1) == 0)
  }

  test("t.partitions metadata table: per-day rows from names + the ledger") {
    val (cat, base) = freshCatalog("meta")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))""")
    loadDays(cat)
    val rows = spark.sql(s"SELECT * FROM $cat.corpus.t.partitions ORDER BY partition")
      .collect()
    // 4 days, each with exact ledger-sourced row counts (25 rows/day)
    val perDay = rows.map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(perDay.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(perDay.forall { case (_, nSegs, nRows, dv) => nSegs >= 1 && nRows == 25L && dv == 0L },
      s"per-day rows must be ledger-exact: ${perDay.toSeq}")
    // deletes surface as dv_positions on a merge-on-read table
    spark.sql(s"""CREATE TABLE $cat.corpus.m (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))
      TBLPROPERTIES ('deleteMode'='merge-on-read', 'dvFoldThreshold'='2.0')""")
    spark.range(0, 100)
      .selectExpr("id", s"id % 4 * $DayUs + id * 1000000 AS ts_us", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("part_meta_src")
    spark.sql(s"INSERT INTO $cat.corpus.m SELECT * FROM part_meta_src")
    spark.sql(s"DELETE FROM $cat.corpus.m WHERE id IN (1, 5)") // day 1
    val m = spark.sql(s"""SELECT partition, sum(n_rows) AS live, sum(dv_positions) AS dv
      FROM $cat.corpus.m.partitions GROUP BY partition ORDER BY partition""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq((0L, 25L, 0L), (1L, 23L, 2L), (2L, 25L, 0L), (3L, 25L, 0L)),
      s"dv positions must surface per partition: ${m.toSeq}")
  }

  test("streaming ingest into a partitioned table: per-day segments, replay exactly-once, retention composes (round 17)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val (cat, base) = freshCatalog("stream")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))""")
    val ck = Files.createTempDirectory("frame-part-stream-ck").toString
    val in = MemoryStream[Long]
    val q = in.toDF()
      .selectExpr("value AS id", s"value % 4 * $DayUs + value * 1000000 AS ts_us",
        "CAST(value AS DOUBLE) AS v")
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(0))
      .toTable(s"$cat.corpus.t")
    try {
      in.addData(0L until 50L: _*); q.processAllAvailable()
      in.addData(50L until 100L: _*); q.processAllAvailable()
    } finally q.stop()

    // two epochs landed across four days: every segment carries its
    // day token AND the epoch tag (the exactly-once replay key)
    val dir = new java.io.File(base, "corpus/t")
    val names = AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    assert(names.forall(_.matches(".*-e\\d{9}-p\\d{5}-T\\d+\\.bin")),
      s"streamed segments must carry epoch + day tokens: ${names.toSeq}")
    assert(names.flatMap(FrameTimePart.valueOf(_)).toSet == Set(0L, 1L, 2L, 3L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 100L)

    // crash-replay of a partitioned epoch: the first commit stands for
    // EVERY per-day file of the task (the multi-file `more` shape)
    import graft.sources.{AvroFrameCommitMessage, AvroFrameStreamingWrite, AvroFrameStreamingWriterFactory}
    val (schemaJson, schemaId) = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.FrameCatalog].wireSchemaOf("corpus.t")
    val part = Some(FrameTimePart("ts_us", "days"))
    val w = new AvroFrameStreamingWrite(dir.getAbsolutePath, schemaJson, schemaId,
      "qpart", None, part)
    val factory = new AvroFrameStreamingWriterFactory(dir.getAbsolutePath, schemaJson,
      schemaId, "qpart", None, part)
    def runEpoch(epoch: Long, ids: Seq[Long], task: Long): AvroFrameCommitMessage = {
      val writer = factory.createWriter(0, task, epoch)
      ids.foreach { i =>
        writer.write(org.apache.spark.sql.catalyst.InternalRow(
          i, i % 4 * DayUs + i * 1000000L, i.toDouble))
      }
      writer.commit().asInstanceOf[AvroFrameCommitMessage]
    }
    w.commit(7L, Array(runEpoch(7L, Seq(1000L, 1001L), task = 1L))) // days 0,1
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 102L)
    w.commit(7L, Array(runEpoch(7L, Seq(1000L, 1001L), task = 2L))) // replay, same data
    val after = spark.sql(s"SELECT id FROM $cat.corpus.t WHERE id >= 1000 AND id < 2000")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == Seq(1000L, 1001L), s"replayed partitioned epoch must not duplicate: $after")
    assert(!dir.listFiles().exists(_.getName.startsWith(".inprogress")),
      "replay temps must be cleaned up")

    // partial-commit crash: only day 0's file of epoch 8 reached the
    // log before the "crash"; the replay COMPLETES the epoch — day 0
    // dedups on its (epoch, task-partition, day) name, day 1 lands —
    // converging to exactly-once per row
    val full = runEpoch(8L, Seq(2000L, 2001L), task = 3L) // days 0,1
    val parts = full.parts
    assert(parts.length == 2, s"two per-day files expected: $parts")
    w.commit(8L, Array(AvroFrameCommitMessage("", "", "", parts.take(1))))
    // the crashed attempt's unpublished temp is litter the orphan GC owns
    parts.drop(1).foreach { case (tmp, _, _) => new java.io.File(dir, tmp).delete() }
    w.commit(8L, Array(runEpoch(8L, Seq(2000L, 2001L), task = 4L)))
    val e8 = spark.sql(s"SELECT id FROM $cat.corpus.t WHERE id >= 2000")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(e8 == Seq(2000L, 2001L),
      s"replay must complete a partially-committed epoch exactly-once: $e8")

    // the stream-built table prunes and retains like any partitioned
    // table: window scan plans day 1 only, then retention drops day 0
    val day1 = AvroFrames.listSegments(dir.getAbsolutePath)
      .count(f => FrameTimePart.valueOf(f.getName).contains(1L))
    val plan = spark.sql(s"""SELECT id FROM $cat.corpus.t
      WHERE ts_us >= $DayUs AND ts_us < ${2 * DayUs}""")
      .queryExecution.executedPlan.toString
    val seg = "Segments=(\\d+)/(\\d+) after stat-pruning".r.findFirstMatchIn(plan)
    assert(seg.exists(_.group(1).toInt == day1),
      s"stream-built partitions must prune (want $day1 planned):\n$plan")
    val res = spark.sql(
      s"CALL $cat.corpus.drop_partitions(table => 'corpus.t', older_than => 1)")
      .collect()(0)
    assert(res.getInt(0) == 1 && res.getInt(1) >= 3,
      s"day 0 (three epochs' segments) must drop as one partition: $res")
    val left = spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0)
    assert(left == 104L - 25L - 2L, s"exactly day 0's rows must go: $left")
  }

  test("months/years/hours transform arithmetic is UTC-exact") {
    val tp = FrameTimePart("ts", "months")
    // 2024-02-15 12:00:00 UTC
    val feb2024 = java.time.Instant.parse("2024-02-15T12:00:00Z").getEpochSecond * 1000000L
    val pv = tp.value(feb2024)
    assert(pv == (2024 - 1970) * 12 + 1)
    val (lo, hi) = tp.boundsUs(pv)
    assert(lo == java.time.Instant.parse("2024-02-01T00:00:00Z").getEpochSecond * 1000000L)
    assert(hi == java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond * 1000000L - 1)
    val ty = FrameTimePart("ts", "years")
    assert(ty.value(feb2024) == 54L)
    assert(ty.boundsUs(54L)._1 ==
      java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L)
    val th = FrameTimePart("ts", "hours")
    assert(th.value(3600000000L * 5 + 17) == 5L)
    // pre-epoch values floor correctly (no truncation-towards-zero bug)
    val td = FrameTimePart("ts", "days")
    assert(td.value(-1L) == -1L)
    assert(td.boundsUs(-1L) == (-DayUs, -1L))
  }

  test("guards: nullable/typed partition columns refused; drop refused; rename follows") {
    val (cat, _) = freshCatalog("guards")
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.corpus.bad1 (
        id BIGINT NOT NULL, ts_us BIGINT, v DOUBLE NOT NULL)
        PARTITIONED BY (days(ts_us))""")
    }
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.corpus.bad2 (
        id BIGINT NOT NULL, ts_us STRING NOT NULL, v DOUBLE NOT NULL)
        PARTITIONED BY (days(ts_us))""")
    }
    spark.sql(s"""CREATE TABLE $cat.corpus.ok (
      id BIGINT NOT NULL, ts_us BIGINT NOT NULL, v DOUBLE NOT NULL)
      PARTITIONED BY (days(ts_us))""")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.ok DROP COLUMN ts_us")
    }
    spark.sql(s"ALTER TABLE $cat.corpus.ok RENAME COLUMN ts_us TO event_us")
    loadOk(cat)
    // pruning follows the rename (descriptor partitionCol updated):
    // only day-0 segments survive the plan
    val names = AvroFrames.listSegments(
      spark.conf.get(s"spark.sql.catalog.$cat.base") + "/corpus/ok").map(_.getName)
    val day0 = names.count(n => FrameTimePart.valueOf(n).contains(0L))
    assert(day0 > 0 && day0 < names.length)
    val plan = spark.sql(s"SELECT id FROM $cat.corpus.ok WHERE event_us < $DayUs")
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"Segments=$day0/$day0"), plan) // shard-level prune
  }

  private def loadOk(cat: String): Unit = {
    spark.range(0, 20)
      .selectExpr("id", s"id % 2 * $DayUs AS event_us", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("part_ok_src")
    spark.sql(s"INSERT INTO $cat.corpus.ok SELECT * FROM part_ok_src")
  }
}
