package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFrames, FrameChanges, FrameMaintenance, FrameStatsLedger, FrameTags}

/** Round-16 snapshot rollback + named tags (VERDICT r15 item 3): the
  * ops answer to "a bad backfill just landed" — one version-minting
  * operation makes the current state equal an addressed snapshot,
  * old versions stay addressable, the change feed reports the delta
  * row-exactly, and tags give versions human names.
  */
class FrameRollbackSpec extends AnyFunSuite with SparkFixture {

  private val schemaJson = AvroFrames.avroSchemaFor(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType, nullable = false))),
    "t")

  private def writeRows(dir: String, from: Long, to: Long): Unit =
    spark.range(from, to).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .coalesce(1)
      .write.format("graft.sources.AvroFrameDataSource")
      .option("path", dir).option("avroSchema", schemaJson)
      .mode("append").save()

  private def ids(dir: String): Set[Long] =
    spark.read.format("graft.sources.AvroFrameDataSource")
      .option("path", dir).option("avroSchema", schemaJson).load()
      .select("id").collect().map(_.getLong(0)).toSet

  test("rollback: bad append undone, old versions stay addressable, CDC shows the delta") {
    val dir = Files.createTempDirectory("rollback-basic").toFile
    writeRows(dir.toString, 0, 10)    // v1
    writeRows(dir.toString, 10, 20)   // v2
    writeRows(dir.toString, 100, 105) // v3: the bad backfill
    assert(ids(dir.toString) == ((0L until 20L) ++ (100L until 105L)).toSet)

    val res = FrameMaintenance.rollback(dir, 2)
    assert(res.retired == 1 && res.restored == 0)
    // current state == v2 state
    assert(ids(dir.toString) == (0L until 20L).toSet)
    // the event history is append-only: rollback minted v4
    assert(FrameMaintenance.totalVersions(dir) == 4)
    // every version still resolves — including the bad v3
    assert(FrameMaintenance.resolveVersion(dir, 3).nonEmpty)
    assert(FrameMaintenance.resolveVersion(dir, 4).map(_.getName).toSet ==
      FrameMaintenance.resolveVersion(dir, 2).map(_.getName).toSet)
    // CDC: version 4 reports exactly the bad rows as deletes
    val delta = FrameChanges.read(spark, dir.toString, schemaJson,
        AvroFrames.DefaultSchemaId, 3, Some(4))
      .select("id", FrameChanges.ChangeTypeCol).collect()
    assert(delta.forall(_.getString(1) == "delete"))
    assert(delta.map(_.getLong(0)).toSet == (100L until 105L).toSet)
    // ledger stays in lockstep with the live set
    assert(FrameStatsLedger.read(dir).get.keySet ==
      AvroFrames.listSegments(dir.toString).map(_.getName).toSet)

    // rollback OF the rollback: restore the bad state, CDC shows inserts
    val fwd = FrameMaintenance.rollback(dir, 3)
    assert(fwd.retired == 0 && fwd.restored == 1)
    assert(ids(dir.toString) == ((0L until 20L) ++ (100L until 105L)).toSet)
    val fwdDelta = FrameChanges.read(spark, dir.toString, schemaJson,
        AvroFrames.DefaultSchemaId, 4, Some(5))
      .select("id", FrameChanges.ChangeTypeCol).collect()
    assert(fwdDelta.forall(_.getString(1) == "insert"))
    assert(fwdDelta.map(_.getLong(0)).toSet == (100L until 105L).toSet)
  }

  test("rollback across a merge-on-read delete re-inserts exactly the erased rows") {
    val dir = Files.createTempDirectory("rollback-mor").toFile
    writeRows(dir.toString, 0, 100) // v1
    FrameMaintenance.deleteWhereMoR(spark, dir, schemaJson, AvroFrames.DefaultSchemaId,
      Array(org.apache.spark.sql.sources.EqualTo("id", 7L))) // v2: dv
    FrameMaintenance.deleteWhereMoR(spark, dir, schemaJson, AvroFrames.DefaultSchemaId,
      Array(org.apache.spark.sql.sources.EqualTo("id", 13L))) // v3: cumulative dv
    assert(ids(dir.toString) == (0L until 100L).toSet -- Set(7L, 13L))

    // roll back to v2: id=13 comes back, id=7 stays deleted (the
    // intermediate vector is restored, not dropped)
    FrameMaintenance.rollback(dir, 2)
    assert(ids(dir.toString) == (0L until 100L).toSet - 7L)
    val delta = FrameChanges.read(spark, dir.toString, schemaJson,
        AvroFrames.DefaultSchemaId, 3, Some(4))
      .select("id", FrameChanges.ChangeTypeCol).collect()
    assert(delta.length == 1 && delta(0).getLong(0) == 13L &&
      delta(0).getString(1) == "insert",
      s"rollback over a dv must re-insert exactly the un-deleted row, got " +
        delta.map(r => (r.getLong(0), r.getString(1))).mkString(", "))

    // and back to v1: id=7 returns too (vector removed entirely)
    FrameMaintenance.rollback(dir, 1)
    assert(ids(dir.toString) == (0L until 100L).toSet)
  }

  test("rollback across a copy-on-write delete restores the original segment") {
    val dir = Files.createTempDirectory("rollback-cow").toFile
    writeRows(dir.toString, 0, 50)  // v1
    writeRows(dir.toString, 50, 99) // v2
    FrameMaintenance.deleteWhere(spark, dir, schemaJson, AvroFrames.DefaultSchemaId,
      Array(org.apache.spark.sql.sources.LessThan("id", 10L))) // v3 rewrites seg 1
    assert(ids(dir.toString) == (10L until 99L).toSet)
    FrameMaintenance.rollback(dir, 2)
    assert(ids(dir.toString) == (0L until 99L).toSet)
    // versions before, at, and after all resolve
    (1 to FrameMaintenance.totalVersions(dir)).foreach { v =>
      FrameMaintenance.resolveVersion(dir, v)
    }
  }

  test("SQL surface: CALL rollback, create_tag / drop_tag, VERSION AS OF 'tag', t.tags") {
    val base = Files.createTempDirectory("rollback-sql").toString
    val cat = "frollb_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    def insert(from: Int, to: Int): Unit = {
      spark.range(from, to).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1)
        .createOrReplaceTempView("rollback_sql_src")
      spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM rollback_sql_src")
    }
    insert(0, 10)  // v1
    insert(10, 20) // v2
    val tagged = spark.sql(s"CALL $cat.sys.create_tag(table => 'corpus.t', tag => 'validated')")
      .collect()(0).getInt(0)
    assert(tagged == 2)
    insert(900, 910) // v3: bad
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 30L)

    // tag-addressed read
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t VERSION AS OF 'validated'")
      .collect()(0).getLong(0) == 20L)
    // tag-addressed rollback
    val r = spark.sql(s"CALL $cat.sys.rollback(table => 'corpus.t', version => 'validated')")
      .collect()(0)
    assert(r.getInt(0) == 1 && r.getInt(1) == 0)
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 20L)
    // the bad version is still addressable by number
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t VERSION AS OF 3")
      .collect()(0).getLong(0) == 30L)
    // tags metadata table
    val tags = spark.sql(s"SELECT * FROM $cat.corpus.t.tags").collect()
    assert(tags.length == 1 && tags(0).getString(0) == "validated" && tags(0).getInt(1) == 2)
    // drop
    spark.sql(s"CALL $cat.sys.drop_tag(table => 'corpus.t', tag => 'validated')")
    assert(spark.sql(s"SELECT * FROM $cat.corpus.t.tags").collect().isEmpty)
    intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM $cat.corpus.t VERSION AS OF 'validated'").collect()
    }
  }

  test("physical TRUNCATE drops tags with the lineage") {
    val dir = Files.createTempDirectory("rollback-trunc").toFile
    writeRows(dir.toString, 0, 5)
    FrameTags.write(dir, Map("clean" -> 1))
    // INSERT OVERWRITE = physical truncate = new lineage
    spark.range(0, 3).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1)
      .write.format("graft.sources.AvroFrameDataSource")
      .option("path", dir.toString).option("avroSchema", schemaJson)
      .mode("overwrite").save()
    assert(FrameTags.read(dir).isEmpty,
      "a tag surviving a physical truncate would address the new lineage's versions")
  }

  test("rollback refuses unreachable targets; no-op rollback mints nothing") {
    val dir = Files.createTempDirectory("rollback-err").toFile
    writeRows(dir.toString, 0, 5) // v1
    intercept[IllegalArgumentException] { FrameMaintenance.rollback(dir, 9) }
    // rolling back to the current state is a no-op, no version minted
    val res = FrameMaintenance.rollback(dir, 1)
    assert(res.retired == 0 && res.restored == 0)
    assert(FrameMaintenance.totalVersions(dir) == 1)
    // target needing expired history fails loudly
    writeRows(dir.toString, 5, 9) // v2
    FrameMaintenance.deleteAll(dir) // v3
    FrameMaintenance.expire(dir, System.currentTimeMillis() + 1000L)
    intercept[IllegalStateException] { FrameMaintenance.rollback(dir, 2) }
  }

  test("tailing stream offsets survive a rollback (versions are stable)") {
    val dir = Files.createTempDirectory("rollback-stream").toFile
    writeRows(dir.toString, 0, 10)  // v1
    writeRows(dir.toString, 10, 20) // v2
    FrameMaintenance.rollback(dir, 1) // v3: drop the second append
    // appendVersions: the retired segment's version is STILL v2 (it
    // resolves from history for a lagging reader); rollback minted v3
    // with no appended data
    val av = FrameMaintenance.appendVersions(dir)
    assert(av.map(_._2) == Vector(1, 2))
    av.foreach { case (n, _) => FrameMaintenance.resolvePhysical(dir, n) }
    assert(FrameMaintenance.totalVersions(dir) == 3)
  }
}
