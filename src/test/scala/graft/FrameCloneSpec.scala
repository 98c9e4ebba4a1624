package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFrames, FrameDv, FrameMaintenance, FrameStatsLedger}

/** Round-16 `CALL clone` — zero-copy snapshot forks via hardlinks:
  * immutable segments + rename-based maintenance mean the clone and
  * the source can never observe each other's mutations, while sharing
  * every byte until their lifecycles diverge.
  */
class FrameCloneSpec extends AnyFunSuite with SparkFixture {

  private def freshCatalog(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"frame-clone-$tag").toString
    val cat = s"fclone_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    (cat, base)
  }

  private def load(cat: String, table: String, from: Int, to: Int): Unit = {
    spark.range(from, to).coalesce(1)
      .selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView(s"clone_src_${cat}_$from")
    spark.sql(s"INSERT INTO $cat.corpus.$table SELECT * FROM clone_src_${cat}_$from")
  }

  private def ids(cat: String, t: String): Seq[Long] =
    spark.sql(s"SELECT id FROM $cat.corpus.$t").collect().map(_.getLong(0)).sorted.toSeq

  test("clone shares bytes, then source and clone diverge independently") {
    val (cat, base) = freshCatalog("indep")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    load(cat, "t", 0, 50); load(cat, "t", 50, 100)
    val r = spark.sql(
      s"CALL $cat.sys.clone(table => 'corpus.t', target => 'corpus.fork')").collect()(0)
    assert(r.getInt(0) > 0 && r.getInt(1) == 0,
      s"same-filesystem clone must hardlink, not copy: linked=${r.getInt(0)} copied=${r.getInt(1)}")
    assert(ids(cat, "fork") == (0L until 100L))
    // ledger minted for the clone
    assert(FrameStatsLedger.read(new java.io.File(base, "corpus/fork")).get.nonEmpty)

    // source mutations invisible to the clone — including maintenance
    // that RETIRES the shared segments (rename; the inode lives on)
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE id < 30")
    FrameMaintenance.compact(spark, new java.io.File(base, "corpus/t"))
    spark.sql(s"CALL $cat.sys.expire_snapshots(table => 'corpus.t', " +
      s"older_than_ms => ${System.currentTimeMillis() + 1000})")
    assert(ids(cat, "t") == (30L until 100L))
    assert(ids(cat, "fork") == (0L until 100L), "clone must not see source mutations")

    // clone mutations invisible to the source
    load(cat, "fork", 100, 110)
    spark.sql(s"DELETE FROM $cat.corpus.fork WHERE id = 0")
    assert(ids(cat, "fork") == (1L until 110L))
    assert(ids(cat, "t") == (30L until 100L), "source must not see clone mutations")
  }

  test("clone by tag materializes the tagged snapshot") {
    val (cat, _) = freshCatalog("tag")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    load(cat, "t", 0, 20)
    spark.sql(s"CALL $cat.sys.create_tag(table => 'corpus.t', tag => 'v1')")
    load(cat, "t", 20, 40)
    spark.sql(s"CALL $cat.sys.clone(table => 'corpus.t', target => 'corpus.old', " +
      "version => 'v1')")
    assert(ids(cat, "old") == (0L until 20L))
    assert(ids(cat, "t") == (0L until 40L))
    // tags do NOT travel: the clone's version numbering is its own
    assert(spark.sql(s"SELECT * FROM $cat.corpus.old.tags").collect().isEmpty)
  }

  test("cloning a vectored (merge-on-read) table keeps deletes and a consistent feed") {
    val (cat, base) = freshCatalog("dv")
    spark.sql(s"""CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)
      TBLPROPERTIES ('deleteMode'='merge-on-read', 'dvFoldThreshold'='2.0')""")
    load(cat, "t", 0, 100)
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE id IN (3, 7)")
    assert(AvroFrames.liveDvMap(base + "/corpus/t").nonEmpty)

    spark.sql(s"CALL $cat.sys.clone(table => 'corpus.t', target => 'corpus.fork')")
    val forkDir = new java.io.File(base, "corpus/fork")
    assert(ids(cat, "fork") == (0L until 100L).filterNot(Set(3L, 7L)))
    // the synthesized manifest declares the inherited vector: replay,
    // version count, and the change feed are all consistent
    assert(FrameMaintenance.totalVersions(forkDir) == 2) // 1 append + 1 dv op
    val feed = spark.sql(s"SELECT id, _change_type FROM $cat.corpus.fork.changes")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val net = feed.groupBy(_._1).view.mapValues(xs =>
      xs.count(_._2 == "insert") - xs.count(_._2 == "delete")).toMap
    assert(net.collect { case (id, n) if n > 0 => id }.toSeq.sorted ==
      (0L until 100L).filterNot(Set(3L, 7L)),
      "the clone's feed must reconstruct exactly its live rows")
    // diverging deletes stay independent
    spark.sql(s"DELETE FROM $cat.corpus.fork WHERE id = 11")
    assert(ids(cat, "t") == (0L until 100L).filterNot(Set(3L, 7L)))
    assert(ids(cat, "fork") == (0L until 100L).filterNot(Set(3L, 7L, 11L)))
  }

  test("clone refusals: existing target, missing namespace, bad version") {
    val (cat, _) = freshCatalog("err")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    load(cat, "t", 0, 5)
    intercept[Exception] {
      spark.sql(s"CALL $cat.sys.clone(table => 'corpus.t', target => 'corpus.t')")
    }
    intercept[Exception] {
      spark.sql(s"CALL $cat.sys.clone(table => 'corpus.t', target => 'nope.x')")
    }
    intercept[Exception] {
      spark.sql(s"CALL $cat.sys.clone(table => 'corpus.t', target => 'corpus.x', " +
        "version => 'no-such-tag')")
    }
  }
}
