package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FrameCommitIo

/** Round-17 object-store portability pass (VERDICT r16 item 3): every
  * visibility-granting filesystem operation of the commit protocol —
  * mutex, publish, metadata swap, history retirement, snapshot link,
  * table rename — routes through [[FrameCommitIo.impl]]. These tests
  * swap the implementation and prove (a) each primitive is actually
  * exercised by the operations that conceptually need it, and (b) the
  * indirection is load-bearing: a failing impl fails the commit, so no
  * hidden direct-rename path can bypass a future object-store impl.
  */
class CommitIoSpec extends AnyFunSuite with SparkFixture {

  /** Pass-through impl that counts each primitive. */
  private class Counting extends FrameCommitIo {
    val locks, publishes, swaps, moves, links, renames = new AtomicLong(0)
    private val d = FrameCommitIo.Local
    override def tryLock(l: java.io.File) = { locks.incrementAndGet(); d.tryLock(l) }
    override def unlock(l: java.io.File) = d.unlock(l)
    override def publish(t: java.io.File, f: java.io.File) =
      { publishes.incrementAndGet(); d.publish(t, f) }
    override def swap(t: java.io.File, f: java.io.File) =
      { swaps.incrementAndGet(); d.swap(t, f) }
    override def move(s: java.io.File, f: java.io.File, r: Boolean) =
      { moves.incrementAndGet(); d.move(s, f, r) }
    override def link(s: java.io.File, f: java.io.File) =
      { links.incrementAndGet(); d.link(s, f) }
    override def renameDir(s: java.io.File, f: java.io.File) =
      { renames.incrementAndGet(); d.renameDir(s, f) }
  }

  test("the full lifecycle exercises exactly the five primitives, through the interface") {
    val base = Files.createTempDirectory("commitio").toString
    val cat = "cio"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val io = new Counting
    FrameCommitIo.impl = io
    try {
      spark.sql(s"CREATE NAMESPACE $cat.corpus")
      spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
      spark.range(0, 200).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .repartition(4).createOrReplaceTempView("cio_src")
      spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM cio_src")
      assert(io.publishes.get() >= 4, "append commit must publish through the interface")
      assert(io.swaps.get() >= 1, "the ledger fold must swap through the interface")

      // maintenance: lock + retire(move) + publish + manifest swap
      val (p0, m0, l0) = (io.publishes.get(), io.moves.get(), io.locks.get())
      spark.sql(s"CALL $cat.corpus.compact(table => 'corpus.t')").collect()
      assert(io.locks.get() > l0, "compaction must take the table mutex")
      assert(io.moves.get() > m0, "compaction must retire originals via move")
      assert(io.publishes.get() > p0, "compaction must publish its bin")

      // row-level delete: metadata-only retire + manifest swap
      val m1 = io.moves.get()
      spark.sql(s"DELETE FROM $cat.corpus.t WHERE id >= 0")
      assert(io.moves.get() > m1, "whole-table delete must retire via move")

      // clone: zero-copy link
      spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM cio_src")
      spark.sql(s"CALL $cat.corpus.clone(table => 'corpus.t', target => 'corpus.fork')")
        .collect()
      assert(io.links.get() >= 1, "clone must link through the interface")
      assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.fork")
        .collect()(0).getLong(0) == 200L)

      // table rename
      spark.sql(s"ALTER TABLE $cat.corpus.fork RENAME TO corpus.fork2")
      assert(io.renames.get() >= 1, "RENAME must go through renameDir")
      assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.fork2")
        .collect()(0).getLong(0) == 200L)

      // and the table still reads exactly
      assert(spark.sql(s"SELECT sum(id) FROM $cat.corpus.t").collect()(0).getLong(0)
        == (0L until 200L).sum)
    } finally FrameCommitIo.impl = FrameCommitIo.Local
  }

  test("the indirection is load-bearing: a refusing impl fails the commit") {
    val dir = Files.createTempDirectory("commitio-fail").toString
    val schema = graft.sources.AvroFrames.avroSchemaFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false))), "t")
    def append(): Unit =
      spark.range(0, 10).toDF("id").coalesce(1)
        .write.format("graft.sources.AvroFrameDataSource")
        .option("path", dir).option("avroSchema", schema).mode("append").save()
    FrameCommitIo.impl = new FrameCommitIo {
      private val d = FrameCommitIo.Local
      override def tryLock(l: java.io.File) = d.tryLock(l)
      override def unlock(l: java.io.File) = d.unlock(l)
      override def publish(t: java.io.File, f: java.io.File) = false // refuse
      override def swap(t: java.io.File, f: java.io.File) = d.swap(t, f)
      override def move(s: java.io.File, f: java.io.File, r: Boolean) = d.move(s, f, r)
      override def link(s: java.io.File, f: java.io.File) = d.link(s, f)
      override def renameDir(s: java.io.File, f: java.io.File) = d.renameDir(s, f)
    }
    try {
      val e = intercept[Exception] { append() }
      assert(e.getMessage != null)
    } finally FrameCommitIo.impl = FrameCommitIo.Local
    // no half-visible state: the refused commit published nothing
    assert(graft.sources.AvroFrames.listSegments(dir).isEmpty,
      "a refused publish must leave zero visible segments")
    // and with the real impl the same append succeeds
    append()
    assert(spark.read.format("graft.sources.AvroFrameDataSource")
      .option("path", dir).option("avroSchema", schema).load().count() == 10L)
  }
}
