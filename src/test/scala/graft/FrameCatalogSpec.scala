package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frame connector's catalog plugin: full SQL lifecycle (CREATE
  * NAMESPACE / CREATE TABLE / INSERT / SELECT / RENAME / DROP) over a
  * directory-tree metastore, with every scan/write capability —
  * pushdown, stat-pruning, aggregate answering, exactly-once commit —
  * applying identically through SQL, because loadTable returns the
  * same Table implementation as the path-based API.
  */
class FrameCatalogSpec extends AnyFunSuite with SparkFixture {

  private def freshCatalog(tag: String): String = {
    val base = Files.createTempDirectory(s"frame-cat-$tag").toString
    val cat = s"fcat_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    cat
  }

  test("SQL lifecycle: create namespace + table, insert, select with pushdown, drop") {
    val cat = freshCatalog("life")
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"""CREATE TABLE $cat.corpus.ticks (
      id BIGINT NOT NULL, tag STRING, price DOUBLE NOT NULL)""")
    assert(spark.sql(s"SHOW TABLES IN $cat.corpus").collect()
      .map(_.getString(1)).toSeq == Seq("ticks"))

    spark.range(1, 101)
      .selectExpr("id", "IF(id % 10 = 0, NULL, CONCAT('t', id)) AS tag",
        "CAST(id AS DOUBLE) * 1.5 AS price")
      .createOrReplaceTempView("src_ticks")
    spark.sql(s"INSERT INTO $cat.corpus.ticks SELECT * FROM src_ticks")

    // the insert went through the DSv2 commit protocol: visible
    // segments + stats sidecars, no temp files
    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val tdir = new java.io.File(base, "corpus/ticks")
    val files = tdir.listFiles().map(_.getName)
    assert(files.exists(_.startsWith("segment-")) && files.exists(_.endsWith(".stats")),
      s"expected committed segments + sidecars, got ${files.toSeq}")
    assert(!files.exists(_.startsWith(".inprogress")))

    // SELECT with filter: pushed into the same scan as the path API
    val q = spark.sql(s"SELECT id, price FROM $cat.corpus.ticks WHERE price >= 120.0")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AvroFrameScan") && plan.contains("GreaterThanOrEqual(price,120.0)"),
      s"filter must push through the catalog path:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (80L to 100L))

    // aggregate pushdown through SQL: answered from sidecars
    val agg = spark.sql(s"SELECT count(*) AS n, max(id) AS mx FROM $cat.corpus.ticks")
    assert(agg.queryExecution.executedPlan.toString.contains("complete, sidecar-only"),
      "catalog reads must keep aggregate pushdown")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 100L)

    // second INSERT appends (the log is append-only)
    spark.sql(s"INSERT INTO $cat.corpus.ticks SELECT * FROM src_ticks")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.corpus.ticks").collect()(0).getLong(0) == 200L)

    spark.sql(s"DROP TABLE $cat.corpus.ticks")
    assert(spark.sql(s"SHOW TABLES IN $cat.corpus").collect().isEmpty)
    spark.sql(s"DROP NAMESPACE $cat.corpus")
  }

  test("CTAS derives the Avro wire schema from the query; round-trips exactly") {
    val cat = freshCatalog("ctas")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    Tables.nation(spark, sfDir).createOrReplaceTempView("src_nation")
    spark.sql(s"""CREATE TABLE $cat.ns.nations AS
      SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name AS name FROM src_nation""")
    val got = spark.sql(s"SELECT nationkey, name FROM $cat.ns.nations")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = Tables.nation(spark, sfDir)
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the descriptor holds a real Avro schema readable by the provider path
    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val desc = java.nio.file.Files.readString(
      new java.io.File(base, "ns/nations/_table.json").toPath)
    assert(desc.contains("avroSchema") && desc.contains("nationkey"))
  }

  test("metastore semantics: duplicate/missing/rename/alter/non-empty-drop behave like a catalog") {
    val cat = freshCatalog("sem")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.a (id BIGINT NOT NULL)")
    intercept[Exception](spark.sql(s"CREATE TABLE $cat.ns.a (id BIGINT NOT NULL)"))
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.ns.a (id BIGINT NOT NULL)") // no throw
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.ns.missing").collect())
    // ADD/RENAME/DROP COLUMN are supported since the schema-evolution
    // rounds; byte-reinterpreting changes (retype) and degenerate drops
    // stay rejected
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.ns.a DROP COLUMN id")) // only column
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.ns.a ALTER COLUMN id TYPE STRING"))
    spark.sql(s"ALTER TABLE $cat.ns.a RENAME COLUMN id TO id2")
    assert(spark.table(s"$cat.ns.a").schema.fieldNames.toSeq == Seq("id2"))
    spark.sql(s"ALTER TABLE $cat.ns.a RENAME COLUMN id2 TO id")
    // the RENAME target is a catalog-relative multipart name
    spark.sql(s"ALTER TABLE $cat.ns.a RENAME TO ns.b")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect().map(_.getString(1)).toSeq == Seq("b"))
    intercept[Exception](spark.sql(s"DROP NAMESPACE $cat.ns")) // non-empty
    spark.sql(s"DROP NAMESPACE $cat.ns CASCADE")
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect().isEmpty)
    // unsupported column types fail at CREATE, not at first write
    spark.sql(s"CREATE NAMESPACE $cat.ns2")
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.ns2.bad (id BIGINT NOT NULL, m MAP<STRING,STRING>)"))
  }

  test("V2 catalog function: jaro_winkler binds, codegen-dispatches, and matches the expression") {
    val cat = freshCatalog("fn")
    spark.sql(s"CREATE NAMESPACE $cat.lib")
    // resolution + SHOW FUNCTIONS surface
    assert(spark.sql(s"SHOW FUNCTIONS IN $cat.lib").collect()
      .map(_.getString(0)).exists(_.endsWith("jaro_winkler")))
    // value parity with the Catalyst expression on tricky cases
    val cases = Seq(
      ("martha", "marhta"), ("dwayne", "duane"), ("", "abc"),
      ("same", "same"), ("a", "b"))
    cases.foreach { case (a, b) =>
      val viaFn = spark.sql(s"SELECT $cat.lib.jaro_winkler('$a', '$b') AS v")
        .collect()(0).getDouble(0)
      val viaExpr = graft.sources.FrameFunctions.JaroWinklerBound.invoke(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(viaFn == viaExpr, s"($a,$b): fn=$viaFn expr=$viaExpr")
    }
    // null in -> null out (DuckDB semantics)
    assert(spark.sql(s"SELECT $cat.lib.jaro_winkler(CAST(NULL AS STRING), 'x') AS v")
      .collect()(0).isNullAt(0))
    // arity/type misuse fails at ANALYSIS, not at runtime
    intercept[Exception](spark.sql(s"SELECT $cat.lib.jaro_winkler('a') AS v").collect())
    intercept[Exception](spark.sql(s"SELECT $cat.lib.jaro_winkler(1, 2) AS v").collect())
    // unknown function name
    intercept[Exception](spark.sql(s"SELECT $cat.lib.no_such_fn('a') AS v").collect())
  }

  test("V2 catalog function: hamming64 primitive dispatch, null-intolerance, bounds") {
    val cat = freshCatalog("fn2")
    spark.sql(s"CREATE NAMESPACE $cat.lib")
    def ham(a: Long, b: Long): Int =
      spark.sql(s"SELECT $cat.lib.hamming64(${a}L, ${b}L) AS v").collect()(0).getInt(0)
    assert(ham(0L, 0L) == 0)
    assert(ham(0L, -1L) == 64)
    assert(ham(0x5555555555555555L, 0L) == 32)
    assert(ham(13L, 13L) == 0)
    assert(ham(1L, 2L) == 2)
    // matches the direct kernel on random pairs
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val (a, b) = (rnd.nextLong(), rnd.nextLong())
      assert(ham(a, b) == java.lang.Long.bitCount(a ^ b))
    }
    // null in -> null out; analysis-time type rejection
    assert(spark.sql(s"SELECT $cat.lib.hamming64(CAST(NULL AS BIGINT), 1L) AS v")
      .collect()(0).isNullAt(0))
    intercept[Exception](spark.sql(s"SELECT $cat.lib.hamming64('a', 'b') AS v").collect())
    intercept[Exception](spark.sql(s"SELECT $cat.lib.hamming64(1L) AS v").collect())
  }

  test("time travel: VERSION AS OF reads the first-n-segments slice; TIMESTAMP AS OF by publish time") {
    val cat = freshCatalog("tt")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.log (id BIGINT NOT NULL)")
    // two appends = two log versions (1 segment each: coalesced input)
    spark.range(1, 6).coalesce(1).createOrReplaceTempView("tt_first")
    spark.sql(s"INSERT INTO $cat.ns.log SELECT id FROM tt_first")
    val v1Segments = new java.io.File(
      spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/log")
      .listFiles().count(_.getName.endsWith(".bin"))
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100) // mtime granularity guard
    spark.range(100, 103).coalesce(1).createOrReplaceTempView("tt_second")
    spark.sql(s"INSERT INTO $cat.ns.log SELECT id FROM tt_second")

    def ids(sql: String): Seq[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(s"SELECT id FROM $cat.ns.log") == Seq(1L, 2L, 3L, 4L, 5L, 100L, 101L, 102L))
    assert(ids(s"SELECT id FROM $cat.ns.log VERSION AS OF $v1Segments") == (1L to 5L),
      "VERSION AS OF must read exactly the first append's segments")
    assert(ids(s"SELECT id FROM $cat.ns.log VERSION AS OF 0") == Seq.empty,
      "version 0 is the empty log")
    intercept[Exception](spark.sql(s"SELECT id FROM $cat.ns.log VERSION AS OF 99").collect())
    // timestamp between the appends sees only the first
    val tsLit = new java.sql.Timestamp(betweenMs).toString
    assert(ids(s"SELECT id FROM $cat.ns.log TIMESTAMP AS OF '$tsLit'") == (1L to 5L),
      "TIMESTAMP AS OF must cut on publish mtime")
    // history composes with sidecar-only aggregate pushdown: the old
    // slice's max comes from the old sidecars alone
    val agg = spark.sql(
      s"SELECT max(id) AS mx, count(*) AS n FROM $cat.ns.log VERSION AS OF $v1Segments")
    assert(agg.queryExecution.executedPlan.toString.contains("complete, sidecar-only"))
    val r = agg.collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
  }

  test("unsafe identifiers never reach the filesystem: '..' and separator segments rejected") {
    val cat = freshCatalog("safe")
    val base = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"))
    // a sibling dir that a traversal would clobber
    val sibling = new java.io.File(base.getParentFile, base.getName + "-sibling")
    sibling.mkdirs()
    val canary = new java.io.File(sibling, "canary.txt")
    java.nio.file.Files.writeString(canary.toPath, "alive")
    try {
      // DROP NAMESPACE `..` CASCADE must fail, not delete above the base
      intercept[Exception](spark.sql(s"DROP NAMESPACE $cat.`..` CASCADE"))
      intercept[Exception](spark.sql(s"CREATE NAMESPACE $cat.`../escape`"))
      intercept[Exception](spark.sql(s"CREATE NAMESPACE $cat.`a/b`"))
      spark.sql(s"CREATE NAMESPACE $cat.ok")
      intercept[Exception](spark.sql(s"CREATE TABLE $cat.ok.`..` (id BIGINT NOT NULL)"))
      intercept[Exception](spark.sql(s"DROP TABLE $cat.ok.`../../etc`"))
      // rename target validated too
      spark.sql(s"CREATE TABLE $cat.ok.t (id BIGINT NOT NULL)")
      intercept[Exception](spark.sql(s"ALTER TABLE $cat.ok.t RENAME TO ok.`..`"))
      assert(canary.isFile && base.isDirectory,
        "traversal identifiers must never touch the filesystem")
      // exists-probes with unsafe names answer false instead of throwing
      val fc = new graft.sources.FrameCatalog
      fc.initialize("probe", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("base", base.getAbsolutePath)))
      assert(!fc.namespaceExists(Array("..")))
      assert(!fc.tableExists(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ok"), "../../etc")))
    } finally {
      canary.delete(); sibling.delete()
    }
  }

  test("batch publish: one mtime per commit (TIMESTAMP AS OF cuts on publish, not task write)") {
    val cat = freshCatalog("pub")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL)")
    val t0 = System.currentTimeMillis()
    // 4 partitions = 4 tasks whose temp files get distinct write times;
    // the job commit must restamp them all to ONE publish instant
    spark.range(0, 4000).repartition(4).createOrReplaceTempView("pub_src")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT id FROM pub_src")
    val dir = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/t")
    val mtimes = dir.listFiles().filter(_.getName.endsWith(".bin")).map(_.lastModified()).toSet
    assert(mtimes.size == 1, s"all segments of one commit must share one publish mtime, got $mtimes")
    assert(mtimes.head >= t0, "publish mtime must be the commit instant, not the task write time")
  }

  test("batch stamps are monotone over the log even if the clock steps backwards") {
    val dir = Files.createTempDirectory("stamp-mono").toFile
    // a segment stamped in the future (as if written by a fast clock)
    val future = System.currentTimeMillis() + 10 * 60 * 1000L
    val fname = f"segment-$future%013d-deadbeef-p00000.bin"
    java.nio.file.Files.writeString(new java.io.File(dir, fname).toPath, "")
    val next = graft.sources.AvroFrames.nextBatchStampMs(dir.getAbsolutePath)
    assert(next == future + 1,
      s"next stamp must be max(existing+1, now); got $next for existing $future")
    // empty log: wall clock
    val empty = Files.createTempDirectory("stamp-empty").toFile
    val now = System.currentTimeMillis()
    assert(math.abs(graft.sources.AvroFrames.nextBatchStampMs(empty.getAbsolutePath) - now) < 5000)
  }

  test("CALL compact: semantically invisible, merged sidecars, time travel intact, expiry invalidates") {
    val cat = freshCatalog("cmp")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.log (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    def insert(lo: Long, hi: Long): Unit = {
      spark.range(lo, hi).selectExpr("id", "CAST(id AS DOUBLE) * 0.5 AS v")
        .coalesce(1).createOrReplaceTempView("cmp_src")
      spark.sql(s"INSERT INTO $cat.ns.log SELECT * FROM cmp_src")
      Thread.sleep(5) // distinct publish instants
    }
    insert(0, 100); insert(100, 200); insert(200, 300)
    val dir = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/log")
    def liveBins = dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.endsWith(".stats") && !f.getName.endsWith(".tmp")).map(_.getName).sorted
    assert(liveBins.length == 3)
    def ids(sql: String): Seq[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq
    val before = ids(s"SELECT id FROM $cat.ns.log")
    val v2Before = ids(s"SELECT id FROM $cat.ns.log VERSION AS OF 2")
    assert(v2Before == (0L until 200L))

    val res = spark.sql(s"CALL $cat.ns.compact(table => 'ns.log')").collect()
    assert(res.length == 1 && res(0).getInt(0) == 1 && res(0).getInt(1) == 3,
      s"expected 1 bin over 3 segments, got ${res.toSeq}")
    assert(liveBins.length == 1 && liveBins.head.contains(".c"),
      s"live log must be one compacted segment, got ${liveBins.toSeq}")

    // hash-identical result, ONE input partition instead of three
    assert(ids(s"SELECT id FROM $cat.ns.log") == before, "compaction must be invisible")
    val plan = spark.sql(s"SELECT id FROM $cat.ns.log")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Segments=1/1"), s"post-compaction scan must plan 1 split:\n$plan")
    // merged sidecar still answers complete aggregate pushdown
    val agg = spark.sql(s"SELECT count(*) AS n, max(id) AS mx FROM $cat.ns.log")
    assert(agg.queryExecution.executedPlan.toString.contains("complete, sidecar-only"))
    val r0 = agg.collect()(0); assert(r0.getLong(0) == 300L && r0.getLong(1) == 299L)

    // pre-compaction versions resolve from history; the all-appends
    // version (3) resolves too (covered exactly by the replacement)
    assert(ids(s"SELECT id FROM $cat.ns.log VERSION AS OF 2") == v2Before)
    assert(ids(s"SELECT id FROM $cat.ns.log VERSION AS OF 3") == before)
    assert(new java.io.File(dir, "_history").listFiles()
      .count(_.getName.endsWith(".bin")) == 3)

    // expiry: version 2 (needs a replaced original) stops resolving;
    // version 3 (covered by the live replacement) keeps resolving
    val dropped = spark.sql(
      s"CALL $cat.ns.expire_snapshots(table => 'ns.log', older_than_ms => ${System.currentTimeMillis()})")
      .collect()(0).getInt(0)
    assert(dropped == 3, s"3 history segments should expire, got $dropped")
    val ex = intercept[Exception](ids(s"SELECT id FROM $cat.ns.log VERSION AS OF 2"))
    assert(ex.getMessage != null)
    assert(ids(s"SELECT id FROM $cat.ns.log VERSION AS OF 3") == before)
    assert(ids(s"SELECT id FROM $cat.ns.log") == before)
  }

  test("compact respects target_bytes: consecutive bins, order preserved") {
    val cat = freshCatalog("cmpb")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL)")
    (0 until 5).foreach { i =>
      spark.range(i * 10L, i * 10L + 10L).coalesce(1).createOrReplaceTempView("cb_src")
      spark.sql(s"INSERT INTO $cat.ns.t SELECT id FROM cb_src")
    }
    val dir = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/t")
    val segBytes = graft.sources.AvroFrames.listSegments(dir.getAbsolutePath).head.length()
    // target fits ~2 segments per bin -> bins of 2,2 and a loose tail
    spark.sql(s"CALL $cat.ns.compact(table => 'ns.t', target_bytes => ${segBytes * 2 + 4})")
    val live = graft.sources.AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    assert(live.length == 3, s"5 segments at 2/bin -> 2 bins + 1 loose, got ${live.toSeq}")
    // read order unchanged: ids come back in log order within the scan
    val got = spark.sql(s"SELECT id FROM $cat.ns.t").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 50L))
  }

  test("DELETE FROM: metadata-only fast path, rewrite path, pre-delete time travel, versioning") {
    val cat = freshCatalog("del")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL, tag STRING)")
    spark.range(1, 51).selectExpr("id", "CONCAT('a', id % 3) AS tag")
      .coalesce(1).createOrReplaceTempView("del_one")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM del_one")
    Thread.sleep(30)
    spark.range(51, 101).selectExpr("id", "CONCAT('a', id % 3) AS tag")
      .coalesce(1).createOrReplaceTempView("del_two")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM del_two")
    Thread.sleep(30)
    val preDeleteMs = System.currentTimeMillis()
    Thread.sleep(30)

    val dir = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/t")
    def liveNames = graft.sources.AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    def ids(sql: String): Seq[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq

    // (a) metadata-only: segment 1 (ids 1..50) provably all-match,
    // segment 2 provably none-match -> no rewrite anywhere
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id <= 50")
    assert(liveNames.length == 1 && !liveNames.head.contains(".d"),
      s"metadata-only delete must not rewrite: ${liveNames.toSeq}")
    assert(ids(s"SELECT id FROM $cat.ns.t") == (51L to 100L))

    // (b) rewrite: straddles segment 2
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id >= 90")
    assert(liveNames.length == 1 && liveNames.head.contains(".d"),
      s"straddling delete must rewrite in place: ${liveNames.toSeq}")
    assert(ids(s"SELECT id FROM $cat.ns.t") == (51L to 89L))
    // rewritten sidecar is fresh: complete agg pushdown gives new max
    val agg = spark.sql(s"SELECT max(id) AS mx, count(*) AS n FROM $cat.ns.t")
    assert(agg.queryExecution.executedPlan.toString.contains("complete, sidecar-only"))
    val r0 = agg.collect()(0); assert(r0.getLong(0) == 89L && r0.getLong(1) == 39L)

    // versions: 2 appends + 2 deletes = 4; replay each state
    assert(ids(s"SELECT id FROM $cat.ns.t VERSION AS OF 2") == (1L to 100L))
    assert(ids(s"SELECT id FROM $cat.ns.t VERSION AS OF 3") == (51L to 100L))
    assert(ids(s"SELECT id FROM $cat.ns.t VERSION AS OF 4") == (51L to 89L))
    intercept[Exception](spark.sql(s"SELECT id FROM $cat.ns.t VERSION AS OF 5").collect())
    // timestamp travel to the pre-delete instant
    val tsLit = new java.sql.Timestamp(preDeleteMs).toString
    assert(ids(s"SELECT id FROM $cat.ns.t TIMESTAMP AS OF '$tsLit'") == (1L to 100L))

    // (c) a condition the sidecar filters CANNOT express routes through
    // the group-based row-level rewrite (round 14) — still exact
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id % 2 = 0 AND id >= 80")
    val afterGroupDelete = (51L to 79L) ++ Seq(81L, 83L, 85L, 87L, 89L)
    assert(ids(s"SELECT id FROM $cat.ns.t") == afterGroupDelete,
      "group-rewrite delete must remove exactly the matching rows")
    // the rewrite = one delete version + one appended segment version
    assert(ids(s"SELECT id FROM $cat.ns.t VERSION AS OF 4") == (51L to 89L),
      "pre-rewrite state stays addressable")

    // expiry invalidates pre-delete snapshots but not the current state
    spark.sql(s"CALL $cat.ns.expire_snapshots(table => 'ns.t', older_than_ms => ${System.currentTimeMillis()})")
    intercept[Exception](ids(s"SELECT id FROM $cat.ns.t VERSION AS OF 2"))
    assert(ids(s"SELECT id FROM $cat.ns.t") == afterGroupDelete)
  }

  test("row-level ops: SQL UPDATE and MERGE INTO rewrite only affected segments") {
    val cat = freshCatalog("rlo")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL, v BIGINT NOT NULL)")
    spark.range(1, 51).selectExpr("id", "id AS v").coalesce(1)
      .createOrReplaceTempView("rlo_one")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM rlo_one")
    spark.range(51, 101).selectExpr("id", "id AS v").coalesce(1)
      .createOrReplaceTempView("rlo_two")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM rlo_two")
    val dir = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/t")
    val preSegments = graft.sources.AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    assert(preSegments.length == 2)

    def rows(sql: String): Seq[(Long, Long)] =
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    // UPDATE with an arithmetic condition (not sidecar-translatable):
    // matches live only in segment 1 — runtime group filtering should
    // leave segment 2 untouched
    spark.sql(s"UPDATE $cat.ns.t SET v = v * 100 WHERE id % 25 = 3 AND id < 50")
    val wantAfterUpdate = (1L to 100L).map(i =>
      (i, if (i % 25 == 3 && i < 50) i * 100 else i))
    assert(rows(s"SELECT id, v FROM $cat.ns.t") == wantAfterUpdate,
      "UPDATE must rewrite exactly the matching rows")
    val postUpdate = graft.sources.AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    assert(postUpdate.contains(preSegments(1)),
      s"runtime group filtering must leave the unaffected segment in place: " +
        s"${postUpdate.toSeq} vs ${preSegments.toSeq}")
    assert(!postUpdate.contains(preSegments(0)), "the affected segment must be replaced")

    // MERGE INTO: matched update + not-matched insert, one statement
    spark.range(95, 106).selectExpr("id", "id * 1000 AS v")
      .createOrReplaceTempView("rlo_src")
    spark.sql(s"""
      MERGE INTO $cat.ns.t t USING rlo_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
    """)
    val wantAfterMerge = (1L to 94L).map(i =>
      (i, if (i % 25 == 3 && i < 50) i * 100 else i)) ++
      (95L to 105L).map(i => (i, i * 1000))
    assert(rows(s"SELECT id, v FROM $cat.ns.t") == wantAfterMerge,
      "MERGE must upsert exactly")

    // maintenance invariants held throughout: pre-op states addressable
    assert(rows(s"SELECT id, v FROM $cat.ns.t VERSION AS OF 2")
      == (1L to 100L).map(i => (i, i)),
      "the pre-UPDATE state must remain addressable")
    // and the history grew by exactly the replaced segments
    val hist = new java.io.File(dir, "_history")
    assert(hist.listFiles().count(_.getName.endsWith(".bin")) >= 2,
      "replaced groups must retire to history")
  }

  test("row-level UPDATE on a bucketed table preserves the bucket invariant (SPJ survives)") {
    val cat = freshCatalog("rlob")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.facts (id BIGINT NOT NULL, v BIGINT NOT NULL)
      PARTITIONED BY (bucket(4, id))""")
    spark.sql(s"""CREATE TABLE $cat.ns.dim (id BIGINT NOT NULL, w BIGINT NOT NULL)
      PARTITIONED BY (bucket(4, id))""")
    spark.range(0, 400).selectExpr("id % 100 AS id", "id AS v")
      .createOrReplaceTempView("rlob_facts")
    spark.range(0, 100).selectExpr("id", "id * 10 AS w")
      .createOrReplaceTempView("rlob_dim")
    spark.sql(s"INSERT INTO $cat.ns.facts SELECT * FROM rlob_facts")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT * FROM rlob_dim")

    // group rewrite with a non-translatable condition
    spark.sql(s"UPDATE $cat.ns.facts SET v = v + 1000000 WHERE id % 10 = 3")
    // every live segment still carries a valid bucket ordinal
    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val segs = graft.sources.AvroFrames.listSegments(s"$base/ns/facts")
    assert(segs.nonEmpty && segs.forall(f =>
      graft.sources.AvroFrames.bucketOf(f.getName).exists(b => b >= 0 && b < 4)),
      s"rewritten segments must keep bucket ordinals: ${segs.map(_.getName).toSeq}")
    // rewritten rows landed in the RIGHT buckets (placement == function)
    spark.sql(s"SELECT id, _segment FROM $cat.ns.facts").collect().foreach { r =>
      val want = graft.sources.FrameFunctions.BucketLongBound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(4, r.getLong(0))).intValue
      val got = graft.sources.AvroFrames.bucketOf(r.getString(1)).get
      assert(got == want, s"id ${r.getLong(0)} in bucket $got, function says $want")
    }

    // the storage-partitioned join still plans with zero exchange and
    // computes the updated values
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.sql(s"""
        SELECT f.id, sum(f.v) AS sv, max(d.w) AS w
        FROM $cat.ns.facts f JOIN $cat.ns.dim d ON f.id = d.id
        GROUP BY f.id ORDER BY f.id""")
      val rows = q.collect()
      assert(!q.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        "SPJ must survive a row-level rewrite")
      assert(rows.length == 100)
      val r3 = rows(3) // id 3 matched the update: 4 rows, each +1000000
      assert(r3.getLong(0) == 3L &&
        r3.getLong(1) == (0 until 4).map(k => 3L + 100L * k + 1000000L).sum &&
        r3.getLong(2) == 30L)
      val r4 = rows(4) // id 4 untouched
      assert(r4.getLong(1) == (0 until 4).map(k => 4L + 100L * k).sum)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("storage-partitioned join: two bucketed frame tables join with ZERO exchange") {
    val cat = freshCatalog("spj")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.facts (id BIGINT NOT NULL, v BIGINT NOT NULL)
      PARTITIONED BY (bucket(4, id))""")
    spark.sql(s"""CREATE TABLE $cat.ns.dim (id BIGINT NOT NULL, w BIGINT NOT NULL)
      PARTITIONED BY (bucket(4, id))""")
    spark.range(0, 1000).selectExpr("id % 100 AS id", "id AS v")
      .createOrReplaceTempView("spj_facts")
    spark.range(0, 100).selectExpr("id", "id * 10 AS w")
      .createOrReplaceTempView("spj_dim")
    spark.sql(s"INSERT INTO $cat.ns.facts SELECT * FROM spj_facts")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT * FROM spj_dim")

    // the write produced at most 4 segments per insert: one per bucket
    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val factSegs = graft.sources.AvroFrames.listSegments(s"$base/ns/facts")
    assert(factSegs.nonEmpty && factSegs.length <= 4,
      s"bucketed write must emit <=1 segment per bucket, got ${factSegs.map(_.getName).toSeq}")
    assert(factSegs.forall(f => graft.sources.AvroFrames.bucketOf(f.getName).exists(_ < 4)))

    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val q = spark.sql(s"""
        SELECT f.id, sum(f.v) AS sv, max(d.w) AS w
        FROM $cat.ns.facts f JOIN $cat.ns.dim d ON f.id = d.id
        GROUP BY f.id ORDER BY f.id""")
      val rows = q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned join must not shuffle either side:\n$plan")
      // values: id in 0..99 each 10x in facts; sum v per id; w = id*10
      assert(rows.length == 100)
      val r7 = rows(7)
      assert(r7.getLong(0) == 7L && r7.getLong(2) == 70L)
      assert(r7.getLong(1) == (0 until 10).map(k => 7L + 100L * k).sum)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }

    // the catalog bucket function IS the write placement: parity with
    // Spark's own HashPartitioning id on random keys
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val v = rnd.nextLong(); val n = 1 + rnd.nextInt(64)
      val viaFn = graft.sources.FrameFunctions.BucketLongBound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(n, v)).intValue
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42)
      val expected = { val r = h % n; if (r < 0) r + n else r }
      assert(viaFn == expected, s"bucket($n, $v): $viaFn != $expected")
    }
    // and matches where segments actually landed
    val seen = spark.sql(s"SELECT id, _segment FROM $cat.ns.dim").collect()
    seen.foreach { r =>
      val want = graft.sources.FrameFunctions.BucketLongBound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(4, r.getLong(0))).intValue
      val got = graft.sources.AvroFrames.bucketOf(r.getString(1)).get
      assert(got == want, s"id ${r.getLong(0)} landed in bucket $got, function says $want")
    }

    // PER-BUCKET compaction: a second insert doubles the per-bucket
    // segment count; compact must merge WITHIN buckets only, so the
    // bucket structure (and the zero-exchange join) survives
    spark.sql(s"INSERT INTO $cat.ns.facts SELECT * FROM spj_facts")
    val factsDir = s"$base/ns/facts"
    val preBuckets = graft.sources.AvroFrames.listSegments(factsDir)
      .flatMap(f => graft.sources.AvroFrames.bucketOf(f.getName)).toSeq
    assert(preBuckets.distinct.exists(b => preBuckets.count(_ == b) >= 2),
      "fixture must have a bucket with >= 2 segments before compaction")
    spark.sql(s"CALL $cat.ns.compact(table => 'ns.facts')")
    val post = graft.sources.AvroFrames.listSegments(factsDir)
    val postBuckets = post.flatMap(f => graft.sources.AvroFrames.bucketOf(f.getName)).toSeq
    assert(postBuckets.size == postBuckets.distinct.size,
      s"per-bucket compaction must leave one segment per bucket, got ${post.map(_.getName).toSeq}")
    val saved2 = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q2 = spark.sql(s"""
        SELECT f.id, sum(f.v) AS sv, max(d.w) AS w
        FROM $cat.ns.facts f JOIN $cat.ns.dim d ON f.id = d.id
        GROUP BY f.id ORDER BY f.id""")
      val rows2 = q2.collect()
      assert(!q2.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        "the storage-partitioned join must survive per-bucket compaction")
      // doubled facts: sums double, dim max unchanged
      assert(rows2.length == 100 && rows2(7).getLong(1) ==
        2L * (0 until 10).map(k => 7L + 100L * k).sum && rows2(7).getLong(2) == 70L)
    } finally saved2.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("INSERT INTO ... REPLACE WHERE: filter-based overwrite swaps the slice, history intact") {
    val cat = freshCatalog("rpw")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL, v BIGINT NOT NULL)")
    spark.range(1, 51).selectExpr("id", "id AS v").coalesce(1)
      .createOrReplaceTempView("rpw_one")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM rpw_one")
    Thread.sleep(30)
    spark.range(51, 101).selectExpr("id", "id AS v").coalesce(1)
      .createOrReplaceTempView("rpw_two")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM rpw_two")
    Thread.sleep(30)
    val preMs = System.currentTimeMillis()
    Thread.sleep(30)

    // replace the id >= 40 slice with doubled values
    spark.range(40, 101).selectExpr("id", "id * 2 AS v").coalesce(1)
      .createOrReplaceTempView("rpw_fix")
    spark.sql(s"INSERT INTO $cat.ns.t REPLACE WHERE id >= 40 SELECT * FROM rpw_fix")

    def rows(sql: String): Seq[(Long, Long)] =
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val got = rows(s"SELECT id, v FROM $cat.ns.t")
    val want = (1L until 40L).map(i => (i, i)) ++ (40L to 100L).map(i => (i, i * 2))
    assert(got == want, s"replace slice must swap exactly: got ${got.take(5)}...")

    // the delete half used maintenance (history + manifest), so the
    // pre-replace state is still addressable
    val tsLit = new java.sql.Timestamp(preMs).toString
    assert(rows(s"SELECT id, v FROM $cat.ns.t TIMESTAMP AS OF '$tsLit'")
      == (1L to 100L).map(i => (i, i)),
      "TIMESTAMP AS OF must reach the pre-replace state")
    // segment 2 (51..100) was provably all-match -> metadata-only
    // delete; segment 1 (1..50) straddles -> one .d rewrite
    val dir = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat.base"), "ns/t")
    val names = graft.sources.AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName)
    assert(names.count(_.contains(".d")) == 1,
      s"exactly the straddling segment rewrites: ${names.toSeq}")

    // unsupported replace condition fails at analysis, changes nothing
    intercept[Exception](spark.sql(
      s"INSERT INTO $cat.ns.t REPLACE WHERE id % 2 = 0 SELECT * FROM rpw_fix"))
    assert(rows(s"SELECT id, v FROM $cat.ns.t") == want)
  }

  test("scan reports CBO-grade column statistics from the sidecars") {
    import scala.jdk.CollectionConverters._
    val cat = freshCatalog("cbo")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL, tag STRING)")
    spark.range(1, 101)
      .selectExpr("id", "IF(id % 10 = 0, NULL, CONCAT('t', id)) AS tag")
      .coalesce(2).createOrReplaceTempView("cbo_src")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM cbo_src")

    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of(
      "path", s"$base/ns/t",
      "avroSchema", graft.sources.AvroFrames.avroSchemaFor(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("tag",
            org.apache.spark.sql.types.StringType, nullable = true))), "t")))
    val provider = new graft.sources.AvroFrameDataSource()
    val table = provider.getTable(provider.inferSchema(opts), Array.empty, opts)
    val scan = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(opts).build()
    val stats = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 100L)
    val cs = stats.columnStats()
    assert(cs.size() == 2, s"both columns must report stats, got ${cs.keySet()}")
    val idStats = cs.entrySet().asScala.find(_.getKey.describe() == "id").get.getValue
    assert(idStats.nullCount().getAsLong == 0L)
    assert(idStats.min().get() == Long.box(1L) && idStats.max().get() == Long.box(100L))
    val tagStats = cs.entrySet().asScala.find(_.getKey.describe() == "tag").get.getValue
    assert(tagStats.nullCount().getAsLong == 10L, "every 10th tag is NULL")
    assert(tagStats.min().get().toString == "t1" && tagStats.max().get().toString == "t99")
    // DESCRIBE EXTENDED surfaces the wire contract
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.ns.t").collect().map(_.mkString("|"))
    assert(desc.exists(_.contains("schemaId")), s"properties must surface: ${desc.toSeq.takeRight(5)}")
  }

  test("composite filter pushdown: OR/NOT/IN push with exact three-valued null semantics") {
    val cat = freshCatalog("tri")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL, tag STRING)")
    spark.range(1, 101)
      .selectExpr("id", "IF(id % 10 = 0, NULL, CONCAT('t', id % 7)) AS tag")
      .coalesce(1).createOrReplaceTempView("tri_src")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM tri_src")

    def ids(where: String): Seq[Long] =
      spark.sql(s"SELECT id FROM $cat.ns.t WHERE $where")
        .collect().map(_.getLong(0)).sorted.toSeq
    def oracle(where: String): Seq[Long] =
      spark.sql(s"SELECT id FROM tri_src WHERE $where")
        .collect().map(_.getLong(0)).sorted.toSeq
    // OR pushes into the scan (visible in the plan) and matches the
    // in-memory relation exactly, NULL tags included
    val q = spark.sql(s"SELECT id FROM $cat.ns.t WHERE id <= 5 OR id >= 95")
    assert(q.queryExecution.executedPlan.toString.contains("Or("),
      "disjunction must reach the scan")
    Seq(
      "id <= 5 OR id >= 95",
      "NOT (tag = 't1')",          // NULL tag is UNKNOWN -> dropped
      "tag IN ('t1', 't3') OR tag IS NULL",
      "NOT (tag IN ('t1', 't3'))", // 3VL through IN
      "(id < 20 AND tag = 't2') OR (id > 80 AND tag IS NOT NULL)"
    ).foreach { w => assert(ids(w) == oracle(w), s"pushdown parity broke for: $w") }

    // OR range delete takes the METADATA-ONLY path on range-partitioned
    // segments whose sidecars prove each disjunct
    val cat2 = freshCatalog("tri2")
    spark.sql(s"CREATE NAMESPACE $cat2.ns")
    spark.sql(s"CREATE TABLE $cat2.ns.t (id BIGINT NOT NULL)")
    spark.range(1, 101).selectExpr("id").repartitionByRange(4, col("id"))
      .createOrReplaceTempView("tri2_src")
    spark.sql(s"INSERT INTO $cat2.ns.t SELECT * FROM tri2_src")
    val dir2 = new java.io.File(spark.conf.get(s"spark.sql.catalog.$cat2.base"), "ns/t")
    assert(graft.sources.AvroFrames.listSegments(dir2.getAbsolutePath).length == 4)
    // both END quartiles match one disjunct entirely -> retire
    // metadata-only; the middle two match neither -> untouched
    spark.sql(s"DELETE FROM $cat2.ns.t WHERE id <= 25 OR id > 75")
    val live2 = graft.sources.AvroFrames.listSegments(dir2.getAbsolutePath).map(_.getName)
    assert(live2.length == 2 && !live2.exists(_.contains(".d")),
      s"OR range delete must be metadata-only on covered segments: ${live2.toSeq}")
    assert(spark.sql(s"SELECT id FROM $cat2.ns.t").collect().map(_.getLong(0)).sorted.toSeq
      == (26L to 75L))
  }

  test("catalog INSERT OVERWRITE truncates through the commit protocol") {
    val cat = freshCatalog("ovw")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT NOT NULL)")
    spark.range(1, 11).createOrReplaceTempView("src_ten")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT id FROM src_ten")
    spark.range(100, 103).createOrReplaceTempView("src_three")
    spark.sql(s"INSERT OVERWRITE $cat.ns.t SELECT id FROM src_three")
    assert(spark.sql(s"SELECT id FROM $cat.ns.t").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(100L, 101L, 102L))
  }

  /** Round 15, SupportsReportOrdering: bucketed + `sortedBy` tables —
    * the write sorts within each bucket task, the scan reports the
    * per-partition ordering, and the storage-partitioned sort-merge
    * join on the sort column elides BOTH exchanges AND both sorts.
    */
  test("sorted bucketed tables: SPJ sort-merge join elides exchanges AND sorts") {
    val cat = freshCatalog("sortspj")
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.facts (id BIGINT NOT NULL, v BIGINT NOT NULL)
      PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('sortedBy'='id')""")
    spark.sql(s"""CREATE TABLE $cat.ns.dim (id BIGINT NOT NULL, w BIGINT NOT NULL)
      PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('sortedBy'='id')""")
    spark.range(0, 1000).selectExpr("id % 100 AS id", "id AS v")
      .createOrReplaceTempView("sspj_facts")
    spark.range(0, 100).selectExpr("id", "id * 10 AS w")
      .createOrReplaceTempView("sspj_dim")
    spark.sql(s"INSERT INTO $cat.ns.facts SELECT * FROM sspj_facts")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT * FROM sspj_dim")

    // the write really sorted each segment (raw read-back check)
    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val ids = spark.sql(s"SELECT id, _segment FROM $cat.ns.facts").collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    ids.values.foreach { per =>
      val seq = per.map(_._2).toSeq
      assert(seq == seq.sorted, "each segment must be written sorted")
    }

    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.join.preferSortMergeJoin")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      val q = spark.sql(s"""
        SELECT f.id, f.v, d.w
        FROM $cat.ns.facts f JOIN $cat.ns.dim d ON f.id = d.id""")
      val rows = q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"SPJ must not shuffle either side:\n$plan")
      assert(!plan.contains("Sort "),
        s"reported per-partition ordering must elide the join sorts:\n$plan")
      assert(rows.length == 1000)
      assert(rows.map(r => r.getLong(1) % 100 == r.getLong(0) &&
        r.getLong(2) == r.getLong(0) * 10).forall(identity))

      // a second insert (two segments per bucket) drops the ordering
      // claim — the join must still be CORRECT, with sorts back
      spark.sql(s"INSERT INTO $cat.ns.facts SELECT * FROM sspj_facts")
      val q2 = spark.sql(s"""
        SELECT f.id, count(*) AS n
        FROM $cat.ns.facts f JOIN $cat.ns.dim d ON f.id = d.id
        GROUP BY f.id""")
      val n2 = q2.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(n2.values.forall(_ == 20L), s"post-second-insert join wrong: ${n2.take(3)}")
      assert(q2.queryExecution.executedPlan.toString.contains("Sort"),
        "a bucket with two segments must re-sort (claim dropped)")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
