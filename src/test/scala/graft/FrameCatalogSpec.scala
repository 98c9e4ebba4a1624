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
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.ns.a ADD COLUMN x BIGINT"))
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
}
