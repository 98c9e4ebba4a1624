package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFrames, FrameDv, FrameMaintenance, FrameStatsLedger}

/** Round-16 automatic deletion-vector folding (VERDICT r15 item 4):
  * a delete-heavy merge-on-read table must not accumulate unbounded
  * read amplification — once a segment's cumulative vector covers
  * `dvFoldThreshold` of its rows (default 0.5), the next merge-on-read
  * delete's maintenance pass folds EXACTLY that segment into real
  * bytes (a version-neutral single-member compaction). Sparse deletes
  * below the threshold keep the round-15 zero-rewrite behavior.
  */
class FrameDvFoldSpec extends AnyFunSuite with SparkFixture {

  private val schemaJson = AvroFrames.avroSchemaFor(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType, nullable = false))),
    "t")

  private def writeRows(dir: String, from: Long, to: Long): Unit =
    spark.range(from, to).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1)
      .write.format("graft.sources.AvroFrameDataSource")
      .option("path", dir).option("avroSchema", schemaJson)
      .mode("append").save()

  private def ids(dir: String): Seq[Long] =
    spark.read.format("graft.sources.AvroFrameDataSource")
      .option("path", dir).option("avroSchema", schemaJson).load()
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def dvNames(dir: java.io.File): Seq[String] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(FrameDv.isDvName).sorted.toSeq

  private def mor(dir: java.io.File, f: org.apache.spark.sql.sources.Filter): Unit =
    FrameMaintenance.deleteWhereMoR(spark, dir, schemaJson,
      AvroFrames.DefaultSchemaId, Array(f))

  test("repeated sparse deletes cross the threshold and trigger a fold") {
    val dir = Files.createTempDirectory("dvfold").toFile
    writeRows(dir.toString, 0, 100)   // one 100-row segment
    writeRows(dir.toString, 100, 200) // a second segment, untouched throughout
    val seg2 = AvroFrames.listSegments(dir.toString)(1).getName

    // 30% deleted: below the 0.5 default — vector stays, zero rewrites
    mor(dir, org.apache.spark.sql.sources.LessThan("id", 30L))
    assert(dvNames(dir).size == 1, s"below threshold must keep the vector: ${dvNames(dir)}")
    assert(ids(dir.toString) == (30L until 200L))

    // cumulative 60%: crosses the threshold — the maintenance pass
    // folds THAT segment (single-member compaction), the other segment
    // is untouched
    mor(dir, org.apache.spark.sql.sources.LessThan("id", 60L))
    assert(dvNames(dir).isEmpty,
      s"over-threshold vector must fold into real bytes: ${dvNames(dir)}")
    val names = AvroFrames.listSegments(dir.toString).map(_.getName)
    assert(names.exists(_.matches(".*\\.c\\d+$")), s"folded segment renamed .c<gen>: ${names.toSeq}")
    assert(names.contains(seg2), "the under-threshold segment must be untouched")
    assert(ids(dir.toString) == (60L until 200L))

    // fold is version-neutral: versions = 2 appends + 2 dv deletes
    assert(FrameMaintenance.totalVersions(dir) == 4)
    // time travel through the fold stays exact (substitution covers it)
    assert(FrameMaintenance.resolveVersion(dir, 3).nonEmpty)
    // ledger in lockstep after the fold
    assert(FrameStatsLedger.read(dir).get.keySet ==
      AvroFrames.listSegments(dir.toString).map(_.getName).toSet)
    // read amplification bound: at most one vector per live segment,
    // and here zero — scans open no vectors at all
    assert(AvroFrames.liveDvMap(dir.toString).isEmpty)
  }

  test("ALTER TABLE SET TBLPROPERTIES flips behavioral knobs after CREATE (round 16)") {
    val base = Files.createTempDirectory("dvfold-alter").toString
    val cat = "fdvalter_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    // born copy-on-write, no bloom config
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1)
      .createOrReplaceTempView("dvalter_src")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM dvalter_src")
    val dir = new java.io.File(base, "corpus/t")

    // CoW delete rewrites (no vector)
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE id = 0")
    assert(dvNames(dir).isEmpty, "copy-on-write delete must not mint vectors")

    // switch the delete strategy + pin a no-fold threshold, post-create
    spark.sql(s"""ALTER TABLE $cat.corpus.t SET TBLPROPERTIES (
      'deleteMode'='merge-on-read', 'dvFoldThreshold'='2.0')""")
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.corpus.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE id = 1")
    assert(dvNames(dir).size == 1,
      s"post-ALTER deletes must be merge-on-read (desc: ${desc.get("Table Properties")})")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 98L)

    // bloom config added post-create applies to FUTURE writes; analyze
    // retrofits the existing segments
    spark.sql(s"""ALTER TABLE $cat.corpus.t SET TBLPROPERTIES (
      'bloomColumns'='id', 'bloomExpectedItems'='1000')""")
    spark.sql(s"CALL $cat.sys.analyze(table => 'corpus.t', bloom_columns => 'id', " +
      "bloom_expected_items => 1000)")
    assert(graft.sources.AvroFrames.listSegments(dir.toString)
      .forall(f => graft.sources.AvroFrameStats.readFull(f).exists(_._3.contains("id"))),
      "analyze must retrofit blooms after the property change")

    // UNSET restores the copy-on-write default
    spark.sql(s"ALTER TABLE $cat.corpus.t UNSET TBLPROPERTIES ('deleteMode')")
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE id = 2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 97L)

    // physical-layout and identity properties stay immutable
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t SET TBLPROPERTIES ('sortedBy'='id')")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t SET TBLPROPERTIES ('path'='/elsewhere')")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t SET TBLPROPERTIES ('deleteMode'='bogus')")
    }
  }

  test("threshold > 1 opts out; explicit threshold engages through SQL DELETE") {
    val base = Files.createTempDirectory("dvfold-sql").toString
    val cat = "fdvfold_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    // aggressive policy: fold at 20%
    spark.sql(s"""CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)
      TBLPROPERTIES ('deleteMode'='merge-on-read', 'dvFoldThreshold'='0.2')""")
    spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1)
      .createOrReplaceTempView("dvfold_sql_src")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM dvfold_sql_src")
    val dir = new java.io.File(base, "corpus/t")

    spark.sql(s"DELETE FROM $cat.corpus.t WHERE id < 25") // 25% >= 0.2 -> fold
    assert(dvNames(dir).isEmpty, "SQL DELETE over the table threshold must fold")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) == 75L)

    // opt-out table: same delete keeps the vector
    spark.sql(s"""CREATE TABLE $cat.corpus.u (id BIGINT NOT NULL, v DOUBLE NOT NULL)
      TBLPROPERTIES ('deleteMode'='merge-on-read', 'dvFoldThreshold'='2.0')""")
    spark.sql(s"INSERT INTO $cat.corpus.u SELECT * FROM dvfold_sql_src")
    spark.sql(s"DELETE FROM $cat.corpus.u WHERE id < 75")
    assert(dvNames(new java.io.File(base, "corpus/u")).size == 1,
      "threshold > 1 must disable the auto-fold")
  }
}
