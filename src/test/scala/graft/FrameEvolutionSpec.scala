package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFrames, FrameChanges, FrameMaintenance}

/** Schema evolution on the frame catalog: `ALTER TABLE ADD COLUMNS` —
  * already-written frames keep their original schema version (the
  * embedded Confluent id is the version pointer), the descriptor
  * appends a new registry entry, and every reader resolves each
  * frame's writer schema against the CURRENT schema (old frames read
  * the new columns as NULL). Nothing is rewritten.
  */
class FrameEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def freshCatalog(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"frame-evo-$tag").toString
    val cat = s"fevo_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    (cat, base)
  }

  test("ADD COLUMNS: old frames read NULL, new frames carry values, pushdown stays exact") {
    val (cat, base) = freshCatalog("basic")
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    spark.range(0, 50).coalesce(1).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("evo_src_0")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM evo_src_0")

    spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (tag STRING, w DOUBLE)")
    assert(spark.table(s"$cat.corpus.t").schema.fieldNames.toSeq ==
      Seq("id", "v", "tag", "w"))

    spark.range(50, 80).coalesce(1)
      .selectExpr("id", "CAST(id AS DOUBLE) AS v", "CONCAT('t', id) AS tag",
        "CAST(id * 10 AS DOUBLE) AS w")
      .createOrReplaceTempView("evo_src_1")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM evo_src_1")

    // mixed read: old rows surface NULLs for the added columns
    val rows = spark.sql(s"SELECT id, tag, w FROM $cat.corpus.t").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(rows.length == 80)
    assert(rows.take(50).forall { case (_, t, w) => t.isEmpty && w.isEmpty })
    assert(rows.drop(50).forall { case (id, t, w) =>
      t.contains(s"t$id") && w.contains(id * 10.0) })

    // filter pushdown on the NEW column: 3VL drops old NULL rows exactly
    val q = spark.sql(s"SELECT id FROM $cat.corpus.t WHERE w >= 600.0")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(w,600.0)"),
      s"new-column filter must push into the scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (60L to 79L))

    // aggregates over mixed frames: COUNT(new col) counts only new rows
    // (old segments' sidecars lack the field, so they decode-fallback)
    val agg = spark.sql(s"SELECT count(*), count(tag), max(w) FROM $cat.corpus.t")
      .collect()(0)
    assert(agg.getLong(0) == 80L && agg.getLong(1) == 30L && agg.getDouble(2) == 790.0)

    // DELETE on the new column: old frames (NULL w) must SURVIVE
    spark.sql(s"DELETE FROM $cat.corpus.t WHERE w >= 700.0")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t").collect()(0).getLong(0) ==
      80L - 10L)

    // change feed across the evolution: all frames decode, old ones with NULLs
    val dir = new java.io.File(base, "corpus/t")
    val cat2 = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.FrameCatalog]
    val (curSchema, curId) = cat2.wireSchemaOf("corpus.t")
    assert(curId == 2, s"one ALTER should mint schema id 2, got $curId")
    val hist = cat2.historyJsonOf("corpus.t")
    assert(hist.isDefined, "evolved table must expose a schema history")
    val cdf = FrameChanges.read(spark, dir.getAbsolutePath, curSchema, curId, 0,
      None, hist)
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") == 80L && byType("delete") == 10L, s"got $byType")
  }

  test("rejections: non-nullable, duplicate, non-ADD changes; double evolution works") {
    val (cat, _) = freshCatalog("guard")
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("evo_guard_src")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM evo_guard_src")

    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (x BIGINT NOT NULL)")
    }
    assert(e1.getMessage.contains("nullable"))
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (v DOUBLE)")
    }
    assert(e2.getMessage != null) // duplicate (Spark or catalog rejects)
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t ALTER COLUMN v TYPE STRING")
    }
    assert(e3.getMessage.contains("CTAS") || e3.getMessage.contains("retype") ||
      e3.getMessage != null) // retype rejected (Spark or catalog)

    // two evolutions: three registry entries, everything still reads
    spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (a STRING)")
    spark.range(10, 20).selectExpr("id", "CAST(id AS DOUBLE) AS v", "'x' AS a")
      .createOrReplaceTempView("evo_guard_src2")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM evo_guard_src2")
    spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (b BIGINT)")
    spark.range(20, 30).selectExpr("id", "CAST(id AS DOUBLE) AS v", "'y' AS a", "id AS b")
      .createOrReplaceTempView("evo_guard_src3")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM evo_guard_src3")

    val r = spark.sql(
      s"SELECT count(*), count(a), count(b), sum(b) FROM $cat.corpus.t").collect()(0)
    assert(r.toSeq == Seq(30L, 20L, 10L, (20L until 30L).sum))
  }

  /** Round 15: RENAME COLUMN renames the field in every stored schema
    * (names are metadata — Avro bytes carry none), DROP COLUMN mints a
    * new registry entry and tombstones the name in history so a later
    * re-ADD reads NULL for pre-drop frames instead of resurrecting
    * their values.
    */
  test("RENAME COLUMN: old frames keep their values under the new name, nothing rewritten") {
    val (cat, base) = freshCatalog("ren")
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, v DOUBLE NOT NULL)")
    spark.range(0, 40).coalesce(1).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("ren_src_0")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM ren_src_0")
    val dir = new java.io.File(base, "corpus/t")
    val segsBefore = AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName).toSeq

    spark.sql(s"ALTER TABLE $cat.corpus.t RENAME COLUMN v TO amount")
    assert(spark.table(s"$cat.corpus.t").schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName).toSeq == segsBefore,
      "RENAME must rewrite nothing")

    // old values surface under the new name; writes under it work
    spark.range(40, 50).coalesce(1).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS amount")
      .createOrReplaceTempView("ren_src_1")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM ren_src_1")
    val got = spark.sql(s"SELECT id, amount FROM $cat.corpus.t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == ((0L until 40L).map(i => (i, i.toDouble)) ++
      (40L until 50L).map(i => (i, i * 2.0))))
    // filters on the renamed column stay exact (old sidecars keyed by
    // the old name just stop pruning — conservative)
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t WHERE amount >= 39.0")
      .collect()(0).getLong(0) == 1 + 10)

    // rename composes with evolution: the history entries renamed too
    spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (tag STRING)")
    spark.sql(s"ALTER TABLE $cat.corpus.t RENAME COLUMN amount TO amt")
    assert(spark.sql(s"SELECT sum(amt) FROM $cat.corpus.t").collect()(0).getDouble(0) ==
      (0 until 40).map(_.toDouble).sum + (40 until 50).map(_ * 2.0).sum)

    // guards
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t RENAME COLUMN amt TO id") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.corpus.t RENAME COLUMN nope TO x") }
  }

  test("DROP COLUMN + re-ADD: pre-drop values never resurrect") {
    val (cat, base) = freshCatalog("drop")
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.t (id BIGINT NOT NULL, tag STRING NOT NULL, v DOUBLE NOT NULL)")
    spark.range(0, 30).coalesce(1)
      .selectExpr("id", "CONCAT('old', id) AS tag", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("drop_src_0")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM drop_src_0")
    val dir = new java.io.File(base, "corpus/t")
    val segsBefore = AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName).toSeq

    spark.sql(s"ALTER TABLE $cat.corpus.t DROP COLUMN tag")
    assert(spark.table(s"$cat.corpus.t").schema.fieldNames.toSeq == Seq("id", "v"))
    assert(AvroFrames.listSegments(dir.getAbsolutePath).map(_.getName).toSeq == segsBefore,
      "DROP must rewrite nothing")
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $cat.corpus.t").collect()(0).toSeq ==
      Seq(30L, (0 until 30).map(_.toDouble).sum))

    // writes without the column, then RE-ADD the same name
    spark.range(30, 40).coalesce(1).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("drop_src_1")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM drop_src_1")
    spark.sql(s"ALTER TABLE $cat.corpus.t ADD COLUMNS (tag STRING)")
    spark.range(40, 45).coalesce(1)
      .selectExpr("id", "CAST(id AS DOUBLE) AS v", "CONCAT('new', id) AS tag")
      .createOrReplaceTempView("drop_src_2")
    spark.sql(s"INSERT INTO $cat.corpus.t SELECT * FROM drop_src_2")

    // THE invariant: pre-drop 'oldN' values must NOT come back — only
    // the 5 post-re-add rows carry tag
    val tags = spark.sql(s"SELECT id, tag FROM $cat.corpus.t").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(tags.count(_._2.isDefined) == 5,
      s"pre-drop values resurrected: ${tags.filter(_._2.isDefined)}")
    assert(tags.filter(_._2.isDefined).map(_._1) == (40L until 45L))
    assert(spark.sql(s"SELECT count(tag) FROM $cat.corpus.t").collect()(0).getLong(0) == 5)

    // change feed decodes across the drop/re-add generations
    val (schemaJson, schemaId) = {
      val c = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[graft.sources.FrameCatalog]
      c.wireSchemaOf("corpus.t")
    }
    val hist = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.FrameCatalog].historyJsonOf("corpus.t")
    val feed = FrameChanges.read(spark, dir.getAbsolutePath, schemaJson, schemaId,
      0, None, hist)
    assert(feed.filter(col("_change_type") === "insert").count() == 45)
    assert(feed.filter(col("tag").isNotNull).count() == 5)

    // guards: bucket/bloom/last-column drops refuse
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.corpus.t DROP COLUMN nope") }
    spark.sql(s"ALTER TABLE $cat.corpus.t DROP COLUMN IF EXISTS nope") // no-op, no throw
  }
}
