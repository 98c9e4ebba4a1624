package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFrames, FrameChanges, FrameMaintenance}

/** Z-order clustered rewrite ([[FrameMaintenance.rewriteClustered]] /
  * `CALL rewrite_clustered`): semantically invisible re-layout that
  * makes sidecar pruning effective on EVERY cluster column at once.
  */
class FrameClusterSpec extends AnyFunSuite with SparkFixture {

  private def freshCatalog(tag: String): (String, String) = {
    val base = Files.createTempDirectory(s"frame-z-$tag").toString
    val cat = s"fz_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    (cat, base)
  }

  /** 4096 rows over a (u, t) grid, ingested as 16 t-range segments —
    * the streaming layout: t prunes, u cannot.
    */
  private def buildGrid(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.g (id BIGINT NOT NULL, u BIGINT NOT NULL, t BIGINT NOT NULL, v DOUBLE NOT NULL)")
    spark.range(0, 4096)
      .selectExpr("id", "id % 64 AS u", "CAST(id / 64 AS BIGINT) AS t",
        "CAST(id AS DOUBLE) AS v")
      .repartitionByRange(16, org.apache.spark.sql.functions.col("t"))
      .createOrReplaceTempView("z_grid_src")
    spark.sql(s"INSERT INTO $cat.corpus.g SELECT * FROM z_grid_src")
  }

  private def segmentsPlanned(q: DataFrame): (Int, Int) = {
    val desc = q.queryExecution.executedPlan.toString
    val m = "Segments=(\\d+)/(\\d+) after stat-pruning".r.findFirstMatchIn(desc)
    assert(m.isDefined, s"no AvroFrameScan segment count in plan:\n$desc")
    (m.get.group(1).toInt, m.get.group(2).toInt)
  }

  test("z-order rewrite: invisible to values/versions/feed, prunes on both dimensions") {
    val (cat, base) = freshCatalog("grid")
    buildGrid(cat)
    val dir = new java.io.File(base, "corpus/g")

    def fullSorted(): Seq[(Long, Long, Long, Double)] =
      spark.sql(s"SELECT id, u, t, v FROM $cat.corpus.g").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val before = fullSorted()
    val versionsBefore = FrameMaintenance.totalVersions(dir)

    // ingest layout: a t-slice prunes, a u-slice cannot (u spans every segment)
    val uSlicePre = spark.sql(s"SELECT count(*) AS n FROM $cat.corpus.g WHERE u < 16")
    assert(segmentsPlanned(uSlicePre)._1 == segmentsPlanned(uSlicePre)._2,
      "pre-cluster, a u-filter must not prune (that is the point of the rewrite)")

    val res = spark.sql(s"CALL $cat.corpus.rewrite_clustered(" +
      s"table => 'corpus.g', by => 'u,t', target_segments => 16)").collect()(0)
    assert(res.getInt(0) == 16 && res.getInt(1) == 16,
      s"expected 16 z-segments replacing 16, got $res")

    // same rows, same versions, zero change-feed rows
    assert(fullSorted() == before)
    assert(FrameMaintenance.totalVersions(dir) == versionsBefore)
    val schemaJson = graft.sources.AvroFrames.avroSchemaFor(
      spark.table(s"$cat.corpus.g").schema, "g")
    assert(FrameChanges.read(spark, dir.getAbsolutePath, schemaJson,
      AvroFrames.DefaultSchemaId, versionsBefore).count() == 0)

    // time travel to a pre-cluster version still resolves (from _history/)
    val v1 = spark.sql(s"SELECT count(*) AS n FROM $cat.corpus.g VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(v1 > 0 && v1 < 4096)

    // post-cluster: BOTH single-dimension quarter-slices prune
    val uSlice = spark.sql(s"SELECT sum(v) FROM $cat.corpus.g WHERE u < 16")
    val (uKept, uTotal) = segmentsPlanned(uSlice)
    assert(uTotal == 16 && uKept <= 8, s"u-slice kept $uKept/$uTotal, expected <= 8")
    val tSlice = spark.sql(s"SELECT sum(v) FROM $cat.corpus.g WHERE t < 16")
    val (tKept, tTotal) = segmentsPlanned(tSlice)
    assert(tTotal == 16 && tKept <= 8, s"t-slice kept $tKept/$tTotal, expected <= 8")
    // and the 2-D cell keeps fewer than either slice alone
    val cell = spark.sql(s"SELECT sum(v) FROM $cat.corpus.g WHERE u < 16 AND t < 16")
    val (cKept, _) = segmentsPlanned(cell)
    assert(cKept <= math.min(uKept, tKept) && cKept <= 4,
      s"2-D cell kept $cKept, expected <= 4")

    // pruned queries still compute exact values
    assert(cell.collect()(0).getDouble(0) ==
      (0 until 4096).filter(i => i % 64 < 16 && i / 64 < 16).map(_.toDouble).sum)
  }

  test("bucketed tables refuse z-ordering; cluster columns validated") {
    val (cat, _) = freshCatalog("guard")
    spark.sql(s"CREATE NAMESPACE $cat.corpus")
    spark.sql(s"CREATE TABLE $cat.corpus.b (id BIGINT NOT NULL, v DOUBLE NOT NULL) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("z_guard_src")
    spark.sql(s"INSERT INTO $cat.corpus.b SELECT * FROM z_guard_src")
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $cat.corpus.rewrite_clustered(table => 'corpus.b', " +
        "by => 'id', target_segments => 4)").collect()
    }
    assert(e1.getMessage.contains("BUCKETED"))

    spark.sql(s"CREATE TABLE $cat.corpus.s (id BIGINT NOT NULL, tag STRING NOT NULL)")
    spark.range(0, 10).selectExpr("id", "'x' AS tag").createOrReplaceTempView("z_guard_src2")
    spark.sql(s"INSERT INTO $cat.corpus.s SELECT * FROM z_guard_src2")
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.corpus.rewrite_clustered(table => 'corpus.s', " +
        "by => 'tag', target_segments => 2)").collect()
    }
    assert(e2.getMessage.contains("numeric"))

    // round 15: the refusal is enforced at the OPERATION, not just the
    // SQL entry point — a direct FrameMaintenance call on the bucketed
    // log must hit the same guard (the descriptor probe), not silently
    // destroy the one-bucket-per-segment invariant
    val dir = new java.io.File(
      spark.conf.get(s"spark.sql.catalog.$cat.base"), "corpus/b")
    val schemaJson = graft.sources.AvroFrames.avroSchemaFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType, nullable = false))), "b")
    val e3 = intercept[IllegalArgumentException] {
      graft.sources.FrameMaintenance.rewriteClustered(
        spark, dir, schemaJson, 1, Seq("id"), 4)
    }
    assert(e3.getMessage.contains("BUCKETED"))
  }
}
