package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.{packFloats, unpackFloats}
import graft.operators.AnnIndex

/** Round-17 persisted incremental ANN index (VERDICT r16 item 2): the
  * IVF index lives as frame tables, an append-only delta refreshes it
  * in O(changed vectors) from the corpus change feed, the incremental
  * fold equals a from-scratch rebuild bit-exactly (integer sufficient
  * statistics), and the crash-recovery intent makes the apply
  * exactly-once.
  */
class AnnIndexSpec extends AnyFunSuite with SparkFixture {

  private val Dim = 8

  /** Deterministic pseudo-vectors: component derived from (id, pos),
    * clustered by label so probe rankings are stable.
    */
  private def vectorsDf(from: Long, to: Long): DataFrame = {
    val posCols = (0 until Dim).map(p =>
      ((col("id") % 7 + lit(p * 3) + (col("id") % 8) * 100).cast("float") / 50.0f)
        .cast("float"))
    spark.range(from, to)
      .select(col("id").as("vec_id"), (col("id") % 8).as("label"),
        array(posCols: _*).as("embedding"))
  }

  private def freshCatalog(tag: String): String = {
    val base = Files.createTempDirectory(s"annix-$tag").toString
    val cat = s"annix_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.FrameCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.corpus")
    spark.sql(s"""CREATE TABLE $cat.corpus.vectors (
      vec_id BIGINT NOT NULL, label BIGINT NOT NULL, vec BINARY NOT NULL)""")
    cat
  }

  private def insertVectors(cat: String, df: DataFrame, view: String): Unit = {
    df.select(col("vec_id"), col("label"), packFloats(col("embedding")).as("vec"))
      .createOrReplaceTempView(view)
    spark.sql(s"INSERT INTO $cat.corpus.vectors SELECT * FROM $view")
    ()
  }

  private def queriesDf(n: Long): DataFrame =
    vectorsDf(0, n).select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  private def cellsState(cat: String): Set[(Long, Int, Long, Long)] =
    spark.table(s"$cat.corpus.annix_cells")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  private def searchRows(cat: String): Seq[(Long, Long, Long)] =
    AnnIndex.search(spark, cat, "corpus.annix", queriesDf(5), k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("pack_floats/unpack_floats roundtrip is bit-exact (incl. negatives and tiny values)") {
    val vals = Seq(0.0f, -0.0f, 1.5f, -3.25f, 1e-30f, -1e30f, Float.MinPositiveValue, 3.1415927f)
    val df = spark.range(1).select(
      unpackFloats(packFloats(array(vals.map(lit): _*))).as("rt"))
    val rt = df.collect()(0).getSeq[Float](0)
    assert(rt.length == vals.length)
    rt.zip(vals).foreach { case (a, b) =>
      assert(java.lang.Float.floatToRawIntBits(a) == java.lang.Float.floatToRawIntBits(b),
        s"bit drift: $a vs $b")
    }
    // SQL surface too
    GraftFunctions.register(spark)
    val sql = spark.sql("SELECT unpack_floats(pack_floats(array(CAST(1.5 AS FLOAT), CAST(-2.5 AS FLOAT))))")
      .collect()(0).getSeq[Float](0)
    assert(sql == Seq(1.5f, -2.5f))
  }

  test("incremental refresh equals rebuild bit-exactly, and costs O(delta)") {
    val cat = freshCatalog("incr")
    insertVectors(cat, vectorsDf(0, 200), "annix_incr_base")
    AnnIndex.create(spark, cat, "corpus.annix")
    val r0 = AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r0.changedRows == 200L, s"initial build folds the whole corpus: $r0")
    val baseline = searchRows(cat)
    assert(baseline.nonEmpty)

    // append a delta; the refresh processes ONLY it
    insertVectors(cat, vectorsDf(200, 230), "annix_incr_delta")
    val r1 = AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r1.changedRows == 30L,
      s"append-only delta must refresh in O(changed vectors), got $r1")
    val incrCells = cellsState(cat)
    val incrSearch = searchRows(cat)

    // a from-scratch rebuild lands on the IDENTICAL integer state
    val r2 = AnnIndex.rebuild(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r2.changedRows == 230L)
    assert(cellsState(cat) == incrCells,
      "integer sufficient statistics: incremental fold == rebuild, bit-exact")
    assert(searchRows(cat) == incrSearch)

    // postings carry every vector exactly once
    val n = spark.table(s"$cat.corpus.annix_postings").count()
    assert(n == 230L)

    // a no-op refresh is free
    val r3 = AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r3.changedRows == 0L && r3.fromVersion == r3.toVersion)
  }

  test("corpus deletes flow through: vectors leave the postings and the cell sums") {
    val cat = freshCatalog("del")
    insertVectors(cat, vectorsDf(0, 100), "annix_del_base")
    AnnIndex.create(spark, cat, "corpus.annix")
    AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    spark.sql(s"DELETE FROM $cat.corpus.vectors WHERE vec_id >= 90")
    val r = AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r.changedRows == 10L, s"delete delta only: $r")
    assert(spark.table(s"$cat.corpus.annix_postings").count() == 90L)
    val ids = spark.table(s"$cat.corpus.annix_postings")
      .agg(max("vec_id")).collect()(0).getLong(0)
    assert(ids == 89L)
    // cell counts account exactly for the survivors
    val cnt = spark.table(s"$cat.corpus.annix_cells")
      .filter(col("pos") === 0).agg(sum("cnt")).collect()(0).getLong(0)
    assert(cnt == 90L)
    // and equal the rebuild state
    val incrCells = cellsState(cat)
    AnnIndex.rebuild(spark, cat, "corpus.vectors", "corpus.annix")
    assert(cellsState(cat) == incrCells)
  }

  test("crash recovery: a committed-but-unmarked slice finalizes instead of double-applying") {
    val cat = freshCatalog("crash")
    insertVectors(cat, vectorsDf(0, 50), "annix_crash_base")
    AnnIndex.create(spark, cat, "corpus.annix")
    AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")

    val base = spark.conf.get(s"spark.sql.catalog.$cat.base")
    val cellsDir = new File(base, "corpus/annix_cells")
    val postingsDir = new File(base, "corpus/annix_postings")
    val srcDir = new File(base, "corpus/vectors")
    // the committed watermark after the initial build = the source's
    // version count before the delta lands
    val from = graft.sources.FrameMaintenance.totalVersions(srcDir)
    insertVectors(cat, vectorsDf(50, 60), "annix_crash_delta")
    // capture the cells-version snapshot a refresh would intent-record
    val preVersions = graft.sources.FrameMaintenance.totalVersions(cellsDir)
    val to = graft.sources.FrameMaintenance.totalVersions(srcDir)
    // run the refresh for real (applies + commits)...
    val r = AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r.changedRows == 10L)
    val committedCells = cellsState(cat)
    // ...then forge the crash: watermark back to `from`, intent present
    // with the PRE-apply cells version — exactly what a death between
    // the cells MERGE and the watermark write leaves behind
    java.nio.file.Files.writeString(new File(postingsDir, AnnIndex.MarkerFile).toPath,
      s"""{"srcVersion":$from}""")
    java.nio.file.Files.writeString(new File(postingsDir, AnnIndex.IntentFile).toPath,
      s"""{"from":$from,"to":$to,"cellsVersions":$preVersions}""")
    val r2 = AnnIndex.refresh(spark, cat, "corpus.vectors", "corpus.annix")
    assert(r2.changedRows == 0L,
      s"recovery must detect the committed slice and finalize, not re-apply: $r2")
    assert(cellsState(cat) == committedCells, "no double-application")
    assert(spark.table(s"$cat.corpus.annix_postings").count() == 60L)
  }
}
