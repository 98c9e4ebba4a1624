package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Randomized (seeded, deterministic) cross-checks of the custom
  * expressions against their built-in reference formulations — covers
  * unicode text, duplicates, and empty edges the fixed corpus can't.
  */
class ExpressionPropertySpec extends AnyFunSuite with SparkFixture {

  private val rnd = new scala.util.Random(20260812L)

  private val fragments = Array(
    "alpha", "beta9", "GAMMA", "", " ", ", ", "—", "\n", "É", "ß", "中文", "!!",
    "x", "longertoken12345", "MiXeD", "0", "—dash—", "tab\t", "a-b", "\u0000ctl")

  private def randomText(): String =
    Seq.fill(rnd.nextInt(30))(fragments(rnd.nextInt(fragments.length))).mkString(" ")

  test("TokenHashArray matches the HOF tokenize+portableHash pipeline on arbitrary text") {
    import spark.implicits._
    val texts = Seq.fill(500)(randomText()) :+ "" :+ "   " :+ "\u0000\u0001" :+ "ÉßÇ中文"
    val diff = texts.toDF("text").select(
        tokenHashArray(col("text"), 2147483648L).as("fused"),
        transform(tokens(col("text")), x => portableHash(x) % 2147483648L).as("hof"))
      .filter(not(col("fused") === col("hof")))
      .count()
    assert(diff == 0, s"$diff random texts diverged between fused and HOF hashing")
  }

  test("intersection_size equals size(array_intersect) for long sets, including duplicate inputs") {
    import spark.implicits._
    val pairs = Seq.fill(500)((
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong),
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong))) :+ ((Seq.empty[Long], Seq(1L, 2L)))
    // expression inputs are array_distinct'd (its documented set
    // contract); the reference tolerates raw duplicates
    val diff = pairs.toDF("a", "b").select(
        intersectionSize(array_distinct(col("a")), array_distinct(col("b"))).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0, s"$diff random set pairs diverged from size(array_intersect)")
  }

  test("FloatDoubleDotProduct is bit-identical to the sequential HOF fold it replaced") {
    // planeBit's numeric contract (round 11): widening float x double
    // multiplies accumulated strictly left-to-right — any divergence
    // would silently move LSH band bits and break the banded oracles.
    import spark.implicits._
    val rows = Seq.fill(300)((
      Seq.fill(64)(rnd.nextGaussian().toFloat),
      Seq.fill(64)(rnd.nextGaussian()))) :+ ((Seq.empty[Float], Seq.empty[Double]))
    val diff = rows.toDF("v", "p").select(
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.expressions.FloatDoubleDotProduct(
            org.apache.spark.sql.GraftSqlBridge.expression(col("v")),
            org.apache.spark.sql.GraftSqlBridge.expression(col("p")))).as("fast"),
        aggregate(zip_with(col("v"), col("p"), (x, y) => x.cast("double") * y),
                  lit(0.0), (acc, t) => acc + t).as("hof"))
      .filter(col("fast") =!= col("hof")) // exact bit equality, no tolerance
      .count()
    assert(diff == 0, s"$diff random (float, double) vectors diverged from the HOF fold")
  }

  test("FloatSqDist is bit-identical to the sequential HOF sq-dist fold it replaced") {
    // q81's numeric contract (round 18): each float widened to double
    // BEFORE the subtraction, d·d accumulated strictly left-to-right —
    // any divergence would move k-means assignments off the oracle.
    import spark.implicits._
    import graft.functions.VectorFunctions.sqDistF
    val rows = Seq.fill(300)((
      Seq.fill(64)(rnd.nextGaussian().toFloat),
      Seq.fill(64)(rnd.nextGaussian().toFloat))) :+ ((Seq.empty[Float], Seq.empty[Float]))
    val diff = rows.toDF("a", "b").select(
        sqDistF(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"),
            (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, t) => acc + t).as("hof"))
      .filter(col("fast") =!= col("hof")) // exact bit equality, no tolerance
      .count()
    assert(diff == 0, s"$diff random float vector pairs diverged from the HOF sq-dist fold")
  }

  test("LongDotProduct equals the HOF integer fold on the int8 domain, including empty") {
    // Domain contract: inputs are int8-quantized (|x| <= 127), so no
    // 64-bit overflow is reachable (the codegen loop would wrap
    // silently where the ANSI HOF throws — the bound is what makes
    // them equivalent).
    import spark.implicits._
    import graft.functions.VectorFunctions.longDot
    val rows = Seq.fill(300)((
      Seq.fill(64)((rnd.nextInt(255) - 127).toLong),
      Seq.fill(64)((rnd.nextInt(255) - 127).toLong))) :+
      ((Seq.empty[Long], Seq.empty[Long]))
    val diff = rows.toDF("a", "b").select(
        longDot(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
                  lit(0L), (acc, t) => acc + t).as("hof"))
      .filter(col("fast") =!= col("hof"))
      .count()
    assert(diff == 0, s"$diff random long vectors diverged from the HOF integer fold")
  }

  test("SimHash64 equals the explode+aggregate bit-majority form on arbitrary token sets") {
    import spark.implicits._
    val docs = Seq.fill(200)(randomText()).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .filter(size(tokens(col("text"))) > 0)
    val fused = docs.select(col("doc_id"),
      org.apache.spark.sql.GraftSqlBridge.column(graft.expressions.SimHash64(
        org.apache.spark.sql.GraftSqlBridge.expression(tokenHashArray(col("text"), 0L)), 60)).as("sh"))
    val th = docs.select(col("doc_id"), explode(tokenHashArray(col("text"), 0L)).as("th"))
    val bitAggs = (0 until 60).map(b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$b"))
    val assembled = (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val ref = th.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), assembled.as("ref_sh"))
    val joined = fused.join(ref, "doc_id")
    assert(joined.count() > 0)
    val diff = joined.filter(col("sh") =!= col("ref_sh")).count()
    assert(diff == 0, s"$diff random docs diverged between SimHash64 and the aggregate form")
  }

  test("NfcNormalize matches java.text.Normalizer NFC on arbitrary unicode (codegen path)") {
    import spark.implicits._
    val texts = Seq.fill(300)(randomText()) ++ Seq(
      "café",            // decomposed → composes to café
      "café",             // already composed → unchanged
      "ö Å ṩ", // multiple combining marks + s-dot
      "", "plain ascii only", "😀 é") // surrogate pair + combining
    val rows = texts.toDF("text").select(col("text"),
        org.apache.spark.sql.GraftSqlBridge.column(graft.expressions.NfcNormalize(
          org.apache.spark.sql.GraftSqlBridge.expression(col("text")))).as("norm"))
      .collect()
    rows.foreach { r =>
      val expected = java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expected,
        s"NFC mismatch for ${r.getString(0).map(c => f"\\u$c%04x").mkString}")
    }
  }

  test("nfc_normalize is SQL-registered, composes decomposed sequences, and passes null through") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS composed, nfc_normalize(cast(NULL AS string)) AS n")
      .collect()(0)
    assert(r.getString(0) == "café", "decomposed e+U+0301 must compose to U+00E9")
    assert(r.isNullAt(1), "null input must stay null")
  }
}
