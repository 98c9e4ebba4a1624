package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.functions.SketchFunctions

/** Properties of the round-3 corpus-prep operators that the DuckDB
  * oracle can't express (cross-row coverage invariants, bloom
  * behavior, PII scrubbing over constructed rows).
  */
class CorpusSpec extends AnyFunSuite with SparkFixture {

  test("q69 chunks tile every document: full coverage, fixed stride, correct overlap") {
    val chunks = SparkEntry.queries("q69_doc_chunks")(spark, sfDir).collect()
    val docTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    // every non-empty doc is chunked
    assert(byDoc.keySet == docTokens.filter(_._2.nonEmpty).keySet)
    byDoc.foreach { case (docId, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      val toks = docTokens(docId)
      // chunk i holds tokens [i*24, i*24+32); reassembling the first 24
      // of each chunk plus the tail of the last must give the doc back
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") == i, s"doc $docId: chunk ids not dense")
        val expect = toks.slice(i * 24, i * 24 + 32).mkString(" ")
        assert(r.getAs[String]("chunk_text") == expect, s"doc $docId chunk $i")
      }
      val reassembled = sorted.init.flatMap(_.getAs[String]("chunk_text").split(" ").take(24)) ++
        sorted.last.getAs[String]("chunk_text").split(" ")
      assert(reassembled.mkString(" ") == toks.mkString(" "), s"doc $docId: coverage gap")
    }
  }

  test("q70 ranks are 1..5 per doc and scores are (tf * N / df)") {
    val rows = SparkEntry.queries("q70_tfidf_topk")(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count().toDouble
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to rs.length.toLong), s"doc $d")
      assert(rs.length <= 5)
    }
    rows.foreach { r =>
      val expect = r.getAs[Long]("tf").toDouble * n / r.getAs[Long]("df").toDouble
      assert(r.getAs[Double]("score") == expect)
    }
  }

  test("PII scrubbing redacts emails, urls and phones over constructed rows") {
    import spark.implicits._
    val rows = Seq(
      "contact me at jane.doe+spam@example.co.uk today",
      "see https://example.com/a?b=c&d=e and http://x.io",
      "call 555-123-4567 or 555 1234 4321 now",
      "mixed https://a.b/c bob@corp.com 123-456-7890",
      "clean text with no identifiers at all",
      "url-embedded https://x.io/a@b.co?p=555-123-4567 only")
      .toDF("text")
      .select(col("text"), TextFunctions.piiRedact(col("text")).as("red"),
        TextFunctions.piiCounts(col("text")).as("c"))
      .collect()
    val red = rows.map(_.getAs[String]("red"))
    assert(red(0) == "contact me at <EMAIL> today")
    assert(red(1) == "see <URL> and <URL>")
    assert(red(2) == "call <PHONE> or <PHONE> now")
    assert(red(3) == "mixed <URL> <EMAIL> <PHONE>")
    assert(red(4) == "clean text with no identifiers at all")
    assert(red(5) == "url-embedded <URL> only")
    val c3 = rows(3).getStruct(2)
    assert((c3.getInt(0), c3.getInt(1), c3.getInt(2)) == ((1, 1, 1)))
    val c4 = rows(4).getStruct(2)
    assert((c4.getInt(0), c4.getInt(1), c4.getInt(2)) == ((0, 0, 0)))
    // counts mirror redaction order: the email/phone INSIDE the url is
    // one URL, not a phantom email/phone
    val c5 = rows(5).getStruct(2)
    assert((c5.getInt(0), c5.getInt(1), c5.getInt(2)) == ((0, 1, 0)))
  }

  test("q73 bloom prefilter has no false negatives and prunes most true-new docs") {
    val digested = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(substring(col("text"), 1, 40)).as("digest"))
    val corpus = digested.filter(col("doc_id") % 10 =!= 7)
    val batch = digested.filter(col("doc_id") % 10 === 7)
    val bf = corpus
      .agg(SketchFunctions.bloomFilterAgg(xxhash64(col("digest")), 100000L, 1L << 20).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val flagged = batch
      .withColumn("maybe", SketchFunctions.mightContain(lit(bf), xxhash64(col("digest"))))
    // every true dup must be flagged (bloom has no false negatives)
    val missed = flagged.filter(!col("maybe"))
      .join(corpus.select("digest"), Seq("digest"), "left_semi").count()
    assert(missed == 0, "bloom false negative — exactness broken")
    // and the prefilter should rule out the overwhelming majority of
    // new docs without touching the verify join (1M bits >> items)
    val trueNew = batch.join(corpus.select("digest"), Seq("digest"), "left_anti").count()
    val sentToVerify = flagged.filter(col("maybe")).count()
    val trueDups = batch.count() - trueNew
    assert(sentToVerify - trueDups <= math.max(1L, trueNew / 10),
      s"bloom fp rate too high: $sentToVerify sent, $trueDups true dups")
    // end-to-end: query result == exact anti-join
    val got = SparkEntry.queries("q73_bloom_incremental_dedup")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val expect = batch.join(corpus.select("digest"), Seq("digest"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expect))
  }

  test("profileApprox tracks the exact profile within HLL error on every table column") {
    val exact = operators.Profiling.profile(Tables.orders(spark, sfDir)).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_nulls"), r.getAs[String]("min_value")))
      .toMap
    val approx = operators.Profiling.profileApprox(Tables.orders(spark, sfDir)).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (nd, nn, mn) = exact(r.getAs[String]("column_name"))
      val a = r.getAs[Long]("n_distinct")
      // rsd 0.02, 5x slack (same convention as the q48 HLL spec)
      assert(math.abs(a - nd) <= math.max(2L, (nd * 0.10).toLong),
        s"${r.getAs[String]("column_name")}: approx $a vs exact $nd")
      // everything except the distinct estimator must be identical
      assert(r.getAs[Long]("n_nulls") == nn && r.getAs[String]("min_value") == mn)
    }
  }

  test("q75 binned interval join equals the direct range-predicate join") {
    val ev = Tables.events(spark, sfDir)
    val w = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
    val direct = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
      .join(w, col("ts") >= col("err_ts") &&
        col("ts") < col("err_ts") + expr("INTERVAL 5 MINUTES"), "left")
      .groupBy("event_id").agg(count(col("err_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = SparkEntry.queries("q75_interval_join")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_overlapping_errors")).toMap
    assert(binned == direct)
    assert(binned.valuesIterator.exists(_ > 0), "degenerate fixture: no containment at all")
  }
}
