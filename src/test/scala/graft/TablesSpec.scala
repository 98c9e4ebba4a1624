package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the one failure mode that took down 45 queries in round 8:
  * a table reader pinned to a single historical physical encoding.
  *
  * `Tables.events` must adapt to whatever the parquet footer declares
  * for `ts` — raw int64 nanos (the legacy TIMESTAMP(NANOS) path, which
  * Spark's `nanosAsLong` flag surfaces as LongType), TIMESTAMP_MICROS
  * without UTC adjustment (scans as TIMESTAMP_NTZ), or a UTC-adjusted
  * timestamp (scans as TimestampType). One fixture per encoding, all
  * asserting the SAME logical instant comes back as a session-UTC
  * TimestampType — so a driver-side data refresh can never again
  * silently change the type `ts` presents downstream.
  *
  * Also pins the CURRENT footer schema of all ten driver tables
  * (TESTDATA.md records the same) so any future refresh fails loudly
  * here instead of 45 queries deep.
  */
class TablesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** 2024-01-01 00:00:07.179575 UTC, as micros since epoch. */
  private val microsInstant = 1704067207179575L

  private def writeEventsFixture(schemaVariant: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$schemaVariant").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    val base = Seq(
      (1L, microsInstant, 8L, "error", 6.55, """{"k": 69}"""),
      (2L, microsInstant + 1000000L, 46L, "click", 12.31, """{"k": 89}"""))
    val cols = Seq("event_id", "ts_raw", "user_id", "event_type", "value", "props")
    val df = base.toDF(cols: _*)
    val withTs = schemaVariant match {
      // Raw int64 nanos — what TIMESTAMP(NANOS) files present under
      // the nanosAsLong legacy flag. +999 exercises DIV truncation.
      case "nanos_long" => df.withColumn("ts", $"ts_raw" * 1000L + 999L)
      // TIMESTAMP_MICROS, isAdjustedToUTC=false → TIMESTAMP_NTZ scan.
      case "ntz" => df.withColumn("ts", timestamp_micros($"ts_raw").cast(TimestampNTZType))
      // UTC-adjusted timestamp → TimestampType scan (pass-through).
      case "tz" => df.withColumn("ts", timestamp_micros($"ts_raw"))
    }
    withTs.drop("ts_raw")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(path)
    dir.getAbsolutePath
  }

  for (variant <- Seq("nanos_long", "ntz", "tz")) {
    test(s"Tables.events normalizes ts from the $variant encoding to session-UTC TimestampType") {
      val dir = writeEventsFixture(variant)
      val out = Tables.events(spark, dir)
      assert(out.schema("ts").dataType === TimestampType,
        s"variant=$variant must surface ts as TimestampType")
      // Non-ts columns untouched.
      assert(out.columns.toSeq === Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      val rows = out.orderBy("event_id").select("ts").as[Timestamp].collect()
      // Session tz is UTC, so getTime*1000 + micro-remainder is the
      // UTC micros value regardless of encoding; nanos sub-micro bits
      // must truncate away.
      def micros(t: Timestamp): Long = Math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L
      assert(micros(rows(0)) === microsInstant, s"variant=$variant first instant")
      assert(micros(rows(1)) === microsInstant + 1000000L, s"variant=$variant second instant")
    }
  }

  test("Tables.events works end-to-end on the real driver testdata (current refresh)") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    // Analysis + execution both succeed (r8's break was analysis-time).
    val n = ev.filter(unix_timestamp($"ts") > 0).count()
    assert(n > 0)
  }

  // --- footer-schema pins for the current driver testdata refresh ---
  // (TESTDATA.md §"Verified footer schemas" records the same list.)
  private val expectedSchemas: Map[String, Seq[(String, DataType)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                       "lang" -> StringType, "source" -> StringType,
                       "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType)
  )

  for ((table, expected) <- expectedSchemas.toSeq.sortBy(_._1)) {
    test(s"testdata footer schema: $table") {
      val actual = Tables(spark, sfDir, table).schema
        .map(f => f.name -> f.dataType)
      assert(actual === expected,
        s"driver testdata refresh changed $table's physical schema — " +
          "re-audit every reader of this table (see VERDICT r8 item 3)")
    }
  }

  test("testdata footer schema: events (raw scan, pre-normalization)") {
    // The raw scan may legitimately be NTZ or long depending on the
    // refresh; currently TIMESTAMP_MICROS → NTZ. The normalization
    // contract is pinned by the per-encoding tests above; here we only
    // pin names + the non-ts types.
    val raw = Tables(spark, sfDir, "events").schema.map(f => f.name -> f.dataType)
    assert(raw.map(_._1) === Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(raw.filter(_._1 != "ts") === Seq(
      "event_id" -> LongType, "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    assert(Seq(TimestampNTZType, TimestampType, LongType).contains(raw.toMap.apply("ts")))
  }

  test("events.props carries flat single-key JSON ({\"k\": int}) on current testdata") {
    val shapes = Tables.events(spark, sfDir)
      .select(get_json_object($"props", "$.k").cast("int").as("k"))
    assert(shapes.filter($"k".isNull).count() === 0,
      "props refresh changed the JSON shape q25 extracts")
  }
}
