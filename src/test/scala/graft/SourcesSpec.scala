package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch source/format breadth: the engine reads parquet natively
  * everywhere; json/csv/orc round-trips must preserve rows and survive
  * schema'd re-reads (csv/json carry no types — explicit schema on
  * read, the only scalable pattern).
  */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("json round-trip preserves rows under an explicit schema") {
    val out = tmp("src-json")
    val orders = Tables.orders(spark, sfDir)
    orders.write.mode("overwrite").json(out)
    val back = spark.read.schema(orders.schema).json(out)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
  }

  test("csv round-trip preserves rows under an explicit schema") {
    val out = tmp("src-csv")
    val customer = Tables.customer(spark, sfDir)
    customer.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(customer.schema).option("header", "true").csv(out)
    assert(back.count() == customer.count())
    val a = back.agg(sum("c_acctbal")).head().getDouble(0)
    val b = customer.agg(sum("c_acctbal")).head().getDouble(0)
    assert(math.abs(a - b) <= 0.01, s"csv round-trip drifted: $a vs $b")
  }

  test("orc round-trip preserves rows and types") {
    val out = tmp("src-orc")
    val li = Tables.lineitem(spark, sfDir)
    li.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == li.count())
    assert(back.schema == li.schema)
  }
}
