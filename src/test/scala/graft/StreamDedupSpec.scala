package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{RecordStream, StreamDedup}

/** Cross-batch streaming dedup: first-occurrence-wins through the
  * state store (incl. across a checkpoint restart) and the
  * foreachBatch seen-set form whose dedup horizon outlives the query.
  */
class StreamDedupSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def writeKeys(dir: String, file: String, keys: Seq[String]): Unit = {
    val lines = keys.map(k => s"""{"key":"$k","value":"{\\"name\\":\\"$k\\",\\"age\\":1}"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, file),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("firstPerKey drops re-deliveries across micro-batches AND across a restart") {
    val in = tmp("sd-in"); val out = tmp("sd-out"); val ck = tmp("sd-ck")
    def run(): Unit = {
      val parsed = RecordStream.parseValues(
        RecordStream.jsonDirSource(spark, in,
          schema = RecordStream.envelope, maxFilesPerTrigger = 1),
        RecordStream.testschema)
      val q = StreamDedup.firstPerKey(parsed, Seq("key"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeKeys(in, "b1.json", Seq("a", "b", "a"))
    writeKeys(in, "b2.json", Seq("b", "c"))
    run()
    val first = spark.read.parquet(out).select("key").as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(first.sameElements(Array("a", "b", "c")), first.mkString(","))
    // restart with new files: keys seen BEFORE the restart stay deduped
    writeKeys(in, "b3.json", Seq("c", "d", "a"))
    run()
    val all = spark.read.parquet(out).select("key").as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(all.sameElements(Array("a", "b", "c", "d")),
      s"state not recovered across restart: ${all.mkString(",")}")
  }

  test("startIncremental emits only never-seen keys and persists the seen-set beyond the query") {
    val in = tmp("sdi-in"); val out = tmp("sdi-out")
    val seen = tmp("sdi-seen"); val ck = tmp("sdi-ck")
    def drain(): Unit = {
      val parsed = RecordStream.parseValues(
        RecordStream.jsonDirSource(spark, in,
          schema = RecordStream.envelope, maxFilesPerTrigger = 1),
        RecordStream.testschema)
      val q = StreamDedup.startIncremental(parsed, "key", out, seen, ck)
      q.processAllAvailable(); q.stop()
    }
    writeKeys(in, "b1.json", Seq("x", "y", "x"))
    writeKeys(in, "b2.json", Seq("y", "z"))
    drain()
    val emitted = spark.read.parquet(out).select("key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(emitted.sameElements(Array("x", "y", "z")), emitted.mkString(","))
    // a SECOND query instance (fresh checkpoint — simulates a
    // redeployment) still rejects keys in the persistent seen-set
    val ck2 = tmp("sdi-ck2")
    writeKeys(in, "b3.json", Seq("z", "w"))
    val parsed2 = RecordStream.parseValues(
      RecordStream.jsonDirSource(spark, in, schema = RecordStream.envelope),
      RecordStream.testschema)
    val q2 = StreamDedup.startIncremental(parsed2, "key", out, seen, ck2)
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(out).select("key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    // fresh checkpoint re-reads ALL files; x/y/z are in the seen-set,
    // so only w is new — and nothing is ever emitted twice
    assert(all.sorted.sameElements(Array("w", "x", "y", "z")),
      s"seen-set did not outlive the first query: ${all.sorted.mkString(",")}")
  }
}
