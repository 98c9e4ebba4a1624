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

  test("compaction bounds the seen-set directory count without changing dedup") {
    val in = tmp("sdc-in"); val out = tmp("sdc-out")
    val seen = tmp("sdc-seen"); val ck = tmp("sdc-ck")
    val N = 3 // compact every 3 batches; 13 batches = 4 compactions
    // batch i emits key k$i plus a re-delivery of k${i-1} (dropped)
    (0 until 13).foreach { i =>
      writeKeys(in, f"b$i%02d.json", Seq(s"k$i") ++ (if (i > 0) Seq(s"k${i - 1}") else Nil))
    }
    val parsed = RecordStream.parseValues(
      RecordStream.jsonDirSource(spark, in,
        schema = RecordStream.envelope, maxFilesPerTrigger = 1),
      RecordStream.testschema)
    val q = StreamDedup.startIncremental(parsed, "key", out, seen, ck, compactEvery = N)
    q.processAllAvailable(); q.stop()

    val emitted = spark.read.parquet(out).select("key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(emitted.toSeq == (0 until 13).map(i => s"k$i").sorted,
      s"dedup changed under compaction: ${emitted.mkString(",")}")

    // the run's seen-set must be O(compactEvery) directories, not one
    // per micro-batch: after the batch-12 compaction only the
    // consolidated dir plus the batches since it remain
    val runDir = java.nio.file.Paths.get(seen).toFile.listFiles()
      .filter(_.getName.startsWith("run=")).head
    val batchDirs = runDir.listFiles().map(_.getName).filter(_.startsWith("batch="))
    assert(batchDirs.length <= N + 1,
      s"seen-set grew unbounded: ${batchDirs.sorted.mkString(",")}")
    assert(batchDirs.exists(_.startsWith("batch=c")), "no consolidated partition written")

    // and the compacted seen-set still outlives the query: a fresh
    // deployment (new checkpoint) rejects every previously-seen key
    val ck2 = tmp("sdc-ck2")
    writeKeys(in, "b99.json", Seq("k5", "k12", "fresh"))
    val parsed2 = RecordStream.parseValues(
      RecordStream.jsonDirSource(spark, in, schema = RecordStream.envelope),
      RecordStream.testschema)
    val q2 = StreamDedup.startIncremental(parsed2, "key", out, seen, ck2, compactEvery = N)
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(out).select("key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    assert(all.length == 14 && all.contains("fresh"),
      s"compacted seen-set misread on redeploy: ${all.sorted.mkString(",")}")
  }

  test("bloom prefilter: sketches are written per run; a sketchless legacy seen-set still dedups") {
    val in = tmp("sdb-in"); val out = tmp("sdb-out")
    val seen = tmp("sdb-seen"); val ck = tmp("sdb-ck")
    def drain(ckDir: String): Unit = {
      val parsed = RecordStream.parseValues(
        RecordStream.jsonDirSource(spark, in,
          schema = RecordStream.envelope, maxFilesPerTrigger = 1),
        RecordStream.testschema)
      val q = StreamDedup.startIncremental(parsed, "key", out, seen, ckDir)
      q.processAllAvailable(); q.stop()
    }
    writeKeys(in, "b1.json", Seq("a", "b"))
    writeKeys(in, "b2.json", Seq("b", "c")) // cross-batch dup through the sketch path
    drain(ck)
    val sketchDir = java.nio.file.Paths.get(seen, "_sketch").toFile
    assert(sketchDir.exists && sketchDir.listFiles().exists(_.getName.startsWith("run=")),
      "per-run sketch file missing")
    val emitted = spark.read.parquet(out).select("key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(emitted.toSeq == Seq("a", "b", "c"), emitted.mkString(","))

    // simulate a seen-set written by a pre-sketch deployment: remove
    // the sketches; the prefilter must disable itself (a miss would
    // not be trustworthy) and dedup exactly
    sketchDir.listFiles().foreach(_.delete()); sketchDir.delete()
    writeKeys(in, "b3.json", Seq("c", "d"))
    drain(tmp("sdb-ck2"))
    val all = spark.read.parquet(out).select("key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(all.toSeq == Seq("a", "b", "c", "d"),
      s"legacy fallback mis-deduped: ${all.mkString(",")}")
  }
}
