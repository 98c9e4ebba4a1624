package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Confluent-framed Avro value decoding on core Avro (the `spark-avro`
  * connector is absent in this environment; `avro-1.12.1` ships with
  * Spark itself) — the real-deserialization half of the reference's O2
  * (`KafkaAvroDeserializer`, `Processor.java:50-51`):
  *
  *  - the wire format is Confluent's: magic byte 0x00, 4-byte
  *    big-endian schema id, then the Avro binary body;
  *  - the schema registry becomes a caller-supplied `Map[id -> writer
  *    schema JSON]` (the registry FETCH was the only part of O2 the
  *    environment blocks — the lookup-by-embedded-id semantics are
  *    preserved);
  *  - decoded `GenericRecord`s are emitted as `GenericRecord.toString`
  *    JSON, so the existing `RecordStream.parseValues` / `from_json`
  *    path handles typing without one compiled-in record class. (At
  *    scale you'd decode straight to InternalRow as spark-avro does;
  *    the JSON hop trades peak decode rate for schema-agnostic
  *    composition with the rest of the pipeline and is still one pass
  *    per record.)
  *
  * SUPPORTED SCHEMA SUBSET: record/array/map/union/enum over string,
  * boolean, int, long, float, double, null. `GenericRecord.toString`
  * emits union values as the plain branch value (what `from_json`
  * expects — Avro's spec `JsonEncoder` would wrap them as
  * `{"branch": v}` and break the downstream parse), but it does NOT
  * produce valid JSON for `bytes`/`fixed` fields (raw ISO-8859-1
  * escapes), so registering a schema containing those types throws
  * `IllegalArgumentException` at UDF construction rather than silently
  * nulling every downstream row. Non-finite float/double values
  * (`NaN`/`Infinity`) are likewise unrepresentable in JSON and null
  * out in `from_json`; finite values round-trip exactly.
  *
  * Malformed buffers (wrong magic, unknown id, truncated body) decode
  * to null — the same null-on-malformed convention as `from_json`,
  * asserted in AvroSpec.
  */
object AvroRecords {

  val MagicByte: Byte = 0x00

  /** Confluent framing: prepend magic + big-endian schema id (test
    * producers use this; the reference's serializer did the same).
    */
  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + body.length)
    out(0) = MagicByte
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  /** UDF: Confluent-framed Avro bytes → JSON string (null on malformed
    * input). Readers are built once per executor per schema id via the
    * deserialized closure's lazy map. Throws `IllegalArgumentException`
    * here (driver-side, fail-fast) if a registry schema uses a type
    * outside the supported subset — see the object scaladoc.
    */
  def avroJsonUdf(registry: Map[Int, String]): UserDefinedFunction = {
    registry.foreach { case (id, json) =>
      val schema = new Schema.Parser().parse(json)
      unsupportedTypes(schema).headOption.foreach { t =>
        throw new IllegalArgumentException(
          s"AvroRecords: schema id $id uses Avro type $t, whose " +
          "GenericRecord.toString form is not valid JSON; supported " +
          "types: record/array/map/union/enum over " +
          "string/boolean/int/long/float/double/null")
      }
    }
    val decode = new AvroJsonDecoder(registry)
    udf((bytes: Array[Byte]) => decode(bytes))
  }

  /** Avro types in `schema` whose `toString` rendering is not valid
    * JSON (`bytes`/`fixed`). Cycle-safe via the seen-set (Avro schemas
    * may be recursive through named record types).
    */
  private[streaming] def unsupportedTypes(schema: Schema): Set[Schema.Type] = {
    val seen = scala.collection.mutable.Set[Schema]()
    def walk(s: Schema): Set[Schema.Type] =
      if (!seen.add(s)) Set.empty
      else s.getType match {
        case Schema.Type.BYTES | Schema.Type.FIXED => Set(s.getType)
        case Schema.Type.RECORD =>
          s.getFields.asScala.flatMap(f => walk(f.schema())).toSet
        case Schema.Type.ARRAY => walk(s.getElementType)
        case Schema.Type.MAP   => walk(s.getValueType)
        case Schema.Type.UNION => s.getTypes.asScala.flatMap(walk).toSet
        case _ => Set.empty
      }
    walk(schema)
  }

  /** Column form: `avroJson(col("value"), registry)`. */
  def avroJson(value: Column, registry: Map[Int, String]): Column =
    avroJsonUdf(registry)(value)

  private class AvroJsonDecoder(registry: Map[Int, String]) extends Serializable {
    @transient private lazy val readers: java.util.concurrent.ConcurrentHashMap[Int, GenericDatumReader[GenericRecord]] =
      new java.util.concurrent.ConcurrentHashMap()

    private def reader(id: Int): Option[GenericDatumReader[GenericRecord]] =
      registry.get(id).map { json =>
        readers.computeIfAbsent(id, _ =>
          new GenericDatumReader[GenericRecord](new Schema.Parser().parse(json)))
      }

    def apply(bytes: Array[Byte]): String =
      // 5 bytes (magic + id) is wire-valid: a no-field record encodes
      // to a zero-length Avro body
      if (bytes == null || bytes.length < 5 || bytes(0) != MagicByte) null
      else {
        val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
                 ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
        reader(id) match {
          case None => null
          case Some(r) =>
            try {
              val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
              r.read(null.asInstanceOf[GenericRecord], dec).toString // JSON for the validated subset
            } catch { case scala.util.control.NonFatal(_) => null }
        }
      }
  }
}
