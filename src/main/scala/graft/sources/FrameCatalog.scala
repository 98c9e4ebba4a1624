package graft.sources

import java.io.File
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NonEmptyNamespaceException, NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Catalog plugin over a directory tree of framed-Avro segment logs —
  * the metastore rung of the engine's own connector (SURVEY §2.2
  * C1/C15; the reference wires its source by hand in code,
  * `Processor.java:118-138` — this is what makes the same transport a
  * first-class SQL citizen):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.frames", "graft.sources.FrameCatalog")
  * spark.conf.set("spark.sql.catalog.frames.base", "/data/frame-logs")
  * spark.sql("CREATE NAMESPACE frames.corpus")
  * spark.sql("CREATE TABLE frames.corpus.events (event_id BIGINT, ...)")
  * spark.sql("INSERT INTO frames.corpus.events SELECT ...")
  * spark.sql("SELECT ... FROM frames.corpus.events")   // full pushdown
  * }}}
  *
  * Layout: `<base>/<namespace>/<table>/` holds the segment files, the
  * stats sidecars, and a `_table.json` descriptor (the Avro writer
  * schema — derived from the CREATE TABLE columns — plus the expected
  * embedded schema id). Everything the scan/write paths offer
  * (projection/filter/aggregate/limit pushdown, stat-pruning, metadata
  * columns, exactly-once commit) applies identically through SQL,
  * because loadTable returns the SAME [[AvroFrameTable]] the
  * path-based API builds.
  *
  * Filesystem-as-metastore is deliberate: table existence is the
  * descriptor file's existence, so concurrent readers need no extra
  * coordination service — the pattern of path-based lakehouse
  * catalogs. At 100 TB the catalog holds directory pointers, never
  * data; no operation here scales with row count.
  */
class FrameCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog {

  private var catalogName: String = _
  private var base: File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val b = options.get("base")
    require(b != null,
      s"catalog '$name' requires option spark.sql.catalog.$name.base (root directory)")
    base = new File(b)
    base.mkdirs()
  }

  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("default")

  private val TableDescriptor = "_table.json"

  /** Every namespace/table identifier segment must be a plain name
    * BEFORE it is used as a path component: drop/rename/namespace ops
    * delete recursively, so a backquoted `..` (or a segment containing
    * a separator) must never reach the filesystem — `DROP NAMESPACE
    * cat.`..` CASCADE` would otherwise delete everything above the
    * catalog base. Leading `_`/`.` are reserved for catalog metadata
    * files (`_table.json`, temp files), so they are rejected too.
    */
  private def isSafe(seg: String): Boolean =
    seg != null && seg.matches("[A-Za-z0-9][A-Za-z0-9_.-]*") && !seg.contains("..")

  private def checkSegment(seg: String): String = {
    require(isSafe(seg),
      s"unsafe catalog identifier segment '$seg': segments must match " +
        "[A-Za-z0-9][A-Za-z0-9_.-]* and must not contain '..'")
    seg
  }

  private def nsDir(ns: Array[String]): File = {
    require(ns.length == 1,
      s"frame catalog namespaces are single-level, got ${ns.mkString(".")}")
    new File(base, checkSegment(ns(0)))
  }

  private def tableDir(ident: Identifier): File =
    new File(nsDir(ident.namespace), checkSegment(ident.name))

  private def isTable(dir: File): Boolean = new File(dir, TableDescriptor).isFile

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(f => Array(f.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // no nesting
    else throw new NoSuchNamespaceException(namespace)

  // exists-checks answer false for unsafe segments (Spark probes
  // during resolution); mutating ops go through checkSegment and throw
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && isSafe(namespace(0)) && nsDir(namespace).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    nsDir(namespace).mkdirs()
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("frame catalog namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val dir = nsDir(namespace)
    val tables = Option(dir.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
    if (tables.nonEmpty && !cascade) throw new NonEmptyNamespaceException(namespace)
    deleteRecursively(dir)
    true
  }

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && isTable(d))
      .map(d => Identifier.of(namespace, d.getName)).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && isSafe(ident.namespace()(0)) &&
      isSafe(ident.name) && isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table = loadTableAsOf(ident, Map.empty)

  /** Time travel — free on an append-only log. `VERSION AS OF n` is
    * the log's natural version number: the segment count after the
    * n-th append (reads the first n segments in name = append order).
    * `TIMESTAMP AS OF t` reads segments whose publish mtime ≤ t (the
    * job commit restamps every segment to the commit instant, so mtime
    * IS publish time, never task write time). Nothing is copied or snapshotted —
    * immutable segments ARE the history, the Iceberg/Delta snapshot
    * idea with the segment list as the manifest.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val n = scala.util.Try(version.trim.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"frame-log versions are segment counts; got '$version'"))
    val have = AvroFrames.listSegments(tableDir(ident).getAbsolutePath).length
    require(n >= 0 && n <= have,
      s"version $n does not exist: ${ident.name} has $have segments")
    loadTableAsOf(ident, Map("asOfSegments" -> n.toString))
  }

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadTableAsOf(ident, Map("asOfTimestampMs" -> (timestampMicros / 1000L).toString))

  private def loadTableAsOf(ident: Identifier, asOf: Map[String, String]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val (avroSchema, schemaId) = readDescriptor(new File(dir, TableDescriptor))
    val opts = new CaseInsensitiveStringMap((Map(
      "path" -> dir.getAbsolutePath,
      "avroSchema" -> avroSchema,
      "schemaId" -> schemaId.toString) ++ asOf).asJava)
    new AvroFrameTable(
      AvroFrames.sparkSchema(new org.apache.avro.Schema.Parser().parse(avroSchema)), opts)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    require(info.partitions().isEmpty,
      "frame tables are unpartitioned segment logs (PARTITIONED BY unsupported)")
    if (!namespaceExists(ident.namespace)) throw new NoSuchNamespaceException(ident.namespace)
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    dir.mkdirs()
    val avroSchema = AvroFrames.avroSchemaFor(info.schema(), ident.name)
    val schemaId = Option(info.properties().get("schemaId")).map(_.toInt)
      .getOrElse(AvroFrames.DefaultSchemaId)
    writeDescriptor(new File(dir, TableDescriptor), avroSchema, schemaId)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "frame table schemas are immutable (the Avro writer schema is the wire contract); " +
        "create a new table and backfill")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    deleteRecursively(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!namespaceExists(newIdent.namespace))
      throw new NoSuchNamespaceException(newIdent.namespace)
    val ok = tableDir(oldIdent).renameTo(tableDir(newIdent))
    require(ok, s"rename failed: $oldIdent -> $newIdent")
  }

  // ------------------------------------------------------------ functions

  /** V2 catalog functions — the DSv2 UDF surface (SURVEY §2.2 C13/C14's
    * catalog rung). Library functions, available in every namespace
    * like built-ins; `bind` validates arity/types at analysis and the
    * MAGIC_METHOD `invoke` gives Spark a statically-typed entry point
    * it compiles to a direct call inside whole-stage codegen — no row
    * boxing, unlike a classic Scala UDF.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespaceExists(namespace))
      FrameFunctions.all.keys.toArray.sorted.map(Identifier.of(namespace, _))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    FrameFunctions.all.getOrElse(ident.name, throw new NoSuchFunctionException(ident))

  // ------------------------------------------------------------ descriptor io

  private def writeDescriptor(f: File, avroSchema: String, schemaId: Int): Unit = {
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject()
    gen.writeStringField("avroSchema", avroSchema)
    gen.writeNumberField("schemaId", schemaId)
    gen.writeEndObject(); gen.close()
    java.nio.file.Files.writeString(f.toPath, sw.toString)
  }

  private def readDescriptor(f: File): (String, Int) = {
    val p = new com.fasterxml.jackson.core.JsonFactory()
      .createParser(java.nio.file.Files.readString(f.toPath))
    var schema: String = null
    var id = AvroFrames.DefaultSchemaId
    import com.fasterxml.jackson.core.JsonToken._
    p.nextToken()
    while (p.nextToken() != END_OBJECT) {
      p.currentName() match {
        case "avroSchema" => p.nextToken(); schema = p.getText
        case "schemaId"   => p.nextToken(); id = p.getIntValue
        case _            => p.nextToken()
      }
    }
    require(schema != null, s"corrupt table descriptor ${f.getAbsolutePath}")
    (schema, id)
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}

/** The catalog's function library. Each function is an
  * [[UnboundFunction]] whose `bind` validates the call site's schema,
  * returning a [[ScalarFunction]] with a MAGIC_METHOD `invoke` —
  * Spark's analyzer resolves that method reflectively and plans a
  * direct (codegen-compatible) call on UTF8String/primitive values.
  */
object FrameFunctions {

  val all: Map[String, UnboundFunction] = Map(
    "jaro_winkler" -> JaroWinklerUnbound,
    "hamming64" -> Hamming64Unbound)

  /** Jaro–Winkler similarity as a V2 catalog function — the SAME
    * static kernel as the Catalyst expression
    * ([[graft.expressions.JaroWinkler.similarity]]), so DuckDB's
    * built-in `jaro_winkler_similarity` remains the value-for-value
    * oracle (q159 proved the parity; q331 proves it through the V2
    * dispatch path).
    */
  object JaroWinklerUnbound extends UnboundFunction {
    override def name(): String = "jaro_winkler"
    override def description(): String =
      "jaro_winkler(string, string) -> double: Jaro-Winkler name similarity in [0,1]"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
          inputType.fields.forall(_.dataType == StringType),
        s"jaro_winkler expects (STRING, STRING), got $inputType")
      JaroWinklerBound
    }
  }

  object JaroWinklerBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] = Array(StringType, StringType)
    override def resultType(): DataType = DoubleType
    override def name(): String = "jaro_winkler"
    override def canonicalName(): String = "graft.jaro_winkler"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true // null in -> null out

    /** MAGIC_METHOD entry point: statically resolvable, codegen-direct. */
    def invoke(a: UTF8String, b: UTF8String): java.lang.Double =
      if (a == null || b == null) null
      else Double.box(graft.expressions.JaroWinkler.similarity(a, b))

    /** Interpreted fallback (also the contract Spark checks at bind). */
    override def produceResult(input: InternalRow): java.lang.Double =
      invoke(if (input.isNullAt(0)) null else input.getUTF8String(0),
             if (input.isNullAt(1)) null else input.getUTF8String(1))
  }

  /** Hamming distance between two 64-bit signatures (popcount of xor)
    * — the simhash/fingerprint comparator, as a V2 function with
    * PRIMITIVE-typed magic dispatch: `invoke(long, long): int` compiles
    * to an unboxed direct call (the other magic-method shape next to
    * jaro_winkler's object-typed one). Null-intolerant like the SQL
    * expression `bit_count(a ^ b)`: any NULL input yields NULL.
    */
  object Hamming64Unbound extends UnboundFunction {
    override def name(): String = "hamming64"
    override def description(): String =
      "hamming64(bigint, bigint) -> int: popcount of xor — Hamming distance of 64-bit signatures"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
          inputType.fields.forall(_.dataType == org.apache.spark.sql.types.LongType),
        s"hamming64 expects (BIGINT, BIGINT), got $inputType")
      Hamming64Bound
    }
  }

  object Hamming64Bound extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] =
      Array(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)
    override def resultType(): DataType = org.apache.spark.sql.types.IntegerType
    override def name(): String = "hamming64"
    override def canonicalName(): String = "graft.hamming64"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true // null in -> null out

    /** MAGIC_METHOD entry point: primitive-typed, unboxed dispatch. */
    def invoke(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else Int.box(invoke(input.getLong(0), input.getLong(1)))
  }
}
