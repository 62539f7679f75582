package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.Converters
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Debezium schema-block -> converter auto-dispatch: reads the envelope's
  * own `schema` section and derives both the wire row schema for
  * `from_json` and the per-field logical converter, so callers never
  * hand-author a StructType or pick converters manually
  * (ref: lib/debezium/schema.go:90-199 `ToValueConverter`/`ToKindDetails`,
  * field model at schema.go:29-69, lib/cdc/util/optional_schema.go).
  *
  * The reference re-reads the schema block per message; on Spark the block
  * is constant per topic, so it is parsed ONCE on the driver and compiled
  * into a single codegen'd projection — per-row dispatch cost is zero and
  * the whole decode stays inside whole-stage codegen.
  */
object SchemaDispatch {
  /** One field of the after/before block (schema.go:58-69). */
  final case class DbzField(
      name: String,
      fieldType: String, // wire type: int32 / int64 / string / bytes / ...
      dbzType: String, // logical type ("name" in the schema block), "" if none
      optional: Boolean,
      compressed: Boolean,
      parameters: Map[String, String],
      default: Option[String],
      items: Option[DbzField], // array element metadata (schema.go:67-68)
      nested: Seq[DbzField]) // struct sub-fields

  private val mapper = new ObjectMapper()

  /** Parse a full envelope (or bare `{"schema":...}`) and return the
    * `after` block's field list (optional_schema.go:9-27).
    */
  def parseAfterFields(envelopeJson: String): Seq[DbzField] = {
    val root = mapper.readTree(envelopeJson)
    val schema = if (root.has("schema")) root.path("schema") else root
    val after = schema.path("fields").elements().asScala
      .find(_.path("field").asText() == "after")
      .getOrElse(throw new IllegalArgumentException(
        "Debezium schema block has no 'after' fields object"))
    after.path("fields").elements().asScala.map(parseField).toSeq
  }

  private def parseField(n: JsonNode): DbzField = DbzField(
    name = n.path("field").asText(),
    fieldType = n.path("type").asText(),
    dbzType = n.path("name").asText(""),
    optional = n.path("optional").asBoolean(true),
    compressed = n.path("compressed").asBoolean(false),
    parameters =
      if (n.has("parameters"))
        n.path("parameters").fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty,
    default = Option(n.get("default")).filterNot(_.isNull).map(_.asText()),
    items = Option(n.get("items")).map(parseField),
    nested =
      if (n.path("type").asText() == "struct" && n.has("fields"))
        n.path("fields").elements().asScala.map(parseField).toSeq
      else Nil)

  // Debezium logical type names (lib/debezium/types.go)
  private val VariableDecimal = "io.debezium.data.VariableScaleDecimal"
  private val KafkaDecimal = "org.apache.kafka.connect.data.Decimal"
  private val GeometryT = Set("io.debezium.data.geometry.Geometry", "io.debezium.data.geometry.Geography")
  private val GeometryPoint = "io.debezium.data.geometry.Point"

  /** JSON wire type of a field — what `from_json` must parse BEFORE the
    * logical converter runs. Bytes ride as base64 text; logical structs
    * (variable decimal, geometry) get their known shapes.
    */
  def wireType(f: DbzField): DataType = f.dbzType match {
    case VariableDecimal =>
      StructType(Seq(StructField("scale", IntegerType), StructField("value", StringType)))
    case GeometryPoint =>
      StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType),
        StructField("wkb", StringType), StructField("srid", IntegerType)))
    case g if GeometryT.contains(g) =>
      StructType(Seq(StructField("wkb", StringType), StructField("srid", IntegerType)))
    case _ => f.fieldType match {
      case "int8" | "int16" | "int32" => IntegerType
      case "int64" => LongType
      // JSON cannot carry NaN unquoted; Debezium writes the string "NaN",
      // which PERMISSIVE from_json nulls out — exactly the reference's
      // Float64 NaN -> null semantics (basic.go:67-96)
      case "float" | "double" => DoubleType
      case "boolean" => BooleanType
      case "bytes" => StringType // base64 text on the JSON wire
      case "array" => ArrayType(f.items.map(wireType).getOrElse(StringType))
      case "map" => MapType(StringType, StringType)
      case "struct" => StructType(f.nested.map(sf => StructField(sf.name, wireType(sf))))
      case _ => StringType
    }
  }

  /** Does a field need any logical conversion beyond its wire form?
    * Drives the array-element dispatch below: an element with no logical
    * type, no compression and a scalar wire form passes through, so the
    * array needn't pay a per-element `transform`.
    */
  private def needsLogical(f: DbzField): Boolean =
    f.compressed || f.dbzType.nonEmpty ||
      (f.fieldType match {
        case "struct" | "map" => true
        case "array" => f.items.exists(needsLogical)
        case _ => false
      })

  /** Logical converter for a decoded wire column — the dispatch table of
    * schema.go:90-160 mapped onto the F1-F16 converter set. Unknown
    * logical types fall through to the wire type (schema.go:146-159).
    */
  def converter(f: DbzField): Column => Column = {
    val logical = logicalConverter(f)
    // compressed fields are gzip(base64) on the wire and decompress before
    // any logical parse (schema.go:61-62, types.go:156-184)
    if (f.compressed) c => logical(Converters.gunzip(unbase64(c)).cast(StringType))
    else logical
  }

  /** The logical half of [[converter]] WITHOUT the compressed-wire
    * unwrap — schema-block defaults are DDL literals, not gzip+base64
    * payload encodings, so [[defaultColumns]] must apply only this half
    * (round-13 review: pushing a plain-text default through
    * gunzip(unbase64(...)) nulled it).
    */
  private def logicalConverter(f: DbzField): Column => Column =
    f.dbzType match {
      case "io.debezium.time.Date" | "org.apache.kafka.connect.data.Date" =>
        Converters.epochDaysToDate
      case "io.debezium.time.Time" | "org.apache.kafka.connect.data.Time" =>
        Converters.timeMillis
      case "io.debezium.time.MicroTime" => Converters.timeMicros
      case "io.debezium.time.NanoTime" => Converters.timeNanos
      case "io.debezium.time.Timestamp" | "org.apache.kafka.connect.data.Timestamp" =>
        Converters.epochMillisToTs
      case "io.debezium.time.MicroTimestamp" => Converters.epochMicrosToTs
      case "io.debezium.time.NanoTimestamp" => Converters.epochNanosToTs
      case "io.debezium.time.ZonedTimestamp" => Converters.zonedTimestamp
      case "io.debezium.time.ZonedTime" => Converters.timeWithTimezone
      case KafkaDecimal =>
        val scale = f.parameters.get("scale").map(_.toInt).getOrElse(0)
        val precision = f.parameters.get("connect.decimal.precision").map(_.toInt).getOrElse(38)
        c => Converters.debeziumDecimal(unbase64(c), precision, scale)
      case VariableDecimal =>
        c => Converters.variableScaleDecimal(unbase64(c.getField("value")), c.getField("scale"))
      case "io.debezium.data.Json" => Converters.canonicalJson
      case "io.debezium.data.Bits" => identity // base64 passthrough (Base64{})
      case GeometryPoint => c => Converters.pointGeoJson(c.getField("x"), c.getField("y"))
      case g if GeometryT.contains(g) => c => Converters.ewkbGeoJson(c.getField("wkb"))
      case "io.debezium.data.Uuid" | "io.debezium.data.Ltree" | "io.debezium.data.Enum" |
           "io.debezium.data.EnumSet" | "io.debezium.data.Xml" => identity
      case "io.debezium.time.Year" | "io.debezium.time.MicroDuration" => identity
      case _ => f.fieldType match {
        // array elements convert ELEMENT-WISE through the item metadata
        // (the reference's ToValueConverter recurses into the element
        // converter) — without this, a date[]/decimal[] column shipped
        // raw epoch-day ints / base64 text (round-13 review). Plain
        // scalar elements skip the transform entirely.
        case "array" if f.items.exists(needsLogical) =>
          c => transform(c, e => converter(f.items.get)(e))
        case "struct" | "map" => to_json(_) // Struct kind = canonical JSON text
        case _ => identity
      }
    }

  /** Column defaults declared by the envelope schema, keyed by field name
    * (relational_event.go:58-82) — feed these to
    * MaintenanceOps.backfillDefaults.
    */
  def schemaDefaults(fields: Seq[DbzField]): Map[String, String] =
    fields.flatMap(f => f.default.map(f.name -> _)).toMap

  /** Same defaults as typed Columns — each default rides the wire in the
    * field's wire representation and is pushed through the SAME logical
    * converter as the data column, so the result always matches the
    * decoded column's type (a raw wire-typed default against a converted
    * DateType/DecimalType column would fail coalesce resolution). Ready to
    * hand to MaintenanceOps.backfillDefaults
    * (clients/shared/merge.go:109-144 backfill path).
    */
  def defaultColumns(fields: Seq[DbzField]): Map[String, Column] =
    fields.flatMap { f =>
      wireType(f) match {
        // object-valued defaults (variable decimals, geometry, arrays) have
        // no string-literal wire form — Jackson's asText() flattens them to
        // "" anyway, so emitting a cast would only fail analysis later
        case _: StructType | _: ArrayType | _: MapType => None
        // logicalConverter, NOT converter: a default is a DDL literal on
        // the schema block, never gzip+base64-encoded like a compressed
        // column's payload
        case wt => f.default.map(d => f.name -> logicalConverter(f)(lit(d).cast(wt)))
      }
    }.toMap

  /** Auto-dispatched relational decode: schema block in, typed+converted
    * change rows out. The first envelope of a topic (or any sample with
    * the same schema block) drives the dispatch.
    */
  def decodeAuto(df: DataFrame, envelopeJsonSample: String): DataFrame =
    decodeWithFields(df, parseAfterFields(envelopeJsonSample))

  def decodeWithFields(df: DataFrame, fields: Seq[DbzField]): DataFrame = {
    val wire = StructType(fields.map(f => StructField(f.name, wireType(f))))
    val decoded = Envelope.decodeRelational(df, wire)
    val rowCols = fields.map(f => converter(f)(col(f.name)).as(f.name))
    val passthrough = decoded.columns.filterNot(fields.map(_.name).toSet).map(col)
    decoded.select(rowCols ++ passthrough: _*)
  }
}
