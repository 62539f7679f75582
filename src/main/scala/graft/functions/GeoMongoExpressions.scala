package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F10 + S4 helper expressions: EWKB geometry -> GeoJSON Feature (ref:
  * lib/debezium/converters/geometry.go) and Mongo extended JSON -> plain
  * JSON (ref: lib/typing/bson.go + lib/cdc/mongo/debezium.go:24-97).
  */
object GeoMongoCodec {
  import java.nio.{ByteBuffer, ByteOrder}

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def readPoint(bb: ByteBuffer): String =
    s"[${fmt(bb.getDouble)},${fmt(bb.getDouble)}]"

  /** Minimal EWKB decoder for Point / LineString / Polygon (2D, optional
    * SRID flag), emitting the reference's GeoJSON Feature shape:
    * {"type":"Feature","geometry":{...}}. Unknown shapes -> null.
    */
  def ewkbToGeoJson(wkb: Array[Byte]): String = {
    try {
      val bb = ByteBuffer.wrap(wkb)
      bb.order(if (bb.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val typeWord = bb.getInt
      val hasSrid = (typeWord & 0x20000000) != 0
      if (hasSrid) bb.getInt // srid value unused in GeoJSON output
      val geomType = typeWord & 0xFFFF
      val geometry = geomType match {
        case 1 => s"""{"type":"Point","coordinates":${readPoint(bb)}}"""
        case 2 =>
          val n = bb.getInt
          val pts = (0 until n).map(_ => readPoint(bb)).mkString(",")
          s"""{"type":"LineString","coordinates":[$pts]}"""
        case 3 =>
          val rings = (0 until bb.getInt).map { _ =>
            val n = bb.getInt
            "[" + (0 until n).map(_ => readPoint(bb)).mkString(",") + "]"
          }.mkString(",")
          s"""{"type":"Polygon","coordinates":[$rings]}"""
        case _ => null
      }
      if (geometry == null) null
      else s"""{"type":"Feature","geometry":$geometry}"""
    } catch { case _: Exception => null }
  }

  /** Debezium Point payloads carry x/y directly (geometry.go:40-70). */
  def pointToGeoJson(x: Double, y: Double): String =
    s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[${fmt(x)},${fmt(y)}]}}"""

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Unwrap one extended-JSON node. Single-key objects whose key is a
    * known `$`-wrapper become their plain value; everything else recurses.
    */
  private def unwrap(n: JsonNode): JsonNode = n match {
    case o: ObjectNode if o.size() == 1 && o.fieldNames().next().startsWith("$") =>
      val key = o.fieldNames().next()
      val v = o.get(key)
      key match {
        case "$oid" | "$symbol" | "$numberDecimal" => v
        case "$numberInt" | "$numberLong" =>
          mapper.getNodeFactory.numberNode(v.asText().toLong)
        case "$numberDouble" =>
          if (v.asText() == "NaN" || v.asText().endsWith("Infinity"))
            mapper.getNodeFactory.nullNode()
          else mapper.getNodeFactory.numberNode(v.asText().toDouble)
        case "$date" =>
          val ms = v match {
            case vo: ObjectNode if vo.has("$numberLong") => vo.get("$numberLong").asText().toLong
            case other if other.isNumber => other.asLong()
            case other => return mapper.getNodeFactory.textNode(other.asText())
          }
          mapper.getNodeFactory.textNode(
            java.time.Instant.ofEpochMilli(ms).toString)
        case "$binary" =>
          if (v.isObject && v.has("base64")) v.get("base64") else v
        case "$timestamp" =>
          if (v.isObject && v.has("t"))
            mapper.getNodeFactory.textNode(
              java.time.Instant.ofEpochSecond(v.get("t").asLong()).toString)
          else v
        case "$minKey" | "$maxKey" | "$undefined" => mapper.getNodeFactory.nullNode()
        case _ => walk(o) // unknown wrapper: keep structure, recurse
      }
    case other => walk(other)
  }

  private def walk(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.fields().forEachRemaining { e => out.set[JsonNode](e.getKey, unwrap(e.getValue)); () }
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach { e => out.add(unwrap(e)); () }
      out
    case other => other
  }

  /** Mongo extended JSON (canonical or relaxed) -> plain JSON string. */
  def mongoExtJsonToPlain(s: String): String =
    try mapper.writeValueAsString(unwrap(mapper.readTree(s)))
    catch { case _: Exception => null }

  /** Codegen entry point for [[MongoExtJson]]. */
  def mongoExtJsonUtf8(s: UTF8String): UTF8String = {
    val out = mongoExtJsonToPlain(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

/** EWKB binary -> GeoJSON Feature string (F10). */
case class EwkbToGeoJson(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ewkb_geojson needs BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // unknown geometry types yield null
  override def nullSafeEval(input: Any): Any = {
    val out = GeoMongoCodec.ewkbToGeoJson(input.asInstanceOf[Array[Byte]])
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Mongo extended JSON string -> plain JSON string (S4). Real codegen —
  * this runs per record in the Mongo decode projection, and a fallback
  * would break that stage's whole-stage span (unparseable input -> null,
  * re-checked after the call).
  */
case class MongoExtJson(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mongo_ext_json needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  // unparseable (non-null) input yields null — see CanonicalJson.nullable
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GeoMongoCodec.mongoExtJsonUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoMongoCodec.mongoExtJsonUtf8($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
