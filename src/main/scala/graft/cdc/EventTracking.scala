package graft.cdc

import graft.Constants
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2's third parser: the `artie.trackevents` event-tracking format
  * (ref: lib/cdc/eventtracking/event.go + format.go, label constant
  * lib/config/constants/constants.go:52). Unlike the Debezium parsers the
  * payload is a flat analytics event, not a change envelope:
  *
  * {{{ {"event":"...","timestamp":"RFC3339","messageID":"...",
  *     "properties":{...},"extraFields":{...}} }}}
  *
  * Semantics mirrored from the reference:
  *  - every event is an upsert (`Operation()` = Create; `DeletePayload()`
  *    = false — event.go:29-35), so the delete markers are constant false
  *  - the flat output row is properties ++ extraFields ++
  *    {id = messageID, timestamp, event} (GetData, event.go:50-72)
  *  - source metadata is `{}` (event.go:46-48)
  *  - required fields event/timestamp/messageID/properties; a message
  *    missing any of them is rejected, not silently coerced
  *    (GetEventFromBytes, format.go:16-40) — [[malformedTrackEvents]]
  *    surfaces those frames for dead-lettering
  *  - the primary key comes from the raw Kafka key string, NOT from
  *    messageID (GetPrimaryKey, format.go:45-49) — [[trackEventsKeyId]]
  *    exposes exactly that; the data row's `id` column is messageID.
  *
  * Spark-native deltas: properties/extraFields are dynamic per message, so
  * the decoded row carries them as `map<string,string>` columns; a fixed
  * relational projection comes from [[flattenTrackEvents]] over a
  * driver-inferred (or caller-supplied) key list — the GetColumns
  * (event.go:81-97) schema pass, run once per topic instead of per row.
  */
object EventTracking {
  val Label = "artie.trackevents"

  /** Wire schema of one event frame. Values inside properties/extraFields
    * keep their JSON text form (numbers unquoted, strings bare) — the same
    * "type decided downstream" stance as the reference's typing.Invalid
    * default (event.go:100-113).
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("timestamp", StringType),
    StructField("messageID", StringType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("extraFields", MapType(StringType, StringType))))

  /** One projection extracting EVERY payload reference at once — the same
    * shape as Envelope.decodeWithPayload: keeping all getFields in a
    * single Project lets codegen subexpression elimination share one JSON
    * parse per row, where a parse in a Filter plus per-column pruned
    * parses in a Project each re-read the string (measured 2× on q49).
    * Validation then runs on the EXTRACTED attributes.
    */
  private def extracted(df: DataFrame, extra: Seq[Column]): DataFrame = {
    val p = from_json(col("value").cast(StringType), payloadSchema)
    df.filter(col("value").isNotNull && length(col("value")) > 0)
      .select(Seq(
        p.getField("event").as("__event"),
        graft.functions.Converters.zonedTimestamp(p.getField("timestamp")).as("__ts"),
        p.getField("messageID").as("__mid"),
        p.getField("properties").as("__props"),
        p.getField("extraFields").as("__extra"),
      ) ++ extra: _*)
  }

  /** Required-field validation (format.go:27-40) over the extracted
    * attributes: Go's zero values for missing fields are "" / nil / zero
    * time, all of which reject (a failed whole-payload parse nulls every
    * attribute and rejects too).
    */
  private def isValid: Column =
    col("__event").isNotNull && col("__event") =!= "" &&
      col("__mid").isNotNull && col("__mid") =!= "" &&
      col("__props").isNotNull && col("__ts").isNotNull

  /** Decode event-tracking frames into flat-ish rows:
    * (id, timestamp, event, properties, extraFields, artie markers).
    * Tombstones (empty value) are skipped like every other format;
    * messages failing required-field validation are DROPPED here — pair
    * with [[malformedTrackEvents]] to dead-letter them.
    */
  def decodeTrackEvents(df: DataFrame): DataFrame = {
    // the payload's own `timestamp` column wins the name; Kafka's
    // ingestion timestamp survives as __kafka_timestamp
    val carriedIn = Seq("offset", "partition", "timestamp").filter(df.columns.contains)
    val carriedCols = carriedIn
      .map(c => if (c == "timestamp") col(c).as("__kafka_timestamp") else col(c))
    val carriedOut = carriedIn
      .map(c => if (c == "timestamp") "__kafka_timestamp" else c)
    extracted(df, carriedCols)
      .filter(isValid)
      .select(Seq(
        col("__mid").as("id"),
        col("__ts").as("timestamp"),
        col("__event").as("event"),
        col("__props").as("properties"),
        coalesce(col("__extra"),
          map().cast(MapType(StringType, StringType))).as("extraFields"),
        lit("c").as(Constants.OperationCol),
        lit(false).as(Constants.DeleteCol),
        lit(false).as(Constants.OnlySetDeleteCol),
        lit("{}").as(Constants.SourceMetadataCol),
      ) ++ carriedOut.map(col): _*)
  }

  /** Raw frames that fail required-field validation (non-tombstone) — the
    * dead-letter complement of [[decodeTrackEvents]].
    */
  def malformedTrackEvents(df: DataFrame): DataFrame = {
    val out = df.columns.map(c => col(s"__orig_$c").as(c))
    extracted(df, df.columns.toSeq.map(c => col(c).as(s"__orig_$c")))
      .filter(!isValid)
      .select(out.toIndexedSeq: _*)
  }

  /** The reference's GetPrimaryKey: `id` = the raw Kafka key string
    * (format.go:45-49).
    */
  def trackEventsKeyId(key: Column): Column = key.cast(StringType).as("id")

  /** Name-pattern type inference for a property column — polymorphic
    * fields like IDs and timestamps must not get a too-narrow type from
    * their first value (inferTypeFromColumnName, event.go:100-113).
    */
  def inferredType(name: String): DataType = {
    val lower = name.toLowerCase
    if (lower.endsWith("_id")) StringType
    else if (lower.endsWith("_at") || lower.endsWith("_started")) TimestampType
    else StringType // JSON text form; cast downstream once the type is known
  }

  /** Distinct property/extraField keys over a bounded sample — one
    * driver-side job per topic, the GetColumns schema discovery.
    */
  def inferPropertyKeys(decoded: DataFrame, sampleRows: Int = 1000): Seq[String] =
    decoded.limit(sampleRows)
      .select(explode(concat(map_keys(col("properties")), map_keys(col("extraFields")))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq

  /** Project the map columns into typed top-level columns (GetData's
    * flat row). Reserved output names (id/timestamp/event/markers) keep
    * their built-in meaning: a property with a colliding name is surfaced
    * as `<name>__property` instead of clobbering the metadata — the
    * reference escapes reserved columns the same way (EscapeName).
    * Properties win over extraFields on shared keys ONLY when absent —
    * maps.Copy order in GetData means extraFields overwrite properties.
    */
  def flattenTrackEvents(decoded: DataFrame, keys: Seq[String]): DataFrame = {
    val reserved = Set("id", "timestamp", "event", Constants.OperationCol,
      Constants.DeleteCol, Constants.OnlySetDeleteCol, Constants.SourceMetadataCol)
    val propCols = keys.distinct.map { k =>
      val raw = coalesce(element_at(col("extraFields"), k), element_at(col("properties"), k))
      val typed = inferredType(k) match {
        case TimestampType => graft.functions.Converters.zonedTimestamp(raw)
        case _ => raw
      }
      typed.as(if (reserved.contains(k)) s"${k}__property" else k)
    }
    val passthrough = decoded.columns.toSeq
      .filterNot(c => c == "properties" || c == "extraFields").map(col)
    decoded.select(passthrough ++ propCols: _*)
  }
}
