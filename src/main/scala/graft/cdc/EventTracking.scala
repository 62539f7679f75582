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

  /** ONE whole-struct JSON parse per row, behind a `Generate` barrier:
    * `explode(array(from_json(...)))` materializes the parsed payload as a
    * generated attribute, which (a) stops OptimizeJsonExprs from splitting
    * the parse into per-field schema-pruned copies — each of which still
    * scans the full JSON text, so five fields meant five parses — and
    * (b) stops the downstream validation Filter from being pushed below
    * this projection (and below any repartition Exchange), where each of
    * its ~8 predicates would re-run the entire upstream chain per row on
    * the SOURCE partitioning (a small parquet file or micro-batch is one
    * partition). Measured 9.5 s → 1.8 s on q49's 100k-row round-trip.
    */
  private def extracted(df: DataFrame, extra: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__p"),
      "trackevents decode: input must not contain reserved column __p")
    val p = from_json(col("value").cast(StringType), payloadSchema)
    val step1 = df.filter(col("value").isNotNull && length(col("value")) > 0)
      .select(Seq(explode(array(p)).as("__p")) ++ extra: _*)
    val carried = step1.columns.filter(_ != "__p").map(col)
    step1.select(Seq(
      col("__p").getField("event").as("__event"),
      graft.functions.Converters.zonedTimestamp(col("__p").getField("timestamp")).as("__ts"),
      col("__p").getField("messageID").as("__mid"),
      col("__p").getField("properties").as("__props"),
      col("__p").getField("extraFields").as("__extra"),
    ) ++ carried: _*)
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
    // ingestion timestamp survives as __kafka_timestamp. The raw Kafka
    // KEY rides through too (round-13 review: dropping it made the
    // reference's GetPrimaryKey — the raw key, format.go:45-49 — 
    // unrecoverable downstream; [[trackEventsKeyId]] consumes it)
    val carriedIn = Seq("key", "offset", "partition", "timestamp").filter(df.columns.contains)
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
    // originals ride in ONE struct column — per-column __orig_* aliases
    // could collide with user columns (or with the extracted __event/__mid
    // attributes); a single guarded internal name cannot
    require(!df.columns.contains("__orig"),
      "malformedTrackEvents: input must not contain reserved column __orig")
    val out = df.columns.map(c => col("__orig").getField(c).as(c))
    extracted(df, Seq(struct(df.columns.toSeq.map(col): _*).as("__orig")))
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
    // `*_id` deliberately has NO branch: IDs stay strings, which is the
    // default here anyway (an explicit pin only becomes meaningful if a
    // numeric-widening branch is ever added for other suffixes)
    if (lower.endsWith("_at") || lower.endsWith("_started")) TimestampType
    else StringType // JSON text form; cast downstream once the type is known
  }

  /** Distinct property/extraField keys over a bounded sample — one
    * driver-side job per topic, the GetColumns schema discovery.
    * `maxKeys` caps the collected set: the sample bounds the ROWS but not
    * the keys per row, so a pathological topic emitting unbounded dynamic
    * key names (ids/timestamps as keys) would otherwise grow this
    * driver-side collect — and the flattened schema — without limit. Past
    * the cap this fails loudly; such a topic needs an explicit key list,
    * not schema discovery.
    */
  def inferPropertyKeys(decoded: DataFrame, sampleRows: Int = 1000,
                        maxKeys: Int = 1024): Seq[String] = {
    val keys = decoded.limit(sampleRows)
      .select(explode(concat(map_keys(col("properties")), map_keys(col("extraFields")))).as("k"))
      .distinct().limit(maxKeys + 1).collect().map(_.getString(0))
    require(keys.length <= maxKeys,
      s"inferPropertyKeys found more than $maxKeys distinct property/extraField keys — " +
        "this topic uses unbounded dynamic keys; pass an explicit key list to " +
        "flattenTrackEvents instead of relying on schema discovery (or raise maxKeys)")
    keys.sorted.toSeq
  }

  /** Project the map columns into typed top-level columns (GetData's
    * flat row). Reserved output names (id/timestamp/event/markers) keep
    * their built-in meaning: a property with a colliding name is surfaced
    * as `<name>__property` instead of clobbering the metadata — the
    * reference escapes reserved columns the same way (EscapeName).
    * extraFields overwrite properties on shared keys — including with
    * an explicit null value (maps.Copy order in GetData); a key absent
    * from extraFields falls back to properties.
    */
  def flattenTrackEvents(decoded: DataFrame, keys: Seq[String]): DataFrame = {
    val passthroughNames = decoded.columns.toSeq
      .filterNot(c => c == "properties" || c == "extraFields")
    // reserved = the fixed metadata names PLUS whatever rides through
    // from the decode (offset/partition/__kafka_timestamp/carried source
    // columns): a property key equal to ANY passthrough column would
    // otherwise emit a duplicate name and every later reference —
    // including cfg.orderCol="offset" in the merge — dies AMBIGUOUS
    val reserved = Set("id", "timestamp", "event", Constants.OperationCol,
      Constants.DeleteCol, Constants.OnlySetDeleteCol, Constants.SourceMetadataCol) ++
      passthroughNames
    val propCols = keys.distinct.map { k =>
      // key-PRESENCE dispatch, not coalesce (round-13 review): the
      // reference's maps.Copy means an extraFields entry overwrites the
      // properties entry even when its VALUE is an explicit null —
      // coalesce would fall back to the stale properties value
      val raw = when(map_contains_key(col("extraFields"), lit(k)),
        element_at(col("extraFields"), k))
        .otherwise(element_at(col("properties"), k))
      val typed = inferredType(k) match {
        case TimestampType => graft.functions.Converters.zonedTimestamp(raw)
        case _ => raw
      }
      typed.as(if (reserved.contains(k)) s"${k}__property" else k)
    }
    decoded.select(passthroughNames.map(col) ++ propCols: _*)
  }
}
