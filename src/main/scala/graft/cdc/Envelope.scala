package graft.cdc

import graft.Constants
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium relational envelope decoding (ref: lib/cdc/relational/debezium.go
  * + lib/cdc/util/relational_event.go:19-45,123-188), expressed as
  * `from_json` over the Kafka value — one codegen'd projection, no
  * per-record driver work.
  */
object Envelope {
  /** Envelope StructType for a given row schema (schema-enabled Debezium
    * JSON: {schema:..., payload:{before,after,source,op,ts_ms}}).
    */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", rowSchema),
      StructField("after", rowSchema),
      StructField("source", MapType(StringType, StringType)),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
    )))))

  /** Decode Kafka records into typed change rows:
    *  - tombstones (empty value) dropped (kafka.go:71-74)
    *  - delete events take `before`'s columns (after is null), others take
    *    `after` (relational_event.go:123-188)
    *  - `__artie_delete` / `__artie_operation` markers synthesized
    *    (P8, relational_event.go:126-154)
    *
    * Input needs `value` (string/binary); `offset` is carried through when
    * present (the ordering column for last-wins dedup).
    */
  def decodeRelational(df: DataFrame, rowSchema: StructType): DataFrame =
    decodeWithPayload(df, rowSchema,
      from_json(col("value").cast(StringType), envelopeSchema(rowSchema))
        .getField("payload"))

  /** Schema-disabled topics (JsonConverter schemas.enable=false) emit the
    * envelope WITHOUT the payload wrapper: {"before":...,"after":...,
    * "op":...}. Same decode, parsing the bare shape.
    */
  def decodeBareRelational(df: DataFrame, rowSchema: StructType): DataFrame =
    decodeWithPayload(df, rowSchema,
      from_json(col("value").cast(StringType),
        envelopeSchema(rowSchema)("payload").dataType.asInstanceOf[StructType]))

  private def decodeWithPayload(df: DataFrame, rowSchema: StructType,
                                payload: Column): DataFrame = {
    // The parsed payload is materialized ONCE per row as a generated
    // attribute (`explode` of a 1-element array). Without the Generate
    // barrier, OptimizeJsonExprs splits the parse into a schema-pruned
    // copy per referenced column (each still scanning the full JSON text
    // — N row columns = N parses), and predicate pushdown drags the final
    // op-null guard below the projection and any repartition Exchange,
    // re-running the parse chain on the source partitioning (one
    // partition for a small file or micro-batch).
    require(!df.columns.contains("__p"),
      "relational decode: input must not contain reserved column __p")
    // a ROW column named like a synthesized marker would emit TWICE (the
    // row projection and the meta projection), making every downstream
    // col("__artie_delete")/col("__artie_operation") reference ambiguous
    // — the artie marker namespace is reserved (lib/config/constants.go)
    // OnlySetDeleteCol included (round-13 review): a data column named
    // __artie_only_set_delete would pass decode and mergeApply would
    // reinterpret it as the only-set-delete CONTROL flag — matched rows
    // whose data value is true silently keep all target values
    val reservedMeta = Set(Constants.OperationCol, Constants.DeleteCol,
      Constants.OnlySetDeleteCol, "__source_ts_ms", Constants.SourceMetadataCol)
    val clashes = rowSchema.fieldNames.filter(reservedMeta.contains)
    require(clashes.isEmpty,
      s"relational decode: row schema carries reserved metadata column(s) " +
        s"${clashes.mkString(", ")} — the artie marker namespace is reserved " +
        "(rename the source columns or exclude them via columnsToExclude)")
    val carriedIn = Seq("offset", "partition", "timestamp")
      .filter(df.columns.contains)
    // a Kafka metadata column whose name collides with a ROW column rides
    // through under a __kafka_ prefix (the rename decodeTrackEvents
    // applies to `timestamp`) — emitting both unrenamed would make every
    // downstream col("timestamp") reference ambiguous
    val rowNames = rowSchema.fieldNames.toSet
    val carriedOut = carriedIn.map(n => if (rowNames.contains(n)) s"__kafka_$n" else n)
    val carriedCols = carriedIn.zip(carriedOut).map { case (n, o) => col(n).as(o) }
    val step1 = df.filter(col("value").isNotNull && length(col("value")) > 0)
      .select(Seq(explode(array(payload)).as("__p")) ++ carriedCols: _*)
    val p = col("__p")
    val op = p.getField("op")
    val isDelete = op === "d"
    val rowCols = rowSchema.fieldNames.toSeq.map { f =>
      when(isDelete, p.getField("before").getField(f))
        .otherwise(p.getField("after").getField(f)).as(f)
    }
    val metaCols = Seq(
      op.as(Constants.OperationCol),
      isDelete.as(Constants.DeleteCol),
      p.getField("ts_ms").as("__source_ts_ms"),
      to_json(p.getField("source")).as(Constants.SourceMetadataCol),
    )
    step1.select(rowCols ++ metaCols ++ carriedOut.map(col): _*)
      // malformed JSON parses to a null envelope -> null op after the
      // projection; dropping here keeps phantom all-null rows (null PK,
      // null delete flag) out of the dedup/merge stages. The predicate is
      // on the EXTRACTED attribute, not the parse expression.
      .filter(col(Constants.OperationCol).isNotNull)
  }

  /** Raw frames whose (non-tombstone) value fails to decode as a
    * relational envelope — malformed JSON, or JSON that is not a change
    * envelope (no `op`). [[decodeRelational]] drops these rows to keep
    * phantom all-null records out of the merge; a pipeline that must not
    * lose poison messages writes THIS complement to a dead-letter target
    * (the reference surfaces per-record processing errors instead of
    * skipping them — processes/consumer/process.go). `bare` selects the
    * schemas.enable=false envelope shape and MUST match the decoder used
    * on the topic ([[decodeRelational]] vs [[decodeBareRelational]]) — a
    * mismatched shape would classify the whole stream malformed. The
    * parse here prunes to just the `op` field (OptimizeJsonExprs), so the
    * check is far cheaper than the full decode.
    */
  def malformedRelational(df: DataFrame, rowSchema: StructType,
                          bare: Boolean = false): DataFrame = {
    val out = df.columns.map(col)
    val op =
      if (bare) from_json(col("value").cast(StringType),
        envelopeSchema(rowSchema)("payload").dataType.asInstanceOf[StructType])
        .getField("op")
      else from_json(col("value").cast(StringType), envelopeSchema(rowSchema))
        .getField("payload").getField("op")
    // filter on the expression directly — a helper column would shadow any
    // pre-existing column of the same name and corrupt the dead-letter rows
    df.filter(col("value").isNotNull && length(col("value")) > 0)
      .filter(op.isNull)
      .select(out.toIndexedSeq: _*)
  }

  /** Value-based schema inference for schema-disabled Debezium topics —
    * the Spark-native analog of the reference's per-value kind inference
    * (lib/typing/parse.go:23-67): run Spark's JSON schema inference over a
    * bounded sample of before/after documents (one driver-side job, once
    * per topic), instead of re-inferring per value per row.
    */
  def inferRowSchema(df: DataFrame, sampleRows: Int = 1000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col("value").cast(StringType)
    // wrapped ($.payload.after) and bare ($.after) envelope shapes both
    // occur in the wild — schemas.enable=false drops the payload wrapper
    val docs = df.filter(col("value").isNotNull && length(col("value")) > 0)
      .select(explode(array(
        coalesce(get_json_object(v, "$.payload.after"), get_json_object(v, "$.after")),
        coalesce(get_json_object(v, "$.payload.before"), get_json_object(v, "$.before"))))
        .as("doc"))
      .filter(col("doc").isNotNull)
      .limit(sampleRows)
      .as[String]
    spark.read.json(docs).schema
  }

  /** Schemaless decode: infer the row schema from the data, detect whether
    * the envelope carries the payload wrapper (one driver-side sample
    * probe), then decode with the matching shape. For a streaming source,
    * run this on a bounded batch read of the same topic first and pass the
    * schema to [[decodeRelational]]/[[decodeBareRelational]].
    */
  def decodeInferred(df: DataFrame, sampleRows: Int = 1000): DataFrame = {
    val schema = inferRowSchema(df, sampleRows)
    val wrapped = df
      .filter(col("value").isNotNull && length(col("value")) > 0)
      .filter(get_json_object(col("value").cast(StringType), "$.payload.op").isNotNull)
      .limit(1).count() > 0
    if (wrapped) decodeRelational(df, schema) else decodeBareRelational(df, schema)
  }

  /** S5: Kafka key -> PK columns. JSON keys (with or without the
    * schema/payload wrapper) via from_json; `Struct{k=v,...}` string keys
    * via regex (lib/debezium/keys.go:50-139). The logical-table-router
    * marker `__dbz__physicalTableIdentifier` is never a PK — it is dropped
    * from the parse schema so routed topics cannot mis-key
    * (keys.go: `delete(retMap, constants.DebeziumTopicRoutingKey)`).
    */
  def parseJsonKey(key: Column, keySchema: StructType): Column = {
    val cleaned = StructType(
      keySchema.fields.filterNot(_.name == Constants.DebeziumTopicRoutingKey))
    // a key schema that contains ONLY the routing marker would clean to an
    // empty struct, which from_json satisfies for ANY json — every caller
    // would silently get zero PK columns; fail fast instead
    require(cleaned.fields.nonEmpty,
      s"key schema contains no PK fields after stripping " +
        s"${Constants.DebeziumTopicRoutingKey} — set primaryKeysOverride for this topic")
    val wrapped = from_json(key.cast(StringType),
      StructType(Seq(StructField("payload", cleaned))))
    val bare = from_json(key.cast(StringType), cleaned)
    when(wrapped("payload").isNotNull, wrapped("payload")).otherwise(bare)
  }

  /** `Struct{id=1001}` -> value of `field` as string (keys.go:76-96). */
  def parseStructStringKey(key: Column, field: String): Column =
    regexp_extract(key.cast(StringType), s"[{,]\\s*$field=([^,}]*)", 1)

  /** S4: MongoDB Debezium envelope — before/after arrive as extended-JSON
    * *strings* (lib/cdc/mongo/debezium.go:24-97). Normalizes extended JSON
    * to plain JSON, surfaces `_id` as the PK column (the reference's
    * id -> _id rename), keeps the document as a JSON string column
    * (Struct kind semantics, §1.2).
    */
  def decodeMongo(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("payload", StructType(Seq(
        StructField("before", StringType),
        StructField("after", StringType),
        StructField("updateDescription", StringType),
        StructField("source", MapType(StringType, StringType)),
        StructField("op", StringType),
        StructField("ts_ms", LongType),
      )))))
    // same decode discipline as the relational path (decodeWithPayload):
    // reserved-column guard, ONE parse per row behind a Generate barrier
    // (withColumn let OptimizeJsonExprs split the parse into a pruned
    // copy per referenced field — op/before/after/ts_ms/source = 5 full
    // JSON scans per row), and a malformed-frame filter at the end
    require(!df.columns.contains("__p"),
      "mongo decode: input must not contain reserved column __p")
    val carriedNames = Seq("offset", "partition", "timestamp")
      .filter(df.columns.contains)
    val keyCol = if (df.columns.contains("key")) Seq(col("key")) else Nil
    val decoded = df
      .filter(col("value").isNotNull && length(col("value")) > 0)
      .select(Seq(explode(array(from_json(col("value").cast(StringType), schema)
        .getField("payload"))).as("__p")) ++ carriedNames.map(col) ++ keyCol: _*)
    val isDelete = col("__p.op") === "d"
    val rawDoc = when(isDelete, col("__p.before")).otherwise(col("__p.after"))
    val doc = graft.functions.Converters.mongoExtJson(rawDoc)
    val carried = carriedNames.map(col)
    // delete events carry no before-image unless pre-images are enabled,
    // so the PK must come from the Kafka key (mongo/debezium.go
    // GetPrimaryKey + the id -> _id rename); the document body is the
    // fallback for insert/update
    val keyId =
      if (df.columns.contains("key")) {
        val keyJson = graft.functions.Converters.mongoExtJson(col("key").cast(StringType))
        coalesce(
          get_json_object(keyJson, "$.payload.id"),
          get_json_object(keyJson, "$.id"),
          get_json_object(keyJson, "$.payload._id"),
          get_json_object(keyJson, "$._id"))
      } else lit(null).cast(StringType)
    decoded.select(Seq(
      coalesce(get_json_object(doc, "$._id"), keyId).as("_id"),
      doc.as("document"),
      col("__p.op").as(Constants.OperationCol),
      isDelete.as(Constants.DeleteCol),
      col("__p.ts_ms").as("__source_ts_ms"),
      to_json(col("__p.source")).as(Constants.SourceMetadataCol),
    ) ++ carried: _*)
      // malformed/non-envelope JSON parses to a null payload → null op;
      // without this filter a poison frame with a parseable KEY became a
      // phantom (real _id, null document, null delete flag) row that the
      // merge dialects' COALESCE(delete,false) arm UPSERTS — overwriting
      // that _id's live document with NULL at the destination
      .filter(col(Constants.OperationCol).isNotNull)
  }
}

/** S2: CDC format registry (lib/cdc/format/format.go:14-29) — label ->
  * envelope decoder. Three parsers like the reference: relational
  * Debezium, Mongo Debezium, and `artie.trackevents` event tracking.
  */
object FormatRegistry {
  /** Decoders take (kafka frame df, row schema); Mongo and event tracking
    * ignore the schema (documents/events are schemaless JSON).
    */
  def decoder(label: String): (DataFrame, StructType) => DataFrame = label match {
    case "debezium.relational" => Envelope.decodeRelational
    case "debezium.mongodb" => (df, _) => Envelope.decodeMongo(df)
    case EventTracking.Label => (df, _) => EventTracking.decodeTrackEvents(df)
    case other => throw new IllegalArgumentException(
      s"unsupported CDC format label: $other (expected debezium.relational " +
        s"| debezium.mongodb | ${EventTracking.Label})")
  }
}
