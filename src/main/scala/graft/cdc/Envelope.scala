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
  def decodeRelational(df: DataFrame, rowSchema: StructType): DataFrame = {
    val env = from_json(col("value").cast(StringType), envelopeSchema(rowSchema))
    val decoded = df
      .filter(col("value").isNotNull && length(col("value")) > 0)
      .withColumn("__env", env)
      .withColumn("__p", col("__env.payload"))
    val isDelete = col("__p.op") === "d"
    val rowCols = rowSchema.fieldNames.toSeq.map { f =>
      when(isDelete, col(s"__p.before.$f")).otherwise(col(s"__p.after.$f")).as(f)
    }
    val metaCols = Seq(
      col("__p.op").as(Constants.OperationCol),
      isDelete.as(Constants.DeleteCol),
      col("__p.ts_ms").as("__source_ts_ms"),
      to_json(col("__p.source")).as(Constants.SourceMetadataCol),
    )
    val carried = Seq("offset", "partition", "timestamp")
      .filter(df.columns.contains).map(col)
    decoded.select(rowCols ++ metaCols ++ carried: _*)
  }

  /** S5: Kafka key -> PK columns. JSON keys (with or without the
    * schema/payload wrapper) via from_json; `Struct{k=v,...}` string keys
    * via regex (lib/debezium/keys.go:50-139).
    */
  def parseJsonKey(key: Column, keySchema: StructType): Column = {
    val wrapped = from_json(key.cast(StringType),
      StructType(Seq(StructField("payload", keySchema))))
    val bare = from_json(key.cast(StringType), keySchema)
    when(wrapped("payload").isNotNull, wrapped("payload")).otherwise(bare)
  }

  /** `Struct{id=1001}` -> value of `field` as string (keys.go:76-96). */
  def parseStructStringKey(key: Column, field: String): Column =
    regexp_extract(key.cast(StringType), s"[{,]\\s*$field=([^,}]*)", 1)
}
