package graft

/** Reserved metadata column names and sentinel values.
  *
  * Mirrors the reference's reserved-column surface
  * (artie-labs/transfer `lib/config/constants/constants.go:7-66`).
  */
object Constants {
  val DeleteCol = "__artie_delete"
  val OnlySetDeleteCol = "__artie_only_set_delete"
  val UpdatedAtCol = "__artie_updated_at"
  val DbUpdatedAtCol = "__artie_db_updated_at"
  val OperationCol = "__artie_operation"
  val SourceMetadataCol = "__artie_source_metadata"
  val FullSourceTableCol = "__artie_full_source_table_name"

  /** Placeholder for NULL in canonical string form (constants.go:8). */
  val NullValuePlaceholder = "__artie_null_value"

  /** Debezium TOAST sentinel: column value unavailable in this event
    * (constants.go:21-24); the dedup/merge operators inherit the previous
    * value when they see it.
    */
  val ToastPlaceholder = "__debezium_unavailable_value"

  /** Value exceeded destination size cap (constants.go + staging.go:25-41). */
  val ExceededValuePlaceholder = "__artie_exceeded_value"

  /** History-mode table suffix (models/event/event.go:82-94). */
  val HistoryTableSuffix = "__history"

  /** Debezium logical-table-router marker injected into keys of
    * multi-partition-routed topics — never a real PK column; stripped
    * during key parsing (constants.go:11-14, keys.go:50-139).
    */
  val DebeziumTopicRoutingKey = "__dbz__physicalTableIdentifier"
}
