package graft.sink

import graft.Constants
import org.apache.spark.sql.types._

/** The DDL face of each warehouse dialect — the rest of the reference's
  * per-client dialect interface beyond merge (lib/sql/dialect.go:30-68):
  * CREATE TABLE (permanent + temporary/staging form), ADD/DROP COLUMN,
  * DROP/TRUNCATE TABLE, the artie-temp-table sweep query, and the
  * Spark-type → destination-type mapping (`DataTypeForKind` twin). The
  * statement TEXT per dialect is the spec — each builder mirrors the
  * reference client's `ddl.go`/`typing.go` exactly where a Spark type has
  * a reference kind; Spark-only leftovers (e.g. BinaryType on dialects
  * whose reference switch falls through) take the dialect's natural type
  * and are excluded from golden assertions.
  *
  * [[MergeDialects]] carries the DML face; this registry carries DDL so a
  * statement-emitting sink can reconcile schema (create/evolve) before it
  * emits the merge plan — the reference's stage → DDL-reconcile → merge
  * flow (clients/shared/merge.go:43-68).
  */
trait DdlDialect {
  def name: String
  def quote(id: String): String

  /** DataTypeForKind twin (clients/＊/dialect/typing.go): destination type
    * for a Spark column type. `isPk` matters on MSSQL/MySQL, whose string
    * PKs are capped below the unbounded text form.
    */
  def dataType(dt: DataType, isPk: Boolean = false): String

  /** One `"name" TYPE` column-definition part. */
  def colDef(colName: String, dt: DataType, isPk: Boolean = false): String =
    s"${quote(colName)} ${dataType(dt, isPk)}"

  /** `temporary` builds the staging-table form where the dialect has one
    * (Snowflake TRANSIENT + stage file format, BigQuery expiration
    * OPTIONS); dialects that create staging tables like permanent ones
    * (their ddl.go says so) ignore it. `now` anchors BigQuery's
    * expiration timestamp (reference: time.Now + 6 h TTL) so golden tests
    * can pin it.
    */
  def createTable(target: String, colDefs: Seq[String], temporary: Boolean = false,
                  now: java.time.Instant = java.time.Instant.now()): String

  def addColumn(target: String, colDefSql: String): String
  def dropColumn(target: String, colName: String): String
  def dropTable(target: String): String = s"DROP TABLE IF EXISTS $target"
  def truncateTable(target: String): String = s"TRUNCATE TABLE $target"

  /** The `PRIMARY KEY (...)` column-list part the reference's shared
    * create builder appends in replication mode
    * (lib/destination/ddl/ddl.go:49-56, BuildCreateTableSQL) — handed to
    * every dialect's create; DuckDB's builder filters it back out
    * (motherduck dialect.go:149, appender-flush PK collisions) and
    * BigQuery marks it NOT ENFORCED. None where this engine's executable
    * adaptation has no PK syntax (Spark/Iceberg DDL).
    */
  def primaryKeyClause(pks: Seq[String]): Option[String] =
    if (pks.isEmpty) None
    else Some(s"PRIMARY KEY (${pks.map(quote).mkString(", ")})")

  /** GetDefaultValueStrategy twin (clients/＊/dialect/default.go): how a
    * source-declared column default reaches the destination. `Backfill`
    * (Snowflake/BigQuery/Redshift) runs an UPDATE … WHERE col IS NULL
    * after ADD COLUMN plus a "backfilled" column-comment marker; `Native`
    * relies on the column's own DEFAULT clause; `NotImplemented`
    * (Postgres/DuckDB) skips.
    */
  def defaultValueStrategy: DdlDialects.DefaultStrategy = DdlDialects.Native

  /** Literal rendering of a column default for backfill statement text
    * (clients/shared/default_value.go:21-87's DefaultValue, the subset of
    * kinds the wire envelope carries here): strings and date/time kinds
    * are single-quoted via the reference's sql.QuoteLiteral
    * (lib/sql/util.go:13 — backslashes doubled, then `\'` quote escape),
    * booleans and numbers print bare. Reference-faithful escaping
    * matters beyond fidelity: the Backfill-strategy dialects
    * (Snowflake/BigQuery/Redshift) all treat `\` as a string-literal
    * escape, so the earlier `''`-only doubling shipped raw backslashes
    * into statement text that could mis-parse or truncate — and BigQuery
    * standard SQL rejects `''` doubling outright. Control characters
    * have no portable literal form here — fail loudly rather than emit a
    * statement a destination would silently mangle.
    */
  def defaultValueSql(value: Any, dt: DataType): String = dt match {
    case StringType | DateType | TimestampType | TimestampNTZType =>
      val raw = String.valueOf(value)
      require(!raw.exists(_ < ' '),
        s"$name backfill default contains control characters (no portable " +
          s"literal form): ${raw.take(40)}")
      "'" + raw.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case _ => String.valueOf(value)
  }

  /** Backfill plan for one just-added column with a default
    * (clients/shared/default_value.go:102-150): the UPDATE plus the
    * `{"backfilled": true}` column-comment marker the reference writes so
    * a restart doesn't re-backfill. Empty unless [[defaultValueStrategy]]
    * is Backfill; Redshift and BigQuery override their reference-specific
    * statement forms. `defaultSql` is BY-NAME (ADVICE r13): rendering a
    * literal — including [[defaultValueSql]]'s control-character guard —
    * must only happen on the path that embeds it; a Native/NotImplemented
    * dialect discards the literal and must not crash on a default it
    * never quotes (the reference's QuoteLiteral is likewise only reached
    * from the backfill builders).
    */
  def backfillStatements(target: String, colName: String, defaultSql: => String): Seq[String] =
    defaultValueStrategy match {
      case DdlDialects.Backfill =>
        val c = quote(colName)
        Seq(s"UPDATE $target as t SET t.$c = $defaultSql WHERE t.$c IS NULL;",
          s"""COMMENT ON COLUMN $target.$c IS '{"backfilled": true}';""")
      case _ => Nil
    }

  /** Sweep query listing leftover `__artie`-suffixed temp tables for the
    * TTL reaper (D6) — (statement, bind args) exactly as the reference's
    * BuildSweepQuery returns them; None where the reference client sweeps
    * via a catalog API instead of SQL (BigQuery, Iceberg/Spark).
    */
  def sweepQuery(dbName: String, schemaName: String): Option[(String, Seq[Any])]

  /** D5's per-dialect dedupe plan (BuildDedupeQueries): capture one
    * surviving row per duplicated PK group in a staging table, delete
    * every occurrence from the target, re-insert the survivors. None
    * where the reference client panics "not implemented" (MSSQL, MySQL,
    * Postgres, ClickHouse — ReplacingMergeTree dedupes itself). The
    * QUALIFY `= 2` most dialects use captures the SECOND occurrence —
    * any one row of each group that HAS duplicates — while DuckDB's
    * `= 1` DESC variant keeps the latest; each form is that client's
    * dialect.go text. `now` anchors BigQuery's staging expiration.
    */
  def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                    includeArtieUpdatedAt: Boolean = false,
                    now: java.time.Instant = java.time.Instant.now()): Option[Seq[String]] = None

  /** Quoted `pks (+ __artie_updated_at) ASC` order list shared by the
    * QUALIFY dedupe forms.
    */
  protected def dedupeOrderCols(pks: Seq[String], includeArtieUpdatedAt: Boolean,
                                dir: String = "ASC"): String =
    (pks.map(quote) ++ (if (includeArtieUpdatedAt) Seq(quote(Constants.UpdatedAtCol)) else Nil))
      .map(c => s"$c $dir").mkString(", ")
}

object DdlDialects {
  private val ArtiePattern = "%" + "__artie" + "%"

  /** sql.DefaultValueStrategy twin (lib/sql/default_value_strategy.go). */
  sealed trait DefaultStrategy
  case object Backfill extends DefaultStrategy
  case object Native extends DefaultStrategy
  case object NotImplemented extends DefaultStrategy

  /** Shared decimal rendering (lib/typing/decimal/details.go:toKind):
    * NUMERIC(p, s) up to the 38-digit ceiling, the dialect's string type
    * past it.
    */
  private def numericOr(d: DecimalType, fallback: String): String =
    if (d.precision > 38) fallback else s"NUMERIC(${d.precision}, ${d.scale})"

  /** spark/iceberg: the dialect this engine executes (iceberg/dialect.go
    * 181-215 via MergeSqlBuilder's existing builders); types are Spark DDL.
    */
  object SparkDdl extends DdlDialect {
    val name = "spark"
    def quote(id: String) = s"`${id.replace("`", "")}`"
    def dataType(dt: DataType, isPk: Boolean) = dt.sql
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // Iceberg has no temporary tables (iceberg/ddl.go:194-204)
      s"CREATE TABLE IF NOT EXISTS $target (${colDefs.mkString(", ")}) USING iceberg TBLPROPERTIES ('format-version'='2')"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMNS ($colDefSql)"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN ${quote(colName)}"
    // Spark/Iceberg DDL has no PRIMARY KEY syntax — this dialect's create
    // EXECUTES here (GraftCatalog), so the clause is dropped rather than
    // emitted unrunnable (documented deviation; PK semantics ride in the
    // MERGE's ON clause)
    override def primaryKeyClause(pks: Seq[String]) = None
    def sweepQuery(dbName: String, schemaName: String) = None // catalog API, not SQL
    override def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                               includeArtieUpdatedAt: Boolean, now: java.time.Instant) =
      Some(MergeSqlBuilder.buildDedupe(target, stagingTable, pks,
        if (includeArtieUpdatedAt) Seq(Constants.UpdatedAtCol) else Nil))
  }

  /** clients/snowflake/dialect/{ddl,typing}.go. */
  object SnowflakeDdl extends DdlDialect {
    val name = "snowflake"
    def quote(id: String) = "\"" + id.replace("\"", "").toUpperCase + "\""
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case _: StructType | _: MapType => "variant"
      case BooleanType => "boolean"
      case DateType => "date"
      case TimestampNTZType => "timestamp_ntz"
      case TimestampType => "timestamp_tz"
      case d: DecimalType => numericOr(d, "STRING")
      case StringType => "string"
      case _: ArrayType => "array"
      case FloatType | DoubleType => "float"
      case ByteType | ShortType | IntegerType | LongType => "int"
      case BinaryType => "binary" // Spark-only leftover: dialect's natural type
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      if (!temporary) s"CREATE TABLE IF NOT EXISTS $target (${colDefs.mkString(",")})"
      else
        s"CREATE TRANSIENT TABLE IF NOT EXISTS $target (${colDefs.mkString(",")})" +
          " DATA_RETENTION_TIME_IN_DAYS = 0 STAGE_COPY_OPTIONS = ( PURGE = TRUE )" +
          " STAGE_FILE_FORMAT = ( TYPE = 'csv' FIELD_DELIMITER= '\\t'" +
          " FIELD_OPTIONALLY_ENCLOSED_BY='\"'" +
          s" NULL_IF='${Constants.NullValuePlaceholder}' EMPTY_FIELD_AS_NULL=FALSE)"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN IF NOT EXISTS $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN IF EXISTS ${quote(colName)}"
    override def truncateTable(target: String) = s"TRUNCATE TABLE IF EXISTS $target"
    override def defaultValueStrategy = DdlDialects.Backfill
    /** snowflake/dialect.go:81-117: transient staging + DELETE USING. */
    override def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                               includeArtieUpdatedAt: Boolean, now: java.time.Instant) = Some(Seq(
      s"CREATE OR REPLACE TRANSIENT TABLE $stagingTable AS (SELECT * FROM $target QUALIFY ROW_NUMBER() OVER (PARTITION BY ${pks.map(quote).mkString(", ")} ORDER BY ${dedupeOrderCols(pks, includeArtieUpdatedAt)}) = 2)",
      s"DELETE FROM $target t1 USING $stagingTable t2 WHERE ${pks.map(k => s"t1.${quote(k)} = t2.${quote(k)}").mkString(" AND ")}",
      s"INSERT INTO $target SELECT * FROM $stagingTable"))
    def sweepQuery(dbName: String, schemaName: String) = Some((
      s"""
SELECT
    table_schema, table_name
FROM
    $dbName.information_schema.tables
WHERE
    UPPER(table_schema) = UPPER(?) AND table_name ILIKE ?""",
      Seq(schemaName, ArtiePattern)))
  }

  /** clients/bigquery/dialect/{ddl,typing}.go. */
  object BigQueryDdl extends DdlDialect {
    val name = "bigquery"
    def quote(id: String) = s"`${id.replace("`", "")}`"
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "float64"
      case _: ArrayType => "array<string>"
      case _: StructType | _: MapType => "json"
      case DateType => "date"
      case TimestampNTZType => "datetime"
      case TimestampType => "timestamp"
      case d: DecimalType => numericOr(d, "BIGNUMERIC")
      case StringType => "string"
      case BooleanType => "bool"
      case ByteType | ShortType | IntegerType | LongType => "int"
      case BinaryType => "bytes"
      case other => other.sql
    }
    /** The temp form appends the 6 h expiration the reference computes
      * (ddl.go:14-26, constants.TemporaryTableTTL), formatted in BQ's
      * `2006-01-02 15:04:05 MST` layout in UTC.
      */
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) = {
      val base = s"CREATE TABLE IF NOT EXISTS $target (${colDefs.mkString(",")})"
      if (!temporary) base
      else {
        val expiry = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss 'UTC'")
          .withZone(java.time.ZoneOffset.UTC)
          .format(now.plus(java.time.Duration.ofHours(6)))
        s"""$base OPTIONS (expiration_timestamp = TIMESTAMP("$expiry"))"""
      }
    }
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN ${quote(colName)}"
    /** BigQuery PKs are informational (ddl.go:50-53's NOT ENFORCED). */
    override def primaryKeyClause(pks: Seq[String]) =
      super.primaryKeyClause(pks).map(_ + " NOT ENFORCED")
    def sweepQuery(dbName: String, schemaName: String) = None // swept via the BQ API
    override def defaultValueStrategy = DdlDialects.Backfill
    /** BigQuery has no COMMENT ON: the backfilled marker is a column
      * OPTIONS description (default_value.go:136-141).
      */
    override def backfillStatements(target: String, colName: String, defaultSql: => String) = {
      val c = quote(colName)
      Seq(s"UPDATE $target as t SET t.$c = $defaultSql WHERE t.$c IS NULL;",
        s"ALTER TABLE $target ALTER COLUMN $c SET OPTIONS (description=`{\"backfilled\": true}`);")
    }
    /** bigquery/dialect.go:61-101: expiring staging + DELETE WHERE EXISTS. */
    override def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                               includeArtieUpdatedAt: Boolean, now: java.time.Instant) = {
      val expiry = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss 'UTC'").withZone(java.time.ZoneOffset.UTC)
        .format(now.plus(java.time.Duration.ofHours(6)))
      Some(Seq(
        s"""CREATE OR REPLACE TABLE $stagingTable OPTIONS (expiration_timestamp = TIMESTAMP("$expiry")) AS (SELECT * FROM $target QUALIFY ROW_NUMBER() OVER (PARTITION BY ${pks.map(quote).mkString(", ")} ORDER BY ${dedupeOrderCols(pks, includeArtieUpdatedAt)}) = 2)""",
        s"DELETE FROM $target t1 WHERE EXISTS (SELECT * FROM $stagingTable t2 WHERE ${pks.map(k => s"t1.${quote(k)} = t2.${quote(k)}").mkString(" AND ")})",
        s"INSERT INTO $target SELECT * FROM $stagingTable"))
    }
  }

  /** clients/redshift/dialect/{ddl,typing}.go. Also carries the
    * reference's one widening builder ([[increaseStringPrecision]]).
    */
  object RedshiftDdl extends DdlDialect {
    val name = "redshift"
    def quote(id: String) = "\"" + id.replace("\"", "").toLowerCase + "\""
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case ShortType | ByteType => "INT2"
      case IntegerType => "INT4"
      case LongType => "INT8"
      case _: StructType | _: MapType => "SUPER"
      case _: ArrayType => "VARCHAR(MAX)" // no JSON type: arrays store as JSON text
      case StringType => "VARCHAR(MAX)"
      case BooleanType => "BOOLEAN NULL" // NULL appended so Redshift accepts nulls
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP WITHOUT TIME ZONE"
      case TimestampType => "TIMESTAMP WITH TIME ZONE"
      case d: DecimalType => numericOr(d, "TEXT")
      case FloatType | DoubleType => "float"
      case BinaryType => "VARBYTE"
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // same syntax for temporary and permanent tables (redshift/ddl.go:52-55)
      s"CREATE TABLE IF NOT EXISTS $target (${colDefs.mkString(",")});"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN ${quote(colName)}"
    /** dialect.go:377-379 — the string-precision widening ALTER. */
    def increaseStringPrecision(target: String, colName: String, newPrecision: Int): String =
      s"ALTER TABLE $target ALTER COLUMN ${quote(colName)} TYPE VARCHAR($newPrecision)"
    override def defaultValueStrategy = DdlDialects.Backfill
    /** Redshift UPDATE supports no table alias and needs none
      * (default_value.go:120-123, redshift BuildBackfillQuery).
      */
    override def backfillStatements(target: String, colName: String, defaultSql: => String) = {
      val c = quote(colName)
      Seq(s"UPDATE $target SET $c = $defaultSql WHERE $c IS NULL;",
        s"""COMMENT ON COLUMN $target.$c IS '{"backfilled": true}';""")
    }
    /** redshift/dialect.go:72-121 — TEMPORARY staging (schema-less name,
      * `WHERE true` making QUALIFY valid), alias-less DELETE USING.
      */
    override def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                               includeArtieUpdatedAt: Boolean, now: java.time.Instant) = {
      val stagingShort = quote(stagingTable.split('.').last) // temps may not carry a schema
      val targetShort = quote(target.split('.').last) // deletes may not alias the target
      Some(Seq(
        s"CREATE TEMPORARY TABLE $stagingShort AS (SELECT * FROM $target WHERE true QUALIFY ROW_NUMBER() OVER (PARTITION BY ${pks.map(quote).mkString(", ")} ORDER BY ${dedupeOrderCols(pks, includeArtieUpdatedAt)}) = 2)",
        s"DELETE FROM $target USING $stagingShort t2 WHERE ${pks.map(k => s"$targetShort.${quote(k)} = t2.${quote(k)}").mkString(" AND ")}",
        s"INSERT INTO $target SELECT * FROM $stagingShort"))
    }

    /** The reference's newer snapshot-dedupe plan
      * (redshift/dialect.go:202-267, BuildDedupeQueriesAlterTableAppend):
      * ALTER TABLE APPEND round-trip through a `_<artie>_dedupe` mirror
      * with a BIGINT IDENTITY tiebreaker — MAX(rn) picks the winner,
      * DISTSTYLE ALL colocates the losers, FILLTARGET/IGNOREEXTRA manage
      * the extra column. Returned flattened in execution order (the
      * reference groups them into Prep/AppendIn/Dedupe/AppendOut/Cleanup;
      * the two APPENDs must run outside BEGIN/END).
      */
    def dedupeQueriesAlterTableAppend(target: String, losersTable: String,
                                      pks: Seq[String]): Seq[String] = {
      val rn = quote("_artie_dedupe_rn")
      val dedupeId = s"${target}___artie_dedupe"
      val dedupeShort = quote(dedupeId.split('.').last)
      val losersShort = quote(losersTable.split('.').last)
      val pkTuple = pks.map(quote).mkString(", ")
      Seq(
        s"CREATE TABLE $dedupeId (LIKE $target INCLUDING DEFAULTS, $rn BIGINT IDENTITY(1,1))",
        s"ALTER TABLE $dedupeId APPEND FROM $target FILLTARGET",
        s"CREATE TEMPORARY TABLE $losersShort DISTSTYLE ALL AS SELECT $rn FROM $dedupeId WHERE $rn NOT IN (SELECT MAX($rn) FROM $dedupeId GROUP BY $pkTuple)",
        s"DELETE FROM $dedupeId USING $losersShort l WHERE $dedupeShort.$rn = l.$rn",
        s"ALTER TABLE $target APPEND FROM $dedupeId IGNOREEXTRA",
        s"DROP TABLE $dedupeId")
    }
    def sweepQuery(dbName: String, schemaName: String) = Some((
      s"""
SELECT
    n.nspname, c.relname
FROM
    PG_CATALOG.PG_CLASS c
JOIN
    PG_CATALOG.PG_NAMESPACE n ON n.oid = c.relnamespace
WHERE
    n.nspname = $$1 AND c.relname ILIKE $$2 AND c.relkind = 'r';""",
      Seq(schemaName, ArtiePattern)))
  }

  /** clients/mssql/dialect/{ddl,typing}.go. */
  object MssqlDdl extends DdlDialect {
    val name = "mssql"
    def quote(id: String) = "[" + id.replace("[", "").replace("]", "") + "]"
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "float"
      case ByteType | ShortType | IntegerType | LongType => "bigint"
      case _: StructType | _: MapType | _: ArrayType => "NVARCHAR(MAX)"
      // string PKs are capped at 900 chars (SQL Server PK length limit)
      case StringType => if (isPk) "VARCHAR(900)" else "VARCHAR(MAX)"
      case BooleanType => "BIT"
      case DateType => "DATE"
      case TimestampNTZType => "datetime2"
      case TimestampType => "datetimeoffset"
      case d: DecimalType => numericOr(d, "NVARCHAR(MAX)")
      case BinaryType => "VARBINARY(MAX)"
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // no IF NOT EXISTS on SQL Server (mssql/ddl.go:51-55)
      s"CREATE TABLE $target (${colDefs.mkString(",")});"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP ${quote(colName)}"
    def sweepQuery(dbName: String, schemaName: String) = Some((
      """
SELECT
    TABLE_SCHEMA, TABLE_NAME
FROM
    INFORMATION_SCHEMA.TABLES
WHERE
    LOWER(TABLE_NAME) LIKE ? AND LOWER(TABLE_SCHEMA) = LOWER(?)""",
      Seq(ArtiePattern, schemaName)))
  }

  /** clients/mysql/dialect/{ddl,typing}.go. */
  object MysqlDdl extends DdlDialect {
    val name = "mysql"
    def quote(id: String) = "`" + id.replace("`", "``") + "`"
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "DOUBLE"
      case ByteType | ShortType | IntegerType | LongType => "BIGINT"
      case _: StructType | _: MapType | _: ArrayType => "JSON"
      // string PKs capped at 255 (InnoDB utf8mb4 key-length headroom)
      case StringType => if (isPk) "VARCHAR(255)" else "TEXT"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType | TimestampType => "DATETIME(6)" // no TZ-aware type
      case d: DecimalType => numericOr(d, "TEXT")
      case BinaryType => "BLOB"
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // no TEMPORARY keyword: session-scoped temps break connection pooling
      s"CREATE TABLE IF NOT EXISTS $target (${colDefs.mkString(",")});"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN ${quote(colName)}"
    def sweepQuery(dbName: String, schemaName: String) = Some((
      """
SELECT
    TABLE_SCHEMA, TABLE_NAME
FROM
    INFORMATION_SCHEMA.TABLES
WHERE
    LOWER(TABLE_NAME) LIKE ? AND LOWER(TABLE_SCHEMA) = LOWER(?)""",
      Seq(ArtiePattern, dbName)))
  }

  /** clients/postgres/dialect/dialect.go:67-124,326-386. */
  object PostgresDdl extends DdlDialect {
    val name = "postgres"
    def quote(id: String) = "\"" + id.replace("\"", "\"\"") + "\""
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "double precision"
      case BooleanType => "boolean"
      case _: StructType | _: MapType => "jsonb"
      case StringType => "text"
      case BinaryType => "bytea"
      case DateType => "date"
      case TimestampNTZType => "timestamp without time zone"
      case TimestampType => "timestamp with time zone"
      case ShortType | ByteType => "smallint"
      case IntegerType => "integer"
      case LongType => "bigint"
      case d: DecimalType => numericOr(d, "text")
      case ArrayType(elem, _) => s"${dataType(elem, isPk = false)}[]"
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // temps created like permanent tables (session scoping vs pooling)
      s"CREATE TABLE $target (${colDefs.mkString(",")});"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN IF NOT EXISTS $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN IF EXISTS ${quote(colName)}"
    override def defaultValueStrategy = DdlDialects.NotImplemented
    def sweepQuery(dbName: String, schemaName: String) = Some((
      "SELECT table_schema, table_name FROM information_schema.tables WHERE table_schema = $1 AND table_name LIKE $2",
      Seq(schemaName, ArtiePattern)))
  }

  /** clients/motherduck/dialect/dialect.go:31-76,143-162,381-395. */
  object DuckDbDdl extends DdlDialect {
    val name = "duckdb"
    def quote(id: String) = "\"" + id.replace("\"", "\"\"") + "\""
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "double"
      case ShortType | ByteType => "smallint"
      case IntegerType => "integer"
      case LongType => "bigint"
      case d: DecimalType => numericOr(d, "text")
      case BooleanType => "boolean"
      case _: ArrayType => "text[]"
      case _: StructType | _: MapType => "json"
      case StringType => "text"
      case DateType => "date"
      case TimestampNTZType => "timestamp"
      case TimestampType => "timestamp with time zone"
      case BinaryType => "blob"
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // PRIMARY KEY parts are dropped: appender flushes would collide with
      // PK constraints and constraints can't be dropped later
      // (motherduck/dialect.go:143-156)
      s"CREATE TABLE $target (${colDefs.filterNot(_.contains("PRIMARY KEY")).mkString(",")});"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN IF NOT EXISTS $colDefSql;"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN IF EXISTS ${quote(colName)};"
    override def defaultValueStrategy = DdlDialects.NotImplemented
    def sweepQuery(dbName: String, schemaName: String) = Some((
      "SELECT table_schema, table_name FROM information_schema.tables WHERE table_catalog = $1 AND table_schema = $2 AND table_name LIKE $3;",
      Seq(dbName, schemaName, ArtiePattern)))
    /** motherduck/dialect.go:166-218 — the `= 1` DESC keep-latest variant,
      * `SELECT 1` EXISTS probe, trailing staging DROP.
      */
    override def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                               includeArtieUpdatedAt: Boolean, now: java.time.Instant) = Some(Seq(
      s"CREATE TABLE $stagingTable AS (SELECT * FROM $target QUALIFY ROW_NUMBER() OVER (PARTITION BY ${pks.map(quote).mkString(", ")} ORDER BY ${dedupeOrderCols(pks, includeArtieUpdatedAt, "DESC")}) = 1)",
      s"DELETE FROM $target t1 WHERE EXISTS (SELECT 1 FROM $stagingTable t2 WHERE ${pks.map(k => s"t1.${quote(k)} = t2.${quote(k)}").mkString(" AND ")})",
      s"INSERT INTO $target SELECT * FROM $stagingTable",
      dropTable(stagingTable)))
  }

  /** clients/databricks/dialect/{ddl,typing}.go. */
  object DatabricksDdl extends DdlDialect {
    val name = "databricks"
    def quote(id: String) = "`" + id.replace("`", "") + "`"
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "DOUBLE"
      case ByteType | ShortType | IntegerType | LongType => "BIGINT"
      case _: StructType | _: MapType => "STRING"
      case _: ArrayType => "ARRAY<string>"
      case StringType => "STRING"
      case BinaryType => "BINARY"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP_NTZ"
      case TimestampType => "TIMESTAMP"
      case d: DecimalType => numericOr(d, "STRING")
      case other => other.sql
    }
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) =
      // Databricks has no temporary tables (databricks/ddl.go:11-14);
      // note the ", " join — the one dialect that spaces its column list
      s"CREATE TABLE IF NOT EXISTS $target (${colDefs.mkString(", ")})"
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN $colDefSql"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN ${quote(colName)}"
    def sweepQuery(dbName: String, schemaName: String) = Some((
      s"""
SELECT
    table_schema, table_name
FROM
    ${quote(dbName)}.information_schema.tables
WHERE
    UPPER(table_schema) = UPPER(:p_schema) AND table_name ILIKE :p_artie_prefix""",
      Seq(schemaName, ArtiePattern)))
    /** databricks/dialect.go:52-84 — bare `AS SELECT` staging create,
      * DELETE WHERE EXISTS.
      */
    override def dedupeQueries(target: String, stagingTable: String, pks: Seq[String],
                               includeArtieUpdatedAt: Boolean, now: java.time.Instant) = Some(Seq(
      s"CREATE TABLE $stagingTable AS SELECT * FROM $target QUALIFY ROW_NUMBER() OVER (PARTITION BY ${pks.map(quote).mkString(", ")} ORDER BY ${dedupeOrderCols(pks, includeArtieUpdatedAt)}) = 2",
      s"DELETE FROM $target t1 WHERE EXISTS (SELECT * FROM $stagingTable t2 WHERE ${pks.map(k => s"t1.${quote(k)} = t2.${quote(k)}").mkString(" AND ")})",
      s"INSERT INTO $target SELECT * FROM $stagingTable"))
  }

  /** clients/clickhouse/dialect/dialect.go:67-120 — wraps the existing
    * engine-form CREATE builders; types from DataTypeForKind:123-176.
    */
  object ClickhouseDdl extends DdlDialect {
    val name = "clickhouse"
    def quote(id: String) = "`" + id.replace("`", "") + "`"
    def dataType(dt: DataType, isPk: Boolean) = dt match {
      case FloatType | DoubleType => "Float64"
      case ShortType | ByteType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case d: DecimalType => numericOr(d, "String")
      case BooleanType => "Bool"
      case _: ArrayType => "Array(String)"
      case _: StructType | _: MapType => "JSON"
      case StringType => "String"
      case DateType => "Date"
      case TimestampNTZType | TimestampType => "DateTime"
      case BinaryType => "String"
      case other => other.sql
    }
    /** Replication form: ReplacingMergeTree with the delete-marker column
      * surgery ([[ClickhouseSqlBuilder.buildCreateTable]] keeps the golden
      * text); history mode is exposed there too. The engine clause
      * references `__artie_updated_at` WITHOUT declaring it in the column
      * list — byte-faithful to the reference
      * (clickhouse/dialect.go:91-108, whose own comment says declaring it
      * inline collides with the later ALTER that adds it; the column
      * arrives via the metadata-column ADD when includeArtieUpdatedAt is
      * configured, which ClickHouse topics set).
      */
    def createTable(target: String, colDefs: Seq[String], temporary: Boolean,
                    now: java.time.Instant) = {
      val kept = colDefs.filterNot(_.contains(Constants.DeleteCol)) :+
        s"${quote(Constants.DeleteCol)} UInt8"
      s"CREATE TABLE $target (${kept.mkString(",")}) ENGINE = ReplacingMergeTree(${quote(Constants.UpdatedAtCol)}, ${quote(Constants.DeleteCol)});"
    }
    def addColumn(target: String, colDefSql: String) =
      s"ALTER TABLE $target ADD COLUMN IF NOT EXISTS $colDefSql;"
    def dropColumn(target: String, colName: String) =
      s"ALTER TABLE $target DROP COLUMN IF EXISTS ${quote(colName)};"
    def sweepQuery(dbName: String, schemaName: String) = Some((
      "SELECT table_schema, table_name FROM information_schema.tables WHERE table_catalog = ? AND table_name LIKE ?;",
      Seq(dbName, ArtiePattern)))
  }

  /** Every dialect label — the merge registry's nine plus clickhouse
    * (whose merge is engine-side but whose DDL face is first-class).
    */
  val registry: Map[String, DdlDialect] = Seq(
    SparkDdl, SnowflakeDdl, BigQueryDdl, RedshiftDdl, MssqlDdl, MysqlDdl,
    PostgresDdl, DuckDbDdl, DatabricksDdl, ClickhouseDdl,
  ).map(d => d.name -> d).toMap

  def apply(label: String): DdlDialect =
    registry.getOrElse(label, throw new IllegalArgumentException(
      s"unknown DDL dialect: $label (known: ${registry.keys.toSeq.sorted.mkString(", ")})"))
}
