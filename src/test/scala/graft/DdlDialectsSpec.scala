package graft

import java.time.Instant

import graft.sink.DdlDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden strings for the DDL face of every dialect — the reference's
  * per-client ddl.go/typing.go surface (CREATE TABLE incl. staging forms,
  * ADD/DROP COLUMN, DROP/TRUNCATE, sweep, Redshift's string widening),
  * pinned the way each client's dialect_test.go pins them.
  */
class DdlDialectsSpec extends AnyFunSuite {
  private val now = Instant.parse("2026-08-15T00:00:00Z")
  private val allLabels = Set("spark", "snowflake", "bigquery", "redshift",
    "mssql", "mysql", "postgres", "duckdb", "databricks", "clickhouse")

  test("registry covers the merge registry's label space plus clickhouse") {
    assert(DdlDialects.registry.keySet == allLabels)
    val e = intercept[IllegalArgumentException](DdlDialects("sqlite"))
    assert(e.getMessage.contains("unknown DDL dialect"))
  }

  test("snowflake: transient staging create, IF-NOT/IF-EXISTS alters, truncate, sweep") {
    val d = DdlDialects("snowflake")
    assert(d.createTable("db.schema.t", Seq("\"ID\" int", "\"NAME\" string"), temporary = false, now) ==
      """CREATE TABLE IF NOT EXISTS db.schema.t ("ID" int,"NAME" string)""")
    val tmp = d.createTable("db.schema.t__artie_x", Seq("\"ID\" int"), temporary = true, now)
    assert(tmp.startsWith("""CREATE TRANSIENT TABLE IF NOT EXISTS db.schema.t__artie_x ("ID" int) DATA_RETENTION_TIME_IN_DAYS = 0 STAGE_COPY_OPTIONS = ( PURGE = TRUE )"""))
    assert(tmp.contains("FIELD_DELIMITER= '\\t'") &&
      tmp.contains(s"NULL_IF='${Constants.NullValuePlaceholder}' EMPTY_FIELD_AS_NULL=FALSE)"))
    assert(d.addColumn("db.schema.t", d.colDef("age", LongType)) ==
      """ALTER TABLE db.schema.t ADD COLUMN IF NOT EXISTS "AGE" int""")
    assert(d.dropColumn("db.schema.t", "age") ==
      """ALTER TABLE db.schema.t DROP COLUMN IF EXISTS "AGE"""")
    assert(d.truncateTable("db.schema.t") == "TRUNCATE TABLE IF EXISTS db.schema.t")
    assert(d.dropTable("db.schema.t") == "DROP TABLE IF EXISTS db.schema.t")
    val Some((sweep, args)) = d.sweepQuery("db", "schema")
    assert(sweep.contains("db.information_schema.tables") &&
      sweep.contains("UPPER(table_schema) = UPPER(?) AND table_name ILIKE ?"))
    assert(args == Seq("schema", "%__artie%"))
  }

  test("snowflake types: variant struct, timestamp split, decimal ceiling") {
    val d = DdlDialects("snowflake")
    assert(d.dataType(StructType(Nil)) == "variant")
    assert(d.dataType(TimestampType) == "timestamp_tz")
    assert(d.dataType(TimestampNTZType) == "timestamp_ntz")
    assert(d.dataType(DecimalType(20, 4)) == "NUMERIC(20, 4)")
    assert(d.dataType(ArrayType(StringType)) == "array")
  }

  test("bigquery: expiration OPTIONS on temp create; plain defaults otherwise") {
    val d = DdlDialects("bigquery")
    assert(d.createTable("p.d.t", Seq("`id` int64"), temporary = false, now) ==
      "CREATE TABLE IF NOT EXISTS p.d.t (`id` int64)")
    // 6 h TTL from the pinned now, reference's BQ layout in UTC
    assert(d.createTable("p.d.t__artie_x", Seq("`id` int64"), temporary = true, now) ==
      """CREATE TABLE IF NOT EXISTS p.d.t__artie_x (`id` int64) OPTIONS (expiration_timestamp = TIMESTAMP("2026-08-15 06:00:00 UTC"))""")
    assert(d.addColumn("p.d.t", d.colDef("name", StringType)) ==
      "ALTER TABLE p.d.t ADD COLUMN `name` string")
    assert(d.dropColumn("p.d.t", "name") == "ALTER TABLE p.d.t DROP COLUMN `name`")
    assert(d.dataType(DoubleType) == "float64" && d.dataType(ArrayType(LongType)) == "array<string>" &&
      d.dataType(MapType(StringType, StringType)) == "json" && d.dataType(TimestampNTZType) == "datetime")
    assert(d.sweepQuery("p", "d").isEmpty) // BQ sweeps via API, not SQL
  }

  test("redshift: lowercased quotes, NULL-suffixed boolean, widen, PG_CLASS sweep") {
    val d = DdlDialects.RedshiftDdl
    assert(d.createTable("s.t", Seq("\"id\" INT8", "\"ok\" BOOLEAN NULL"), temporary = true, now) ==
      """CREATE TABLE IF NOT EXISTS s.t ("id" INT8,"ok" BOOLEAN NULL);""")
    assert(d.colDef("Name", StringType) == "\"name\" VARCHAR(MAX)")
    assert(d.dataType(BooleanType) == "BOOLEAN NULL" && d.dataType(StructType(Nil)) == "SUPER" &&
      d.dataType(IntegerType) == "INT4" && d.dataType(ShortType) == "INT2" &&
      d.dataType(TimestampType) == "TIMESTAMP WITH TIME ZONE")
    assert(d.increaseStringPrecision("s.t", "Name", 300) ==
      """ALTER TABLE s.t ALTER COLUMN "name" TYPE VARCHAR(300)""")
    val Some((sweep, args)) = d.sweepQuery("db", "schema")
    assert(sweep.contains("PG_CATALOG.PG_CLASS") && sweep.contains("c.relkind = 'r'") &&
      sweep.contains("$1") && sweep.contains("ILIKE $2"))
    assert(args == Seq("schema", "%__artie%"))
  }

  test("mssql: bracket quoting, no IF NOT EXISTS, bare ADD/DROP, PK string cap") {
    val d = DdlDialects("mssql")
    assert(d.createTable("dbo.t", Seq("[id] bigint"), temporary = false, now) ==
      "CREATE TABLE dbo.t ([id] bigint);")
    assert(d.addColumn("dbo.t", d.colDef("name", StringType)) ==
      "ALTER TABLE dbo.t ADD [name] VARCHAR(MAX)")
    assert(d.dropColumn("dbo.t", "name") == "ALTER TABLE dbo.t DROP [name]")
    assert(d.colDef("id", StringType, isPk = true) == "[id] VARCHAR(900)")
    assert(d.dataType(BooleanType) == "BIT" && d.dataType(TimestampType) == "datetimeoffset" &&
      d.dataType(TimestampNTZType) == "datetime2")
    val Some((sweep, args)) = d.sweepQuery("db", "dbo")
    assert(sweep.contains("INFORMATION_SCHEMA.TABLES"))
    assert(args == Seq("%__artie%", "dbo")) // prefix FIRST on MSSQL
  }

  test("mysql: backtick doubling, PK string cap at 255, sweep binds database") {
    val d = DdlDialects("mysql")
    assert(d.quote("we`ird") == "`we``ird`")
    assert(d.createTable("db.t", Seq("`id` BIGINT"), temporary = true, now) ==
      "CREATE TABLE IF NOT EXISTS db.t (`id` BIGINT);")
    assert(d.colDef("k", StringType, isPk = true) == "`k` VARCHAR(255)")
    assert(d.colDef("v", StringType) == "`v` TEXT")
    assert(d.dataType(TimestampType) == "DATETIME(6)" && d.dataType(StructType(Nil)) == "JSON")
    val Some((_, args)) = d.sweepQuery("mydb", "ignored")
    assert(args == Seq("%__artie%", "mydb")) // MySQL sweeps by DATABASE
  }

  test("postgres: typed arrays, jsonb struct, IF-guarded alters, $n sweep") {
    val d = DdlDialects("postgres")
    assert(d.createTable("s.t", Seq("\"id\" bigint"), temporary = true, now) ==
      """CREATE TABLE s.t ("id" bigint);""") // no IF NOT EXISTS (pg ddl.go:67-71)
    assert(d.addColumn("s.t", d.colDef("tags", ArrayType(StringType))) ==
      """ALTER TABLE s.t ADD COLUMN IF NOT EXISTS "tags" text[]""")
    assert(d.dataType(ArrayType(LongType)) == "bigint[]" &&
      d.dataType(StructType(Nil)) == "jsonb" && d.dataType(BinaryType) == "bytea" &&
      d.dataType(DoubleType) == "double precision")
    val Some((sweep, args)) = d.sweepQuery("db", "public")
    assert(sweep == "SELECT table_schema, table_name FROM information_schema.tables WHERE table_schema = $1 AND table_name LIKE $2")
    assert(args == Seq("public", "%__artie%"))
  }

  test("duckdb: PRIMARY KEY parts filtered from create; semicolon alters; 3-arg sweep") {
    val d = DdlDialects("duckdb")
    assert(d.createTable("db.s.t", Seq("\"id\" bigint PRIMARY KEY", "\"v\" text"), temporary = false, now) ==
      """CREATE TABLE db.s.t ("v" text);""")
    assert(d.addColumn("db.s.t", d.colDef("v2", StringType)) ==
      """ALTER TABLE db.s.t ADD COLUMN IF NOT EXISTS "v2" text;""")
    assert(d.dropColumn("db.s.t", "v2") ==
      """ALTER TABLE db.s.t DROP COLUMN IF EXISTS "v2";""")
    assert(d.dataType(StructType(Nil)) == "json" && d.dataType(ArrayType(LongType)) == "text[]")
    val Some((_, args)) = d.sweepQuery("db", "s")
    assert(args == Seq("db", "s", "%__artie%"))
  }

  test("databricks: spaced column join, no temp form, named-param sweep") {
    val d = DdlDialects("databricks")
    assert(d.createTable("c.s.t", Seq("`id` BIGINT", "`v` STRING"), temporary = true, now) ==
      "CREATE TABLE IF NOT EXISTS c.s.t (`id` BIGINT, `v` STRING)")
    assert(d.dataType(TimestampNTZType) == "TIMESTAMP_NTZ" &&
      d.dataType(ArrayType(LongType)) == "ARRAY<string>" && d.dataType(StructType(Nil)) == "STRING")
    val Some((sweep, _)) = d.sweepQuery("cat", "s")
    assert(sweep.contains("`cat`.information_schema.tables") &&
      sweep.contains(":p_schema") && sweep.contains(":p_artie_prefix"))
  }

  test("clickhouse: ReplacingMergeTree create with delete-marker surgery; Int widths") {
    val d = DdlDialects("clickhouse")
    val create = d.createTable("db.t",
      Seq("`id` Int64", s"`${Constants.DeleteCol}` Bool"), temporary = false, now)
    // caller's delete column is REPLACED by the UInt8 engine form
    assert(create ==
      s"CREATE TABLE db.t (`id` Int64,`${Constants.DeleteCol}` UInt8) ENGINE = ReplacingMergeTree(`${Constants.UpdatedAtCol}`, `${Constants.DeleteCol}`);")
    assert(d.dataType(IntegerType) == "Int32" && d.dataType(ShortType) == "Int16" &&
      d.dataType(BooleanType) == "Bool" && d.dataType(ArrayType(LongType)) == "Array(String)")
    assert(d.addColumn("db.t", "`v` String") ==
      "ALTER TABLE db.t ADD COLUMN IF NOT EXISTS `v` String;")
  }

  test("spark/iceberg: v2 tblproperties create, ADD COLUMNS wrapper, no SQL sweep") {
    val d = DdlDialects("spark")
    assert(d.createTable("g.t", Seq("`id` BIGINT"), temporary = true, now) ==
      "CREATE TABLE IF NOT EXISTS g.t (`id` BIGINT) USING iceberg TBLPROPERTIES ('format-version'='2')")
    assert(d.addColumn("g.t", "`v` STRING") == "ALTER TABLE g.t ADD COLUMNS (`v` STRING)")
    assert(d.dataType(LongType) == "BIGINT")
    assert(d.sweepQuery("g", "s").isEmpty)
  }

  test("per-dialect dedupe plans: QUALIFY capture -> delete -> re-insert, each client's own text") {
    val pks = Seq("id")
    // snowflake: transient staging, `= 2` second-occurrence capture, DELETE USING
    val Some(sf) = DdlDialects("snowflake").dedupeQueries("db.s.t", "db.s.t_stg", pks,
      includeArtieUpdatedAt = true, now)
    assert(sf.head == """CREATE OR REPLACE TRANSIENT TABLE db.s.t_stg AS (SELECT * FROM db.s.t QUALIFY ROW_NUMBER() OVER (PARTITION BY "ID" ORDER BY "ID" ASC, "__ARTIE_UPDATED_AT" ASC) = 2)""")
    assert(sf(1) == """DELETE FROM db.s.t t1 USING db.s.t_stg t2 WHERE t1."ID" = t2."ID"""")
    assert(sf(2) == "INSERT INTO db.s.t SELECT * FROM db.s.t_stg")
    // redshift: schema-less TEMPORARY staging, `WHERE true`, alias-less delete
    val Some(rs) = DdlDialects("redshift").dedupeQueries("s.t", "s.t_stg", pks, false, now)
    assert(rs.head == """CREATE TEMPORARY TABLE "t_stg" AS (SELECT * FROM s.t WHERE true QUALIFY ROW_NUMBER() OVER (PARTITION BY "id" ORDER BY "id" ASC) = 2)""")
    assert(rs(1) == """DELETE FROM s.t USING "t_stg" t2 WHERE "t"."id" = t2."id"""")
    // bigquery: expiring staging
    val Some(bq) = DdlDialects("bigquery").dedupeQueries("p.d.t", "p.d.t_stg", pks, false, now)
    assert(bq.head.contains("""OPTIONS (expiration_timestamp = TIMESTAMP("2026-08-15 06:00:00 UTC")) AS (SELECT * FROM p.d.t QUALIFY"""))
    assert(bq(1).startsWith("DELETE FROM p.d.t t1 WHERE EXISTS"))
    // duckdb: keep-LATEST (`= 1` DESC) + trailing staging drop
    val Some(dk) = DdlDialects("duckdb").dedupeQueries("db.s.t", "db.s.t_stg", pks, true, now)
    assert(dk.head.contains("""ORDER BY "id" DESC, "__artie_updated_at" DESC) = 1)"""))
    assert(dk.last == "DROP TABLE IF EXISTS db.s.t_stg")
    // databricks: bare AS SELECT form
    assert(DdlDialects("databricks").dedupeQueries("c.s.t", "c.s.t_stg", pks, false, now)
      .get.head.startsWith("CREATE TABLE c.s.t_stg AS SELECT * FROM c.s.t QUALIFY"))
    // spark: the executed 4-statement INSERT OVERWRITE plan
    assert(DdlDialects("spark").dedupeQueries("g.t", "g.t_stg", pks, false, now).get.size == 4)
    // the reference panics for these four; the registry surfaces None
    for (l <- Seq("mssql", "mysql", "postgres", "clickhouse"))
      assert(DdlDialects(l).dedupeQueries("db.t", "db.t_stg", pks, false, now).isEmpty, l)
  }

  test("redshift ALTER TABLE APPEND snapshot-dedupe plan (identity tiebreaker round-trip)") {
    val plan = DdlDialects.RedshiftDdl.dedupeQueriesAlterTableAppend("s.t", "s.t_losers", Seq("id"))
    assert(plan.head == """CREATE TABLE s.t___artie_dedupe (LIKE s.t INCLUDING DEFAULTS, "_artie_dedupe_rn" BIGINT IDENTITY(1,1))""")
    assert(plan(1) == "ALTER TABLE s.t___artie_dedupe APPEND FROM s.t FILLTARGET")
    assert(plan(2).contains("DISTSTYLE ALL") && plan(2).contains("""NOT IN (SELECT MAX("_artie_dedupe_rn")"""))
    assert(plan(4) == "ALTER TABLE s.t APPEND FROM s.t___artie_dedupe IGNOREEXTRA")
    assert(plan.last == "DROP TABLE s.t___artie_dedupe")
  }

  test("every dialect renders a full col-def surface without throwing") {
    val types = Seq(StringType, LongType, IntegerType, ShortType, DoubleType,
      BooleanType, DateType, TimestampType, TimestampNTZType, BinaryType,
      DecimalType(12, 2), DecimalType(38, 10), ArrayType(StringType),
      StructType(Seq(StructField("x", LongType))), MapType(StringType, LongType))
    for (l <- allLabels; t <- types) {
      val s = DdlDialects(l).colDef("c", t)
      assert(s.nonEmpty && s.contains(" "), s"$l/$t")
    }
    // Spark's DecimalType caps at 38 digits, so the reference's
    // string-fallback branch (precision > 38) is a defensive guard here
    assert(DdlDialects("redshift").dataType(DecimalType(38, 10)) == "NUMERIC(38, 10)")
  }
}
