package graft

import graft.sink.SnowflakeSqlBuilder
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 third dialect: Snowflake single-statement MERGE
  * (clients/snowflake/dialect/dialect.go:145-207). Golden strings mirror
  * the reference's own dialect tests (uppercased quoting, inline staging
  * subquery, EQUAL_NULL option, TO_VARCHAR toast guard for non-string
  * columns). Arm semantics equal the Spark dialect's — RedshiftSqlSpec
  * proves the shared semantic contract frame-level; these tests pin the
  * per-warehouse text.
  */
class SnowflakeSqlSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("id", "bar", del, osd)

  test("hard-delete MERGE: three arms, uppercased identifiers, inline subquery") {
    val sql = SnowflakeSqlBuilder.buildMerge("database.schema.table", "db.stage_sub",
      Seq("id"), cols, softDelete = false)
    assert(sql == s"""
MERGE INTO database.schema.table tgt USING ( db.stage_sub ) AS stg ON tgt."ID" = stg."ID"
WHEN MATCHED AND stg."__ARTIE_DELETE" THEN DELETE
WHEN MATCHED AND IFNULL(stg."__ARTIE_DELETE", false) = false THEN UPDATE SET "ID"=stg."ID","BAR"=stg."BAR"
WHEN NOT MATCHED AND IFNULL(stg."__ARTIE_DELETE", false) = false THEN INSERT ("ID","BAR") VALUES (stg."ID",stg."BAR");""")
  }

  test("soft-delete MERGE: only-set-delete arm updates just the flag; insert keeps it") {
    val sql = SnowflakeSqlBuilder.buildMerge("database.schema.table", "db.stage_sub",
      Seq("id"), cols, softDelete = true)
    assert(sql == s"""
MERGE INTO database.schema.table tgt USING ( db.stage_sub ) AS stg ON tgt."ID" = stg."ID"
WHEN MATCHED AND IFNULL(stg."__ARTIE_ONLY_SET_DELETE", false) = false THEN UPDATE SET "ID"=stg."ID","BAR"=stg."BAR","__ARTIE_DELETE"=stg."__ARTIE_DELETE"
WHEN MATCHED AND IFNULL(stg."__ARTIE_ONLY_SET_DELETE", false) = true THEN UPDATE SET "__ARTIE_DELETE"=stg."__ARTIE_DELETE"
WHEN NOT MATCHED THEN INSERT ("ID","BAR","__ARTIE_DELETE") VALUES (stg."ID",stg."BAR",stg."__ARTIE_DELETE");""")
  }

  test("EQUAL_NULL ON clause when null-safe PK equality is requested") {
    val sql = SnowflakeSqlBuilder.buildMerge("db.s.t", "sub", Seq("id", "k2"),
      cols, softDelete = false, useEqualNull = true)
    assert(sql.contains(
      """ON EQUAL_NULL(tgt."ID", stg."ID") AND EQUAL_NULL(tgt."K2", stg."K2")"""))
  }

  test("toast guards: string direct, non-string through TO_VARCHAR") {
    val sql = SnowflakeSqlBuilder.buildMerge("db.s.t", "sub", Seq("id"),
      Seq("id", "bar", "payload", del, osd), softDelete = false,
      toastCols = Set("bar"), varcharCastToastCols = Set("payload"))
    assert(sql.contains(
      s""""BAR"= CASE WHEN COALESCE(stg."BAR" NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN stg."BAR" ELSE tgt."BAR" END"""))
    assert(sql.contains(
      s""""PAYLOAD"= CASE WHEN COALESCE(TO_VARCHAR(stg."PAYLOAD") NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN stg."PAYLOAD" ELSE tgt."PAYLOAD" END"""))
  }

  test("additional predicates extend the ON clause") {
    val sql = SnowflakeSqlBuilder.buildMerge("db.s.t", "sub", Seq("id"), cols,
      softDelete = false, additionalPredicates = Seq("tgt.\"REGION\" = stg.\"REGION\""))
    assert(sql.contains("""ON tgt."ID" = stg."ID" AND tgt."REGION" = stg."REGION""""))
  }
}
