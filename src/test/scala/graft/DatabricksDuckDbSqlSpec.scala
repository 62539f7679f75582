package graft

import graft.sink.{DatabricksSqlBuilder, DuckDbSqlBuilder}
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 ninth + tenth dialects: Databricks
  * (clients/databricks/dialect/dialect.go:86-146) and DuckDB/MotherDuck
  * (clients/motherduck/dialect/dialect.go:277-380). With these, every
  * reference client that implements BuildMergeQueries has a counterpart
  * builder (ClickHouse's merge lives in its table engine; see
  * ClickhouseSqlBuilder).
  */
class DatabricksDuckDbSqlSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("id", "name", del, osd)

  test("databricks: USING without AS, backtick quoting, three hard arms") {
    val sql = DatabricksSqlBuilder.buildMerge("db.t", "db.t_tmp", Seq("id"),
      cols, softDelete = false)
    assert(sql == s"""MERGE INTO db.t tgt USING db.t_tmp stg ON tgt.`id` = stg.`id`
WHEN MATCHED AND stg.`$del` THEN DELETE
WHEN MATCHED AND IFNULL(stg.`$del`, false) = false THEN UPDATE SET `id`=stg.`id`,`name`=stg.`name`
WHEN NOT MATCHED AND IFNULL(stg.`$del`, false) = false THEN INSERT (`id`,`name`) VALUES (stg.`id`,stg.`name`);""")
  }

  test("databricks: CAST AS STRING toast guard for non-string columns") {
    val sql = DatabricksSqlBuilder.buildMerge("t", "sub", Seq("id"),
      Seq("id", "payload", del, osd), softDelete = true,
      castToastCols = Set("payload"))
    assert(sql.contains(
      s"`payload`= CASE WHEN COALESCE(CAST(stg.`payload` AS STRING) NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN stg.`payload` ELSE tgt.`payload` END"))
  }

  test("duckdb: bare table reference auto-wraps as SELECT * FROM in USING") {
    val sql = DuckDbSqlBuilder.buildMerge("db.t", "db.t_tmp", Seq("id"),
      cols, softDelete = false)
    assert(sql == s"""
MERGE INTO db.t AS tgt USING (SELECT * FROM db.t_tmp) AS stg ON tgt."id" = stg."id"
WHEN MATCHED AND stg."$del" = true THEN DELETE
WHEN MATCHED AND COALESCE(stg."$del", false) = false THEN UPDATE SET "id"=stg."id","name"=stg."name"
WHEN NOT MATCHED AND COALESCE(stg."$del", false) = false THEN INSERT ("id","name") VALUES (stg."id",stg."name")""")
    // a real SELECT subquery passes through un-wrapped
    val sql2 = DuckDbSqlBuilder.buildMerge("db.t", "SELECT * FROM x WHERE y", Seq("id"),
      cols, softDelete = false)
    assert(sql2.contains("USING (SELECT * FROM x WHERE y) AS stg"))
  }

  test("duckdb: soft MERGE two-line header, VARCHAR-cast toast for struct columns") {
    val sql = DuckDbSqlBuilder.buildMerge("db.t", "SELECT * FROM s", Seq("id"),
      Seq("id", "doc", del, osd), softDelete = true,
      varcharCastToastCols = Set("doc"))
    assert(sql.startsWith("\nMERGE INTO db.t AS tgt\nUSING (SELECT * FROM s) AS stg ON"))
    assert(sql.contains(
      s""""doc"= CASE WHEN COALESCE(CAST(stg."doc" AS VARCHAR) NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN stg."doc" ELSE tgt."doc" END"""))
    assert(!sql.endsWith(";")) // DuckDB text ends bare, like Postgres
  }
}
