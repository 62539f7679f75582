package graft

import graft.sink.MssqlSqlBuilder
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 fifth dialect: MS SQL (clients/mssql/dialect/dialect.go:73-209).
  * Golden strings mirror the reference's own dialect tests: bracket
  * quoting, BIT-flag arithmetic, the NOT-MATCHED arm's COALESCE
  * default-1, and the soft path's INSERT-first three-statement plan.
  */
class MssqlSqlSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("id", "bar", del, osd)

  test("hard path: one MERGE with BIT-flag arms and the default-1 insert COALESCE") {
    val qs = MssqlSqlBuilder.buildMergeQueries("database.schema.table",
      "database.schema.table_tmp", Seq("id"), cols, softDelete = false)
    assert(qs.size == 1)
    assert(qs.head == s"""
MERGE INTO database.schema.table tgt
USING database.schema.table_tmp AS stg ON tgt.[id] = stg.[id]
WHEN MATCHED AND stg.[$del] = 1 THEN DELETE
WHEN MATCHED AND COALESCE(stg.[$del], 0) = 0 THEN UPDATE SET [id]=stg.[id],[bar]=stg.[bar]
WHEN NOT MATCHED AND COALESCE(stg.[$del], 1) = 0 THEN INSERT ([id],[bar]) VALUES (stg.[id],stg.[bar]);""")
  }

  test("soft path: INSERT first, then UPDATE(all), then UPDATE(flag) — reference order") {
    val qs = MssqlSqlBuilder.buildMergeQueries("database.schema.table",
      "{SUB_QUERY}", Seq("id"), cols, softDelete = true)
    assert(qs.size == 3)
    assert(qs(0) == s"""
INSERT INTO database.schema.table ([id],[bar],[$del])
SELECT stg.[id],stg.[bar],stg.[$del] FROM {SUB_QUERY} AS stg
LEFT JOIN database.schema.table AS tgt ON tgt.[id] = stg.[id]
WHERE tgt.[id] IS NULL;""")
    assert(qs(1) == s"""
UPDATE tgt SET [id]=stg.[id],[bar]=stg.[bar],[$del]=stg.[$del]
FROM {SUB_QUERY} AS stg LEFT JOIN database.schema.table AS tgt ON tgt.[id] = stg.[id]
WHERE COALESCE(stg.[$osd], 0) = 0;""")
    assert(qs(2) == s"""
UPDATE tgt SET [$del]=stg.[$del]
FROM {SUB_QUERY} AS stg LEFT JOIN database.schema.table AS tgt ON tgt.[id] = stg.[id]
WHERE COALESCE(stg.[$osd], 0) = 1;""")
  }

  test("toast guard folds NULL to empty string before the NOT LIKE") {
    val qs = MssqlSqlBuilder.buildMergeQueries("t", "sub", Seq("id"),
      Seq("id", "txt", del, osd), softDelete = false, toastCols = Set("txt"))
    assert(qs.head.contains(
      s"[txt]= CASE WHEN COALESCE(stg.[txt], '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg.[txt] ELSE tgt.[txt] END"))
  }

  test("bracket characters are stripped from identifiers before quoting") {
    val qs = MssqlSqlBuilder.buildMergeQueries("t", "sub", Seq("id"),
      Seq("id", "we[i]rd", del, osd), softDelete = false)
    assert(qs.head.contains("[weird]=stg.[weird]"))
  }
}
