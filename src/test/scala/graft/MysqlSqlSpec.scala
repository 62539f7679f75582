package graft

import graft.sink.MysqlSqlBuilder
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 sixth dialect: MySQL (clients/mysql/dialect/dialect.go:57-217)
  * — no MERGE exists, so the hard path is DELETE-via-join +
  * INSERT … ON DUPLICATE KEY UPDATE, transcribed from the reference's
  * statement templates (that client ships no merge golden test; the
  * templates themselves are the spec).
  */
class MysqlSqlSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("id", "bar", del, osd)

  test("hard path: DELETE via inner join, then INSERT .. ON DUPLICATE KEY UPDATE") {
    val qs = MysqlSqlBuilder.buildMergeQueries("db.t", "db.t_tmp",
      Seq("id"), cols, softDelete = false)
    assert(qs.size == 2)
    assert(qs(0) == s"""
DELETE tgt FROM db.t AS tgt
INNER JOIN db.t_tmp AS stg ON tgt.`id` = stg.`id`
WHERE stg.`$del` = 1;""")
    assert(qs(1) == s"""
INSERT INTO db.t (`id`,`bar`)
SELECT stg.`id`,stg.`bar` FROM db.t_tmp AS stg
WHERE COALESCE(stg.`$del`, 0) = 0
ON DUPLICATE KEY UPDATE `id` = VALUES(`id`), `bar` = VALUES(`bar`);""")
  }

  test("soft path: INSERT first, then the two join-syntax UPDATEs") {
    val qs = MysqlSqlBuilder.buildMergeQueries("db.t", "{SUB}",
      Seq("id"), cols, softDelete = true)
    assert(qs.size == 3)
    assert(qs(0).startsWith("\nINSERT INTO db.t (`id`,`bar`,`" + del))
    assert(qs(1) == s"""
UPDATE db.t AS tgt
INNER JOIN {SUB} AS stg ON tgt.`id` = stg.`id`
SET `id`=stg.`id`,`bar`=stg.`bar`,`$del`=stg.`$del`
WHERE COALESCE(stg.`$osd`, 0) = 0;""")
    assert(qs(2) == s"""
UPDATE db.t AS tgt
INNER JOIN {SUB} AS stg ON tgt.`id` = stg.`id`
SET `$del`=stg.`$del`
WHERE COALESCE(stg.`$osd`, 0) = 1;""")
  }

  test("backticks in identifiers DOUBLE instead of stripping (MySQL escaping)") {
    val qs = MysqlSqlBuilder.buildMergeQueries("t", "sub", Seq("id"),
      Seq("id", "we`ird", del, osd), softDelete = false)
    assert(qs(1).contains("`we``ird`"))
  }

  test("toast guard folds NULL to empty string") {
    val qs = MysqlSqlBuilder.buildMergeQueries("t", "sub", Seq("id"),
      Seq("id", "txt", del, osd), softDelete = true, toastCols = Set("txt"))
    assert(qs(1).contains(
      s"`txt`= CASE WHEN COALESCE(stg.`txt`, '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg.`txt` ELSE tgt.`txt` END"))
  }
}
