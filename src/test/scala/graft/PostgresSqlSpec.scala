package graft

import graft.sink.PostgresSqlBuilder
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 seventh dialect: Postgres (clients/postgres/dialect/dialect.go:
  * 127-330) — PG15+ MERGE and the pre-15 ordered fallback behind the
  * reference's disableMerge switch. Golden strings mirror
  * merge_test.go's expected statements.
  */
class PostgresSqlSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("id", "name", del, osd)

  test("hard MERGE matches merge_test.go's single-line-header text (no trailing semicolon)") {
    val qs = PostgresSqlBuilder.buildMergeQueries(""""database"."schema"."table"""",
      "SELECT * FROM staging", Seq("id"), cols, softDelete = false)
    assert(qs.size == 1)
    assert(qs.head == s"""
MERGE INTO "database"."schema"."table" AS tgt USING SELECT * FROM staging AS stg ON tgt."id" = stg."id"
WHEN MATCHED AND stg."$del" = true THEN DELETE
WHEN MATCHED AND COALESCE(stg."$del", false) = false THEN UPDATE SET "id"=stg."id","name"=stg."name"
WHEN NOT MATCHED AND COALESCE(stg."$del", false) = false THEN INSERT ("id","name") VALUES (stg."id",stg."name")""")
  }

  test("soft MERGE matches merge_test.go: two-line header, flag-only second arm, flag-carrying insert") {
    val qs = PostgresSqlBuilder.buildMergeQueries(""""database"."schema"."table"""",
      "SELECT * FROM staging", Seq("id"), cols, softDelete = true)
    assert(qs.size == 1)
    assert(qs.head == s"""
MERGE INTO "database"."schema"."table" AS tgt
USING SELECT * FROM staging AS stg ON tgt."id" = stg."id"
WHEN MATCHED AND COALESCE(stg."$osd", false) = false THEN UPDATE SET "id"=stg."id","name"=stg."name","$del"=stg."$del"
WHEN MATCHED AND COALESCE(stg."$osd", false) = true THEN UPDATE SET "$del"=stg."$del"
WHEN NOT MATCHED THEN INSERT ("id","name","$del") VALUES (stg."id",stg."name",stg."$del")""")
  }

  test("pre-15 fallback: ordered UPDATE, INSERT, join-DELETE (hard with deletes)") {
    val qs = PostgresSqlBuilder.buildMergeQueries("public.t", "sub", Seq("id"),
      cols, softDelete = false, useMerge = false)
    assert(qs.size == 3)
    assert(qs(0) == s"""UPDATE public.t AS tgt SET "id"=stg."id","name"=stg."name" FROM sub AS stg WHERE tgt."id" = stg."id" AND COALESCE(stg."$del", false) = false;""")
    assert(qs(1) == s"""INSERT INTO public.t ("id","name") SELECT stg."id",stg."name" FROM sub AS stg LEFT JOIN public.t AS tgt ON tgt."id" = stg."id" WHERE tgt."id" IS NULL AND COALESCE(stg."$del", false) = false;""")
    assert(qs(2) == s"""DELETE FROM public.t AS tgt USING sub AS stg WHERE tgt."id" = stg."id" AND stg."$del" = true;""")
    // no hard deletes in the batch -> the DELETE statement drops out
    assert(PostgresSqlBuilder.buildMergeQueries("public.t", "sub", Seq("id"),
      cols, softDelete = false, containsHardDeletes = false, useMerge = false).size == 2)
  }

  test("toast guards: ::text for scalars, encode(.., 'escape') for bytea") {
    val qs = PostgresSqlBuilder.buildMergeQueries("t", "sub", Seq("id"),
      Seq("id", "txt", "blob", del, osd), softDelete = false,
      toastCols = Set("txt"), byteaToastCols = Set("blob"))
    assert(qs.head.contains(
      s""""txt"= CASE WHEN COALESCE(stg."txt"::text, '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg."txt" ELSE tgt."txt" END"""))
    assert(qs.head.contains(
      s""""blob"= CASE WHEN COALESCE(encode(stg."blob", 'escape'), '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg."blob" ELSE tgt."blob" END"""))
  }

  test("double quotes in identifiers double instead of stripping") {
    val qs = PostgresSqlBuilder.buildMergeQueries("t", "sub", Seq("id"),
      Seq("id", "we\"ird", del, osd), softDelete = false)
    assert(qs.head.contains("\"we\"\"ird\"=stg.\"we\"\"ird\""))
  }
}
