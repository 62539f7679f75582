package graft

import graft.sink.RedshiftSqlBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 second dialect: the reference's Redshift ordered
  * UPDATE → INSERT → DELETE plan (clients/redshift/dialect/dialect.go:
  * 271-375). Golden strings pin the statement text (the text IS the
  * spec); the equivalence tests REPLAY the ordered plan's semantics at
  * the frame level and prove the three-statement protocol produces
  * exactly what the single-statement MERGE (CdcOps.mergeApply, the
  * Spark dialect's semantics) produces — the property the reference
  * relies on when it targets warehouses without native MERGE.
  */
class RedshiftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol

  test("hard-delete plan: UPDATE then INSERT then DELETE, reference text") {
    val qs = RedshiftSqlBuilder.buildMergeQueries("public.t", "public.t__temp",
      Seq("id"), Seq("id", "name", del, osd), softDelete = false,
      containsHardDeletes = true)
    assert(qs.size == 3)
    assert(qs(0) ==
      """UPDATE public.t AS tgt SET "id"=stg."id","name"=stg."name" FROM public.t__temp AS stg WHERE tgt."id" = stg."id" AND COALESCE(stg."__artie_delete", false) = false;""")
    assert(qs(1) ==
      """INSERT INTO public.t ("id","name") SELECT stg."id",stg."name" FROM public.t__temp AS stg LEFT JOIN public.t AS tgt ON tgt."id" = stg."id" WHERE tgt."id" IS NULL AND COALESCE(stg."__artie_delete", false) = false;""")
    assert(qs(2) ==
      """DELETE FROM public.t WHERE ("id") IN (SELECT stg."id" FROM public.t__temp AS stg WHERE stg."__artie_delete" = true);""")
  }

  test("soft-delete plan: two updates (full row / flag only), no delete statement") {
    val qs = RedshiftSqlBuilder.buildMergeQueries("public.t", "public.t__temp",
      Seq("id"), Seq("id", "name", del, osd), softDelete = true,
      containsHardDeletes = true)
    assert(qs.size == 3)
    assert(qs(0) ==
      s"""UPDATE public.t AS tgt SET "id"=stg."id","name"=stg."name","$del"=stg."$del" FROM public.t__temp AS stg WHERE tgt."id" = stg."id" AND COALESCE(stg."$osd", false) = false;""")
    assert(qs(1) ==
      s"""UPDATE public.t AS tgt SET "$del"=stg."$del" FROM public.t__temp AS stg WHERE tgt."id" = stg."id" AND COALESCE(stg."$osd", false) = true;""")
    assert(qs(2).startsWith("INSERT INTO public.t "))
    // soft insert keeps the delete flag column and has NO delete filter
    assert(qs(2).contains(s""""$del""""))
    assert(!qs(2).contains("= false;") || qs(2).endsWith("""WHERE tgt."id" IS NULL;"""))
  }

  test("toast column renders the reference's scalar COALESCE NOT LIKE guard") {
    val qs = RedshiftSqlBuilder.buildMergeQueries("public.t", "public.t__temp",
      Seq("id"), Seq("id", "txt", del, osd), softDelete = false,
      containsHardDeletes = false, toastCols = Set("txt"))
    assert(qs.size == 2) // no hard deletes in batch -> no DELETE statement
    assert(qs(0).contains(
      s""""txt"= CASE WHEN COALESCE(stg."txt" NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN stg."txt" ELSE tgt."txt" END"""))
  }

  test("identifiers are double-quoted and lowercased (Redshift folding)") {
    val qs = RedshiftSqlBuilder.buildMergeQueries("public.t", "sub",
      Seq("UserID"), Seq("UserID", "FullName", del, osd), softDelete = false,
      containsHardDeletes = false)
    assert(qs(0).contains("\"userid\"=stg.\"userid\""))
    assert(qs(0).contains("\"fullname\"=stg.\"fullname\""))
  }

  // ---- frame-level replay of the ordered plan ------------------------------

  /** Executes the hard-delete UPDATE→INSERT→DELETE semantics over
    * DataFrames, statement for statement.
    */
  private def replayHard(base: DataFrame, latest: DataFrame,
                         dataCols: Seq[String]): DataFrame = {
    val stgVals = latest.select((col("pk") +: dataCols.map(col)) :+ col(del): _*)
    // UPDATE … WHERE pk match AND COALESCE(delete,false) = false
    val upd = base.as("t")
      .join(stgVals.filter(coalesce(col(del), lit(false)) === false).as("s"),
        col("t.pk") === col("s.pk"), "left")
      .select(col("t.pk") +: dataCols.map(c =>
        when(col("s.pk").isNotNull, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
    // INSERT … LEFT JOIN … WHERE tgt.pk IS NULL AND COALESCE(delete,false) = false
    val ins = stgVals.filter(coalesce(col(del), lit(false)) === false).as("s")
      .join(base.as("t"), col("t.pk") === col("s.pk"), "left_anti")
      .select(col("pk") +: dataCols.map(col): _*)
    // DELETE … WHERE pk IN (SELECT pk FROM stg WHERE delete = true)
    upd.unionByName(ins)
      .join(stgVals.filter(col(del) === true).select(col("pk")), Seq("pk"), "left_anti")
  }

  test("ordered hard plan replay equals the single-statement MERGE (mergeApply)") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("pk", "name", "v")
    val changes = Seq(
      (2L, "b2", 21L, false, 1L), // update
      (3L, "x", 0L, true, 2L),    // hard delete
      (4L, "d", 40L, false, 3L),  // insert
      (5L, "poof", 0L, true, 4L), // delete of an absent row: no-op
    ).toDF("pk", "name", "v", del, "off")
    val latest = graft.operators.CdcOps.lastWins(changes, Seq("pk"), Seq(col("off")))
    val got = replayHard(base, latest, Seq("name", "v"))
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val viaMerge = graft.operators.CdcOps
      .mergeApply(base, changes, Seq("pk"), Seq(col("off")))
      .select("pk", "name", "v")
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == viaMerge.toSeq)
    assert(got.toSeq == Seq((1L, "a", 10L), (2L, "b2", 21L), (4L, "d", 40L)))
  }

  test("ordered soft plan replay equals the soft MERGE: only-set-delete keeps target values") {
    val base = Seq((1L, "a", false), (2L, "b", false)).toDF("pk", "name", del)
    val changes = Seq(
      (1L, "ignored", true, true, 1L), // only-set-delete: flag set, name kept
      (2L, "b2", false, false, 2L),    // normal update
      (3L, "c", false, false, 3L),     // insert
    ).toDF("pk", "name", del, osd, "off")
    val latest = graft.operators.CdcOps.lastWins(changes, Seq("pk"), Seq(col("off")))
    // UPDATE #1: full row where NOT only-set-delete
    val upd1src = latest.filter(coalesce(col(osd), lit(false)) === false)
    val upd1 = base.as("t").join(upd1src.as("s"), col("t.pk") === col("s.pk"), "left")
      .select(col("t.pk"),
        when(col("s.pk").isNotNull, col("s.name")).otherwise(col("t.name")).as("name"),
        when(col("s.pk").isNotNull, col(s"s.$del")).otherwise(col(s"t.$del")).as(del))
    // UPDATE #2: flag only where only-set-delete
    val upd2src = latest.filter(coalesce(col(osd), lit(false)) === true)
    val upd2 = upd1.as("t").join(upd2src.as("s"), col("t.pk") === col("s.pk"), "left")
      .select(col("t.pk"), col("t.name"),
        when(col("s.pk").isNotNull, col(s"s.$del")).otherwise(col(s"t.$del")).as(del))
    // INSERT: not matched (no delete filter in soft mode)
    val ins = latest.as("s").join(base.as("t"), col("t.pk") === col("s.pk"), "left_anti")
      .select(col("pk"), col("name"), col(del))
    val got = upd2.unionByName(ins)
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val viaMerge = graft.operators.CdcOps
      .mergeApply(base, changes, Seq("pk"), Seq(col("off")), softDelete = true)
      .select("pk", "name", del)
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.toSeq == viaMerge.toSeq)
    assert(got.toSeq == Seq((1L, "a", true), (2L, "b2", false), (3L, "c", false)))
  }
}
