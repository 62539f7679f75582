package graft

import java.time.Instant

import graft.schema.SchemaEvolution
import graft.sink.MergeSqlBuilder
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaAndSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff finds adds and drops, protects artie and transient columns") {
    val src = StructType(Seq(
      StructField("id", LongType), StructField("newcol", StringType),
      StructField(Constants.OnlySetDeleteCol, BooleanType)))
    val dst = StructType(Seq(
      StructField("id", LongType), StructField("gone", StringType),
      StructField(Constants.DeleteCol, BooleanType)))
    val d = SchemaEvolution.diff(src, dst)
    assert(d.toAdd.map(_.name) == Seq("newcol"))   // transient marker never materializes
    assert(d.toDrop.map(_.name) == Seq("gone"))    // __artie_delete protected
  }

  test("unionEvolve aligns diverged schemas with typed null backfill") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, "y", 9.5)).toDF("id", "name", "score")
    val out = SchemaEvolution.unionEvolve(a, b).orderBy("id").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head == Seq("id", "name", "score"))
    assert(out(0).isNullAt(2) && out(1).getDouble(2) == 9.5)
  }

  test("unionEvolve resolves type conflicts through the Kind lattice") {
    val a = Seq((1L, 5)).toDF("id", "v")          // v: int
    val b = Seq((2L, 7.5)).toDF("id", "v")        // v: double
    val out = SchemaEvolution.unionEvolve(a, b)
    assert(out.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.orderBy("id").collect().map(_.getDouble(1)).toSeq == Seq(5.0, 7.5))
    val c = Seq((1L, true)).toDF("id", "v")       // bool vs double: degrade
    val out2 = SchemaEvolution.unionEvolve(c, b)
    assert(out2.schema("v").dataType == org.apache.spark.sql.types.StringType)
  }

  test("mergeFromDestination: destination type wins") {
    val mem = StructType(Seq(StructField("id", IntegerType), StructField("v", NullType)))
    val dst = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val out = SchemaEvolution.mergeFromDestination(mem, dst)
    assert(out("id").dataType == LongType && out("v").dataType == StringType)
  }

  test("drop-confidence: only after grace window, never on delete-only batches") {
    val dc = new SchemaEvolution.DropConfidence(graceHours = 4)
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    assert(dc.observe(Set("c"), t0, containsOtherOperations = true).isEmpty)
    // within grace: still absent, not dropped
    assert(dc.observe(Set("c"), t0.plusSeconds(3600), containsOtherOperations = true).isEmpty)
    // delete-only batch provides no evidence even past grace
    assert(dc.observe(Set("c"), t0.plusSeconds(5 * 3600), containsOtherOperations = false).isEmpty)
    // past grace with real evidence -> droppable
    assert(dc.observe(Set("c"), t0.plusSeconds(5 * 3600), containsOtherOperations = true) == Seq("c"))
    // column reappears -> candidate resets
    assert(dc.observe(Set.empty, t0.plusSeconds(6 * 3600), containsOtherOperations = true).isEmpty)
    assert(dc.pending.isEmpty)
  }

  test("drop-confidence: delete-only batches never mutate candidates (ADVICE r12)") {
    // The reference's ShouldDeleteColumn leaves columnsToDelete untouched
    // when !containsOtherOperations — in particular a delete-only batch
    // whose full row image carries the column must NOT purge the standing
    // candidate, or alternating hard-delete/absence traffic defers the
    // drop forever.
    val dc = new SchemaEvolution.DropConfidence(graceHours = 4)
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    assert(dc.observe(Set("c"), t0, containsOtherOperations = true).isEmpty)
    // delete-only batch where the column is PRESENT (absent set empty):
    // candidate survives, clock unchanged
    assert(dc.observe(Set.empty, t0.plusSeconds(3600), containsOtherOperations = false).isEmpty)
    assert(dc.pending.contains("c") && dc.pending("c") == t0)
    // past grace with real evidence -> drops off the ORIGINAL clock
    assert(dc.observe(Set("c"), t0.plusSeconds(5 * 3600), containsOtherOperations = true) == Seq("c"))
  }

  test("hard-delete MERGE text has the reference's three arms") {
    val sql = MergeSqlBuilder.buildMerge("db.tgt", "stg_view", Seq("id"),
      Seq("id", "name", Constants.DeleteCol), softDelete = false, toastCols = Set("name"))
    assert(sql.contains("MERGE INTO db.tgt AS tgt USING stg_view AS stg ON tgt.`id` = stg.`id`"))
    assert(sql.contains("WHEN MATCHED AND stg.`__artie_delete` THEN DELETE"))
    assert(sql.contains("WHEN MATCHED AND IFNULL(stg.`__artie_delete`, false) = false THEN UPDATE SET"))
    assert(sql.contains(
      s"`name` = CASE WHEN CAST(stg.`name` AS STRING) NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg.`name` ELSE tgt.`name` END"))
    assert(sql.contains("WHEN NOT MATCHED AND IFNULL(stg.`__artie_delete`, false) = false THEN INSERT (`id`,`name`) VALUES (stg.`id`,stg.`name`)"))
  }

  test("soft-delete MERGE text: only-set-delete arm updates just the flag") {
    val sql = MergeSqlBuilder.buildMerge("db.tgt", "stg_view", Seq("id"),
      Seq("id", "name", Constants.DeleteCol, Constants.OnlySetDeleteCol), softDelete = true)
    assert(sql.contains("WHEN MATCHED AND IFNULL(stg.`__artie_only_set_delete`, false) = true THEN UPDATE SET `__artie_delete` = stg.`__artie_delete`"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT"))
    assert(!sql.contains("INSERT (`id`,`name`,`__artie_delete`,`__artie_only_set_delete`)"))
  }

  test("dedupe SQL mirrors the reference's staging-table row_number/insert-overwrite shape") {
    val stmts = MergeSqlBuilder.buildDedupe("db.t", "db.t_stg", Seq("id"), Seq("__artie_updated_at"))
    // no QUALIFY (Spark SQL has no such token) and no self-read overwrite:
    // staging table created from a ROW_NUMBER subquery, marker dropped,
    // then the atomic overwrite reads only the staging table
    assert(stmts.head.startsWith("CREATE OR REPLACE TABLE db.t_stg AS SELECT * FROM ("))
    assert(stmts.head.contains("ROW_NUMBER() OVER (PARTITION BY `id` ORDER BY `id` DESC, `__artie_updated_at` DESC) AS __artie_rn"))
    assert(stmts.head.contains("WHERE __artie_rn = 1"))
    assert(!stmts.head.contains("QUALIFY"))
    assert(stmts(1) == "ALTER TABLE db.t_stg DROP COLUMN __artie_rn")
    assert(stmts(2) == "INSERT OVERWRITE db.t TABLE db.t_stg")
    assert(stmts(3) == "DROP TABLE IF EXISTS db.t_stg")
  }

  test("kind lattice: parse + merge") {
    import graft.types.Kind
    assert(Kind.parseValue(null) == Kind.Invalid)
    assert(Kind.parseValue("""{"a":1}""") == Kind.Struct)
    assert(Kind.parseValue("plain") == Kind.Str())
    assert(Kind.merge(Kind.Invalid, Kind.Int(32)) == Kind.Int(32))
    assert(Kind.merge(Kind.Int(32), Kind.Int(64)) == Kind.Int(64))
    assert(Kind.merge(Kind.Int(64), Kind.Float) == Kind.Float)
    assert(Kind.merge(Kind.Bool, Kind.Str()) == Kind.Str())
    assert(Kind.Dec(0, 0).sparkType == StringType) // precision-unspecified -> text
    assert(Kind.Time.sparkType == StringType)
  }
}
