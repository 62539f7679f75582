package graft

import graft.sink.MergeDialects
import org.scalatest.funsuite.AnyFunSuite

/** The dialect registry: one contract over all ten builders
  * (load.go:29-66's dispatch shape). Structural invariants every
  * dialect must satisfy, checked across the whole label space so a
  * future dialect can't ship half-wired.
  */
class MergeDialectsSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("id", "name", del, osd)
  private val labels = Seq("spark", "redshift", "snowflake", "bigquery",
    "mssql", "mysql", "postgres", "duckdb", "databricks")

  test("registry covers every statement-generating reference client") {
    assert(MergeDialects.registry.keySet == labels.toSet)
    assert(MergeDialects.engineMergeLabels == Set("clickhouse"))
  }

  test("every dialect emits a non-empty plan; hard plans delete, soft plans never do") {
    def hasDeleteAction(qs: Seq[String]): Boolean =
      qs.exists(q => q.contains("THEN DELETE") || q.trim.startsWith("DELETE"))
    for (l <- labels; soft <- Seq(true, false)) {
      val qs = MergeDialects(l).mergeStatements("db.t", "db.t_stage",
        Seq("id"), cols, softDelete = soft)
      assert(qs.nonEmpty, s"$l soft=$soft")
      if (soft) {
        // soft mode NEVER removes rows — it writes the delete flag
        // (case-insensitive: Snowflake uppercases identifiers)
        assert(!hasDeleteAction(qs), s"$l soft plan deletes rows")
        assert(qs.mkString.toLowerCase.contains(del), s"$l soft never writes the delete flag")
      } else
        assert(hasDeleteAction(qs), s"$l hard plan has no delete action")
    }
  }

  test("toast columns route through each dialect's guard (soft mode — MySQL's hard path has none)") {
    // soft mode: every dialect's full-row update goes through its toast
    // fragment. MySQL's HARD path is faithful to the reference in having
    // NO toast guard at all (dialect.go:193-216 uses col = VALUES(col)).
    for (l <- labels) {
      val qs = MergeDialects(l).mergeStatements("db.t", "db.t_stage",
        Seq("id"), Seq("id", "txt", del, osd), softDelete = true,
        toastCols = Set("txt"))
      val text = qs.mkString("\n")
      assert(text.contains(Constants.ToastPlaceholder) && text.contains("CASE WHEN"),
        s"$l toast guard missing")
    }
  }

  test("unknown labels fail loudly and name the engine-merge path") {
    val e = intercept[IllegalArgumentException](MergeDialects("clickhouse"))
    assert(e.getMessage.contains("ClickhouseSqlBuilder"))
  }
}
