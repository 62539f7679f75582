package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (Deequ-style constraint suite):
  * the pre-merge gate a CDC pipeline runs before letting a batch reach
  * the warehouse, and the per-snapshot audit a curation pipeline emits.
  *
  * Execution shape at 100 TB: every predicate and uniqueness rule folds
  * into ONE aggregate pass over the table (map-side combinable sums —
  * the table is scanned once no matter how many rules); each referential
  * rule adds one anti-join whose result is a single-row count. The report
  * is rules-sized, never data-sized.
  */
object QualityOps {

  sealed trait Rule { def name: String }

  /** Rows where `violated` evaluates true fail the rule (null counts as
    * a violation — an unevaluable predicate is not a pass).
    */
  final case class PredicateRule(name: String, violated: Column) extends Rule

  /** Duplicate tuples of `cols` fail: violations = n_rows - n_distinct. */
  final case class UniqueRule(name: String, cols: Seq[String]) extends Rule

  /** Values of `keyCol` absent from `ref(refCol)` fail (FK check). */
  final case class ReferentialRule(name: String, keyCol: String,
                                   ref: DataFrame, refCol: String) extends Rule

  /** (rule, n_violations, pass) — one row per rule, ordered by rule. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "report needs at least one rule")
    val aggRules = rules.collect {
      case PredicateRule(n, v) =>
        n -> sum(when(coalesce(v, lit(true)), 1L).otherwise(0L))
      case UniqueRule(n, cols) =>
        n -> (count(lit(1)) - countDistinct(struct(cols.map(col): _*)))
    }
    val aggPart: Option[DataFrame] = if (aggRules.nonEmpty) Some {
      val agged = df.agg(aggRules.head._2.as(aggRules.head._1),
        aggRules.tail.map { case (n, c) => c.as(n) }: _*)
      agged.select(explode(array(aggRules.map { case (n, _) =>
        struct(lit(n).as("rule"), coalesce(col(n), lit(0L)).as("n_violations"))
      }: _*)).as("r")).select(col("r.rule"), col("r.n_violations"))
    } else None
    val refParts = rules.collect { case ReferentialRule(n, k, ref, rk) =>
      df.select(col(k)).filter(col(k).isNotNull)
        .join(ref.select(col(rk)), col(k) === col(rk), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(n).as("rule"), col("n_violations"))
    }
    (aggPart.toSeq ++ refParts).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }
}
