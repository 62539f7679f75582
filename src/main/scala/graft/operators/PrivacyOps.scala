package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Privacy-governance audits for release gating a training corpus.
  *
  * The reference pipeline ships column hashing/encryption and PK bans
  * (`lib/config/config.go` advanced column settings — hashing, encrypting,
  * skipping); a data-release pipeline additionally needs to QUANTIFY
  * re-identification risk before a table leaves the boundary. These
  * operators implement the classic k-anonymity / l-diversity audits
  * (Sweeney 2002; Machanavajjhala et al. 2007) over a caller-declared
  * generalization ladder, as single-pass grouping-sets aggregations.
  */
object PrivacyOps {

  /** k-anonymity + l-diversity audit across a generalization ladder.
    *
    * `levels(i)` is the quasi-identifier column set at generalization
    * level i, ordered most-specific first (e.g. `(nation, segment)` →
    * `(region, segment)` → `(segment)`). For each level the audit reports
    * the equivalence-class census release reviewers act on:
    *
    *  - `n_groups`     — equivalence classes under that QI set
    *  - `min_k`        — smallest class (the k in k-anonymity)
    *  - `groups_below_k` / `rows_at_risk` — classes (and their rows)
    *    smaller than the caller's `k` threshold: the rows that must be
    *    suppressed or further generalized before release
    *  - `min_l`        — minimum distinct `sensitiveCol` values in any
    *    class (the l in l-diversity; a class where every member shares
    *    one sensitive value leaks it even at k ≥ threshold)
    *
    * Scale shape: ONE grouping-sets aggregation computes every level —
    * Spark's Expand replicates each input row once per level map-side
    * (×levels scan cost, no extra shuffle) and the single shuffle is on
    * the grouped keys, whose cardinality is bounded by the QI domain,
    * not the row count. The per-level rollup is a second aggregation
    * over groups-sized data. No windows, no joins, no driver state.
    */
  def anonymityLadder(df: DataFrame, levels: Seq[Seq[String]],
                      sensitiveCol: String, k: Long): DataFrame = {
    require(levels.nonEmpty && levels.forall(_.nonEmpty),
      "need at least one level, each with at least one QI column")
    require(levels.map(_.toSet).distinct.size == levels.size,
      "generalization levels must be distinct column sets")
    val union = levels.flatten.distinct
    // level id from the grouping() bit pattern: a row of the grouping-sets
    // output belongs to level i iff exactly level-i's columns are grouped
    // (grouping(c) = 0) and the rest are aggregated away (grouping(c) = 1)
    val levelExpr = levels.zipWithIndex.foldRight(lit(-1L): Column) {
      case ((ls, i), acc) =>
        val cond = union.map { c =>
          grouping(col(c)) === lit(if (ls.contains(c)) 0 else 1)
        }.reduce(_ && _)
        when(cond, lit(i.toLong)).otherwise(acc)
    }
    df.groupingSets(levels.map(_.map(col)), union.map(col): _*)
      .agg(levelExpr.as("level"), count(lit(1)).as("__cnt"),
        countDistinct(col(sensitiveCol)).as("__nl"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"),
        min(col("__cnt")).as("min_k"),
        sum(when(col("__cnt") < k, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("__cnt") < k, col("__cnt")).otherwise(0L)).as("rows_at_risk"),
        min(col("__nl")).as("min_l"))
      .select(col("level"), col("n_groups").cast(LongType),
        col("min_k").cast(LongType), col("groups_below_k").cast(LongType),
        col("rows_at_risk").cast(LongType), col("min_l").cast(LongType))
      .orderBy(col("level"))
  }
}
