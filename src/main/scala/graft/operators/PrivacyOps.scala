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

  /** t-closeness audit (Li et al. 2007) — the third rung after
    * k-anonymity and l-diversity: a class can be large AND diverse yet
    * still leak if its sensitive-value DISTRIBUTION diverges from the
    * table's (the classic "this zip code is all low-income" failure
    * l-diversity misses). For an ORDERED sensitive attribute the
    * distance is the 1-D earth-mover's: with m global values,
    * EMD = (1/(m−1))·Σ_i |Σ_{j≤i}(p_j − q_j)|, computed integer-exactly
    * at the common denominator n_class·N: cumdiff_i = Σ_{j≤i}
    * (c_j·N − g_j·n_class), emd_ppm = 10^6·Σ|cumdiff| div
    * (n_class·N·(m−1)). The grid is DENSE over the global value spine
    * (a value a class never takes still shifts mass — same lesson as
    * the chi-square dense grid).
    *
    * Scale shape: one (class, value) aggregation; the spine cross-join
    * and the cumulative window run over the (classes × m) relation —
    * QI-domain-sized, never row-sized. Int64 envelope: c·N < 2^63/m
    * (any census table qualifies). Output per class: QI cols, n,
    * emd_ppm, breach = emd_ppm > tPpm.
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one QI column")
    val base = df.select((qiCols.map(col) :+
      col(sensitiveCol).cast(LongType).as("__v")): _*)
    val classes = base.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__nc"))
    val bands = base.groupBy(col("__v")).agg(count(lit(1)).as("__g"))
    val tot = base.groupBy().agg(count(lit(1)).as("__n"),
      countDistinct(col("__v")).as("__m"))
    val cells = base.groupBy((qiCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // NULL-SAFE spine join (round-13 review): a NULL QI class or a NULL
    // sensitive band is a real group out of groupBy, but the name-list
    // equi-join dropped its cells (null != null) — every such class read
    // as zero-mass and its EMD saturated. <=> keys match the groupBy's
    // null semantics (the temperatureRepeats discipline).
    val cellsR = cells.select((qiCols.map(c => col(c).as(s"__r_$c")) :+
      col("__v").as("__r_v") :+ col("__c")): _*)
    val cellCond = (qiCols.map(c => col(c) <=> col(s"__r_$c")) :+
      (col("__v") <=> col("__r_v"))).reduce(_ && _)
    classes.crossJoin(broadcast(bands))
      .join(cellsR, cellCond, "left")
      .drop((qiCols.map(c => s"__r_$c") :+ "__r_v"): _*)
      .crossJoin(broadcast(tot))
      .withColumn("__cum",
        sum(coalesce(col("__c"), lit(0L)) * col("__n") -
          col("__g") * col("__nc")).over(w))
      .groupBy((qiCols.map(col) :+ col("__nc").as("n")): _*)
      .agg(first(col("__n")).as("__nn"), first(col("__m")).as("__mm"),
        sum(abs(col("__cum"))).as("__sa"))
      .select((qiCols.map(col) :+ col("n") :+
        when(col("__mm") > 1L,
          call_function("div", lit(1000000L) * col("__sa"),
            col("n") * col("__nn") * (col("__mm") - 1L)))
          .otherwise(lit(0L)).as("emd_ppm")): _*)
      .withColumn("breach", col("emd_ppm") > tPpm)
      .orderBy(qiCols.map(col): _*)
  }
}
