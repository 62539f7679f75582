package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Mann-Whitney rank-sum AUC: P(score of a random positive > score of
    * a random negative), the standard threshold-free evaluation of a
    * quality/filter score against a binary label — integer-exact to the
    * last ppm, with the textbook midrank tie correction (each tied pair
    * contributes 1/2).
    *
    * Computed at the DISTINCT-SCORE grain, never by ranking rows: one
    * map-side-combinable aggregation collapses the corpus to (score,
    * n_rows, n_pos), and the rank algebra runs over that score-cardinality
    * relation (a quality score is quantized permille/chars — thousands of
    * values at any corpus size; callers with continuous scores quantize
    * first, per the repo's float rules). All arithmetic is doubled-rank
    * int64: positives at a score with `c` rows before it and `t` tied
    * rows have summed double-midrank n_pos_s * (2c + t + 1), so
    * U2 = sum - n_pos*(n_pos+1) is exactly twice the Mann-Whitney U and
    * auc_ppm = U2 * 10^6 / (2 * n_pos * n_neg) divides exactly in int64.
    * Int64 headroom: U2 * 10^6 <= 2n^2 * 10^6 stays below 2^63 for
    * n <= ~2M rows — eval-set sized; score a larger corpus by sampling
    * the eval set, which is what an eval is.
    *
    * Output: ONE row (n_pos, n_neg, auc_ppm); degenerate single-class
    * inputs yield a defined auc_ppm = 0 rather than a divide error.
    */
  def rankSumAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val perScore = df
      .select(scoreCol.cast(LongType).as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__t"), sum(col("__y")).as("__p"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val wCum = wAll.orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val summed = perScore
      .withColumn("__c", coalesce(sum(col("__t")).over(wCum), lit(0L)))
      .agg(
        sum(col("__p") * (lit(2L) * col("__c") + col("__t") + lit(1L))).as("__r2"),
        sum(col("__p")).as("n_pos"),
        sum(col("__t") - col("__p")).as("n_neg"))
    summed.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        call_function("div",
          (col("__r2") - col("n_pos") * (col("n_pos") + 1L)) * 1000000L,
          lit(2L) * col("n_pos") * col("n_neg")))
        .otherwise(lit(0L)).as("auc_ppm"))
  }

  /** floor(1e6 · log10(1 + 1/d)) for d = 1..9 — Benford's first-digit
    * law as integer ppm literals, so neither engine computes a float
    * log (the oracle embeds the same constants).
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(1 -> 301029L, 2 -> 176091L,
    3 -> 124938L, 4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
    8 -> 51152L, 9 -> 45757L)

  /** First-significant-digit distribution vs Benford's law, per group —
    * the classic fabricated-amounts screen for financial columns.
    * `amountCents` must be a positive integer amount (fixed-point cents;
    * zero/negative rows are excluded — they have no significant digit).
    * Output per (group, digit 1..9): n, observed ppm (integer floor of
    * the within-group share), the Benford expectation, and the absolute
    * deviation. Digits a group never produces are absent (outer-join a
    * digit spine downstream if a dense grid is wanted).
    *
    * Scale shape: one map-side-combinable groupBy on (group, digit) —
    * the first digit is string-head of the int64, row-local codegen —
    * then a group-cardinality window for totals. Nothing is data-sized
    * after the first aggregate.
    */
  def benfordScreen(df: DataFrame, groupCol: String,
                    amountCents: Column): DataFrame = {
    val digit = substring(amountCents.cast(LongType).cast("string"), 1, 1)
      .cast("int")
    val bmap = map(BenfordPpm.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group"))
    df.filter(amountCents.cast(LongType) > 0L)
      .groupBy(col(groupCol).as("group"), digit.as("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(wg))
      .withColumn("ppm", call_function("div", col("n") * 1000000L, col("__tot")))
      .withColumn("benford_ppm", element_at(bmap, col("digit")))
      .select(col("group"), col("digit"), col("n"), col("ppm"),
        col("benford_ppm"), abs(col("ppm") - col("benford_ppm")).as("dev_ppm"))
  }

  /** Decile lift / cumulative-gains table for a ranking signal: rows
    * sort by (`scoreCol` DESC, `tieCol`), split into `buckets` equal
    * rank slices (bucket = rank·buckets div n + 1 — the explicit
    * formula, NOT engine NTILE, so every engine buckets identically),
    * and each slice reports its positives plus the cumulative capture
    * rate (permille of all positives found so far) and cumulative lift
    * vs the base rate (permille, cross-multiplied integers — 1000 =
    * random). The campaign-targeting / review-queue readout that AUC
    * ([[rankSumAuc]]) summarizes away.
    *
    * Scale shape: the global rank comes from [[RangePrefix]] (range
    * partitioning + per-partition offsets), never an unpartitioned
    * window over the corpus; the only single-partition window runs over
    * the buckets-sized aggregate (10 rows).
    */
  def decileLift(df: DataFrame, scoreCol: String, tieCol: String,
                 labelCol: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val reserved = Seq(RangePrefix.PidCol, "__rn", "__off", "__y")
    require(!reserved.contains(scoreCol) && !reserved.contains(tieCol),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(scoreCol), col(tieCol),
      when(labelCol, 1L).otherwise(0L).as("__y"))
    val (sorted, offsets, n) = RangePrefix.withOffsets(
      base, Seq(col(scoreCol).desc, col(tieCol)), lit(1L))
    if (n == 0L) // empty input: emit the schema, no rows (no div-by-zero)
      return sorted.select(lit(0L).as("decile"), lit(0L).as("n"),
        lit(0L).as("n_pos"), lit(0L).as("cum_pos"), lit(0L).as("capture_pm"),
        lit(0L).as("lift_pm")).limit(0)
    val offDf = broadcast(offsets.toSeq.toDF(RangePrefix.PidCol, "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(RangePrefix.PidCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
    val bucketed = sorted
      .withColumn("__rn", row_number().over(w).cast(LongType) - 1L)
      .join(offDf, Seq(RangePrefix.PidCol))
      .select((call_function("div",
        (col("__rn") + col("__off")) * buckets, lit(n)) + 1L).as("decile"),
        col("__y"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val wCum = wAll.orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bucketed
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__tp", sum(col("n_pos")).over(wAll))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        when(col("__tp") > 0L,
          call_function("div", col("cum_pos") * 1000L, col("__tp")))
          .otherwise(lit(0L)).as("capture_pm"),
        when(col("__tp") > 0L,
          call_function("div", col("cum_pos") * lit(n) * 1000L,
            col("cum_n") * col("__tp")))
          .otherwise(lit(0L)).as("lift_pm"))
      .orderBy(col("decile"))
  }

  /** Split-conformal calibration per group (Vovk et al.; Lei et al.
    * 2018): the conformal quantile over a calibration set is the
    * ceil((n_cal + 1)·(1 − α))-th smallest nonconformity score — the
    * "+1" is what buys the finite-sample coverage guarantee a plain
    * quantile lacks. Reports that threshold per group plus the achieved
    * coverage (permille of test-set scores <= threshold). `alphaPm` is
    * the miscoverage budget in permille (100 = 90% target coverage).
    * When the adjusted rank exceeds n_cal the threshold is the
    * calibration max and `saturated` flags the group (the honest "need
    * more calibration data" signal, instead of a silent +infinity).
    *
    * Scale shape: one group-partitioned window ranks calibration
    * scores; the threshold relation is groups-sized and broadcast-joins
    * back to the test side; coverage is one keyed aggregation. Exact
    * integer ranks throughout.
    */
  def conformalCoverage(cal: DataFrame, test: DataFrame, groupCol: String,
                        scoreCol: String, tieCol: String,
                        alphaPm: Long): DataFrame = {
    require(alphaPm >= 1L && alphaPm <= 500L,
      s"need 1 <= alphaPm <= 500, got $alphaPm")
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol), col(tieCol))
    val ranked = cal
      .select(col(groupCol), col(scoreCol), col(tieCol))
      .withColumn("__rk", row_number().over(wg).cast(LongType))
      .withColumn("__nc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    // k = ceil((n_cal + 1) * (1000 - alphaPm) / 1000), capped at n_cal
    val k = call_function("div",
      (col("__nc") + 1L) * (1000L - alphaPm) + 999L, lit(1000L))
    val thresholds = ranked
      .withColumn("__k", k)
      .filter(col("__rk") === least(col("__k"), col("__nc")))
      .select(col(groupCol), col("__nc").as("n_cal"),
        col(scoreCol).as("threshold"), (col("__k") > col("__nc")).as("saturated"))
    test.select(col(groupCol), col(scoreCol))
      .join(broadcast(thresholds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        first(col("threshold")).as("threshold"),
        first(col("saturated")).as("saturated"),
        call_function("div",
          sum(when(col(scoreCol) <= col("threshold"), 1L).otherwise(0L)) * 1000L,
          count(lit(1))).as("coverage_pm"))
      .orderBy(col(groupCol))
  }
}
