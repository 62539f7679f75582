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
      // distinct internal aliases (round-13 review): the raw
      // col(k) === col(rk) join was AMBIGUOUS whenever k == rk — the
      // most common FK shape (same column name on both sides)
      df.select(col(k).as("__fk")).filter(col("__fk").isNotNull)
        .join(ref.select(col(rk).as("__rk")), col("__fk") === col("__rk"), "left_anti")
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

  /** Per-group Spearman rank correlation between two integer metrics,
    * integer-exact: both metrics rank on the TOTAL order (value,
    * `tieCol`) — the house tie rule (one deterministic rank per row,
    * like [[decileLift]]'s explicit bucketing), which makes the classic
    * no-tie identity rho = 1 − 6·Σd²/(n·(n²−1)) exact in int64 rather
    * than the midrank Pearson-on-ranks form that would force a float
    * sqrt. Output per group: n, sum_d2, and rho_ppm (floor-scaled;
    * groups with n < 2 emit rho_ppm = 0 — no self-correlation claim).
    *
    * Scale shape: two group-partitioned window ranks (metric sorts run
    * inside the group partition — groups are category-sized, the
    * partition count is the scale axis), one keyed aggregation. Int64
    * envelope: 6·10^6·n³ < 2^63 needs per-group n ≤ ~115k; correlation
    * readouts over larger groups pre-aggregate (e.g. to customer grain)
    * first, which is what every fixture here does anyway.
    */
  def spearmanCorr(df: DataFrame, groupCol: String, xCol: String,
                   yCol: String, tieCol: String): DataFrame = {
    val reserved = Seq("__rx", "__ry", "__d2", "group", "n", "sum_d2", "rho_ppm")
    require(!Seq(groupCol, xCol, yCol, tieCol).exists(reserved.contains),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    def wg(c: String) = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(c), col(tieCol))
    val ranked = df.select(col(groupCol), col(xCol), col(yCol), col(tieCol))
      .withColumn("__rx", row_number().over(wg(xCol)).cast(LongType))
      .withColumn("__ry", row_number().over(wg(yCol)).cast(LongType))
      .withColumn("__d2",
        (col("__rx") - col("__ry")) * (col("__rx") - col("__ry")))
    ranked.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"), sum(col("__d2")).as("sum_d2"))
      .select(col("group"), col("n"), col("sum_d2"),
        when(col("n") >= 2L,
          lit(1000000L) - call_function("div", lit(6000000L) * col("sum_d2"),
            col("n") * (col("n") * col("n") - 1L)))
          .otherwise(lit(0L)).as("rho_ppm"))
      .orderBy(col("group"))
  }

  /** LCM(1..k) for the exact average-precision scaling (k ≤ 22 keeps
    * the LCM in int32 range; AP cutoffs are 10/20 in practice).
    */
  private[operators] def lcmTo(k: Int): Long = {
    def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)
    (1L to k.toLong).foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
  }

  /** Per-query average precision at k over an already-ranked list
    * (`qCol`, `rankCol` 1-based, binary `relCol`), integer-exact and
    * STANDARD AP@k: AP@k = (1/min(R, k))·Σ_{i≤k} rel_i · P(i) with
    * P(i) = hits_i / i and R the number of relevant items in the WHOLE
    * list (not just the top k — the round-14 repair; the two coincide
    * only when the caller's list is already truncated at k). After
    * multiplying through by L = LCM(1..k), the numerator is the int64
    * sum Σ rel_i · hits_i · (L/i) — every term exact, no per-term
    * floor. Output: q_id, n_rel (list-wide R), ap_ppm
    * (= 10^6·Σ/(L·min(R, k)), the ONLY floor, applied identically by
    * both engines; R = 0 → 0).
    *
    * Scale shape: the cumulative window runs inside the (query,
    * rank ≤ k) slice — k-bounded per query — and the list-wide R is a
    * separate plain aggregation joined back on the SAME q_id key (both
    * shuffles co-partitioned; queries are the parallel axis). Int64:
    * Σ ≤ k²·L fine for k ≤ 20 (envelope 10^6·k²·L < 2^63).
    */
  def averagePrecisionAtK(ranked: DataFrame, qCol: String, rankCol: String,
                          relCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"need 1 <= k <= 20, got $k")
    val L = lcmTo(k)
    // the window orders by the POST-select name (the q178 lesson: never
    // lean on Spark's missing-reference fallback into the child)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("__rk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val base = ranked.select(col(qCol).as("q_id"), col(rankCol).as("__rk"),
      when(relCol, 1L).otherwise(0L).as("__rel"))
    val rTot = base.groupBy(col("q_id")).agg(sum(col("__rel")).as("n_rel"))
    val num = base.filter(col("__rk") <= k)
      .withColumn("__hits", sum(col("__rel")).over(wq))
      .groupBy(col("q_id"))
      .agg(sum(col("__rel") * col("__hits") *
        call_function("div", lit(L), col("__rk"))).as("__num"))
    // left join: a query whose every rank sits past k still reports its
    // list-wide R with AP 0
    rTot.join(num, Seq("q_id"), "left")
      .select(col("q_id"), col("n_rel"),
        when(col("n_rel") > 0L,
          call_function("div", coalesce(col("__num"), lit(0L)) * 1000000L,
            lit(L) * least(col("n_rel"), lit(k.toLong))))
          .otherwise(lit(0L)).as("ap_ppm"))
      .orderBy(col("q_id"))
  }

  /** Chi-square association screen for two categorical columns — the
    * feature-leakage / segment-mix audit. Integer-exact per cell:
    * with N rows, row total R, column total C and observed O, the cell
    * contribution (O − RC/N)²/(RC/N) = (N·O − R·C)²/(N·R·C) computes as
    * contrib_ppm = ((N·O − R·C)² div (R·C)) · 10^6 div N — two integer
    * floors, identical in both engines, summed as integers (never a
    * float sum whose order differs). Cramér's V is emitted SQUARED
    * (v2_ppm = chi2_ppm div (N·min(r−1, c−1))) so no engine takes a
    * sqrt. Output: one row per cell of the DENSE margin grid (a, b, o,
    * r_tot, c_tot, contrib_ppm — empty cells appear at o = 0; they
    * carry chi-square mass) plus the table-level chi2_ppm / v2_ppm
    * repeated on each row via a broadcast single-row join. NULL is a
    * first-class category: it forms its own grid row/column (null-safe
    * spine join, null-aware category counts), matching groupBy's own
    * null semantics.
    *
    * Scale shape: one (a,b) aggregation, two category-sized margins
    * broadcast back, a single-row total. Int64 envelope: (N·O − R·C)²
    * < 2^63 needs N·max_cell < 3·10^9 — contingency screens run on
    * eval-scale or pre-aggregated relations; at the full 100 TB grain
    * the margins themselves are the thing to compute first.
    */
  def contingencyAssociation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("__o"))
    val rTot = obs.groupBy(col("a")).agg(sum(col("__o")).as("r_tot"))
    val cTot = obs.groupBy(col("b")).agg(sum(col("__o")).as("c_tot"))
    // NULL is a real category out of groupBy: countDistinct skips it, so
    // the category counts add an explicit null indicator (round 14 —
    // the same class of miss as the spine join below)
    val tot = obs.groupBy().agg(sum(col("__o")).as("__n"),
      (countDistinct(col("a")) +
        max(when(col("a").isNull, 1L).otherwise(0L))).as("__ra"),
      (countDistinct(col("b")) +
        max(when(col("b").isNull, 1L).otherwise(0L))).as("__cb"))
    // the DENSE margin grid, not just observed cells — an empty cell
    // under nonzero margins contributes (R·C)²/(N·R·C), and dropping it
    // understates chi2 exactly when association is strongest. NULL-SAFE
    // spine join (round 14, the tCloseness discipline): a NULL category
    // is a real groupBy cell, but a name-list equi-join drops it
    // (null != null) — its observed count read as 0 and chi2 was wrong
    // whenever either column carried nulls
    val obsR = obs.select(col("a").as("__oa"), col("b").as("__ob"),
      col("__o"))
    val cells = rTot.crossJoin(broadcast(cTot))
      .join(obsR, col("a") <=> col("__oa") && col("b") <=> col("__ob"),
        "left")
      .drop("__oa", "__ob")
      .withColumn("o", coalesce(col("__o"), lit(0L)))
    val d = col("__n") * col("o") - col("r_tot") * col("c_tot")
    val contrib = call_function("div",
      call_function("div", d * d, col("r_tot") * col("c_tot")) * 1000000L,
      col("__n"))
    val graded = cells
      .crossJoin(broadcast(tot))
      .withColumn("contrib_ppm", contrib)
    val chi2 = graded.groupBy()
      .agg(sum(col("contrib_ppm")).as("chi2_ppm"),
        first(col("__n")).as("__n2"),
        first(least(col("__ra"), col("__cb")) - 1L).as("__k"))
      .select(col("chi2_ppm"),
        when(col("__k") > 0L,
          call_function("div", col("chi2_ppm"), col("__n2") * col("__k")))
          .otherwise(lit(0L)).as("v2_ppm"))
    graded
      .select(col("a"), col("b"), col("o"), col("r_tot"), col("c_tot"),
        col("contrib_ppm"))
      .crossJoin(broadcast(chi2))
      .orderBy(col("a"), col("b"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al. 2013):
    * per-unit post-metric y adjusted by the pre-period covariate x,
    * y_adj = y − θ·(x − x̄), with θ = cov(x,y)/var(x) POOLED across
    * arms (the standard choice — assignment-independent by design).
    * Integer-exact: means floor to integers (x̄ = Σx div n — a defined
    * estimator, identical both engines), deviations center on those
    * floor-means, θ_ppm = 10^6·Σxd·yd div Σxd² in one integer divide,
    * per-arm adjusted means in milli-units. Output one row per arm
    * (treat, n, mean_y_me3, mean_adj_me3, theta_ppm) — the lift delta
    * is a trivial downstream subtraction.
    *
    * `xCol`/`yCol` must be integer metrics ALREADY SCALED by the caller
    * so that 10^6·|Σxd·yd| and 10^6·n·max|yd| stay inside int64 (the
    * house float rule: quantize at the source, never trust a float
    * sum). The per-unit relation is one aggregation from the raw
    * events; everything after is single-row broadcasts.
    */
  def cupedAdjust(df: DataFrame, treatCol: Column, xCol: Column,
                  yCol: Column): DataFrame = {
    val base = df.select(treatCol.as("treat"),
      xCol.cast(LongType).as("__x"), yCol.cast(LongType).as("__y"))
    val means = base.groupBy().agg(
      call_function("div", sum(col("__x")), count(lit(1))).as("__xm"),
      call_function("div", sum(col("__y")), count(lit(1))).as("__ym"))
    val dev = base.crossJoin(broadcast(means))
      .select(col("treat"), col("__x"), col("__y"), col("__xm"),
        (col("__x") - col("__xm")).as("__xd"),
        (col("__y") - col("__ym")).as("__yd"))
    val theta = dev.groupBy()
      .agg(sum(col("__xd") * col("__yd")).as("__sxy"),
        sum(col("__xd") * col("__xd")).as("__sxx"))
      .select(when(col("__sxx") > 0L,
        call_function("div", col("__sxy") * 1000000L, col("__sxx")))
        .otherwise(lit(0L)).as("theta_ppm"))
    dev.crossJoin(broadcast(theta))
      .groupBy(col("treat"))
      .agg(count(lit(1)).as("n"),
        call_function("div", sum(col("__y")) * 1000L, count(lit(1)))
          .as("mean_y_me3"),
        call_function("div",
          sum(col("__y") * 1000L -
            call_function("div",
              col("theta_ppm") * (col("__x") - col("__xm")), lit(1000L))),
          count(lit(1))).as("mean_adj_me3"),
        first(col("theta_ppm")).as("theta_ppm"))
      .orderBy(col("treat"))
  }

  /** Leave-one-group-out jackknife for a RATIO metric (Tukey; the
    * standard delete-block variance estimator for ratio-of-sums
    * metrics, where per-row variance formulas are simply wrong):
    * input is the GROUP-grain relation (group, num, den) — the caller
    * aggregates raw rows to blocks first (users, shards, days). For
    * each block, loo_ppm = 10^6·(N−num_g) div (D−den_g); the jackknife
    * variance is (G−1)/G · Σ(loo_g − mean_loo)² with floor-mean
    * centering, all int64 (ppm² units). Output one row per block
    * (group, num, den, loo_ppm) with table-level ratio_ppm /
    * jk_var_ppm2 repeated via a broadcast single-row join.
    *
    * Scale shape: one single-row total broadcast back to the block
    * relation, one blocks-sized aggregation — nothing data-sized after
    * the caller's upstream groupBy. A block whose removal empties the
    * denominator yields loo_ppm = 0 (flagged by den = D, not hidden).
    */
  def jackknifeRatio(df: DataFrame, groupCol: String, numCol: String,
                     denCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("group"),
      col(numCol).cast(LongType).as("num"), col(denCol).cast(LongType).as("den"))
    val tot = base.groupBy().agg(sum(col("num")).as("__tn"),
      sum(col("den")).as("__td"), count(lit(1)).as("__g"))
    val loo = base.crossJoin(broadcast(tot))
      .withColumn("loo_ppm",
        when(col("__td") - col("den") > 0L,
          call_function("div", lit(1000000L) * (col("__tn") - col("num")),
            col("__td") - col("den"))).otherwise(lit(0L)))
    val mean = loo.groupBy().agg(
      call_function("div", sum(col("loo_ppm")), count(lit(1))).as("__m"))
    val stats = loo.crossJoin(broadcast(mean))
      .groupBy()
      .agg(first(col("__tn")).as("n_sum"), first(col("__td")).as("d_sum"),
        first(col("__g")).as("__gg"),
        sum((col("loo_ppm") - col("__m")) * (col("loo_ppm") - col("__m")))
          .as("__ss"))
      .select(
        when(col("d_sum") > 0L,
          call_function("div", lit(1000000L) * col("n_sum"), col("d_sum")))
          .otherwise(lit(0L)).as("ratio_ppm"),
        when(col("__gg") > 1L,
          call_function("div", (col("__gg") - 1L) * col("__ss"), col("__gg")))
          .otherwise(lit(0L)).as("jk_var_ppm2"))
    loo.select(col("group"), col("num"), col("den"), col("loo_ppm"))
      .crossJoin(broadcast(stats))
      .orderBy(col("group"))
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED complement
    * of [[rankSumAuc]]'s Mann-Whitney: over per-unit paired differences
    * d = x − y (zeros dropped, the standard practice), |d| gets
    * tie-averaged ranks held exact at ×2 scale (r2 = lo + hi of the tie
    * span — always an integer), W⁺/W⁻ accumulate r2 by sign, and the
    * normal-approximation significance check runs as one integer
    * cross-multiplication: 120000·(W2⁺ − E2)² ≥ 38416·Var48, where
    * E2 = n(n+1)/2·2/… = n(n+1)/2 at the ×2 scale and Var48 =
    * 2n(n+1)(2n+1) − Σ(t³−t) is 48·Var[W⁺] with the exact tie
    * correction (z = 1.96 → z² = 38416/10⁴; 48·4·… folds to the 120000
    * factor). No float, no sqrt. Output ONE row: (n_pairs, w2_plus,
    * w2_minus, e2, var48, significant).
    *
    * Scale shape: one pair-keyed aggregation builds the differences;
    * the rank spans come from TWO band aggregates over the distinct
    * |d| values (value-domain-sized), broadcast back; the final reduce
    * is a single row. Pair counts are calendar/unit-bounded by nature.
    */
  def wilcoxonSignedRank(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d0 = df.select((col(xCol).cast("long") - col(yCol).cast("long")).as("__d"))
      .filter(col("__d") =!= 0L)
      .select(col("__d"), abs(col("__d")).as("__ad"))
    val dom = d0.groupBy(col("__ad")).agg(count(lit(1)).as("__t"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("__ad"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // lo = (# smaller) + 1, hi = (# smaller) + t  ->  r2 = lo + hi
    val spans = dom
      .withColumn("__below", coalesce(sum(col("__t")).over(wOrd), lit(0L)))
      .select(col("__ad"),
        (col("__below") * 2L + col("__t") + 1L).as("__r2"), col("__t"))
    val joined = d0.join(broadcast(spans.select(col("__ad"), col("__r2"))), Seq("__ad"))
    val tieCorr = spans.agg(
      coalesce(sum(col("__t") * col("__t") * col("__t") - col("__t")), lit(0L))
        .as("__tc"))
    joined.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__d") > 0L, col("__r2")).otherwise(0L)).as("w2_plus"),
        sum(when(col("__d") < 0L, col("__r2")).otherwise(0L)).as("w2_minus"))
      .crossJoin(broadcast(tieCorr))
      .select(col("n_pairs"), col("w2_plus"), col("w2_minus"),
        call_function("div",
          col("n_pairs") * (col("n_pairs") + 1L), lit(2L)).as("e2"),
        (lit(2L) * col("n_pairs") * (col("n_pairs") + 1L)
          * (lit(2L) * col("n_pairs") + 1L) - col("__tc")).as("var48"))
      .select(col("n_pairs"), col("w2_plus"), col("w2_minus"), col("e2"),
        col("var48"),
        (lit(120000L) * (col("w2_plus") - col("e2"))
          * (col("w2_plus") - col("e2")) >= lit(38416L) * col("var48"))
          .as("significant"))
  }

  /** B-cubed clustering-quality audit (Bagga & Baldwin 1998): item-level
    * precision/recall of a SYSTEM clustering against a GOLD one —
    * precision(i) = |C(i)∩G(i)|/|C(i)|, recall(i) = |C(i)∩G(i)|/|G(i)|,
    * both averaged over items. Unlike pair-counting (Rand), B³ rewards
    * each item's own cluster purity/completeness, the standard metric
    * for dedup/coref cluster evaluation. Exact integers: per-(C, G)
    * cell, Σ_i over the cell collapses to n_cg²/n_c (resp. /n_g),
    * floored at ppm per cell, then the item-average floors once more.
    * Output one row: (n, n_sys_clusters, n_gold_clusters,
    * bcubed_prec_ppm, bcubed_rec_ppm, bcubed_f1_ppm).
    *
    * Scale shape: one equi-join of the two assignment relations on the
    * item id, one (cid, gid)-keyed cell count, two cluster-size
    * aggregations joined back cell-wise, one single-row reduce. Cell
    * count ≤ min(#sys, #gold) clusters × overlap — never item-pairs.
    */
  def bcubedClusterAudit(sys: DataFrame, idCol: String, sysCol: String,
                         gold: DataFrame, goldIdCol: String,
                         goldCol: String): DataFrame = {
    val cell = sys.select(col(idCol).as("__id"), col(sysCol).as("__c"))
      .join(gold.select(col(goldIdCol).as("__id"), col(goldCol).as("__g")),
        Seq("__id"))
      .groupBy(col("__c"), col("__g")).agg(count(lit(1)).as("__ncg"))
    // NULL-safe size joins + null-aware cluster counts (round-14 review,
    // the contingencyAssociation discipline): a NULL cluster label is a
    // real groupBy cell — "the unassigned bucket" — but a name-list
    // equi-join dropped its items from n and both sums, silently
    // shrinking the audit's domain
    val cs = cell.groupBy(col("__c")).agg(sum(col("__ncg")).as("__nc"))
      .select(col("__c").as("__cc"), col("__nc"))
    val gs = cell.groupBy(col("__g")).agg(sum(col("__ncg")).as("__ng"))
      .select(col("__g").as("__gg"), col("__ng"))
    val tp = cell.join(cs, col("__c") <=> col("__cc"))
      .join(gs, col("__g") <=> col("__gg"))
      .agg(
        sum(call_function("div",
          lit(1000000L) * col("__ncg") * col("__ncg"), col("__nc"))).as("__sp"),
        sum(call_function("div",
          lit(1000000L) * col("__ncg") * col("__ncg"), col("__ng"))).as("__sr"),
        sum(col("__ncg")).as("n"),
        (countDistinct(col("__c")) +
          max(when(col("__c").isNull, 1L).otherwise(0L))).as("n_sys_clusters"),
        (countDistinct(col("__g")) +
          max(when(col("__g").isNull, 1L).otherwise(0L))).as("n_gold_clusters"))
    val p = call_function("div", col("__sp"), col("n"))
    val r = call_function("div", col("__sr"), col("n"))
    tp.select(col("n"), col("n_sys_clusters"), col("n_gold_clusters"),
      p.as("bcubed_prec_ppm"), r.as("bcubed_rec_ppm"),
      when(p + r > 0L, call_function("div", lit(2L) * p * r, p + r))
        .otherwise(lit(0L)).as("bcubed_f1_ppm"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between two
    * categorical raters/columns, the inter-annotator metric a labeling
    * pipeline gates on: κ = (p_o − p_e)/(1 − p_e) with p_o = agree/n and
    * p_e = Σ_k row_k·col_k / n², computed as ONE exact integer rational
    * κ_e6 = ⌊1e6·(n·agree − Σrc) / (n² − Σrc)⌋ (floor per the house
    * pmod/div pattern — κ can be negative). Output one row:
    * (n, agree, po_e6, pe_e6, kappa_e6).
    *
    * Scale shape: one (a, b)-keyed count aggregation over the corpus;
    * everything after is contingency-table sized (label vocabulary —
    * tiny by nature): marginal sums, one inner equi-join for Σrc
    * (absent categories contribute 0 products, so no full-outer join is
    * needed), and single-row broadcast crosses.
    *
    * Items unrated by EITHER rater (NULL in either column) are excluded
    * up front — the textbook kappa domain is items rated by both
    * (round-14 review: the earlier code counted such rows in n while
    * never counting them as agreement or in the expected-agreement
    * marginals — neither exclusion nor category semantics, so a
    * null-bearing input deflated kappa).
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val tot = ct.agg(sum(col("__c")).as("n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L)).as("agree"))
    val src = ct.groupBy(col("__a")).agg(sum(col("__c")).as("__na"))
      .join(ct.groupBy(col("__b")).agg(sum(col("__c")).as("__nb")),
        col("__a") === col("__b"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__src"))
    val fdiv = (x: Column, y: Column) =>
      call_function("div", x - pmod(x, y), y)
    tot.crossJoin(broadcast(src))
      .select(col("n"), col("agree"),
        fdiv(lit(1000000L) * col("agree"), col("n")).as("po_e6"),
        fdiv(lit(1000000L) * col("__src"), col("n") * col("n")).as("pe_e6"),
        when(col("n") * col("n") === col("__src"), lit(1000000L)) // degenerate
          .otherwise(fdiv(lit(1000000L) * (col("n") * col("agree") - col("__src")),
            col("n") * col("n") - col("__src"))).as("kappa_e6"))
  }
}
