package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal shaping operators: gaps-and-islands value runs (SCD Type-2
  * validity intervals from an event stream).
  *
  * The reference materializes history as an append-only audit stream
  * (models/event/event.go:82-94, history mode); warehouses consume that
  * stream as slowly-changing dimensions. This operator produces the
  * SCD2 form directly: one validity interval per contiguous run of an
  * attribute value.
  */
object TemporalOps {

  /** Collapse each key's ordered event stream into contiguous runs of
    * identical `valueCol` (gaps-and-islands), emitting SCD2-style
    * half-open validity intervals:
    *
    *   key, value, valid_from (= first ord of the run),
    *   valid_to (= next run's valid_from, NULL for the current run),
    *   n_events, is_current.
    *
    * Run ids come from a running sum of null-safe change flags — two
    * window functions over the SAME key partitioning (one exchange, one
    * sort), then one aggregation on (key, run) and a final lead over the
    * runs relation (already tiny: one row per run). All windows are
    * key-partitioned — no global window, scales with key cardinality.
    */
  def valueRuns(df: DataFrame, keyCol: String, ordCol: Column, tieCol: Column,
                valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCol, tieCol)
    val chg = (!(col(valueCol) <=> lag(col(valueCol), 1).over(w))).cast("long")
    val runs = df
      .withColumn("__run", sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col(valueCol), col("__run"))
      .agg(min(ordCol).as("valid_from"), count(lit(1)).as("n_events"))
    // the run id tie-breaks the runs-level lead: two runs share a
    // valid_from when the value changes within one ord tick, and the run
    // id (monotone in event order) is the only deterministic order there
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"), col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }

  /** Theil-Sen robust trend per key: the MEDIAN of all pairwise slopes
    * (v2-v1)/(t2-t1) over the key's (t, v) series — the estimator that
    * shrugs off the outlier days a least-squares slope chases (breakdown
    * point 29 %). Canonical use here: "is this source/event-type growing
    * or decaying, robustly?" over daily aggregates.
    *
    * Integer-exact contract: slopes are quantized FIRST
    * (floor((v2-v1) * 1000 / (t2-t1)) — one exact int64 floor-division
    * per pair, negative-safe via `div` semantics... see note), then the
    * LOWER MEDIAN of the quantized slopes is an exact order statistic.
    * Quantize-then-median differs from median-then-quantize by < 1 milli
    * unit and makes the whole computation engine-replayable.
    * Floor note: Spark's `div` and DuckDB's `//` both TRUNCATE toward
    * zero on negatives, so the shared quantizer is truncation, not
    * floor — identical in both engines, which is the actual requirement.
    *
    * Scale shape: the input should already be the per-(key, t) aggregate
    * (calendar-bounded: ~90 days of daily counts -> <= 4 k pairs/key);
    * the pair generation is a key-local self-join and the median a
    * key-partitioned window — nothing global. Do NOT feed raw events.
    *
    * Output: (key, n_points, n_pairs, sen_slope_milli) — keys with < 2
    * points are dropped (no pairs, no slope).
    */
  def theilSenTrend(df: DataFrame, keyCol: String, tCol: String,
                    vCol: String): DataFrame = {
    val a = df.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
      col(vCol).cast("long").as("v"))
    val pairs = a.as("p1").join(a.as("p2"),
        col("p1.key") === col("p2.key") && col("p1.t") < col("p2.t"))
      .select(col("p1.key").as("key"),
        call_function("div",
          (col("p2.v") - col("p1.v")) * 1000L,
          col("p2.t") - col("p1.t")).as("slope_milli"))
    val wOrd = Window.partitionBy(col("key")).orderBy(col("slope_milli"))
    val wAll = Window.partitionBy(col("key"))
    val points = a.groupBy(col("key")).agg(count(lit(1)).as("n_points"))
    pairs
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__np", count(lit(1)).over(wAll))
      .filter(col("__rn") ===
        call_function("div", col("__np") + 1L, lit(2L))) // exact lower median
      .select(col("key"), col("__np").as("n_pairs"),
        col("slope_milli").as("sen_slope_milli"))
      .join(points, Seq("key"))
      .select(col("key"), col("n_points"), col("n_pairs"), col("sen_slope_milli"))
  }

  /** One-sided CUSUM changepoint screen per key (Page '54): over the
    * ordered (t, v) series, S_i = max(0, S_{i-1} + (v_i - target - slack))
    * accumulates only SUSTAINED upward deviation; the first t where
    * S_i >= threshold is the alarm. The standard "did this metric SHIFT,
    * as opposed to spike?" detector — the complement of the q93 rolling
    * spike screen, which by design forgives level shifts.
    *
    * The clamped recursion has the classic prefix-sum closed form
    * (reflection): with dev_i = v_i - target - slack and prefix
    * P_i = dev_1 + ... + dev_i,  S_i = P_i - min(0, min_{j<=i} P_j) —
    * so the whole detector is TWO key-partitioned running windows over
    * one sort plus a final aggregation; nothing sequential, nothing
    * collected, and the SQL oracle replays the identical windows. All
    * integer arithmetic: target/slack/threshold are per-key-constant
    * columns in v's units (callers derive them from a reference period,
    * e.g. the key's own mean via integer division).
    *
    * Output: (key, n_points, max_cusum, first_alarm_t); first_alarm_t is
    * NULL when the threshold is never reached.
    */
  def cusumAlarms(df: DataFrame, keyCol: String, tCol: String, vCol: String,
                  target: Column, slack: Column, threshold: Column): DataFrame = {
    val a = df.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
      col(vCol).cast("long").as("v"), target.cast("long").as("__tg"),
      slack.cast("long").as("__sl"), threshold.cast("long").as("__h"))
    val wRun = Window.partitionBy(col("key")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = a
      .withColumn("__p", sum(col("v") - col("__tg") - col("__sl")).over(wRun))
      .withColumn("__s", col("__p") -
        least(lit(0L), min(col("__p")).over(wRun)))
    s.groupBy(col("key"))
      .agg(count(lit(1)).as("n_points"), max(col("__s")).as("max_cusum"),
        min(when(col("__s") >= col("__h"), col("t"))).as("first_alarm_t"))
  }

  /** Kaplan-Meier survival curve over an exit-count series: input is ONE
    * row per event time t with `nEventsCol` subjects exiting at t (e.g.
    * users whose last activity is day t); the at-risk count n_t is the
    * reverse cumulative sum (everyone exiting at or after t), and the
    * survival estimate after t is the product of (1 - d/n) over all
    * steps <= t — "what fraction of the cohort is still alive after
    * day t", the standard retention/churn curve.
    *
    * Integer contract: survival is ppm with TRUNCATION at each step
    * (S_0 = 10^6; S_i = (S_{i-1} * (n_i - d_i)) div n_i) — the
    * cumulative product is inherently sequential, and per-step integer
    * truncation is the only form an external engine replays exactly
    * (the oracle uses a recursive CTE). The fold runs row-locally over
    * the collected step array: sound because the input grain is EVENT
    * TIMES, calendar-bounded (~tens to thousands of steps), never
    * subjects — the subject-sized work happened in the caller's
    * aggregation. Output: (t, n_risk, n_churn, surv_ppm) per step.
    */
  def kaplanMeier(df: DataFrame, tCol: String, nEventsCol: String): DataFrame = {
    val a = df.select(col(tCol).cast("long").as("t"),
      col(nEventsCol).cast("long").as("d"))
    // time-grain relation (see scaladoc): the single-group window and the
    // collected array are bounded by distinct event times, not subjects
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = a.withColumn("r", sum(col("d")).over(wDesc))
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("r")))).as("__st"))
    val folded = aggregate(
      col("__st"),
      array().cast("array<struct<t:bigint,d:bigint,r:bigint,s:bigint>>"),
      (acc, x) => {
        val prev = when(size(acc) === 0, lit(1000000L))
          .otherwise(element_at(acc, size(acc)).getField("s"))
        concat(acc, array(struct(
          x.getField("t").as("t"), x.getField("d").as("d"),
          x.getField("r").as("r"),
          call_function("div",
            prev * (x.getField("r") - x.getField("d")),
            x.getField("r")).as("s"))))
      })
    steps.select(explode(folded).as("__e"))
      .select(col("__e.t").as("t"), col("__e.r").as("n_risk"),
        col("__e.d").as("n_churn"), col("__e.s").as("surv_ppm"))
  }

  /** Integer EWMA smoothing per key: over the (t, v) series in t-order,
    *   e_1 = v_1·alphaDen;  e_i = e_{i-1} + floor((v_i·alphaDen − e_{i-1}) / alphaDen)
    * — state carries the smoothed value scaled by `alphaDen` (α =
    * 1/alphaDen), every step an EXACT floor division (the pmod trick, so
    * truncation-vs-floor can never diverge between engines on negative
    * deviations). The standard load/latency smoother, bit-replayable by
    * a recursive-CTE oracle. Output: (key, t, v, e) per input row, e in
    * alphaDen-ths.
    *
    * The recursion is inherently sequential, so it folds ROW-LOCALLY
    * over the per-key collected series — sound for the same reason as
    * [[kaplanMeier]]: the input grain is pre-aggregated time buckets
    * (calendar-bounded, tens to thousands of steps per key), never raw
    * events; the event-sized work is the caller's upstream aggregation.
    * HOF interpretation cost is bounded by that same grain.
    */
  def ewmaSeries(df: DataFrame, keyCol: String, tCol: String, vCol: String,
                 alphaDen: Long = 8L): DataFrame = {
    require(alphaDen >= 2L, s"need alphaDen >= 2, got $alphaDen")
    val packed = df
      .select(col(keyCol).as("key"), struct(col(tCol).as("t"),
        col(vCol).cast("long").as("v")).as("__p"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(col("__p"))).as("__st"))
    val es = aggregate(
      col("__st"),
      array().cast("array<bigint>"),
      (acc, x) => {
        val v8 = x.getField("v") * alphaDen
        val prev = element_at(acc, size(acc))
        val dev = v8 - prev
        val stepped = prev + call_function("div",
          dev - pmod(dev, lit(alphaDen)), lit(alphaDen))
        concat(acc, array(when(size(acc) === 0, v8).otherwise(stepped)))
      })
    packed.withColumn("__es", es)
      .select(col("key"), posexplode(arrays_zip(col("__st"), col("__es"))))
      .select(col("key"), col("col.__st.t").as("t"), col("col.__st.v").as("v"),
        col("col.__es").as("e"))
  }

  /** Calendar gap-filling with exact linear interpolation — the ETL
    * densification step a downstream forecaster/joiner needs: per key,
    * the day spine spans [min, max] of the PRESENT days, missing days
    * interpolate v_e3 = ⌊1000·(v_prev·(t_next−t) + v_next·(t−t_prev)) /
    * (t_next−t_prev)⌋ between the surrounding present points (`filled`
    * marks them); present days carry v·1000. No extrapolation — the
    * spine's ends are present by construction.
    *
    * Scale shape: the spine is a per-key sequence explode (span-bounded
    * by the calendar), one (key, day) equi-join against the present
    * rows, and four IGNORE-NULLS windows over the SAME key partitioning
    * (one exchange + sort). Never a global window.
    */
  def gapFillInterpolate(df: DataFrame, keyCol: String, tCol: String,
                         vCol: String): DataFrame = {
    val pres = df.select(col(keyCol).as("key"), col(tCol).cast("date").as("day"),
      col(vCol).cast("long").as("__v"))
    val spine = pres.groupBy(col("key"))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col("key"), explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as("day"))
    val j = spine.join(pres, Seq("key", "day"), "left")
    val back = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val presentDay = when(col("__v").isNotNull, col("day"))
    val wnd = j
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pt", last(presentDay, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nt", first(presentDay, ignoreNulls = true).over(fwd))
    wnd.filter(col("__v").isNotNull ||
        (col("__pv").isNotNull && col("__nv").isNotNull))
      .select(col("key"), col("day"),
        when(col("__v").isNotNull, col("__v") * 1000L)
          .otherwise(call_function("div",
            lit(1000L) * (col("__pv") * datediff(col("__nt"), col("day"))
              + col("__nv") * datediff(col("day"), col("__pt"))),
            datediff(col("__nt"), col("__pt")))).as("v_e3"),
        col("__v").isNull.as("filled"))
      .orderBy(col("key"), col("day"))
  }

  /** Holt double-exponential smoothing (level + trend, Holt 1957) as an
    * exact integer recursion — the [[ewmaSeries]] sibling that also
    * tracks drift, so the one-step forecast follows a ramp instead of
    * lagging it. States ×32 fixed-point; per step (α = 1/4, β = 1/8):
    * L' = ⌊(32·x + 3·(L+B))/4⌋,  B' = ⌊((L'−L) + 7·B)/8⌋ (exact FLOOR
    * via the pmod step — B can be negative), L₁ = 32·x₁, B₁ = 0.
    * Output per (key, t): (key, t, v, level_s32, trend_s32,
    * forecast_s32 = L+B, the one-step-ahead prediction).
    *
    * Scale shape: the recursion is inherently sequential per key, so it
    * folds ROW-LOCALLY over the key's sorted packed series (the
    * ewmaSeries shape) — series are calendar-bounded by nature; keys
    * distribute. The oracle replays the identical floors in a recursive
    * CTE.
    */
  def holtSeries(df: DataFrame, keyCol: String, tCol: String,
                 vCol: String): DataFrame = {
    val fdiv = (x: Column, d: Long) =>
      call_function("div", x - pmod(x, lit(d)), lit(d))
    val packed = df
      .select(col(keyCol).as("key"), struct(col(tCol).as("t"),
        col(vCol).cast("long").as("v")).as("__p"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(col("__p"))).as("__st"))
    val hs = aggregate(
      col("__st"),
      array().cast("array<struct<l:bigint,b:bigint>>"),
      (acc, x) => {
        val vS = x.getField("v") * 32L
        val prev = element_at(acc, size(acc))
        val l1 = fdiv(vS + (prev.getField("l") + prev.getField("b")) * 3L, 4L)
        val b1 = fdiv(l1 - prev.getField("l") + prev.getField("b") * 7L, 8L)
        concat(acc, array(
          when(size(acc) === 0, struct(vS.as("l"), lit(0L).as("b")))
            .otherwise(struct(l1.as("l"), b1.as("b")))))
      })
    packed.withColumn("__hs", hs)
      .select(col("key"), posexplode(arrays_zip(col("__st"), col("__hs"))))
      .select(col("key"), col("col.__st.t").as("t"), col("col.__st.v").as("v"),
        col("col.__hs.l").as("level_s32"), col("col.__hs.b").as("trend_s32"),
        (col("col.__hs.l") + col("col.__hs.b")).as("forecast_s32"))
  }

  /** Sequential-pattern support at level 2 (the ordered-pair core of
    * GSP / PrefixSpan — Srikant & Agrawal 1996, Pei et al. 2001): how
    * many sequences contain each ordered item pair (a, b) as a NOT
    * necessarily adjacent subsequence. Per key, the first `maxLen` items
    * in (orderCol, tieCol) order form the sequence; a key supports
    * (a, b) iff some i < j has item_i = a and item_j = b, counted ONCE
    * per key (set semantics — the sequential-pattern definition, distinct
    * from adjacent-bigram transition counts and from unordered basket
    * co-occurrence). Output: (a, b, support) with support >= minSupport.
    *
    * Scale shape: the ordered-pair explode is C(maxLen, 2)-bounded per
    * key (28 at maxLen 8) and entirely row-local array arithmetic inside
    * codegen; the shuffles are the per-key collect and one (a, b) count
    * aggregation. Level-3+ mining repeats the same shape with the
    * surviving pairs as prefixes (candidate-join discipline), never an
    * unbounded subsequence enumeration.
    */
  def sequentialPairSupport(df: DataFrame, keyCol: String, itemCol: String,
                            orderCol: String, tieCol: String,
                            maxLen: Int = 8, minSupport: Long = 2L): DataFrame = {
    require(maxLen >= 2 && maxLen <= 64,
      s"pair explode is C(maxLen,2) per key; supported maxLen is 2..64, got $maxLen")
    val seqs = df.groupBy(col(keyCol))
      .agg(transform(slice(array_sort(collect_list(
          struct(col(orderCol), col(tieCol), col(itemCol).as("__it")))), 1, maxLen),
        x => x.getField("__it")).as("__items"))
    val n = size(col("__items"))
    // sequence(a, b) DESCENDS when a > b — filtering n < 2 keys (they
    // support nothing) keeps the outer range from generating [1, 0] and
    // inventing reversed pairs, and stays item-type-agnostic
    val prs = flatten(transform(sequence(lit(1), n - 1), i =>
      transform(sequence(i + 1, n), j =>
        struct(element_at(col("__items"), i).as("a"),
          element_at(col("__items"), j).as("b")))))
    seqs.filter(n >= 2)
      .select(col(keyCol), explode(array_distinct(prs)).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** FIFO matching (inventory lot allocation / queue cost attribution):
    * per key, demand consumes supply OLDEST-FIRST. Both sides become
    * consecutive cumulative-quantity intervals ([cum−q, cum) in FIFO
    * order) and each (supply, demand) pair's allocation is the overlap
    * of its intervals — the standard prefix-sum formulation, exact and
    * order-deterministic via `ordCol`/`tieCol`. Quantities must be
    * NON-NEGATIVE (a negative row would make the cumulative intervals
    * non-monotone and the overlap math meaningless — net out
    * adjustments upstream). Output one row per overlapping pair:
    * key + supply id + demand id + alloc.
    *
    * Scale shape: two key-partitioned cumsum windows and ONE key equi-
    * join. Because the intervals on each side are consecutive, the
    * OUTPUT is linear per key (≤ supplies + demands − 1 rows) — but the
    * range predicate evaluates as a post-join filter on the key
    * equi-join, so COMPUTE is still |supply_k| × |demand_k| per key.
    * Hot keys are the skew dial: sub-partition a hot key by coarse
    * cum-quantity blocks (both sides cut at the same block boundaries)
    * to bound the per-task pair enumeration.
    */
  def fifoMatch(supply: DataFrame, demand: DataFrame, keyCol: String,
                idCol: String, qtyCol: String, ordCol: String,
                tieCol: String): DataFrame = {
    def cumIntervals(df: DataFrame, outId: String, lo: String, hi: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__k")).orderBy(col(ordCol), col(tieCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      df.select(col(keyCol).as("__k"), col(idCol).as(outId),
          col(qtyCol).cast("long").as("__q"), col(ordCol), col(tieCol))
        .withColumn(hi, sum(col("__q")).over(w))
        .select(col("__k"), col(outId), (col(hi) - col("__q")).as(lo), col(hi))
    }
    val lots = cumIntervals(supply, "supply_id", "__a0", "__a1")
    val rets = cumIntervals(demand, "demand_id", "__b0", "__b1")
    lots.join(rets, Seq("__k"))
      .filter(col("__a1") > col("__b0") && col("__b1") > col("__a0"))
      .select(col("__k").as("key"), col("supply_id"), col("demand_id"),
        (least(col("__a1"), col("__b1")) -
          greatest(col("__a0"), col("__b0"))).as("alloc"))
      // zero-quantity rows produce zero-width intervals that sit "inside"
      // a counterpart without consuming anything — drop their 0-allocs
      .filter(col("alloc") > 0L)
  }

  /** Per-key interval-union coverage (the uptime / active-time measure):
    * overlapping or touching intervals merge into islands (classic
    * gaps-and-islands: an interval starts a new island iff its start
    * exceeds the running max end of everything before it), and the
    * answer is Σ island lengths — total covered time with overlaps
    * counted once. Output: (key, n_intervals, n_islands, covered).
    * Deterministic: the island flag depends only on interval VALUES,
    * whatever the tie order of identical intervals.
    *
    * Scale shape: one key-partitioned window (running max end + island
    * cumsum) and two aggregations — keys-sized output. The classic
    * alternative (sorting interval endpoints globally) needs no window
    * at all but produces a global answer; per-key islanding is the
    * partitioned form that scales with keys.
    */
  def intervalUnionLength(df: DataFrame, keyCol: String, startCol: String,
                          endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__s"), col("__e"))
    val wPrior = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(keyCol).as("key"), col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .withColumn("__newisl",
        when(col("__s") > coalesce(max(col("__e")).over(wPrior), col("__s") - 1L), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__newisl")).over(wRun))
      .groupBy(col("key"), col("__isl"))
      .agg(count(lit(1)).as("__n"), (max(col("__e")) - min(col("__s"))).as("__len"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n_intervals"), count(lit(1)).as("n_islands"),
        sum(col("__len")).as("covered"))
  }

  /** Time-weighted average (TWAP): per key, the average of `valueCol`
    * weighted by how LONG each observation was in force — weight_i =
    * t_{i+1} − t_i over the observed span [first, last], the standard
    * piecewise-constant integral (the last point closes the span with
    * weight 0). Pure integer: Σ v_i·Δ_i div Σ Δ_i. Keys with zero
    * total duration (a single point, or all points at one instant) are
    * excluded — they have no time axis to average over. Ties at one
    * timestamp order by `tieCol`, so the replay is exact.
    * Output: (key, n_points, span, twap) in the input value unit.
    *
    * int64 bound: Σ v·Δ per key below 2^63 — pick a coarse-enough time
    * unit (days, not µs) for long-lived keys.
    *
    * Scale shape: one key-partitioned lead window + one
    * map-side-combinable aggregation; keys-sized output, no global
    * windows, no joins.
    */
  def timeWeightedAverage(df: DataFrame, keyCol: String, tCol: String,
                          valueCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__t"), col(tieCol))
    df.select(col(keyCol).as("key"), col(tCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__v"), col(tieCol))
      .withColumn("__dur", coalesce(lead(col("__t"), 1).over(w), col("__t")) - col("__t"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_points"), sum(col("__dur")).as("span"),
        sum(col("__v") * col("__dur")).as("__area"))
      .filter(col("span") > 0L)
      .select(col("key"), col("n_points"), col("span"),
        call_function("div", col("__area"), col("span")).as("twap"))
  }

  /** Event-time disorder profile — the measurement that SIZES a
    * streaming watermark: per key, each event's lateness is how far its
    * event time sits behind the running maximum of the events that
    * ARRIVED before it (arrival order = `arrivalCol`, e.g. a log
    * offset — must be UNIQUE per key, or equal-arrival rows have no
    * defined order and the profile is not replayable), and the
    * corpus-level answer is the lateness histogram in
    * order-of-magnitude buckets (bucket = decimal digit count — an
    * integer stand-in for log10 both engines compute identically;
    * bucket 0 = in-order). `withDelayedWatermark(p99-bucket)` is then a
    * data-driven choice instead of a guess.
    *
    * Output: (bucket, n_events, max_lateness) ordered by bucket.
    *
    * Scale shape: one key-partitioned running-max window (frame ends at
    * the PRIOR row, so the first event per key is exactly on-time) and
    * one map-side-combinable bucket aggregation — histogram-sized
    * output, no global windows.
    */
  def disorderProfile(df: DataFrame, keyCol: String, arrivalCol: String,
                      timeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(keyCol), col(arrivalCol), col(timeCol).cast("long").as("__t"))
      .withColumn("__late",
        greatest(lit(0L), coalesce(max(col("__t")).over(w), col("__t")) - col("__t")))
      .withColumn("bucket",
        when(col("__late") === 0L, lit(0L))
          .otherwise(length(col("__late").cast("string")).cast("long")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("__late")).as("max_lateness"))
      .orderBy(col("bucket"))
  }

  /** Mann-Kendall trend test per group — the nonparametric "is this
    * series drifting" screen that pairs with [[theilSenTrend]]'s slope
    * (same robustness story: signs of pairwise differences, no
    * distributional assumption, immune to outliers a mean-based slope
    * chases). S = Σ_{i<j} sign(v_j − v_i) over time order; the variance
    * ships ×18 (var18 = n(n−1)(2n+5) − Σ t_k(t_k−1)(2t_k+5), the
    * textbook tie correction) so both engines emit exact integers —
    * the z-score is one double away for whoever wants it.
    *
    * Input grain must be PRE-AGGREGATED periods with distinct `tCol`
    * per group (duplicate times would double-count pairs); the pair
    * enumeration is therefore calendar-bounded per group (months/weeks,
    * never events), and groups are the parallel axis — the same
    * contract as [[kaplanMeier]]'s time grain.
    */
  def mannKendall(df: DataFrame, groupCol: String, tCol: String,
                  vCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("group"),
      col(tCol).cast("long").as("__t"), col(vCol).cast("long").as("__v"))
    val a = base.select(col("group"), col("__t").as("__ta"), col("__v").as("__va"))
    val b = base.select(col("group"), col("__t").as("__tb"), col("__v").as("__vb"))
    val sPairs = a.join(b, Seq("group")).filter(col("__ta") < col("__tb"))
      .groupBy(col("group"))
      .agg(sum(signum(col("__vb") - col("__va")).cast("long")).as("s_stat"))
    val nG = base.groupBy(col("group")).agg(count(lit(1)).as("n"))
    val ties = base.groupBy(col("group"), col("__v"))
      .agg(count(lit(1)).as("__tk"))
      .groupBy(col("group"))
      .agg(sum(col("__tk") * (col("__tk") - 1L) * (col("__tk") * 2L + 5L))
        .as("__t18"))
    nG.join(sPairs, Seq("group"), "left").join(ties, Seq("group"))
      .select(col("group"), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        (col("n") * (col("n") - 1L) * (col("n") * 2L + 5L) - col("__t18"))
          .as("var18"))
      .orderBy(col("group"))
  }

  /** Wald–Wolfowitz runs test per key — "is this sequence RANDOM in its
    * sign pattern", the dichotomy complement to [[mannKendall]] (which
    * sees monotone drift) and q201's CV² (which sees cadence): values
    * above/below the key's exact lower median (median ties excluded,
    * the textbook rule), runs R = 1 + sign changes in time order.
    * Everything ships integer-exact: n1/n2 (above/below counts), R,
    *   e_runs_ppm  = 10⁶ + (2·n1·n2·10⁶) div (n1+n2)      (E[R] in ppm)
    *   ratio_ppm   = R·(n1+n2)·10⁶ div (n1+n2+2·n1·n2)     (R / E[R])
    * — cross-multiplied, never a float division. ratio ≪ 10⁶ means
    * long one-sided streaks (level shifts, stuck sensors); ratio ≫ 10⁶
    * means alternation faster than chance (oscillation, ping-pong
    * retries). Keys where every value equals the median (n1=0 or n2=0)
    * are dropped — the statistic is undefined there.
    *
    * int64 bound: R·n·10⁶ — safe to ~3e9 observations per key.
    *
    * Scale shape: one keyed aggregation for the median (order
    * statistic via keyed window), one keyed lag window for the sign
    * changes, one final aggregation — keys are the parallel axis, no
    * global windows, no self-join.
    */
  def runsTest(df: DataFrame, keyCol: String, tCol: String, vCol: String,
               tieCol: String): DataFrame = {
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__v"), col("__tie"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val base = df.select(col(keyCol).as("key"), col(tCol).as("__t"),
      col(vCol).as("__v"), col(tieCol).as("__tie"))
    val med = base
      .withColumn("__rn", row_number().over(byV).cast("long"))
      .withColumn("__n", count(lit(1)).over(all))
      .filter(col("__rn") === call_function("div", col("__n") + 1L, lit(2L)))
      .select(col("key"), col("__v").as("__med"))
    val byT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__t"), col("__tie"))
    val signed = base.join(med, Seq("key"))
      .filter(col("__v") =!= col("__med"))
      .withColumn("__sign", (col("__v") > col("__med")).cast("long"))
      .withColumn("__chg",
        when(lag(col("__sign"), 1).over(byT).isNull, lit(0L))
          .otherwise((col("__sign") =!= lag(col("__sign"), 1).over(byT))
            .cast("long")))
    signed.groupBy(col("key"))
      .agg(sum(col("__sign")).as("n1"),
        (count(lit(1)) - sum(col("__sign"))).as("n2"),
        (sum(col("__chg")) + 1L).as("runs"))
      .filter(col("n1") > 0L && col("n2") > 0L)
      .select(col("key"), col("n1"), col("n2"), col("runs"),
        (lit(1000000L) + call_function("div",
          col("n1") * col("n2") * 2000000L, col("n1") + col("n2")))
          .as("e_runs_ppm"),
        call_function("div",
          col("runs") * (col("n1") + col("n2")) * 1000000L,
          col("n1") + col("n2") + col("n1") * col("n2") * 2L)
          .as("ratio_ppm"))
  }

  /** Two-sample log-rank test over per-(time, arm) exit counts — "do the
    * two arms churn at the same rate?", the standard survival-curve
    * comparison that completes the [[kaplanMeier]]/[[nelsonAalen]]
    * family. At each distinct time with pooled exits d over pooled
    * at-risk n (arm A at-risk n_a): observed o_a = Σ d_a, expected
    * e_a_me3 = Σ 1000·d·n_a div n (milli-units), hypergeometric
    * variance v_me6 = Σ nested-floor of 10^6·d·n_a·n_b·(n−d) /
    * (n²·(n−1)) — each floor applied identically by any engine, every
    * intermediate inside int64 for cohort sizes to ~10^5 per step
    * term (the nesting bounds each product by 10^14). The z-score is
    * (o_a − e_a/1000)/sqrt(v/10^6), one double away for the consumer.
    *
    * `armCol` must be boolean (true = arm A). Input is the distinct
    * (time, arm) exit-count grain — calendar-bounded, same contract as
    * [[kaplanMeier]]; at-risk counts come from per-arm reverse cumsums
    * over that relation, so nothing is subject-sized. Output: ONE row
    * (o_a, o_b, e_a_me3, v_me6).
    */
  def logRank(df: DataFrame, tCol: String, armCol: Column,
              dCol: String): DataFrame = {
    val perT = df
      .select(col(tCol).cast("long").as("t"), armCol.as("__arm"),
        col(dCol).cast("long").as("__d"))
      .groupBy(col("t"))
      .agg(sum(when(col("__arm"), col("__d")).otherwise(0L)).as("__da"),
        sum(when(!col("__arm"), col("__d")).otherwise(0L)).as("__db"))
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = perT
      .withColumn("__na", sum(col("__da")).over(wDesc))
      .withColumn("__nb", sum(col("__db")).over(wDesc))
    val d = col("__da") + col("__db")
    val n = col("__na") + col("__nb")
    val eStep = call_function("div", lit(1000L) * d * col("__na"), n)
    val vStep = call_function("div",
      call_function("div",
        call_function("div", lit(1000000L) * d * col("__na"), n) * col("__nb"),
        n) * (n - d),
      when(n > 1L, n - 1L).otherwise(lit(1L)))
    risk.groupBy()
      .agg(sum(col("__da")).as("o_a"), sum(col("__db")).as("o_b"),
        sum(eStep).as("e_a_me3"), sum(vStep).as("v_me6"))
  }

  /** Aalen-Johansen cumulative incidence under TWO competing risks —
    * "what fraction has exited via cause 1 (vs cause 2) by time t",
    * which naive per-cause KM overstates (1 − KM_k treats the other
    * cause's exits as censoring and the two 'probabilities' can sum
    * past 1; the textbook competing-risks trap). At each step the
    * cause-k increment is S(t_{i−1})·d_k/n over the POOLED at-risk
    * count, with S the pooled KM product.
    *
    * Integer contract mirrors [[kaplanMeier]]: S in ppm with per-step
    * truncation, each CIF increment floor(S_prev·d_k div n) summed as
    * integers — the sequential product folds row-locally over the
    * distinct-time relation (calendar-bounded, same soundness argument).
    * Output per time: (t, n_risk, d1, d2, surv_ppm, cif1_ppm, cif2_ppm);
    * surv + cif1 + cif2 ≈ 10^6 (off only by the per-step floors).
    */
  def competingRisks(df: DataFrame, tCol: String, d1Col: String,
                     d2Col: String): DataFrame = {
    val a = df.select(col(tCol).cast("long").as("t"),
      col(d1Col).cast("long").as("d1"), col(d2Col).cast("long").as("d2"))
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = a.withColumn("r", sum(col("d1") + col("d2")).over(wDesc))
      .agg(sort_array(collect_list(struct(col("t"), col("d1"), col("d2"),
        col("r")))).as("__st"))
    val folded = aggregate(
      col("__st"),
      array().cast(
        "array<struct<t:bigint,d1:bigint,d2:bigint,r:bigint,s:bigint,c1:bigint,c2:bigint>>"),
      (acc, x) => {
        val prevS = when(size(acc) === 0, lit(1000000L))
          .otherwise(element_at(acc, size(acc)).getField("s"))
        val prevC1 = when(size(acc) === 0, lit(0L))
          .otherwise(element_at(acc, size(acc)).getField("c1"))
        val prevC2 = when(size(acc) === 0, lit(0L))
          .otherwise(element_at(acc, size(acc)).getField("c2"))
        val r = x.getField("r")
        val d = x.getField("d1") + x.getField("d2")
        concat(acc, array(struct(
          x.getField("t").as("t"), x.getField("d1").as("d1"),
          x.getField("d2").as("d2"), r.as("r"),
          call_function("div", prevS * (r - d), r).as("s"),
          (prevC1 + call_function("div", prevS * x.getField("d1"), r)).as("c1"),
          (prevC2 + call_function("div", prevS * x.getField("d2"), r)).as("c2"))))
      })
    steps.select(explode(folded).as("__e"))
      .select(col("__e.t").as("t"), col("__e.r").as("n_risk"),
        col("__e.d1").as("d1"), col("__e.d2").as("d2"),
        col("__e.s").as("surv_ppm"), col("__e.c1").as("cif1_ppm"),
        col("__e.c2").as("cif2_ppm"))
  }

  /** Nelson-Aalen cumulative hazard — the additive companion to
    * [[kaplanMeier]] (same (event time, n_events) input grain): at each
    * distinct time the hazard increment is d/r over the at-risk count,
    * and H(t) is the running sum. Integer ppm with per-step floor
    * (hazard_ppm = 10^6·d div r), summed as integers — no recursion
    * needed because the estimator is additive, which is exactly why a
    * practitioner reaches for it over KM at scale.
    *
    * The single-group windows run over the DISTINCT-TIME relation
    * (calendar-bounded, same soundness argument as [[kaplanMeier]]) —
    * the subject-sized work is the caller's upstream groupBy.
    */
  def nelsonAalen(df: DataFrame, tCol: String, nEventsCol: String): DataFrame = {
    val a = df.select(col(tCol).cast("long").as("t"),
      col(nEventsCol).cast("long").as("d"))
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.partitionBy(lit(0)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.withColumn("r", sum(col("d")).over(wDesc))
      .withColumn("hazard_ppm",
        call_function("div", lit(1000000L) * col("d"), col("r")))
      .withColumn("cumhaz_ppm", sum(col("hazard_ppm")).over(wAsc))
      .select(col("t"), col("r").as("n_risk"), col("d").as("n_churn"),
        col("hazard_ppm"), col("cumhaz_ppm"))
  }

  /** Single-level binary-segmentation changepoint (Scott & Knott 1974 /
    * the first step of Killick's PELT): per key, the split position t
    * that maximizes the exact floor-scaled variance-reduction objective
    * score(t) = ⌊ΣL²·1000/t⌋ + ⌊ΣR²·1000/(n−t)⌋ (minimizing within-
    * segment SSE; the Σx² term is constant and cancels), smallest-t
    * tie-break. Output per key: (key, split_t = last point of the left
    * segment, n, gain_e3 = score − ⌊S²·1000/n⌋ ≥ 0 vs the no-split
    * fit, mean_left_e3, mean_right_e3) — every step int64, so both
    * engines agree bit-for-bit. Keys with fewer than 2 points have no
    * candidate split and drop out.
    *
    * Scale shape: one prefix-sum window PARTITIONED ON THE KEY (series
    * lengths are calendar-bounded by nature; work distributes across
    * keys) and one argmax aggregation via the house max-struct with a
    * negated-position tie-break. No self-join: every candidate split is
    * scored from the running sum alone, so compute is linear per key.
    * CUSUM (q160) asks IF a drift happened; this asks WHERE.
    */
  def changepointSplit(df: DataFrame, keyCol: String, tCol: String,
                       vCol: String): DataFrame = {
    val reserved = Seq("__cl", "__t", "__s", "__n", "__score", "__best")
    require(!Seq(keyCol, tCol, vCol).exists(reserved.contains),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    // (tCol, vCol) ordering: tCol alone left duplicate timestamps with
    // partition-order-dependent prefix sums (nondeterministic split_t);
    // with the value tie-break the running sum is a pure function of the
    // data whenever (key, t, v) rows are distinct — the oracle twin
    // orders identically. Overflow bound (documented like the siblings,
    // not checked): __score computes S²·1000, so per-key |Σv| must stay
    // ≤ ~3.0e6 (3e6² · 1e3 ≈ 9e15 < 2⁶³); feed per-period aggregates,
    // not raw sums of large magnitudes.
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(tCol), col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(col(keyCol))
    val scored = df
      .withColumn("__cl", sum(col(vCol)).over(wRun))
      .withColumn("__t", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(tCol), col(vCol))).cast("long"))
      .withColumn("__s", sum(col(vCol)).over(wKey))
      .withColumn("__n", count(lit(1)).over(wKey).cast("long"))
      .filter(col("__t") < col("__n"))
      .withColumn("__score",
        call_function("div", col("__cl") * col("__cl") * 1000L, col("__t")) +
        call_function("div",
          (col("__s") - col("__cl")) * (col("__s") - col("__cl")) * 1000L,
          col("__n") - col("__t")))
    scored.groupBy(col(keyCol))
      .agg(max(struct(col("__score"), (-col("__t")).as("__negt"),
        col(tCol).as("__st"), col("__cl"), col("__s"), col("__n"))).as("__best"))
      .select(col(keyCol),
        col("__best.__st").as("split_t"),
        col("__best.__n").as("n"),
        (col("__best.__score") - call_function("div",
          col("__best.__s") * col("__best.__s") * 1000L,
          col("__best.__n"))).as("gain_e3"),
        call_function("div", col("__best.__cl") * 1000L,
          -col("__best.__negt")).as("mean_left_e3"),
        call_function("div", (col("__best.__s") - col("__best.__cl")) * 1000L,
          col("__best.__n") + col("__best.__negt")).as("mean_right_e3"))
      .orderBy(col(keyCol))
  }
}
