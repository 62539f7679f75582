package graft.operators

import graft.functions.Converters
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch/statistics operators for corpus profiling at scale. Unlike
  * `approx_count_distinct`/`approx_percentile` these are DETERMINISTIC and
  * engine-portable (built on the rolling fingerprint and exact order
  * statistics), so the same sketch computed by an external engine is
  * bit-identical — which makes them oracle-checkable and stable across
  * retries/partitionings.
  */
object SketchOps {
  /** Global 1-based rank over `sortCols` (ascending, caller supplies the
    * full tie-break) via [[RangePrefix]]: range-partitioned pid windows +
    * broadcast partition offsets — never an unpartitioned data-sized
    * window. Returns (input + `rankCol`, total row count). The public
    * doorway for rank-derived readouts (q343's deciles) that live
    * outside this package.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
                 rankCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    require(!df.columns.contains(rankCol),
      s"input already carries a column named $rankCol")
    val (sorted, offsets, n) = RangePrefix.withOffsets(df, sortCols, lit(1L))
    val offDf = broadcast(offsets.toSeq.toDF(RangePrefix.PidCol, "__off"))
    val wPid = org.apache.spark.sql.expressions.Window
      .partitionBy(col(RangePrefix.PidCol)).orderBy(sortCols: _*)
    val ranked = sorted.join(offDf, Seq(RangePrefix.PidCol))
      .withColumn(rankCol, col("__off") + row_number().over(wPid).cast("long"))
      .drop(RangePrefix.PidCol, "__off")
    (ranked, n)
  }

  /** The raw min-k sketch as a Column (custom TypedImperativeAggregate —
    * bounded k-entry state, map-side combinable, mergeable across
    * partitions).
    */
  def kmvSketch(normalizedHash: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.KmvMinK(
        org.apache.spark.sql.GraftBridge.expression(normalizedHash), k)
        .toAggregateExpression())

  /** Normalized (0, 1] hash of a value — the KMV input. The rolling
    * fingerprint alone is NOT KMV-grade: similar strings ("doc1","doc2")
    * fingerprint to CONSECUTIVE integers, clustering the min-k order
    * statistics and wrecking the estimate. A universal-hash finalizer
    * (a*fp + b) mod p equidistributes those runs across [0, p) while
    * staying a one-line replay for an external engine (a*fp < 2^63, no
    * overflow in checked BIGINT arithmetic either).
    */
  def normalizedHash(value: Column): Column = {
    val p = 1000000007L
    val mixed = pmod(lit(636413622L) * Converters.fingerprint64(value.cast(StringType))
      + lit(528402381L), lit(p))
    (mixed + lit(1L)).cast(DoubleType) / lit(p.toDouble)
  }

  /** K-minimum-values distinct-count estimate of `valueCol` per group.
    * The k smallest normalized hashes h_1..h_k of the distinct values give
    * estimate = (k-1) / h_k (the classic KMV estimator): one shuffle on
    * the group keys, sketch size k per group regardless of cardinality —
    * the mergeable-sketch shape a 100 TB profile job needs.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64): DataFrame = {
    // duplicate values share a hash and the sketch dedupes, so min-k over
    // all rows = min-k over distinct values: no distinct pre-shuffle
    val grouped = df.withColumn("__h", normalizedHash(col(valueCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(kmvSketch(col("__h"), k).as("__hs"))
    val nMin = size(col("__hs")).cast(DoubleType)
    val kth = element_at(col("__hs"), size(col("__hs")))
    // fewer than k distinct hashes -> the sketch IS the exact value set
    val estimate = when(size(col("__hs")) < k, nMin)
      .otherwise((nMin - 1.0) / kth)
    grouped.select(groupCols.map(col) :+ estimate.as("distinct_est"): _*)
  }

  /** Sketch-based set-overlap (join-size) estimation from two KMV
    * sketches — |A ∪ B|, |A ∩ B|, and the resemblance, WITHOUT shuffling
    * either side against the other: each relation collapses to its own
    * k-entry sketch, and the combine is row-local array math over the
    * two broadcast one-row frames. The planner's classic use is join
    * cardinality estimation before picking a strategy. KMV algebra:
    * the k smallest of the union of the two sketches is a valid sketch
    * of A ∪ B, and members of it present in both sketches estimate the
    * resemblance. Every estimate is a deterministic function of the
    * sketch order statistics (q46's bit-replayable contract), so the
    * SQL oracle reproduces all four outputs exactly. Output one row:
    * (k_union, resemblance_ppm, union_est, intersect_est) —
    * resemblance integer ppm; the two _est doubles quantized with the
    * single-op floor(x * 10^4) rule.
    */
  def kmvOverlap(dfA: DataFrame, keyA: String, dfB: DataFrame, keyB: String,
                 k: Int = 64): DataFrame = {
    def sketch(df: DataFrame, c: String, out: String) =
      df.withColumn("__h", normalizedHash(col(c)))
        .agg(kmvSketch(col("__h"), k).as(out))
    val joined = sketch(dfA, keyA, "__a").crossJoin(broadcast(sketch(dfB, keyB, "__b")))
    val unionK = slice(array_sort(array_distinct(concat(col("__a"), col("__b")))), 1, k)
    val q4 = (c: Column) => floor(c * 10000.0) / 10000.0
    joined.select(unionK.as("__u"), col("__a"), col("__b"))
      .select(col("__u"), col("__a"), col("__b"),
        size(col("__u")).cast("long").as("k_union"),
        size(array_intersect(array_intersect(col("__u"), col("__a")), col("__b")))
          .cast("long").as("__m"))
      .select(col("k_union"),
        // k_union = 0 (both inputs empty / all values sketch to nothing)
        // must return a defined zero row, not an ANSI divide-by-zero
        when(col("k_union") > 0L,
          call_function("div", col("__m") * 1000000L, col("k_union")))
          .otherwise(lit(0L)).as("resemblance_ppm"),
        when(col("k_union") > 0L,
          q4(when(col("k_union") < k, col("k_union").cast("double"))
            .otherwise((col("k_union").cast("double") - 1.0) /
              element_at(col("__u"), size(col("__u"))))))
          .otherwise(lit(0.0)).as("union_est"),
        when(col("k_union") > 0L,
          q4((col("__m").cast("double") / col("k_union").cast("double")) *
            when(col("k_union") < k, col("k_union").cast("double"))
              .otherwise((col("k_union").cast("double") - 1.0) /
                element_at(col("__u"), size(col("__u"))))))
          .otherwise(lit(0.0)).as("intersect_est"))
  }

  /** HyperLogLog distinct-count sketch (Flajolet et al. '07), the
    * fixed-size complement to [[kmvDistinct]]: m=64 one-byte registers
    * per group instead of k 8-byte order statistics, mergeable by
    * register-max — the approx-distinct shape every 100 TB profiling
    * stack standardizes on. DETERMINISTIC and engine-portable, unlike
    * `approx_count_distinct` (whose xxHash+HLL++ bias tables no external
    * engine replays): the register index is `h mod 64` and the rank is
    * trailing-zeros+1 of `h div 64`, all int64 bit arithmetic
    * (`bit_count((w & -w) - 1)`), so an external SQL engine reproduces
    * every register and hence the estimate bit-for-bit. The hash is the
    * [[normalizedHash]] finalizer followed by ONE nonlinear remix,
    * h = (mixed^2 + 1) mod p: the affine finalizer alone maps the
    * near-arithmetic-progressions that sequential ids/suffixes
    * fingerprint into (stride even) straight into biased trailing-zero
    * statistics — KMV's order statistics don't care, HLL's rank geometry
    * does — and squaring mod an odd prime is the cheapest avalanche that
    * stays inside checked int64 ((p-1)^2 < 2^60) and replays as one SQL
    * multiply.
    *
    * Plan shape: one groupBy (group, register) with map-side-combinable
    * max, then a group-sized re-aggregation — register state is bounded
    * at 64 rows per group no matter the cardinality, and empty registers
    * are accounted arithmetically ((64 - nr) * 2^W) instead of being
    * materialized. The estimate is the raw HLL harmonic mean as ONE
    * exact integer division (alpha_64 = 0.709 as the rational 709/1000;
    * numerator 709 * 64^2 * 2^25 < 2^47): no floats anywhere. The
    * linear-counting small-range correction is deliberately omitted —
    * callers counting < 3m distinct values should use the exact path;
    * this sketch is for the regime where exact is unaffordable. Rank
    * geometry note: `mixed div 64` is uniform on [0, p/64) rather than a
    * power-of-two range, which perturbs p(rank=k) by O(2^k / (p/64)) —
    * immaterial next to HLL's inherent 1.04/sqrt(64) = 13 % error, and
    * identical in any replaying engine.
    *
    * Output: (group cols..., n_values, hll_est) where n_values is the
    * exact input-row count (free from the same pass at the register
    * grain — NOT the distinct count; the whole point is not computing
    * that exactly).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val p = 1000000007L
    val m = 64L
    val W = 25 // mixed div 64 < p/64 < 2^24, so trailing zeros <= 23; w=0 -> rank W
    val mixed = pmod(lit(636413622L) * Converters.fingerprint64(col(valueCol).cast(StringType))
      + lit(528402381L), lit(p))
    val h = pmod(mixed * mixed + lit(1L), lit(p))
    val w = call_function("div", h, lit(m))
    val rank = when(w === 0L, lit(W))
      .otherwise(call_function("bit_count", w.bitwiseAND(-w) - lit(1L)) + lit(1))
    val regs = df
      .select(groupCols.map(col) :+ pmod(h, lit(m)).as("__r") :+ rank.cast("int").as("__rho"): _*)
      .groupBy((groupCols :+ "__r").map(col): _*)
      .agg(max(col("__rho")).as("__m"), count(lit(1)).as("__n"))
    val summed = regs.groupBy(groupCols.map(col): _*)
      .agg(sum(call_function("shiftleft", lit(1L), lit(W) - col("__m"))).as("__s"),
        count(lit(1)).as("__nr"), sum(col("__n")).as("n_values"))
    val denom = col("__s") + (lit(m) - col("__nr")) * lit(1L << W)
    summed.select(groupCols.map(col) :+ col("n_values") :+
      call_function("div", lit(709L * m * m) * lit(1L << W), lit(1000L) * denom).as("hll_est"): _*)
  }

  /** Mergeable log-histogram quantile sketch over a NON-NEGATIVE integer
    * column — the bounded-state approximate complement to
    * [[exactPercentiles]] for 100 TB profiling: ONE map-side-combinable
    * groupBy pass (no sort anywhere), sketch state <= 256 bucket counts
    * regardless of n, histograms merge by addition (partials, retries,
    * cross-day unions all compose). Buckets are base-2 octaves with 4
    * linear sub-bins — pure integer bit arithmetic (`length(bin(v))`,
    * `>>`, `&`), so the sketch and its quantile read-out are exactly
    * replayable by an external SQL engine, unlike t-digest/KLL whose
    * float centroids drift per merge order. The estimate returns the
    * containing bucket's lower bound: deterministic, with <= 25 %
    * relative error by construction (bucket width / 4). The bounded
    * bucket table is resolved on the driver (<= 256 rows) — the same
    * driver-bounded pattern as [[RangePrefix]].
    */
  /** Shared octave/sub-bin bucket assignment: m = floor(log2(v)) as
    * length(bin(v)) - 1; sub-bin = next 2 bits below the msb; v in {0, 1}
    * and {2, 3} fill buckets 0-7 exactly. Single source of truth for the
    * global and per-group sketch forms (and their oracles' replay).
    */
  private def histBucketExpr(valueCol: String): Column = {
    val v = s"CAST($valueCol AS BIGINT)"
    expr(s"CAST((length(bin($v)) - 1) * 4 + (($v >> greatest(length(bin($v)) - 3, 0)) & 3) AS INT)")
  }

  private def requireQuantiles(qs: Seq[Double]): Unit =
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1], got ${qs.filterNot(q => q >= 0.0 && q <= 1.0).mkString(", ")}")

  def histogramQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireQuantiles(qs)
    val bucket = histBucketExpr(valueCol)
    val counts = df.filter(expr(s"CAST($valueCol AS BIGINT) >= 0"))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    if (n == 0) return qs.toDF("q").filter(lit(false)).withColumn("est", lit(0L))
    var acc = 0L
    val cum = counts.map { case (b, c) => val e = (b, acc, c); acc += c; e }
    def lowerBound(b: Int): Long = {
      val m = b / 4
      val sub = b % 4
      if (m <= 1) sub.toLong else (4L + sub) << (m - 2)
    }
    qs.map { q =>
      val rank = math.floor((n - 1) * q).toLong
      val b = cum.find { case (_, off, c) => rank >= off && rank < off + c }
        .getOrElse(throw new IllegalStateException(
          s"rank $rank outside the cumulative histogram (n=$n)"))._1
      (q, lowerBound(b))
    }.toDF("q", "est")
  }

  /** Per-group [[histogramQuantiles]] with a FULLY DISTRIBUTED read-out:
    * unlike the global form (whose <=256-bucket table fits on the driver),
    * a per-group sketch can have millions of groups — so the cumulative
    * counts and the quantile pick run as windows PARTITIONED on the group
    * key (each window partition is one group's <=256 bucket rows) plus a
    * broadcast join against the quantile list. One combinable groupBy
    * pass over the data, no global window, no driver-side state.
    */
  def histogramQuantilesByGroup(df: DataFrame, groupCols: Seq[String],
                                valueCol: String, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(groupCols.nonEmpty, "use histogramQuantiles for the global form")
    requireQuantiles(qs)
    val reserved = Seq("bucket", "c", "q", "est", "__off", "__n")
    require(!(groupCols :+ valueCol).exists(reserved.contains),
      s"group/value columns may not use the reserved names ${reserved.mkString(", ")}")
    val bucket = histBucketExpr(valueCol)
    val counts = df.filter(expr(s"CAST($valueCol AS BIGINT) >= 0"))
      .groupBy(groupCols.map(col) :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("c"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = counts
      .withColumn("__off", sum(col("c")).over(wOrd) - col("c"))
      .withColumn("__n", sum(col("c")).over(wAll))
    val rank = floor((col("__n") - 1) * col("q"))
    val est = expr("CAST(CASE WHEN bucket div 4 <= 1 THEN bucket % 4 " +
      "ELSE shiftleft(CAST(4 + bucket % 4 AS BIGINT), CAST(bucket div 4 - 2 AS INT)) END AS BIGINT)")
    cum.join(broadcast(qs.toDF("q")),
        rank >= col("__off") && rank < col("__off") + col("c"))
      .select(groupCols.map(col) ++ Seq(col("q"), est.as("est")): _*)
  }

  /** Exact order-statistic percentiles of `valueCol` (deterministic
    * lower-index convention: value at row floor((n-1) * q) of the sorted
    * column, ties broken by `tieCol`). Returns one row per requested
    * quantile.
    *
    * Scale-safe rank computation: rows are range-partitioned on
    * (value, tie) so partitions are ordered slices of the global sort;
    * per-partition row counts (one row per partition — driver-bounded)
    * give each partition's exclusive rank offset and the global n, the
    * target global ranks floor((n-1) * q) resolve on the driver to
    * (partition, local rank), and the final pass ranks WITHIN partitions
    * only (partitioned window + broadcast target join). No stage ever
    * moves all rows to a single partition.
    */
  def exactPercentiles(df: DataFrame, valueCol: String, tieCol: String,
                       qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reserved = Seq(RangePrefix.PidCol, "__rn", "__tpid", "__lrn", "q", "value")
    require(!reserved.contains(valueCol) && !reserved.contains(tieCol),
      s"valueCol/tieCol may not use the reserved names ${reserved.mkString(", ")}")
    // out-of-range quantiles would resolve to the last partition and
    // silently vanish from the join output — reject them loudly instead
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1], got ${qs.filterNot(q => q >= 0.0 && q <= 1.0).mkString(", ")}")
    // exclusive prefix row-counts per partition (RangePrefix), then each
    // target rank maps to exactly one (partition, local rank) — all
    // driver-side arithmetic over #partitions-sized arrays
    val (sorted, offsets, n) = RangePrefix.withOffsets(
      df.select(col(valueCol), col(tieCol)),
      Seq(col(valueCol), col(tieCol)), lit(1L))
    val quantiles = qs.toDF("q")
    if (n == 0) return quantiles.join(sorted.select(col(valueCol).as("value")), lit(false))
      .select(col("q"), col("value"))
    val bounds = offsets.toSeq.sorted // (pid, exclusive start), ascending
    val targets = qs.map { q =>
      val rank = math.floor((n - 1) * q).toLong
      val (pid, off) = bounds.takeWhile(_._2 <= rank).lastOption
        .getOrElse(throw new IllegalStateException(
          s"target rank $rank outside all partition slices (n=$n)"))
      (q, pid, rank - off)
    }.toDF("q", "__tpid", "__lrn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(valueCol), col(tieCol))
    // long, not int: row_number() wraps past 2^31-1 rows per partition
    sorted.withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .join(broadcast(targets),
        col("__pid") === col("__tpid") && col("__rn") === col("__lrn"))
      .select(col("q"), col(valueCol).as("value"))
  }

  /** Exact per-group median as an order statistic — the LOWER median
    * (element at rank ceil(n/2)), so no float averaging ever happens and
    * the result is a value that actually occurs in the data (bit-exact
    * on any engine; an even-count mean of two doubles would reopen the
    * float-sum parity trap). One window per group carries both the rank
    * and the group size. Output: (group, n, median_value).
    *
    * Scale shape: group-partitioned window only — for a handful of huge
    * groups use [[exactPercentiles]]'s range-partitioned rank per group
    * instead; for everything else the per-group sort IS the correct
    * distribution of work.
    */
  /** Robust per-group outliers by median absolute deviation: flag rows
    * with |v - median| > k * MAD, both medians exact lower-median order
    * statistics ([[exactGroupMedian]]). Every float step is a single
    * IEEE operation (subtract, abs, one multiply, compare) — no sums,
    * no averages — so the flag is bit-identical across engines. The
    * robust alternative to mean/stddev z-scores, immune to the outliers
    * it hunts. Output: (group, id, v, group_median, mad) for flagged
    * rows only. Constant groups have MAD 0: any deviation flags, the
    * standard convention.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String, k: Int = 3): DataFrame = {
    val med = exactGroupMedian(df, groupCol, valueCol, tieCol)
      .select(col("group"), col("median_value").as("__med"))
    // two consumers: the MAD median and the final flag join
    val dev = df.select(col(groupCol).as("group"), col(tieCol).as("id"),
        col(valueCol).as("v"))
      .join(med, Seq("group"))
      .withColumn("__dev", abs(col("v") - col("__med")))
      .localCheckpoint(false)
    val mad = exactGroupMedian(dev, "group", "__dev", "id")
      .select(col("group"), col("median_value").as("mad"))
    dev.join(mad, Seq("group"))
      .filter(col("__dev") > lit(k.toDouble) * col("mad"))
      .select(col("group"), col("id"), col("v"),
        col("__med").as("group_median"), col("mad"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan '05) pairwise-hash rows:
    * (row index, a, b) for bucket_r(x) = ((a_r*fp(x) + b_r) mod p) mod w.
    * Fixed constants so any engine replays the sketch bit-for-bit.
    */
  private val CmsRows = Seq((0, 911382323L, 972663749L),
    (1, 636413622L, 528402381L), (2, 306674912L, 877905225L),
    (3, 700001363L, 123456791L))
  private val CmsP = 1000000007L

  private def cmsBucket(fp: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(lit(a) * fp + lit(b), lit(CmsP)), lit(width.toLong))

  /** Count-min sketch over the whitespace token stream, probed at the
    * exact top-K tokens: (token, exact_n, cms_est) with cms_est >= exact_n
    * by construction (one-sided error). The sketch is d=4 rows x `width`
    * buckets of int64 counts — bounded mergeable state, the shape that
    * replaces an unbounded exact vocabulary count when only heavy hitters
    * matter at 100 TB.
    *
    * Both the sketch and the probe derive from ONE exact (token, n)
    * aggregation (map-side combinable; bucket counts are sums of
    * per-token counts, identical to hashing the raw stream but the
    * aggregate input is vocab-sized, not corpus-sized). The deterministic
    * fingerprint hash keeps every bucket externally replayable.
    */
  def cmsTokenEstimates(df: DataFrame, textCol: String, width: Int = 1024,
                        topK: Int = 20): DataFrame = {
    require(width > 0 && topK > 0, s"width/topK must be positive, got $width/$topK")
    val counts = df
      .select(explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .withColumn("f", Converters.fingerprint64(col("t")))
      .localCheckpoint(false) // feeds both the sketch and the probe side
    val bucketed = counts.select(col("n"), explode(array(CmsRows.map {
      case (r, a, b) => struct(lit(r).as("r"), cmsBucket(col("f"), a, b, width).as("bkt"))
    }: _*)).as("rb"))
    val sketch = bucketed
      .groupBy(col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .agg(sum(col("n")).as("c"))
    // TakeOrdered top-K (never a global sort), then a broadcast-sized
    // probe relation of topK x d bucket keys joined against the sketch
    val probes = counts
      .orderBy(col("n").desc, col("t")).limit(topK)
      .select(col("t"), col("n"), explode(array(CmsRows.map {
        case (r, a, b) => struct(lit(r).as("r"), cmsBucket(col("f"), a, b, width).as("bkt"))
      }: _*)).as("rb"))
      .select(col("t"), col("n"), col("rb.r").as("r"), col("rb.bkt").as("bkt"))
    probes.join(sketch, Seq("r", "bkt"))
      .groupBy(col("t").as("token"))
      .agg(max(col("n")).as("exact_n"), min(col("c")).as("cms_est"))
      .orderBy(col("exact_n").desc, col("token"))
  }

  def exactGroupMedian(df: DataFrame, groupCol: String, valueCol: String,
                       tieCol: String): DataFrame = {
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("v"), col(tieCol))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col("group"))
    df.select(col(groupCol).as("group"), col(valueCol).as("v"), col(tieCol))
      .withColumn("__rn", row_number().over(byV).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .filter(col("__rn") === call_function("div", col("n") + 1L, lit(2L)))
      .select(col("group"), col("n"), col("v").as("median_value"))
  }

  /** Exact per-group WEIGHTED lower median: the smallest value whose
    * running weight (values ascending, ties broken by `tieCol`) reaches
    * half the group's total — 2·cumw ≥ W in integers, never a float
    * half. The workhorse behind fair-price / robust-aggregate readouts
    * where rows carry unequal mass (row-weighted quality, token-count
    * weighted doc stats). Output (group, w_total, median_value), one
    * row per group. Weights must be positive integers (required — a
    * zero weight would make the crossing row ambiguous), and
    * (`valueCol`, `tieCol`) must be UNIQUE within each group (required —
    * the running weight walks rows in that order, so duplicate sort
    * keys would make "the first crossing row" ill-defined; pass a
    * per-row id as `tieCol`, as every caller of the ordered-walk
    * operators in this library does).
    *
    * Scale shape: one key-partitioned window for the running weight +
    * one group aggregate for W — the same keyed-window shape as
    * [[exactGroupMedian]] (group domains are bounded here; for a
    * single colossal group reach for [[exactPercentiles]]'
    * RangePrefix machinery instead).
    */
  def weightedGroupMedian(df: DataFrame, groupCol: String, valueCol: String,
                          weightCol: String, tieCol: String): DataFrame = {
    // explicit ROWS frame: the default RANGE frame makes rows with equal
    // (v, tieCol) peers that SHARE a cumulative weight, so the crossing
    // filter would emit zero or duplicate rows for a group with duplicate
    // sort keys — ROWS matches the documented one-row-at-a-time crossing
    // rule (and the q306 oracle's explicit ROWS BETWEEN frame) even if a
    // caller violates the uniqueness precondition
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("v"), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col("group"))
    df.select(col(groupCol).as("group"), col(valueCol).as("v"),
        col(weightCol).cast("long").as("__w"), col(tieCol))
      .withColumn("__cw", sum(col("__w")).over(byV))
      .withColumn("w_total", sum(col("__w")).over(all))
      // the lower weighted median is the FIRST row crossing half-mass:
      // its cum reaches ceil(W/2) and the previous cum did not
      .filter(col("__cw") * 2L >= col("w_total") &&
        (col("__cw") - col("__w")) * 2L < col("w_total"))
      .select(col("group"), col("w_total"), col("v").as("median_value"))
  }

  /** Lorenz curve + Gini coefficient, integer-exact: values sort
    * ascending (ties by `tieCol`), split into `nBuckets` equal-count
    * buckets, and each row reports the bucket's share and cumulative
    * share of the total in ppm, plus the corpus Gini in ppm via the
    * rank formula G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) — the standard
    * inequality/concentration readout (revenue concentration, token
    * budget skew). Output: (bucket, n, sum_v, share_ppm, cum_share_ppm,
    * gini_ppm) ordered by bucket.
    *
    * int64 bound: Σ i·x_i < 2^63 — n · max-value · n; rescale the value
    * unit for corpora past ~1e18 rank-weighted mass.
    *
    * Scale shape: global ranks via [[RangePrefix]] (never an
    * unpartitioned data-sized window); bucket stats are one
    * aggregation; the cumulative walk runs over the BUCKETS-sized
    * relation; the Gini scalars ride one broadcast row.
    */
  def lorenzGini(df: DataFrame, valueCol: String, tieCol: String,
                 nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val (sorted, offsets, n) = RangePrefix.withOffsets(
      df.select(col(valueCol).cast("long").as("__v"), col(tieCol)),
      Seq(col("__v"), col(tieCol)), lit(1L))
    if (n == 0) return spark.emptyDataFrame
      .withColumn("bucket", lit(0L)).filter(lit(false))
      .select(col("bucket"), lit(0L).as("n"), lit(0L).as("sum_v"),
        lit(0L).as("share_ppm"), lit(0L).as("cum_share_ppm"), lit(0L).as("gini_ppm"))
    val offDf = broadcast(offsets.toSeq.toDF(RangePrefix.PidCol, "__off"))
    val wPid = org.apache.spark.sql.expressions.Window
      .partitionBy(col(RangePrefix.PidCol)).orderBy(col("__v"), col(tieCol))
    val g = sorted.join(offDf, Seq(RangePrefix.PidCol))
      .withColumn("__grank", col("__off") + row_number().over(wPid).cast("long"))
      .localCheckpoint(false) // bucket stats + gini scalars
    val scalars = broadcast(g.agg(sum(col("__v")).as("__tot"),
      sum(col("__grank") * col("__v")).as("__sixi")))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("bucket")) // buckets-sized relation
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    g.withColumn("bucket",
        call_function("div", (col("__grank") - 1L) * nBuckets, lit(n)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("sum_v"))
      .crossJoin(scalars)
      .withColumn("share_ppm",
        when(col("__tot") > 0L,
          call_function("div", col("sum_v") * 1000000L, col("__tot"))).otherwise(0L))
      .withColumn("cum_share_ppm",
        when(col("__tot") > 0L, call_function("div",
          sum(col("sum_v")).over(wCum) * 1000000L, col("__tot"))).otherwise(0L))
      .withColumn("gini_ppm",
        // two-step scaling keeps int64 headroom: divide the rank-weighted
        // numerator by n BEFORE the ppm scale (identical in the oracle)
        when(col("__tot") > 0L, call_function("div",
          call_function("div",
            lit(2L) * col("__sixi") - lit(n + 1L) * col("__tot"), lit(n)) * 1000000L,
          col("__tot"))).otherwise(0L))
      .select(col("bucket"), col("n"), col("sum_v"), col("share_ppm"),
        col("cum_share_ppm"), col("gini_ppm"))
  }

  /** Quantile normalization across groups (the batch-effect correction
    * of Bolstad et al. 2003, discretized): each row's value is replaced
    * by the GLOBAL order statistic at its within-group quantile
    * position, so every group ends up with (a subsample of) the same
    * distribution — the cross-source score-calibration step a curation
    * pipeline runs before pooling per-source quality scores. The
    * position map is pure integer: within-group rank r of n_g rows maps
    * to global rank 1 + ((r−1)(N−1)) div (n_g−1); a singleton group
    * maps to the global LOWER median. Ties order by `tieCol`, so the
    * result is bit-replayable. Output: (tie, group, v, qnorm).
    *
    * Scale shape: the global rank comes from [[RangePrefix]] (range
    * partition + per-partition offsets), NEVER an unpartitioned window;
    * the within-group rank is a group-partitioned window; the lookup is
    * one equi-join on the target rank. Three shuffles total, all keyed.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        tieCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reserved = Seq(RangePrefix.PidCol, "__off", "__grank", "__rk", "__ns", "__tp")
    require(!reserved.contains(valueCol) && !reserved.contains(tieCol) &&
      !reserved.contains(groupCol),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    // the select renames groupCol->group and valueCol->v, and qnorm is
    // introduced: self-mappings are fine, CROSS-collisions would silently
    // shadow (a tieCol literally named "v" would alias the value column)
    require(tieCol != "group" && tieCol != "v" && tieCol != "qnorm" &&
      valueCol != "group" && valueCol != "qnorm" &&
      groupCol != "v" && groupCol != "qnorm",
      "tieCol/valueCol/groupCol may not collide with the output names group/v/qnorm")
    val (sorted, offsets, n) = RangePrefix.withOffsets(
      df.select(col(groupCol).as("group"), col(valueCol).as("v"), col(tieCol)),
      // sort by the POST-select name (lorenzGini's convention): the
      // pre-rename valueCol only resolved through Spark's missing-
      // reference fallback into the projection's child
      Seq(col("v"), col(tieCol)), lit(1L))
    if (n == 0)
      return sorted.select(col(tieCol), col("group"), col("v"), col("v").as("qnorm"))
        .filter(lit(false))
    val offDf = broadcast(offsets.toSeq.toDF(RangePrefix.PidCol, "__off"))
    val wPid = org.apache.spark.sql.expressions.Window
      .partitionBy(col(RangePrefix.PidCol)).orderBy(col("v"), col(tieCol))
    val g = sorted.join(offDf, Seq(RangePrefix.PidCol))
      .withColumn("__grank", col("__off") + row_number().over(wPid).cast("long"))
      .localCheckpoint(false) // consumed by the rank relation and the lookup
    val wGrp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("v"), col(tieCol))
    val wAllGrp = org.apache.spark.sql.expressions.Window.partitionBy(col("group"))
    val ranked = g
      .withColumn("__rk", row_number().over(wGrp).cast("long"))
      .withColumn("__ns", count(lit(1)).over(wAllGrp))
      .withColumn("__tp", when(col("__ns") > 1L,
          lit(1L) + call_function("div",
            (col("__rk") - 1L) * lit(n - 1L), col("__ns") - 1L))
        .otherwise(lit((n + 1L) / 2L)))
    val lookup = g.select(col("__grank").as("__tp"), col("v").as("qnorm"))
    ranked.join(lookup, Seq("__tp"))
      .select(col(tieCol), col("group"), col("v"), col("qnorm"))
  }

  /** V-optimal histogram (Jagadish et al. 1998, "Optimal histograms with
    * quality guarantees"): partition a sorted value domain into
    * `buckets` contiguous buckets minimizing the total within-bucket
    * SSE of the FREQUENCY vector — the histogram an optimizer's
    * selectivity estimator wants, vs equi-width/equi-depth's arbitrary
    * cuts. Exact integer objective: sse_e3(l, r) = Σf²·1000 −
    * ⌊(Σf)²·1000/(r−l+1)⌋ from two prefix-sum arrays; the O(B·m²) DP
    * breaks cost ties on the smallest split index, so the bucketing is
    * engine-replayable (the oracle unrolls the same layers).
    * Output per bucket: (bucket, band_lo, band_hi, n_bands, n_rows,
    * sse_e3).
    *
    * Scale shape: the corpus-sized work is ONE band-keyed count; the
    * m-point frequency vector is driver-bounded metadata (the domain is
    * RESOLUTION-bounded by contract — m ≤ 4096 enforced, the
    * RangePrefix tradition) and the DP runs exactly there.
    */
  def vOptimalHistogram(df: DataFrame, bandCol: String,
                        buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 16, s"need 2..16 buckets, got $buckets")
    val spark = df.sparkSession
    val hist = df.groupBy(col(bandCol).as("__band")).agg(count(lit(1)).as("__f"))
      .orderBy(col("__band"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = hist.length
    require(m <= 4096, s"band domain must be resolution-bounded, got $m")
    require(m >= buckets, s"need at least $buckets distinct bands, got $m")
    val sf = new Array[Long](m + 1)
    val ss = new Array[Long](m + 1)
    for (i <- 1 to m) {
      sf(i) = sf(i - 1) + hist(i - 1)._2
      ss(i) = ss(i - 1) + hist(i - 1)._2 * hist(i - 1)._2
    }
    def sse(l: Int, r: Int): Long = {
      val s = sf(r) - sf(l - 1)
      (ss(r) - ss(l - 1)) * 1000L - Math.floorDiv(s * s * 1000L, r - l + 1L)
    }
    val dp = Array.fill(buckets + 1, m + 1)(Long.MaxValue / 4)
    val arg = Array.fill(buckets + 1, m + 1)(0)
    for (i <- 1 to m) dp(1)(i) = sse(1, i)
    for (b <- 2 to buckets; i <- b to m) {
      var bestC = Long.MaxValue
      var bestJ = -1
      for (j <- b - 1 to i - 1) {
        val c = dp(b - 1)(j) + sse(j + 1, i)
        if (c < bestC) { bestC = c; bestJ = j } // strict < keeps smallest j
      }
      dp(b)(i) = bestC
      arg(b)(i) = bestJ
    }
    var bounds = List(m)
    for (b <- buckets to 2 by -1) bounds = arg(b)(bounds.head) :: bounds
    val starts = 1 :: bounds.dropRight(1).map(_ + 1)
    import spark.implicits._
    starts.zip(bounds).zipWithIndex.map { case ((l, r), k) =>
      (k + 1L, hist(l - 1)._1, hist(r - 1)._1, r - l + 1L,
        sf(r) - sf(l - 1), sse(l, r))
    }.toDF("bucket", "band_lo", "band_hi", "n_bands", "n_rows", "sse_e3")
      .orderBy(col("bucket"))
  }

  /** Weighted isotonic regression over a BINNED calibration table —
    * the monotone-recalibration step (Platt's rival; Zadrozny & Elkan
    * 2002) that turns a raw score→rate curve into the best monotone
    * non-decreasing fit under squared loss. Uses the MINIMAX
    * characterization of the PAVA solution (Robertson, Wright & Dykstra
    * 1988): fit_i = max_{j≤i} min_{k≥i} avg(j..k), where avg(j..k) is
    * the pooled rate Σpos/Σn over the bin interval — which makes the
    * fit a pure join-window computation both engines replay
    * identically (interval averages are int64 sums divided once in
    * IEEE double; min/max/compare of identical doubles can't drift).
    * Input one row per score bin: (binCol ascending = score order,
    * nCol rows, posCol positives). Output (bin, n, n_pos, fit_ppm)
    * with fit_ppm = floor(fit·10⁶) — monotone non-decreasing in bin.
    *
    * Scale shape: the DATA-sized pass is whatever aggregation built
    * the bins; this operator touches only the bins-sized relation —
    * its B² interval self-join and the two running-extreme windows are
    * bounded by the score-bin domain (≤ a few hundred), the
    * [[lorenzGini]] "cumulative walk over the buckets" contract.
    */
  def isotonicFit(bins: DataFrame, binCol: String, nCol: String,
                  posCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val cum = W.partitionBy(lit(0)).orderBy(col("bin"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val b = bins.select(col(binCol).as("bin"), col(nCol).cast("long").as("n"),
        col(posCol).cast("long").as("n_pos"))
      .withColumn("__cn", sum(col("n")).over(cum))
      .withColumn("__cp", sum(col("n_pos")).over(cum))
    // interval averages A(j,k) = pooled rate over bins j..k (j ≤ k)
    val iv = b.as("j").join(b.as("k"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("__j"), col("k.bin").as("__k"),
        ((col("k.__cp") - col("j.__cp") + col("j.n_pos")).cast("double") /
          (col("k.__cn") - col("j.__cn") + col("j.n")).cast("double"))
          .as("__a"))
    // m(j, i) = min over k ≥ i of A(j, k): running min over k descending
    val mW = W.partitionBy(col("__j")).orderBy(col("__k").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val m = iv.withColumn("__m", min(col("__a")).over(mW))
      .select(col("__j"), col("__k").as("__i"), col("__m"))
    // fit_i = max over j ≤ i of m(j, i): running max over j, keep j = i
    val fW = W.partitionBy(col("__i")).orderBy(col("__j"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val fit = m.withColumn("__f", max(col("__m")).over(fW))
      .filter(col("__j") === col("__i"))
      .select(col("__i").as("bin"), floor(col("__f") * 1000000d)
        .cast("long").as("fit_ppm"))
    b.select(col("bin"), col("n"), col("n_pos")).join(fit, Seq("bin"))
  }
}
