package graft.operators

import graft.functions.Converters
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling / data-mixing operators for training-corpus
  * assembly. `sample()`-style RNG sampling is irreproducible across runs,
  * partitionings, and engines; these derive the keep decision from a
  * content-independent hash of the row id, so a sample is stable under
  * re-partitioning, retries, and re-runs — and exactly replayable by an
  * external SQL engine (the same rolling fingerprint as q29's oracle).
  */
object SamplingOps {
  /** Stable per-id bucket in [0, 100): rolling fingerprint of the id's
    * decimal string, mod 100. Pure column arithmetic — codegen'd, no RNG,
    * no shuffle.
    */
  def deterministicBucket(id: Column): Column =
    pmod(Converters.fingerprint64(id.cast(StringType)), lit(100L))

  /** Keep ~pct% of rows, deterministically by id. */
  def sampleByPct(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(deterministicBucket(col(idCol)) < pct)

  /** Stratified mixing: per-stratum keep percentages (domain mixing for
    * training data — e.g. downsample boilerplate-heavy domains). Strata
    * absent from the map keep `defaultPct`. One codegen'd CASE chain; no
    * shuffle, no per-stratum pass.
    */
  def sampleByStrata(df: DataFrame, idCol: String, strataCol: String,
                     pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val threshold = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(deterministicBucket(col(idCol)) < threshold)
  }

  /** Deterministic train/validation split tag: same id -> same split,
    * forever, on any cluster.
    */
  def splitTag(id: Column, trainPct: Int): Column =
    when(deterministicBucket(id) < trainPct, "train").otherwise("holdout")

  /** Concat-then-chunk sequence packing: documents are laid out
    * back-to-back in `orderCol` order and cut into fixed `seqLen`-token
    * training sequences (documents straddle boundaries, as LLM pre-training
    * packing does). Each document maps to its span: global start offset,
    * first/last sequence index, and offset within the first sequence.
    *
    * The global prefix sum is TWO-PASS, never a single unpartitioned
    * window (which moves every row to one partition — an OOM at scale):
    * rows are range-partitioned by the order key, each partition computes
    * its local running sum under a PARTITIONED window, and the
    * per-partition token totals (one row per partition — driver-bounded)
    * become broadcast exclusive-prefix offsets added to the local sums.
    * The partitioned frame is locally checkpointed so the offset table and
    * the output job see the SAME partition assignment; blocks are freed by
    * the context cleaner when the result is released.
    *
    * PRECONDITIONS: `orderCol` is a UNIQUE key (a doc id) — duplicate
    * order values make the running-sum tie order partition-dependent,
    * voiding the determinism contract. Rows with `tokenCol` <= 0 are
    * excluded BEFORE any summing, so a corrupt negative token count
    * cannot silently shift the span of every later document.
    */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val reserved = Seq("n_tokens", "global_start", "__pack_end", "__pid")
    require(!reserved.contains(orderCol) && !reserved.contains(tokenCol),
      s"orderCol/tokenCol may not use the reserved output names ${reserved.mkString(", ")}")
    // pass 1 (RangePrefix): per-partition totals -> driver (#partitions
    // rows) -> exclusive prefix offsets, shipped back as a map literal
    val (sorted, offsets, _) = RangePrefix.withOffsets(
      df.select(col(orderCol), col(tokenCol).cast(LongType).as("n_tokens"))
        .filter(col("n_tokens") > 0),
      Seq(col(orderCol)), col("n_tokens"))
    val offset =
      if (offsets.isEmpty) lit(0L) else element_at(typedlit(offsets), col("__pid"))
    // pass 2: local running sum under a PARTITIONED window + the offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val end = sum(col("n_tokens")).over(w) + offset
    sorted.select(col(orderCol), col("n_tokens"),
        (end - col("n_tokens")).cast(LongType).as("global_start"),
        end.cast(LongType).as("__pack_end"))
      // integer `div`, never double `/`: float division loses exactness
      // past 2^53 total tokens — well inside 100 TB territory
      .select(col(orderCol), col("n_tokens"), col("global_start"),
        expr(s"global_start div ${seqLen}L").as("start_seq"),
        pmod(col("global_start"), lit(seqLen.toLong)).as("start_off"),
        expr(s"(__pack_end - 1) div ${seqLen}L").as("end_seq"))
  }

  /** Materialize the packing layout from [[packSequences]] as one row per
    * (training sequence, contributing document) — the assignment a data
    * loader actually consumes. A doc contributes to every sequence in its
    * [start_seq, end_seq] span, so this is a row-local explode (no
    * shuffle); boundary-straddling docs appear once per touched sequence.
    */
  def sequenceAssignments(packed: DataFrame, orderCol: String): DataFrame =
    packed.select(col(orderCol),
      explode(sequence(col("start_seq"), col("end_seq"))).as("seq_id"))

  /** Overlapping fixed-size token chunks (chunkSize tokens, window
    * advancing by stride): context-window preparation for documents longer
    * than a model's sequence length. Pure per-row column work — one
    * codegen'd projection plus a Generate, no shuffle and no state, so at
    * 100 TB this is a map-only stage that scales with input splits.
    * Output: (id, chunk_id, chunk_text, n_tokens); the last chunk of a
    * document may be shorter than chunkSize.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val nToks = size(col("__toks"))
    // last start: the smallest stride multiple whose chunk reaches the end
    // of the document — emitting starts past it would produce degenerate
    // tail chunks fully contained in the previous window (when
    // stride < chunkSize). ceil((nToks - chunkSize) / stride) in integer
    // arithmetic; 0 when the whole document fits in one chunk.
    val maxStart = (call_function("div",
      greatest(nToks - chunkSize, lit(0)) + lit(stride - 1), lit(stride))
      * stride).cast(IntegerType)
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      // chunk starts: stride multiples up to maxStart; the chunk index is
      // start/stride, so no positional explode is needed (and the SQL
      // replay is the identical expression)
      .select(col("id"), col("__toks"),
        explode(sequence(lit(0), maxStart, lit(stride))).as("__start"))
      .select(col("id"),
        (col("__start") / stride).cast(LongType).as("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("__start")).cast(LongType).as("n_tokens"))
  }

  /** Keep the best rows of each group until a per-group token budget is
    * reached: ORDER each group by `orderCol` (descending, ties on
    * `tieCol`) and admit rows while the running token total stays within
    * `budget` — the data-mixing step that fills a per-language /
    * per-domain quota from the top of the quality ranking.
    *
    * One window partitioned ON THE GROUP — work distributes across groups
    * and no global sort or single partition appears at any scale.
    * Admission is row-at-a-time (ROWS frame, not the default RANGE frame):
    * rows tied on (orderCol, tieCol) accumulate one by one instead of all
    * receiving the combined sum and being rejected together — so the
    * result is deterministic when (orderCol, tieCol) is unique and
    * fills the budget maximally even when it is not.
    */
  def sampleToTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
                          tieCol: String, tokenCol: String, budget: Long): DataFrame = {
    require(!df.columns.contains("cum_tokens"),
      "sampleToTokenBudget: input must not contain reserved column cum_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol).desc, col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Length-bucketed batch assignment — the padding-efficiency prep for
    * batched inference/training: rows are bucketed by token count
    * (`bucketEdges` = inclusive upper bounds, rows above the last edge
    * form the overflow bucket), then numbered into fixed-size batches
    * within each bucket in (length, id) order, so one batch holds
    * similar-length documents and padding waste stays bounded by the
    * bucket width. One window PARTITIONED on the bucket — no global sort;
    * work distributes across buckets at any scale.
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String, tokenCol: String,
                            bucketEdges: Seq[Long], batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(bucketEdges.nonEmpty && bucketEdges == bucketEdges.sorted,
      s"bucketEdges must be non-empty and ascending, got $bucketEdges")
    Seq("bucket", "__rn", "batch_id", "batch_seq").foreach(c =>
      require(!df.columns.contains(c),
        s"lengthBucketedBatches: input must not contain reserved column $c"))
    val bucket = bucketEdges.zipWithIndex.reverse
      .foldLeft(lit(bucketEdges.size).cast(LongType)) { case (acc, (edge, i)) =>
        when(col(tokenCol) <= edge, lit(i.toLong)).otherwise(acc)
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(tokenCol), col(idCol))
    df.select(col(idCol), col(tokenCol), bucket.as("bucket"))
      .withColumn("__rn", row_number().over(w) - 1)
      .select(col(idCol), col(tokenCol), col("bucket"),
        call_function("div", col("__rn").cast(LongType), lit(batchSize.toLong)).as("batch_id"),
        (col("__rn") % batchSize).cast(LongType).as("batch_seq"))
  }

  /** Temperature-style upsampling for low-resource groups: each row is
    * repeated ceil(maxGroupCount / groupCount) times, capped at `cap` —
    * the integer-exact stand-in for count^alpha mixing weights (a float
    * pow would break cross-engine replay). Output rows carry
    * (repeat_factor, epoch) with epoch in [1, repeat_factor]: the
    * materialized multi-epoch view a data loader consumes.
    *
    * Scale shape: the per-group counts and their max are group-cardinality
    * sized (languages/domains — tiny), so both broadcast; the expansion
    * itself is a map-side Generate. One aggregation pass over the corpus,
    * no skewed shuffle.
    */
  def temperatureRepeats(df: DataFrame, idCol: String, groupCol: String,
                         cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    Seq("__grp", "__n", "__maxn").foreach(c => require(!df.columns.contains(c),
      s"temperatureRepeats: input must not contain reserved column $c"))
    val counts = df.groupBy(col(groupCol).as("__grp")).agg(count(lit(1)).as("__n"))
    val maxN = counts.agg(max(col("__n")).as("__maxn"))
    val factor = least(lit(cap.toLong),
      call_function("div", col("__maxn") + col("__n") - 1, col("__n")))
    // null-safe group match: a NULL group (unidentified language/domain)
    // is a real group — an equi-join would silently drop its rows
    df.join(broadcast(counts), col(groupCol) <=> col("__grp"))
      .crossJoin(broadcast(maxN))
      .select(col(idCol), col(groupCol), factor.as("repeat_factor"))
      .select(col(idCol), col(groupCol), col("repeat_factor"),
        explode(sequence(lit(1L), col("repeat_factor"))).as("epoch"))
  }

  /** Temperature-scaled source mixing DISTRIBUTION (the mT5/XLM-R
    * alpha-sampling rule p_s proportional to n_s^alpha at alpha = 1/2),
    * as exact integer permille that sum to EXACTLY 1000 via
    * largest-remainder (Hamilton) apportionment — the contract a
    * downstream weighted sampler needs (permille that sum to 999 skew
    * every epoch). Complements [[temperatureRepeats]]: that op
    * materializes up-sampling repeats, this one emits the sampling
    * distribution itself.
    *
    * Exactness: n_s^0.5 = floor(sqrt(n_s)) where sqrt is a SINGLE
    * correctly-rounded IEEE op — bit-identical in any engine (the repo's
    * single-op float rule), and everything after is int64 arithmetic.
    * Scale shape: one map-side-combinable aggregation collapses the
    * corpus to the source-cardinality relation; the normalization
    * windows run over that tiny relation only.
    *
    * Output: (group, n_tokens, weight_raw, permille) ordered by group.
    */
  def mixingWeights(df: DataFrame, groupCol: String, tokenCol: Column): DataFrame = {
    val totals = df.groupBy(col(groupCol).as("group"))
      .agg(sum(tokenCol.cast(LongType)).as("n_tokens"))
      .withColumn("weight_raw", floor(sqrt(col("n_tokens").cast(DoubleType))).cast(LongType))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)) // source-cardinality relation: single-group is the POINT
    // guard the degenerate all-empty corpus (total weight 0): every
    // permille is a defined 0 instead of an ANSI divide-by-zero
    val wRank = wAll.orderBy(
      when(col("__tot") > 0, pmod(col("weight_raw") * 1000, col("__tot")))
        .otherwise(lit(0L)).desc, col("group"))
    totals
      .withColumn("__tot", sum(col("weight_raw")).over(wAll))
      .withColumn("__base", when(col("__tot") > 0,
        call_function("div", col("weight_raw") * 1000, col("__tot"))).otherwise(lit(0L)))
      .withColumn("__short", lit(1000L) - sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(wRank))
      .select(col("group"), col("n_tokens"), col("weight_raw"),
        when(col("__tot") > 0,
          col("__base") + when(col("__rk") <= col("__short"), 1L).otherwise(0L))
          .otherwise(lit(0L)).as("permille"))
      .orderBy(col("group"))
  }

  /** The shared portable id hash: the universal-hash finalizer over the
    * rolling fingerprint, bit-replayable by an external SQL engine.
    * ONE definition (round-13 review: stridedInterleave and
    * shardAssignments carried verbatim copies that had to stay
    * bit-identical for the cross-engine replay contract).
    */
  private def portableHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(lit(636413622L) * Converters.fingerprint64(id.cast(StringType))
      + lit(528402381L), lit(1000000007L))

  /** Deterministic curriculum interleave (stride scheduling over the
    * source-mixing distribution): each group's rows are ranked by the
    * portable hash of their id (a reproducible shuffle), and row r of a
    * group with weight w permille gets the integer virtual time
    *   ikey = ((2r - 1) * 500000) div w
    * — the classic stride-scheduler pass interval (Waldspurger &
    * Weihl 1995), so reading the corpus in (ikey, group, rnk) order
    * interleaves sources proportionally to their weights at every
    * prefix, not just in aggregate. Weight-0 groups — and groups absent
    * from `weights` entirely — are excluded (their quota is zero).
    * Output: input columns + (group, rnk, ikey).
    *
    * Scale shape: one group-partitioned window for the rank (group
    * cardinality = sources, so partitions are fat but AQE-splittable;
    * at 100 TB swap the window for [[graft.operators.RangePrefix]]'s
    * two-pass rank on (group, hash)), then pure row-local integer math.
    * The total order is only MATERIALIZED by whoever consumes it — a
    * top-k head is a TakeOrdered; a full training-order export is a
    * range-partitioned write on ikey, never a single global sort
    * partition.
    */
  def stridedInterleave(df: DataFrame, idCol: String, groupCol: String,
                        weights: DataFrame): DataFrame = {
    Seq("__h", "group", "rnk", "ikey").foreach(c => require(!df.columns.contains(c),
      s"stridedInterleave: input must not contain reserved column $c"))
    val h = portableHash(col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("__h"), col(idCol))
    df.withColumn("group", col(groupCol))
      .join(weights.select(col("group"), col("permille")), Seq("group"))
      .filter(col("permille") > 0L)
      .withColumn("__h", h)
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .withColumn("ikey",
        call_function("div", (lit(2L) * col("rnk") - 1L) * 500000L, col("permille")))
      .drop("__h", "permille")
  }

  /** Deterministic training-shard layout: every row is assigned
    * shard = h(id) mod S and a stable position within its shard by
    * ascending hash — the "global shuffle then shard" step every
    * training-data export ends with, made reproducible (re-running the
    * export, or running it on another engine, yields byte-identical
    * shard files) and append-free of any global sort: one hash shuffle
    * on the shard key, per-shard local sort via a partitioned window.
    * The hash is [[portableHash]] (replayable externally); hash ties
    * break by id, so the order is total. Output: input columns +
    * (shard, pos).
    */
  def shardAssignments(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    Seq("__h", "shard", "pos").foreach(c => require(!df.columns.contains(c),
      s"shardAssignments: input must not contain reserved column $c"))
    val h = portableHash(col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)).cast(IntegerType))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("__h")
  }

  /** Systematic probability-proportional-to-size sampling (Madow 1949)
    * — the deterministic weighted sampler survey statisticians use when
    * a hash coin is not enough: lay the items out on the cumulative-
    * weight line in `ordCol` order and take `k` evenly spaced grid
    * points g_j = ⌊(2j+1)·W/(2k)⌋ (centered). An item is drawn once per
    * grid point inside its interval [cum−w, cum) — so items heavier
    * than W/k are drawn MULTIPLE times (the PPS contract) and every
    * draw count is exact: copies = f(cum) − f(cum−w) with
    * f(x) = clamp(⌈(2kx−W)/(2W)⌉, 0, k), no per-grid-point explode.
    * Output: drawn items only, (id, w, cum, copies); Σcopies = k by
    * construction.
    *
    * Scale shape: ONE exclusive prefix sum via [[RangePrefix]] (range
    * partitions + driver-bounded offsets — never a global window), then
    * the closed-form count is map-side arithmetic. The clamp also makes
    * truncating vs floor division immaterial (negative numerators only
    * arise where the clamp pins 0), so both engines agree.
    */
  def systematicPps(df: DataFrame, idCol: String, weightCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // non-positive weights drop BEFORE the prefix sums (round-13 review:
    // a corrupt negative weight made the cumulative line non-monotonic,
    // silently shifting every later item's interval and breaking the
    // sum(copies)==k contract; zero weights never drew anyway — same
    // discipline as packSequences' n_tokens > 0 filter)
    val base = df.select(col(idCol).as("id"),
      col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0L)
    val (parted, offsets, total) = graft.operators.RangePrefix.withOffsets(
      base, Seq(col("id")), col("w"))
    require(total > 0L, "systematicPps needs positive total weight")
    val off = offsets.map { case (pid, o) => (pid.toLong, o) }
    val offCol = off.foldLeft(lit(0L)) { case (acc, (pid, o)) =>
      when(col(graft.operators.RangePrefix.PidCol) === pid, lit(o)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(graft.operators.RangePrefix.PidCol)).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = parted.withColumn("cum", sum(col("w")).over(w) + offCol)
    def f(x: Column): Column =
      least(lit(k.toLong), greatest(lit(0L), call_function("div",
        lit(2L * k) * x - lit(total) + lit(2L) * lit(total) - 1L,
        lit(2L) * lit(total))))
    cum.withColumn("copies", f(col("cum")) - f(col("cum") - col("w")))
      .filter(col("copies") >= 1L)
      .select(col("id"), col("w"), col("cum"), col("copies"))
      .orderBy(col("id"))
  }

  /** Deterministic round-robin interleave schedule across groups — the
    * curriculum/data-ordering step after mixing weights are chosen: rank
    * docs within each group by `rankOrder`, then emit the global
    * position that cycles group-by-group (round 1 takes every group's
    * rank-1 doc in group-name order, round 2 the rank-2 docs of groups
    * that still have one, ...), so no source ever streams twice in a
    * row and exhausted groups drop out of later rounds. Exact closed
    * form — position(g, r) = Σ_{g'} min(n_{g'}, r−1)  +
    * |{g' < g : n_{g'} ≥ r}| + 1 — so the schedule is a permutation of
    * 1..N both engines agree on.
    *
    * Scale shape: ONE group-partitioned rank window; the per-group
    * counts (groups are enum-sized — ≤ 256 enforced) collect as
    * driver-bounded metadata in the RangePrefix tradition and unfold
    * into a 2·|groups|-term codegen expression, so positions are
    * MAP-SIDE — no self-join, no rounds relation, no corpus-times-
    * groups expansion. Output: (position, id, group, round).
    */
  def interleaveSchedule(df: DataFrame, groupCol: String, idCol: String,
                         rankOrder: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__r"),
      "interleaveSchedule: input must not contain reserved column __r")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(rankOrder: _*)
    // rank BEFORE projecting: rankOrder may reference columns beyond
    // (id, group); Catalyst prunes the rest below the window anyway
    val ranked = df
      .withColumn("__r", row_number().over(w).cast("long"))
      .select(col(idCol), col(groupCol), col("__r"))
    val counts = ranked.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map { r =>
        // loud on NULL group keys (round-13 review: .toString NPE'd on the
        // driver) — the schedule's group-name ordering and the string
        // comparisons below have no defined place for a null group
        require(!r.isNullAt(0),
          s"interleaveSchedule: NULL $groupCol group — filter or bucket null " +
            "keys before scheduling (group names order the rounds)")
        (r.get(0).toString, r.getLong(1))
      }.sortBy(_._1)
    require(counts.length <= 256,
      s"interleaveSchedule: groups are enum-sized by contract, got ${counts.length}")
    val offset = counts.map { case (_, n) =>
      least(lit(n), col("__r") - 1L)
    }.reduce(_ + _)
    val within = counts.map { case (g, n) =>
      when(lit(g) < col(groupCol) && col("__r") <= lit(n), 1L).otherwise(0L)
    }.reduce(_ + _)
    ranked.select((offset + within + 1L).as("position"), col(idCol),
        col(groupCol), col("__r").as("round"))
      .orderBy(col("position"))
  }
}
