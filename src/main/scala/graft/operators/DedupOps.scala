package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash. All are expressed as
  * joins/aggregations over an inverted shingle index — never a driver-side
  * pairwise loop — so they scale with shuffle partitions at 100 TB.
  *
  * Barrier trade-off: several pipelines use lazy `localCheckpoint()` to
  * stop an expensive subtree executing once per consumer. Local checkpoint
  * blocks are executor-local and NOT replicated — after one materializes,
  * losing an executor fails the job instead of recomputing the lineage.
  * That is the right default for bounded batch runs (recompute would cost
  * more than a retry); for long multi-hour 100 TB runs on preemptible
  * nodes, swap the `localCheckpoint(false)` barriers for reliable
  * `checkpoint()` (HDFS-backed) or `persist(MEMORY_AND_DISK_2)` — same
  * plan shape, replicated blocks.
  */
object DedupOps {
  /** Word n-gram shingle array over a pre-materialized token array. The
    * token array must be a bound column, not an expression — an expression
    * would be re-evaluated per lambda element (n per shingle).
    */
  def shingleArrayFromTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingle array of a text column (space tokenized).
    * Convenience form; prefer [[shingles]] for bulk work.
    */
  def shingleArray(text: Column, n: Int): Column =
    shingleArrayFromTokens(split(text, " "), n)

  /** HASHED word n-gram shingle array: xxhash64 seed-chained over the n
    * token strings directly, skipping the `concat_ws` shingle-string
    * construction (the allocation-heavy step of the exact pipeline).
    * Token boundaries stay significant because each token re-seeds the
    * chain with the accumulated hash — ("ab","c") and ("a","bc") diverge.
    */
  def hashedShingleArrayFromTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        xxhash64((0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** [[hashedShingleArrayFromTokens]] over the TEXT column directly, as
    * one codegen'd pass ([[graft.functions.HashedShingles]]) — bit-equal
    * output, ~5x cheaper: the declarative form is a higher-order function
    * (interpreted) whose lambda re-evaluates the embedded `split` per
    * `element_at`, n splits per shingle. This is THE hot loop of the
    * dedup family; every space-tokenized call site uses this form, the
    * token-array form above survives for custom tokenizations.
    */
  def hashedShingleArrayFromText(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.HashedShingles(
      org.apache.spark.sql.GraftBridge.expression(text), n))

  /** `array_distinct(hashedShingleArrayFromText(...))` fused into the
    * same codegen'd pass (r16) — bit-equal output (first occurrence,
    * encounter order; DedupTextSpec pins it), one row-local hash table
    * instead of materializing the duplicate-bearing array and re-walking
    * it through ArrayDistinct. This is the per-document set relation the
    * whole jaccard family (q21/q73/q105/q116/q309 machinery) builds.
    */
  def distinctHashedShingleArrayFromText(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.HashedShingles(
      org.apache.spark.sql.GraftBridge.expression(text), n, distinct = true))

  /** [[shingleArray]] as one codegen'd pass ([[graft.functions.StringShingles]])
    * — bit-equal output for space-tokenized text. Use where the shingle
    * TEXT matters downstream (KMV/oracle hashing, jaccard verify sets);
    * prefer [[hashedShingleArrayFromText]] when only equality matters.
    */
  def stringShingleArrayFromText(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.StringShingles(
      org.apache.spark.sql.GraftBridge.expression(text), n))

  /** Exploded distinct (id, shingle) pairs — the inverted-index relation.
    * Repartitions on the id first: small document corpora arrive as one
    * parquet split, and the explode is the CPU-heavy stage — it must fan
    * out across executors. The id partitioning is then reused for free by
    * downstream groupBy(id) aggregations (minhash signatures, counts).
    * Per-document dedup happens with array_distinct BEFORE the explode —
    * a row-local operation — so no (id, shingle) distinct shuffle of the
    * exploded index is ever needed. PRECONDITION: `idCol` is unique (one
    * row per document, as for every operator in this library); duplicate
    * id rows would double-count shingles and inflate jaccard scores —
    * collapse them with [[exactDuplicates]]/dropDuplicates first.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        explode(org.apache.spark.sql.GraftBridge.column(graft.functions.StringShingles(
          org.apache.spark.sql.GraftBridge.expression(col(textCol)), n, distinct = true)))
          .as("shingle"))

  /** Exact duplicate groups by content hash: (keep_id, n_dups). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** All-pairs n-gram Jaccard >= tau via inverted-index self-join,
    * candidate-then-verify. Output: (ia, ib, jaccard) with ia < ib.
    * Candidates come from the index with shingles above `dfCap` document
    * frequency removed (a hot shingle in m docs otherwise creates m^2 join
    * rows — the scale killer); verification computes the exact jaccard
    * over the full sets. See the cap soundness note inside.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double, dfCap: Int = 64): DataFrame =
    jaccardPairsReleasable(df, idCol, textCol, n, tau, dfCap).df

  /** A pair result whose backing persisted index can be released once the
    * caller has materialized `df` — the deterministic unpersist lifecycle
    * for long-lived sessions processing many corpora (otherwise cached
    * shingle indexes accumulate until executor storage fills).
    */
  final case class Releasable(df: DataFrame, release: () => Unit)

  def jaccardPairsReleasable(df: DataFrame, idCol: String, textCol: String,
                             n: Int, tau: Double, dfCap: Int = 64): Releasable = {
    // the shingle index feeds four consumers (counts, candidate generation,
    // both verify sides): persist so Spark doesn't recompute the explode
    // per branch (measured faster than localCheckpoint). CacheManager
    // dedupes identical plans, so repeated calls on the same input reuse
    // one entry; call release() when done with the result.
    val sh = shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    // Candidate generation drops shingles whose document frequency exceeds
    // dfCap: one shingle shared by m docs creates m^2 join rows, so one
    // hot template phrase turns the self-join quadratic. A >= tau pair can
    // only be missed if EVERY shingle it shares is hotter than dfCap —
    // at 3-gram granularity that means pure boilerplate, and at tau = 0.6
    // most of both documents would have to be that boilerplate. For pairs
    // that do surface, the hot-shingle intersection contribution is added
    // back from a second (bounded) pass, so the reported jaccard is exact.
    // Only the HOT side of the document-frequency split is ever
    // materialized as a set: its size is bounded by
    // total-shingle-instances / dfCap (each hot shingle needs > dfCap
    // occurrences), so it is orders of magnitude smaller than the index
    // and broadcastable far past the point where the index itself is not.
    // The split is then two broadcast anti/semi joins — the full index is
    // never shuffled on the shingle key just to be partitioned into
    // rare/hot. (If the hot set ever outgrows the broadcast threshold,
    // drop the hint and AQE picks the join side from runtime sizes.)
    val hotShingles = broadcast(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap).select(col("shingle")))
    // rare is consumed by both self-join sides, but it reads the CACHED
    // index through a broadcast anti-join — measured cheaper to recompute
    // (6.1s) than to checkpoint and re-read (6.4s at sf0.1)
    val rare = sh.join(hotShingles, Seq("shingle"), "left_anti")
    val hot = sh.join(hotShingles, Seq("shingle"), "left_semi")
    // one-pass partial intersection over the capped index (identical to the
    // uncapped plan when no shingle is hot)
    // lazy checkpoint: interRare feeds both the final intersection sum and
    // the hot-pass candidate list — without a barrier the rare self-join
    // (the expensive stage) executes once per consumer. The result is
    // candidate-pair-sized, orders of magnitude smaller than the index.
    val interRare = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ia"), col("b.id").as("ib"))
      .agg(count(lit(1)).as("inter_r"))
      .localCheckpoint(false)
    // hot contribution only for pairs already candidates: bounded by
    // |candidates| x hot-shingles-per-doc, never by hot df^2
    val interHot = interRare.select(col("ia"), col("ib"))
      .join(hot.as("ha"), col("ia") === col("ha.id"))
      .join(hot.as("hb"), col("ib") === col("hb.id") && col("ha.shingle") === col("hb.shingle"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter_h"))
    val inter = interRare.join(interHot, Seq("ia", "ib"), "left")
      .select(col("ia"), col("ib"),
        (col("inter_r") + coalesce(col("inter_h"), lit(0L))).as("inter"))
    Releasable(jaccardFromIntersections(inter, counts, counts, tau), () => { sh.unpersist(); () })
  }

  /** EXACT all-pairs n-gram Jaccard >= tau via prefix filtering
    * (AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08).
    * Output: (ia, ib, jaccard) with ia < ib — equal to the brute-force
    * inverted-index self-join, with no document-frequency cap heuristic.
    *
    * Candidate generation indexes only each document's PREFIX — its first
    * ceil((1-tau)*n)+1 distinct shingles under a canonical global order
    * (ascending document frequency, ties on the shingle text). Theorem: if
    * jaccard(A,B) >= tau then |A∩B| >= ceil(tau*max(|A|,|B|)), and the
    * smallest common shingle in the canonical order lies inside BOTH
    * prefixes — so every qualifying pair collides on a prefix shingle and
    * the exact verify pass makes the output identical to brute force.
    * (Our prefix ceil((1-tau)n)+1 is >= the tight (n - ceil(tau*n) + 1),
    * so float rounding can only lengthen it — the safe direction.)
    *
    * Scale shape vs the dfCap variant: rarest-first ordering puts hot
    * boilerplate shingles LAST, so they enter a prefix only for documents
    * made almost entirely of boilerplate — candidate volume collapses to
    * rare-shingle collisions without giving up exactness. Two further
    * provably-lossless filters prune inside the join: the length filter
    * (min(na,nb) >= tau*max(na,nb), else jaccard < tau is impossible) and
    * the PPJoin positional filter (for the smallest common shingle at
    * per-doc ranks (ra, rb), overlap <= 1 + min(na-ra, nb-rb), which must
    * reach ceil(tau/(1+tau)*(na+nb)); a qualifying pair always passes on
    * its smallest-common-shingle row, and the pair survives if ANY row
    * passes). Epsilons on the >= comparisons keep float rounding on the
    * admit side.
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         n: Int, tau: Double): DataFrame =
    jaccardPairsPrefixReleasable(df, idCol, textCol, n, tau).df

  /** EXACT directional set-containment pairs: C(A,B) = |A∩B| / |A| >= tau
    * over word n-gram shingle sets — the quote/subset detector symmetric
    * Jaccard misses (a short doc embedded verbatim in a long one has low
    * Jaccard but containment 1.0). Output (ia = contained doc, ib =
    * container, containment), both directions, ia != ib.
    *
    * One-sided prefix filter: C(A,B) >= tau forces |A∩B| >= ceil(tau*|A|)
    * shared shingles, so B must hold one of A's (|A| - ceil(tau*|A|) + 1)
    * globally-RAREST shingles (rarest-first canonical order, as in
    * [[jaccardPairsPrefix]]). The contained side therefore probes only its
    * rarest prefix; the container side indexes ALL its shingles
    * (containment puts no lower bound on B's share of its own set, so no
    * symmetric prefix exists — this is the standard set-containment-join
    * asymmetry). Size filter |B| >= ceil(tau*|A|) prunes in-join; the
    * row-local array_intersect verify makes the output identical to brute
    * force. Hot shingles stay out of probe prefixes by the df ranking, so
    * posting lists the probe touches stay short at corpus scale; epsilon
    * on the ceil keeps float rounding on the admit side.
    */
  def containmentPairsReleasable(df: DataFrame, idCol: String, textCol: String,
                                 n: Int, tau: Double): Releasable = {
    import org.apache.spark.sql.expressions.Window
    val docArr = hashedDocArray(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shEx = docArr.select(col("id"), col("n"), explode(col("hs")).as("h"))
    val dfreq = shEx.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rankW = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    val minOverlap = ceil(lit(tau) * col("n") - lit(1e-9))
    // probe side: the rarest (n - ceil(tau*n) + 1) shingles per doc; tiny
    // relation, checkpointed so the df/rank work never re-runs
    val prefix = shEx.join(dfreq, "h")
      .select(col("id"), col("h"), col("n"), row_number().over(rankW).as("rank"))
      .filter(col("rank") <= col("n") - minOverlap + 1)
      .localCheckpoint(false)
    val cands = prefix.as("a")
      .join(shEx.as("b"),
        col("a.h") === col("b.h") && col("a.id") =!= col("b.id") &&
          col("b.n") >= ceil(lit(tau) * col("a.n") - lit(1e-9)))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .distinct()
    val pairs = cands
      .join(docArr.as("da"), col("ia") === col("da.id"))
      .join(docArr.as("db"), col("ib") === col("db.id"))
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("da.hs"), col("db.hs"))).cast("double") /
          col("da.n").cast("double")).as("containment"))
      .filter(col("containment") >= tau)
    Releasable(pairs, () => { docArr.unpersist(); () })
  }

  /** EXACT all-pairs binary-COSINE similarity >= tauNum/tauDen over word
    * n-gram shingle sets: cos(A,B) = |A∩B| / sqrt(|A|·|B|) — the
    * set-similarity measure that, unlike Jaccard, does not punish a
    * focused doc paired with a broader one twice (union-normalized vs
    * geometric-mean-normalized). Completes the AllPairs family next to
    * [[jaccardPairsPrefix]] (symmetric, union norm) and
    * [[containmentPairsReleasable]] (asymmetric, |A| norm).
    *
    * The threshold is an exact RATIONAL p/q, so every filter and the
    * verify are pure integer arithmetic (cos >= p/q <=> o²q² >= p²·na·nb
    * — no sqrt anywhere), bit-replayable by the SQL oracle.
    *
    * Prefix filter (Bayardo et al. WWW'07 adapted to binary cosine):
    * cos >= t forces nb ∈ [t²·na, na/t²] (size filter, both directions
    * in-join) and o >= ceil(t²·na) =: o_min(A) (since o >= t·sqrt(na·nb)
    * >= t·sqrt(na·t²·na)); the canonically-smallest (rarest-first)
    * common shingle of a qualifying pair has per-doc rank
    * <= n - o + 1 <= n - o_min + 1, so it lies in BOTH docs' prefixes of
    * length n - ceil(t²n) + 1 — the prefix-prefix equi-join sees every
    * qualifying pair, and the row-local array_intersect verify makes the
    * output identical to brute force. ceil(t²n) = (p²n + q² - 1) div q²
    * exactly. Same scale shape as the Jaccard prefix join: hot
    * boilerplate shingles rank LAST and stay out of prefixes; the
    * in-join PPJoin positional filter (see inline note) prunes the
    * candidate volume the longer cosine prefix (~(1-t²)·n vs (1-t)·n
    * for Jaccard) would otherwise generate, losslessly.
    *
    * Output: (ia, ib, inter, na, nb) with ia < ib — the integer triple
    * that DEFINES the cosine; consumers needing the float value quantize
    * it themselves (kept out of the operator so the relation stays
    * bit-exact cross-engine).
    */
  def cosinePairsPrefixReleasable(df: DataFrame, idCol: String, textCol: String,
                                  n: Int, tauNum: Int, tauDen: Int): Releasable = {
    require(tauNum > 0 && tauNum <= tauDen,
      s"threshold must be a rational in (0, 1], got $tauNum/$tauDen")
    import org.apache.spark.sql.expressions.Window
    val p2 = tauNum.toLong * tauNum
    val q2 = tauDen.toLong * tauDen
    val docArr = hashedDocArray(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // overflow guard for the int64 threshold arithmetic below: the worst
    // product is maxN² · q2 (ub²·q2 and p2·na·nb are both bounded by it,
    // p2 <= q2). One tiny agg over the already-persisted doc relation;
    // failing loudly beats wrapped-negative products silently admitting
    // (or pruning) pairs. Remedies: reduce the fraction (86602/100000 ->
    // 43301/50000 halves q2... reduce further), or chunk giant documents.
    val maxN = Option(docArr.agg(max(col("n"))).head().get(0))
      .map(_.asInstanceOf[Int].toLong).getOrElse(0L)
    require(maxN == 0L || maxN <= Long.MaxValue / q2 / maxN,
      s"cosine threshold arithmetic would overflow int64: max shingle count " +
        s"$maxN with tauDen=$tauDen gives maxN²·tauDen⁴ > 2⁶³ — reduce the " +
        "threshold fraction to a smaller denominator or chunk outlier documents")
    val shEx = docArr.select(col("id"), col("n"), explode(col("hs")).as("h"))
    val dfreq = shEx.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rankW = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    val minOverlap = call_function("div", lit(p2) * col("n") + lit(q2 - 1), lit(q2))
    val prefix = shEx.join(dfreq, "h")
      .select(col("id"), col("h"), col("n"), row_number().over(rankW).as("rank"))
      .filter(col("rank") <= col("n") - minOverlap + 1)
      .localCheckpoint(false)
    // PPJoin positional filter, cosine form (exact-recall, round-10 —
    // before it, the tau=4/5 prefix of ~0.36n shingles/doc made the
    // prefix-prefix join the suite's candidate-volume hotspot): for the
    // canonically-SMALLEST common shingle of a qualifying pair at per-doc
    // ranks (ra, rb), every common shingle ranks >= ra in A and >= rb in
    // B, so o <= 1 + min(na - ra, nb - rb) =: ub; cos >= p/q forces
    // o >= t·sqrt(na·nb), i.e. o²·q² >= p²·na·nb — so that row satisfies
    // ub²·q² >= p²·na·nb and the pair survives the prune (ANY-row-passes
    // semantics through the distinct, as in [[jaccardPairsPrefixReleasable]]).
    // ub is cast long BEFORE squaring: int² overflows at n ~ 5e4 shingles.
    val ub = (least(col("a.n") - col("a.rank"), col("b.n") - col("b.rank")) + 1)
      .cast("long")
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          // size filter both ways: q²·nb >= p²·na and q²·na >= p²·nb
          lit(q2) * col("b.n") >= lit(p2) * col("a.n") &&
          lit(q2) * col("a.n") >= lit(p2) * col("b.n") &&
          ub * ub * lit(q2) >= lit(p2) * col("a.n").cast("long") * col("b.n"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .distinct()
    val pairs = cands
      .join(docArr.as("da"), col("ia") === col("da.id"))
      .join(docArr.as("db"), col("ib") === col("db.id"))
      .select(col("ia"), col("ib"),
        size(array_intersect(col("da.hs"), col("db.hs"))).cast("long").as("inter"),
        col("da.n").cast("long").as("na"), col("db.n").cast("long").as("nb"))
      .filter(col("inter") * col("inter") * q2 >= lit(p2) * col("na") * col("nb"))
    Releasable(pairs, () => { docArr.unpersist(); () })
  }

  /** Sorted-neighborhood near-dup pairs (Hernández & Stolfo SIGMOD'95):
    * sort each block by a cheap key (first-5-token prefix), slide a
    * window of `windowSize`, verify only window-adjacent pairs with exact
    * n-gram Jaccard — ZERO joins, one block-partitioned window sort, all
    * verification row-local over lead() arrays. Candidate volume is
    * windowSize * |docs| by construction, so the method costs one sort at
    * any corpus size — the classic cheap pre-pass where PPJoin
    * ([[jaccardPairsPrefix]]) is the exact-recall main pass. Recall is
    * heuristic: only pairs whose prefixes sort near each other AND share
    * the caller's `block` key are seen (that asymmetry is the method,
    * not a bug — callers wanting exactness use the prefix join). The
    * block key is ALSO the parallelism dial: it becomes the window
    * partitioning, so pick one fine enough that no block dominates a
    * partition (e.g. lang + a text prefix, not lang alone — SNM's
    * standard multi-key blocking).
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, textCol: String,
                              block: Column, n: Int, windowSize: Int,
                              tau: Double): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    import org.apache.spark.sql.expressions.Window
    val toksCol = split(col(textCol), " ")
    val base = df.select(block.as("blk"), col(idCol).as("id"),
      array_join(slice(toksCol, 1, 5), " ").as("sk"),
      distinctHashedShingleArrayFromText(col(textCol), n).as("hs"))
    val w = Window.partitionBy(col("blk")).orderBy(col("sk"), col("id"))
    val withLeads = base.select(col("id") +: col("hs") +:
      (1 to windowSize).flatMap(j => Seq(
        lead(col("id"), j).over(w).as(s"id$j"),
        lead(col("hs"), j).over(w).as(s"hs$j"))): _*)
    // ONE pass over the window output: explode the lead slots instead of
    // unioning windowSize filtered branches (a union re-executes the
    // whole window + shingle hashing once per branch)
    val leadSlots = array((1 to windowSize).map(j =>
      struct(col(s"id$j").as("rb"), col(s"hs$j").as("hb"))): _*)
    val cands = withLeads
      .select(col("id").as("ra"), col("hs").as("ha"),
        explode(leadSlots).as("c"))
      .filter(col("c.rb").isNotNull)
      .select(col("ra"), col("c.rb").as("rb"), col("ha"), col("c.hb").as("hb"))
    val inter = size(array_intersect(col("ha"), col("hb")))
    cands.select(least(col("ra"), col("rb")).as("ia"),
        greatest(col("ra"), col("rb")).as("ib"),
        (inter.cast("double") /
          (size(col("ha")) + size(col("hb")) - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Per-doc distinct HASHED shingle array (id, hs: array<long>, n),
    * id-partitioned — the shared base relation of the exact-jaccard and
    * MinHash pipelines. The concat-free token hashing runs ONCE here;
    * everything downstream (frequency aggs, join keys, signatures, the
    * row-local array_intersect verify) operates on 8-byte longs instead
    * of shingle strings, cutting shuffle bytes and comparison cost
    * several-fold. A cross-doc xxhash64 collision (probability
    * ~|pairs|*|shingles|^2/2^64 ~ 1e-15 at any realistic corpus) is the
    * only way hashed set arithmetic can differ from string-exact — the
    * same trust already placed in the MinHash base hash.
    */
  private[graft] def hashedDocArray(df: DataFrame, idCol: String, textCol: String,
                                    n: Int): DataFrame =
    df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        distinctHashedShingleArrayFromText(col(textCol), n).as("hs"))
      .select(col("id"), col("hs"), size(col("hs")).as("n"))

  /** Row-local exact verify shared by the candidate-then-verify
    * pipelines: intersection via array_intersect of the two materialized
    * hash arrays — no second pass over an inverted index.
    */
  /** docB is LEFT-joined: a candidate whose corpus doc row is missing can
    * only arise from an interrupted [[appendToMinhashIndex]] (bands are
    * written before docs, so a crash between the two leaves orphan band
    * rows). An orphan band hit cannot be exactly verified, so it is
    * treated as a CONFIRMED dup (jaccard 1.0) — the conservative
    * direction for admission screening: a near-dup of a crashed-batch doc
    * is rejected, never silently admitted. With a consistent index the
    * left join returns exactly the inner-join rows (every band row has
    * its doc), so batch-path callers (q21/q54/q75) are unaffected.
    */
  private def verifyPairs(cands: DataFrame, docA: DataFrame, docB: DataFrame,
                          tau: Double): DataFrame =
    cands
      .join(docA.as("da"), col("ia") === col("da.id"))
      .join(docB.as("db"), col("ib") === col("db.id"), "left")
      .select(col("ia"), col("ib"), col("db.id").isNull.as("orphan"),
        size(array_intersect(col("da.hs"), col("db.hs"))).as("inter"),
        col("da.n").as("na"), col("db.n").as("nb"))
      .select(col("ia"), col("ib"),
        when(col("orphan"), lit(1.0)).otherwise(
          col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)

  def jaccardPairsPrefixReleasable(df: DataFrame, idCol: String, textCol: String,
                                   n: Int, tau: Double): Releasable = {
    import org.apache.spark.sql.expressions.Window
    // materialized once: the shingle hashing is the CPU cost — it must
    // not re-run per consumer (see hashedDocArray for the exactness note)
    val docArr = hashedDocArray(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shEx = docArr.select(col("id"), col("n"), explode(col("hs")).as("h"))
    val dfreq = shEx.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // canonical per-doc rank: one shuffle on the hash (df join), one on id
    // (the window exchange)
    val rankW = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    val ranked = shEx.join(dfreq, "h")
      .select(col("id"), col("h"), col("n"), row_number().over(rankW).as("rank"))
    // the prefix relation feeds both self-join sides; barrier so the
    // rank/df work runs once (prefix is ~(1-tau) of the index)
    val prefix = ranked.filter(col("rank") <= ceil(lit(1 - tau) * col("n")) + 1)
      .localCheckpoint(false)
    // ASYMMETRIC index prefix (PPJoin, Xiao et al.): canonicalize each
    // pair by SIZE (smaller record = index side b, probe side a) instead
    // of by id. For J(a,b) >= tau with nb <= na the required overlap is
    // alpha = ceil(tau/(1+tau)*(na+nb)) >= ceil(2*tau/(1+tau)*nb), so by
    // the prefix-filter principle the matching token must appear within
    // b's first nb - ceil(2*tau/(1+tau)*nb) + 1 tokens — the index prefix,
    // ~(1-tau)/(1+tau)*2 of the doc vs the probe prefix's (1-tau): at
    // tau=0.6 that is 0.25n vs 0.4n, cutting candidate volume
    // (sum_h df_probe(h)*df_index(h)) ~40%. alpha >= tau*na bounds the
    // probe side exactly as before. Derived by a narrow filter ON the
    // checkpointed prefix (idxLen <= probeLen always since
    // 2*tau/(1+tau) >= tau), so the rank/df work still runs once.
    val idxPrefix = prefix.filter(
      col("rank") <= ceil(lit(1 - 2 * tau / (1 + tau)) * col("n")) + 1)
    val na = col("a.n"); val nb = col("b.n")
    val minOverlap = ceil(lit(tau / (1 + tau)) * (na + nb) - lit(1e-9))
    val cands = prefix.as("a").join(idxPrefix.as("b"),
        col("a.h") === col("b.h") &&
          (nb < na || (nb === na && col("b.id") < col("a.id"))) &&
          nb.cast("double") >= lit(tau) * na.cast("double") - lit(1e-9) &&
          (least(na - col("a.rank"), nb - col("b.rank")) + 1) >= minOverlap)
      .select(least(col("a.id"), col("b.id")).as("ia"),
        greatest(col("a.id"), col("b.id")).as("ib"))
      .distinct()
    Releasable(verifyPairs(cands, docArr, docArr, tau), () => { docArr.unpersist(); () })
  }

  /** (ia, ib, inter) + per-doc shingle counts -> exact jaccard >= tau —
    * shared tail of the capped-index, MinHash-LSH, and cross-corpus
    * pipelines. `countsA`/`countsB` are the same frame for self-joins.
    */
  private def jaccardFromIntersections(inter: DataFrame,
                                       countsA: DataFrame, countsB: DataFrame,
                                       tau: Double): DataFrame =
    inter
      .join(countsA.as("ca"), col("ia") === col("ca.id"))
      .join(countsB.as("cb"), col("ib") === col("cb.id"))
      .select(col("ia"), col("ib"),
        (col("inter").cast("double") /
          (col("ca.n_sh") + col("cb.n_sh") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)

  private[graft] val MinhashPrime = 2147483647L // 2^31 - 1; keeps a*h+b within int64

  /** Deterministic (a, b) permutation coefficients via a plain LCG —
    * stable across JVM/Scala versions (unlike util.Random).
    */
  private[graft] def coeffs(k: Int): (Array[Long], Array[Long]) = {
    var state = 42L
    def next(): Long = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      (state >>> 33) % (MinhashPrime - 1)
    }
    val as = Array.fill(k)(next() + 1) // a in [1, P-1]
    val bs = Array.fill(k)(next())
    (as, bs)
  }

  /** MinHash signature per id: k permutations of xxhash64(shingle) via
    * (a*h + b) mod P, all computed in one map-side-combinable aggregation.
    * Delegates to the lane-packed kernel over a hashed index.
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame =
    minhashSignaturesFromHashes(
      sh.select(col("id"), xxhash64(col("shingle")).as("h")), k)

  /** Lane-packed MinHash signatures from a hashed index (id, h: long).
    * Each permutation value is the TOP 15 BITS of (a*h'+b) mod P (h' = h
    * mod P) — small enough that four permutations pack into one long and
    * the whole k-permutation signature aggregates through k/4
    * [[graft.functions.PackedLaneMin]] buffer slots (4x fewer agg
    * expressions and buffer writes than one `min` per permutation; the
    * per-lane min is SWAR bit-twiddling inside the codegen'd update).
    * min-then-truncate == truncate-then-min (>>16 is monotonic), so a
    * lane value is exactly the 15-bit prefix of the unpacked minimum.
    * 15-bit signatures only add a 2^-15 per-row false-collision term to
    * the LSH banding math — absorbed by the exact verify pass — while
    * halving signature bytes. Output: (id, mh0..mh{k-1}) with each mh in
    * [0, 2^15).
    */
  private[graft] def minhashSignaturesFromHashes(hashedEx: DataFrame, k: Int): DataFrame = {
    require(k % 4 == 0, s"lane packing needs k % 4 == 0, got $k")
    val (as, bs) = coeffs(k)
    val h = pmod(col("h"), lit(MinhashPrime))
    // (a*h+b) fits int64: a,h < P = 2^31-1, so a*h < 2^62
    def lane(i: Int): Column =
      shiftrightunsigned((lit(as(i)) * h + lit(bs(i))) % MinhashPrime, 16)
    def packedMin(c: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.PackedLaneMin(
          org.apache.spark.sql.GraftBridge.expression(c)).toAggregateExpression())
    val aggs = (0 until k / 4).map { g =>
      val packed = (0 until 4).map(j => shiftleft(lane(4 * g + j), 16 * j))
        .reduce(_ bitwiseOR _)
      packedMin(packed).as(s"pm$g")
    }
    val unpacked = (0 until k).map { i =>
      shiftrightunsigned(col(s"pm${i / 4}"), 16 * (i % 4))
        .bitwiseAND(lit(0xFFFFL)).as(s"mh$i")
    }
    hashedEx.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id") +: unpacked: _*)
  }

  /** (id, band signature) exploded relation — the LSH bucketing key. */
  private[graft] def bandSignatures(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"LSH banding needs bands >= 1 and rowsPerBand >= 1, got bands=$bands " +
        s"rowsPerBand=$rowsPerBand — rowsPerBand=0 degenerates every band " +
        "signature to the band literal and the 'candidate' join to all-pairs")
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band") +:
        (0 until rowsPerBand).map(j => col(s"mh${b * rowsPerBand + j}").as(s"r$j")): _*)
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("bsig"))
  }

  /** ROW-LOCAL twin of [[minhashSignaturesFromHashes]] + [[bandSignatures]]
    * over a hashed-doc-array relation: the whole k-permutation signature
    * comes out of one codegen'd pass over each row's `hs` array
    * ([[graft.functions.MinhashSig]], bit-equal lanes — DedupTextSpec
    * pins it), then bands are sliced from the signature array in the same
    * projection. Replaces explode → shuffle → 24-slot aggregation with
    * ZERO exchanges — signing is embarrassingly parallel, which is both
    * the measured q54/q75 probe win and the correct 100 TB shape (the
    * only shuffle left in an index probe is the band join itself).
    * Shingle-less docs (empty `hs`) are filtered exactly as the exploded
    * form drops them (explode of an empty array emits no row).
    */
  private[graft] def rowLocalBandSignatures(docArr: DataFrame, k: Int, bands: Int,
                                            rowsPerBand: Int): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1 && bands * rowsPerBand == k,
      s"LSH banding needs bands * rowsPerBand == k, got k=$k bands=$bands " +
        s"rowsPerBand=$rowsPerBand — bands > k degenerates signatures to the " +
        "band literal (all-pairs join) and k % bands != 0 silently drops " +
        "permutations, voiding the (1-j^s)^b recall math")
    val sig = org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinhashSig(
        org.apache.spark.sql.GraftBridge.expression(col("hs")), k))
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band") +:
        (0 until rowsPerBand).map(j =>
          col("__sig").getItem(b * rowsPerBand + j).as(s"r$j")): _*)
    }
    docArr.filter(size(col("hs")) > 0)
      .select(col("id"), sig.as("__sig"))
      .select(col("id"), explode(array(bandStructs: _*)).as("bsig"))
  }

  /** LSH banding: ids sharing any band signature become candidate pairs.
    * Band self-join replaces the quadratic all-pairs comparison.
    */
  def lshCandidatePairs(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // the self-join consumes the band table twice and Spark does not reuse
    // the identical subtree (no ReusedExchange across join children), so
    // the k-way signature aggregation would execute twice; a lazy local
    // checkpoint of the small (bands rows/doc) table caps it at once
    val exploded = bandSignatures(sig, bands, rowsPerBand).localCheckpoint(false)
    exploded.as("a").join(exploded.as("b"),
        col("a.bsig") === col("b.bsig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact Jaccard verification of the
    * candidates (the standard candidate-then-verify pipeline). With
    * bands=48 x rows=2 (k=96) the per-pair miss probability at tau>=0.7 is
    * (1-0.49)^48 ~ 1e-14, so the verified output equals the brute-force
    * >= tau pair set.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int, tau: Double,
                          k: Int = 96, bands: Int = 48): DataFrame =
    minhashNearDupPairsReleasable(df, idCol, textCol, n, tau, k, bands).df

  def minhashNearDupPairsReleasable(df: DataFrame, idCol: String, textCol: String,
                                    n: Int, tau: Double,
                                    k: Int = 96, bands: Int = 48): Releasable = {
    val rowsPerBand = k / bands
    // two consumers (signature agg, verify); persisted so the shingle
    // hashing runs once
    val docArr = hashedDocArray(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // row-local signatures; the checkpoint caps the band build at once
    // across the self-join's two sides (no ReusedExchange across children)
    val exploded = rowLocalBandSignatures(docArr, k, bands, rowsPerBand)
      .localCheckpoint(false)
    val cands = exploded.as("a").join(exploded.as("b"),
        col("a.bsig") === col("b.bsig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .distinct()
    Releasable(verifyPairs(cands, docArr, docArr, tau), () => { docArr.unpersist(); () })
  }

  /** Incremental exact dedup: rows of `newDf` whose content hash does NOT
    * appear in `seenDf` — the "admit only genuinely new documents" step of
    * a continuously-growing corpus, as a hash anti-join (one shuffle on
    * the content hash; at extreme scale put a bloom filter of seen hashes
    * in front to skip the shuffle for the obvious misses).
    */
  def exactNewDocuments(newDf: DataFrame, seenDf: DataFrame,
                        textCol: String): DataFrame = {
    require(!newDf.columns.contains("__h"),
      "newDf may not already carry the internal column __h")
    newDf.withColumn("__h", md5(col(textCol)))
      .join(seenDf.select(md5(col(textCol)).as("__h")).distinct(), Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** Cross-corpus MinHash-LSH near-dup pairs: (ia from `dfA`, ib from
    * `dfB`) with exact-verified jaccard >= tau — incremental near-dedup of
    * a new batch against an existing corpus without re-running the
    * self-join over their union. Same banding/recall math as
    * [[minhashNearDupPairs]]; candidates come from an A-bands x B-bands
    * equality join instead of a self-join. This form recomputes both
    * sides per call; at 100 TB, materialize the corpus side ONCE per
    * corpus generation with [[buildMinhashIndex]] and run batches through
    * [[joinAgainstMinhashIndex]] — per-batch cost proportional to the
    * batch, not the corpus.
    */
  def minhashNearDupJoin(dfA: DataFrame, dfB: DataFrame, idCol: String,
                         textCol: String, n: Int, tau: Double,
                         k: Int = 96, bands: Int = 48): DataFrame =
    minhashNearDupJoinReleasable(dfA, dfB, idCol, textCol, n, tau, k, bands).df

  def minhashNearDupJoinReleasable(dfA: DataFrame, dfB: DataFrame, idCol: String,
                                   textCol: String, n: Int, tau: Double,
                                   k: Int = 96, bands: Int = 48): Releasable = {
    val rowsPerBand = k / bands
    val docA = hashedDocArray(dfA, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docB = hashedDocArray(dfB, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = rowLocalBandSignatures(docA, k, bands, rowsPerBand).as("a")
      .join(rowLocalBandSignatures(docB, k, bands, rowsPerBand).as("b"),
        col("a.bsig") === col("b.bsig"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .distinct()
    Releasable(verifyPairs(cands, docA, docB, tau),
      () => { docA.unpersist(); docB.unpersist(); () })
  }

  /** Build a parquet-backed, REUSABLE MinHash corpus index at `path` —
    * the "computed once per corpus generation" artifact of incremental
    * near-dedup. Layout:
    *   path/docs  (id, hs array<long>, n)  hashed shingle arrays (verify side)
    *   path/bands (id, bsig struct)        LSH band table (candidate side)
    *   path/meta  (n, k, bands)            parameters, enforced on reuse
    * At 100 TB the index is written by one corpus-generation job and then
    * every incoming batch joins against it via
    * [[joinAgainstMinhashIndex]] — per-batch cost proportional to the
    * batch, not the corpus. Both relations are plain parquet: partition
    * pruning/pushdown apply, and the band table can be bucketed on bsig
    * by the caller's writer if the corpus outgrows shuffle comfort.
    */
  def buildMinhashIndex(corpus: DataFrame, idCol: String, textCol: String,
                        path: String, n: Int = 3, k: Int = 96,
                        bands: Int = 48): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val docArr = hashedDocArray(corpus, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docArr.write.mode("overwrite").parquet(s"$path/docs")
    rowLocalBandSignatures(docArr, k, bands, k / bands)
      .write.mode("overwrite").parquet(s"$path/bands")
    Seq((n, k, bands)).toDF("n", "k", "bands")
      .write.mode("overwrite").parquet(s"$path/meta")
    docArr.unpersist()
    ()
  }

  /** Append documents to an existing [[buildMinhashIndex]] artifact —
    * the incremental-growth path used by streaming admission (each
    * micro-batch's ADMITTED docs join the corpus so later batches reject
    * their near-dups). Parameters come from the saved meta, so appended
    * rows are always signature-compatible. Appends only add parquet
    * files (no rewrite); compact the index periodically on long-running
    * streams (many small files + any replay-duplicated rows — duplicates
    * only add redundant candidates, never wrong pairs).
    */
  def appendToMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
                           path: String): Unit = {
    val spark = docs.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n, k, bands) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    // two consumers (docs write, band build); batch-sized barrier
    val docArr = hashedDocArray(docs, idCol, textCol, n).localCheckpoint(false)
    // the two appends are not atomic — write BANDS first. A crash between
    // them leaves orphan band rows, which [[verifyPairs]] treats as
    // confirmed dups (conservative: near-dups of a crashed batch are
    // rejected). The reverse order (docs first) would leave doc rows with
    // no bands — candidates never form and their near-dups are silently
    // admitted on every later batch. Recovery: re-appending the same
    // batch after restart is safe (dup rows only add redundant
    // candidates); compact the index periodically on long-running streams.
    rowLocalBandSignatures(docArr, k, bands, k / bands)
      .write.mode("append").parquet(s"$path/bands")
    docArr.write.mode("append").parquet(s"$path/docs")
    ()
  }

  /** Near-dup pairs (ia from `batch`, ib from the indexed corpus) with
    * exact-verified jaccard >= tau, reading a prebuilt
    * [[buildMinhashIndex]] artifact instead of recomputing the corpus
    * side — the batch-vs-corpus incremental path with the corpus work
    * amortized across batches. Only the BATCH is shingled/signed here;
    * the corpus contributes two parquet scans (bands for candidates,
    * docs for the row-local verify).
    */
  def joinAgainstMinhashIndex(batch: DataFrame, idCol: String, textCol: String,
                              path: String, tau: Double): DataFrame = {
    val spark = batch.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n, k, bands) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val docB = spark.read.parquet(s"$path/docs")
    val bandsB = spark.read.parquet(s"$path/bands")
    // feeds band build + verify; with the row-local shingle+signature
    // expressions both consumers are one cheap projection off the scan,
    // so re-evaluating beats the extra materialization job a checkpoint
    // barrier would cost (round 11 — the old exploded-agg path needed it)
    val docA = hashedDocArray(batch, idCol, textCol, n)
    val bandsA = rowLocalBandSignatures(docA, k, bands, k / bands)
    val cands = bandsA.as("a").join(bandsB.as("b"), col("a.bsig") === col("b.bsig"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .distinct()
    verifyPairs(cands, docA, docB, tau)
  }

  /** 64-bit SimHash per document over word unigrams. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
    val h = xxhash64(col("w"))
    val bitAggs = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sums = words.groupBy(col("id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup candidate pairs within `maxDist` Hamming distance.
    * Pigeonhole blocking on 4x16-bit chunks guarantees recall for
    * maxDist <= 3; larger distances are best-effort (approximate operator).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int): DataFrame =
    hammingPairs64(simhash64(df, idCol, textCol), "id", "simhash", maxDist)

  /** Hamming-distance pairs over ANY 64-bit signature column (SimHash,
    * perceptual frame hashes, …) via pigeonhole blocking on 4x16-bit
    * chunks: a pair within distance <= 3 must agree on at least one chunk
    * (4 chunks, at most 3 differing bits), so the chunk equi-join has
    * guaranteed recall for maxDist <= 3; larger distances are
    * best-effort. The verify step is row-local xor/popcount — never an
    * all-pairs scan.
    */
  def hammingPairs64(sig: DataFrame, idCol: String, hashCol: String,
                     maxDist: Int): DataFrame = {
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("c"), shiftrightunsigned(col(hashCol), c * 16).bitwiseAND(0xFFFFL).as("v")))
    // lazy checkpoint: the chunk self-join consumes this twice, and without
    // a barrier the whole signature computation executes once per side
    val exploded = sig.select(col(idCol).as("id"), col(hashCol).as("__h"),
        explode(array(chunks: _*)).as("chunk"))
      .localCheckpoint(false)
    exploded.as("a").join(exploded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        bit_count(col("a.__h").bitwiseXOR(col("b.__h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** 30-bit SimHash over word-bigram features, hashed with the
    * engine-portable rolling fingerprint (`fingerprint64`, value < 2^30)
    * instead of xxhash64. Every arithmetic step can be replayed bit-for-bit
    * by an external SQL engine, so — unlike [[simhash64]] — the signature
    * itself is exactly oracle-checkable. Bigrams (not unigrams) because a
    * shared vocabulary makes unigram bit-sums converge across documents;
    * bigram features keep the signature discriminative.
    */
  def simhashFp30(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // row-local signing ([[graft.functions.SimhashFp30Sig]], round 11):
    // ZERO exchanges — the bigram explode + 15-packed-lane aggregation
    // below survives only as the bit-equality twin the spec pins. The
    // null filter reproduces the aggregation's no-bigram-doc drop.
    // Intentional trade-off vs the aggregation form: no repartition(id),
    // so signing runs at SOURCE-FILE parallelism — on a single-split
    // corpus the whole pass is one task. Fine at scale (100 TB inputs
    // are many splits) — and MEASURED fine at the small end too
    // (round 13, sf0.1 documents = ONE split, min-of-3 warm:
    // 0.20 s row-local vs 0.34 s with repartition(id) — the shuffle
    // costs more than the single-task signing it parallelizes).
    // Revisit only with a measurement showing the repartition winning.
    df.select(col(idCol).as("id"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.SimhashFp30Sig(
          org.apache.spark.sql.GraftBridge.expression(col(textCol)))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The exploded-aggregation form of [[simhashFp30]] — kept ONLY as the
    * declarative twin DedupTextSpec pins the row-local expression against
    * (both must emit identical signatures or the oracle CTEs drift).
    */
  private[graft] def simhashFp30Agg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val feats = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        explode(stringShingleArrayFromText(col(textCol), 2)).as("w"))
    val h = graft.functions.Converters.fingerprint64(col("w"))
    // the 30 per-bit counters ride in 15 longs (bits j and j+15 share one
    // long, 32-bit lanes) + one count: half the aggregation-buffer slots
    // and map-side update work of 30 separate sums, same signature — the
    // ±1 sign test `sum(±1) > 0` is equivalent to `2*ones > n`. 32-bit
    // lanes keep the packing overflow-safe to 2^31 features per document
    // (the upper lane's scaled sum reaches the signed-long limit first;
    // no real document has billions of distinct bigrams).
    val packedCols = (0 until 15).map { g =>
      (shiftright(h, g).bitwiseAND(1) +
        shiftright(h, g + 15).bitwiseAND(1) * lit(1L << 32)).as(s"p$g")
    }
    val withPacked = feats.select(Seq(col("id")) ++ packedCols: _*)
    val aggs = (0 until 15).map(g => sum(col(s"p$g")).as(s"sp$g")) :+ count(lit(1)).as("n")
    val sums = withPacked.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val sig = (0 until 30).map { j =>
      val g = j % 15
      val ones = if (j >= 15) shiftright(col(s"sp$g"), 32)
                 else col(s"sp$g").bitwiseAND(0xFFFFFFFFL)
      when(ones * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** Near-dup GROUPS from a pair list: connected components by iterative
    * min-label propagation, so an entire duplicate cluster collapses to one
    * canonical id (the smallest member) — the step after pair detection in
    * a dedup pipeline (keep one doc per component, drop the rest).
    * Each round is two shuffles (neighbor min + label join) and the loop
    * ends when no label changes; rounds needed = component diameter.
    * Training-corpus dup clusters are shallow (near-clique), so this
    * converges in 2-3 rounds; for adversarially long chains at 100 TB the
    * large-star/small-star variant halves the diameter per round — same
    * join shapes, more bookkeeping. lineage is truncated per round so the
    * plan does not grow with iterations.
    *
    * PRECONDITION: every endpoint of `pairs` must appear in `ids`. Label
    * propagation seeds labels from `ids` only, so an edge through an
    * unlisted node is silently severed and a connected component splits
    * (ids {1,2} with pairs (1,3),(3,2) reports two singletons) — if an
    * upstream screen filters docs AFTER pair detection, filter the pairs
    * too, or use [[nearDupGroupsStar]], which derives its node set from
    * the edges themselves and handles the same input correctly.
    */
  def nearDupGroups(ids: DataFrame, idCol: String, pairs: DataFrame,
                    maxIter: Int = 20): DataFrame = {
    // persist the pair list FIRST: the union below consumes it twice, and
    // upstream pair producers (simhash/minhash pipelines) are expensive
    val p = pairs.select(col("ia"), col("ib"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the frozen edge relation is joined on dst EVERY propagation step:
    // pre-hash it on the join key before caching so the InMemoryRelation
    // advertises HashPartitioning(dst) and each round's join skips the
    // edge-side exchange (the labels side changes per round and must
    // reshuffle regardless) — one saved exchange of the LARGEST relation
    // per step, 2 steps per round
    val edges = p.select(col("ia").as("src"), col("ib").as("dst"))
      .union(p.select(col("ib").as("src"), col("ia").as("dst")))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // only nodes that appear in a pair need propagation — in a dedup
    // corpus that is a small fraction of the table; everything else is a
    // singleton (canonical = self) and skips the loop entirely
    val allIds = ids.select(col(idCol).as("id"))
    val paired = allIds.join(edges.select(col("src").as("id")), Seq("id"), "left_semi")
    val singletons = allIds.join(edges.select(col("src").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    var labels = paired.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    // FRONTIER propagation (r16, guide §2.1 shuffle less data): only nodes
    // whose label changed since their last propagation can change a
    // neighbor's min, so each step joins the edges against the CHANGED set
    // instead of the full label relation. Labels per round are bit-identical
    // to the full-step form: a non-frontier node's label is unchanged since
    // it was last propagated, hence already folded into every neighbor's
    // min (labels only decrease). Round 1's frontier is every paired node,
    // so it IS the full step.
    var frontier = labels
    var changed = 1L
    var i = 0
    // one propagation step against a frontier: min over the frontier
    // neighborhood, merged into all labels (carrying any extra columns)
    def step(l: DataFrame, f: DataFrame): DataFrame = {
      val nbrMin = edges.join(f.select(col("id"), col("lbl")), col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      val newLbl = least(col("lbl"), coalesce(col("nlbl"), col("lbl")))
      l.join(nbrMin, col("id") === col("src"), "left")
        .select(Seq(col("id"), newLbl.as("lbl")) ++
          l.columns.filter(c => c != "id" && c != "lbl").map(col): _*)
    }
    while (changed > 0 && i < maxIter) {
      // TWO propagation steps per action: at bench scale the loop cost is
      // dominated by per-round fixed overhead (job launch, checkpoint,
      // codegen), not data volume, so halving the rounds halves the loop.
      // Step 2's frontier is the step-1 changed set (checkpointed so the
      // two consumers — the merge side and the filter — compute it once);
      // the NEXT round's frontier is the step-2 changed set: step-1
      // changes were already propagated within this round, and labels
      // only decrease (least), so "step 2 changed nothing" <=> fixpoint.
      val mid = step(labels.select(col("id"), col("lbl"), col("lbl").as("__lbl0")), frontier)
        .localCheckpoint(false)
      val f1 = mid.filter(col("lbl") =!= col("__lbl0")).select(col("id"), col("lbl"))
      val updated = step(mid.select(col("id"), col("lbl"), col("lbl").as("__lbl1")), f1)
        .select(col("id"), col("lbl"), (col("lbl") =!= col("__lbl1")).as("__chg"))
        .localCheckpoint(false)
      frontier = updated.filter(col("__chg")).select(col("id"), col("lbl"))
      changed = frontier.count()
      labels = updated.select(col("id"), col("lbl"))
      i += 1
    }
    // wrong-but-plausible labels are worse than failing: a component whose
    // diameter exceeds the propagation budget would report an intermediate
    // id as canonical. `changed` counts the step-2 frontier, which is empty
    // exactly at the full-step fixpoint (see the loop comment).
    require(changed == 0,
      s"nearDupGroups did not converge in $maxIter double-rounds (${2 * maxIter} steps) — " +
        s"raise maxIter (or use nearDupGroupsStar for deep chains)")
    val out = labels.union(singletons).select(col("id"), col("lbl").as("canonical_id"))
      .localCheckpoint(true) // materialize before releasing the inputs below
    edges.unpersist()
    p.unpersist()
    out
  }

  /** Canonical-doc SELECTION policy over dedup groups: real pipelines keep
    * the BEST document of each near-dup component (highest quality score,
    * longest, most recent…), not the smallest id. Joins the
    * [[nearDupGroups]]/[[nearDupGroupsStar]] output against a caller
    * scoring relation and marks, per component, the winner under the
    * caller's ordering (ties broken by ascending id so the choice is
    * deterministic).
    *
    * Output: every (id, canonical_id) row of `groups`, plus the columns of
    * `scored`, plus `kept_id` (the component's winner) and `kept`
    * (id == kept_id). Exactly one row per component has kept = true.
    *
    * Scale shape: one equi-join on the id and ONE window partitioned by
    * the component label — components are bounded (dup clusters), so no
    * global sort and no skew beyond what the dup distribution itself
    * carries; the same shuffle key the group table already has.
    */
  def keepBestPerGroup(groups: DataFrame, scored: DataFrame, idCol: String,
                       ordering: Seq[Column]): DataFrame = {
    require(ordering.nonEmpty, "keepBestPerGroup needs at least one ordering column")
    import org.apache.spark.sql.expressions.Window
    // LEFT join: a group id whose score row is missing upstream must stay
    // in the output (an inner join silently dropped it — neither kept nor
    // visible as dropped, breaking the "every row of groups" contract).
    // A join-presence marker leads the sort, so rows WITHOUT a score row
    // sort after every scored member regardless of the caller ordering's
    // null placement — a score-less doc wins a component only when no
    // member is scored, and then the id tie-break decides.
    val joined = groups.join(
      scored.withColumnRenamed(idCol, "id").withColumn("__scored", lit(1)),
      Seq("id"), "left")
    val w = Window.partitionBy(col("canonical_id"))
      .orderBy(col("__scored").isNull.cast("int").asc +: ordering :+ col("id").asc: _*)
    joined
      .withColumn("kept_id", first(col("id")).over(w))
      .withColumn("kept", col("id") === col("kept_id"))
      .drop("__scored")
  }

  /** Large-star round: every node connects its strictly-larger neighbors
    * to the minimum of its neighborhood (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", two-phase alternating algorithm).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("a"), col("b"))
      .union(e.select(col("b").as("a"), col("a").as("b")))
    val mins = und.groupBy(col("a")).agg(min(col("b")).as("mb"))
      .select(col("a"), least(col("a"), col("mb")).as("m"))
    // no distinct here (r16): [[smallStar]]'s terminal distinct dedupes
    // the composed round's output either way (its min aggregation is
    // duplicate-insensitive), so the per-round edge SET — and the
    // convergence fingerprint over it — is unchanged while each round
    // runs one exchange fewer. The star loop is stage-count-bound on
    // near-converged edge sets (q303/q71/q44-family), so exchanges per
    // round are the cost that matters.
    und.join(mins, "a").filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
  }

  /** Small-star round: every node rewires its smaller-or-equal neighbors
    * (edges directed larger -> smaller) to their minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
    val mins = dir.groupBy(col("a")).agg(min(col("b")).as("m"))
    dir.join(mins, "a")
      .select(col("b").as("a"), col("m").as("b"))
      .union(mins.select(col("a"), col("m").as("b")))
      .filter(col("a") =!= col("b")).distinct()
  }

  /** Connected components by alternating large-star/small-star rounds —
    * the deep-chain scale path next to [[nearDupGroups]]: min-label
    * propagation needs diameter rounds (fine for near-clique dup
    * clusters), star contraction converges in O(log^2 n) rounds even on
    * adversarial path graphs, with the same join/groupBy shapes. Output
    * matches nearDupGroups: (id, canonical_id = component minimum).
    * Convergence is detected by an (edge-count, hash-sum) fingerprint —
    * one tiny aggregation per round instead of a set-difference join.
    */
  def nearDupGroupsStar(ids: DataFrame, idCol: String, pairs: DataFrame,
                        maxIter: Int = 40): DataFrame = {
    var edges = pairs.select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(false)
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash(col("a"), col("b")).cast("long")), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(edges) // materializes the checkpoint too
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // ONE large/small double-round per action — an r15 A/B of batching
      // TWO double-rounds per fingerprint read q71 2.2 -> 6.4 s: the
      // extra star rounds on the near-converged edge set cost far more
      // than the saved fingerprint/checkpoint overhead
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val nfp = fingerprint(next)
      // fingerprint equality is a candidate signal; the (rarely-run)
      // set-difference confirms it so a hash collision can never declare
      // false convergence and return wrong-but-plausible components
      converged = nfp == fp && next.except(edges).isEmpty
      edges = next
      fp = nfp
      i += 1
    }
    require(converged,
      s"nearDupGroupsStar did not converge in $maxIter rounds (pathological input?)")
    if (sys.props.contains("graft.debug"))
      System.err.println(s"[star] converged in $i double-rounds, ${fp._1} star edges")
    // converged edges are stars (node -> component min); everything else
    // is a singleton
    val labels = edges.select(col("a").as("id"), col("b").as("lbl"))
      .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
    val allIds = ids.select(col(idCol).as("id"))
    allIds.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("canonical_id"))
  }

  /** Exact SimHash near-dup pairs within `maxDist` (<= 3) Hamming distance
    * over the [[simhashFp30]] signature. Pigeonhole blocking on 4 chunks
    * (8/8/8/6 bits) guarantees full recall for maxDist <= 3: 3 differing
    * bits cannot touch all 4 chunks, so every qualifying pair collides on
    * at least one chunk. The output therefore equals a brute-force
    * all-pairs Hamming scan while the join only compares candidates.
    */
  def simhashExactPairs(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int = 3): DataFrame =
    simhashExactPairsFromSigs(simhashFp30(df, idCol, textCol), maxDist)

  /** The chunk-join half of [[simhashExactPairs]], over a precomputed
    * (id, simhash) relation — factored out so the [[buildDedupGraph]]
    * artifact (which persists signatures) and the in-memory path share
    * one implementation of the recall-guaranteed candidate join.
    */
  private[graft] def simhashExactPairsFromSigs(sig: DataFrame,
                                               maxDist: Int): DataFrame = {
    require(maxDist <= 3, s"pigeonhole recall guarantee holds only for maxDist <= 3, got $maxDist")
    // lazy checkpoint: the chunk self-join consumes this twice, and without
    // a barrier the whole signature aggregation executes once per side
    val exploded = explodeSigChunks(sig).localCheckpoint(false)
    exploded.as("a").join(exploded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Cross-relation pigeonhole collisions: every (batch id, corpus id)
    * pair within `maxDist` Hamming distance between two (id, simhash)
    * relations — the admission-time probe of the dedup-graph family.
    * Same recall guarantee as [[simhashExactPairsFromSigs]]; ids may
    * coincide across the two sides (the caller decides whether a
    * same-id hit counts — replay tolerance hangs on excluding it).
    */
  private[graft] def crossSigCollisions(batchSigs: DataFrame,
                                        corpusSigs: DataFrame,
                                        maxDist: Int): DataFrame = {
    require(maxDist <= 3, s"pigeonhole recall guarantee holds only for maxDist <= 3, got $maxDist")
    explodeSigChunks(batchSigs).as("a")
      .join(explodeSigChunks(corpusSigs).as("b"), col("a.chunk") === col("b.chunk"))
      .select(col("a.id").as("bid"), col("b.id").as("cid"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** (id, simhash, chunk) pigeonhole rows for the 30-bit signature:
    * 4 chunks of 8/8/8/6 bits — 3 differing bits cannot touch all 4
    * chunks, so every pair within Hamming distance 3 collides on >= 1.
    */
  private def explodeSigChunks(sig: DataFrame): DataFrame = {
    val chunkSpec = Seq((0, 8), (8, 8), (16, 8), (24, 6))
    val chunks = chunkSpec.zipWithIndex.map { case ((off, w), c) =>
      struct(lit(c).as("c"),
        shiftrightunsigned(col("simhash"), off).bitwiseAND(lit((1L << w) - 1)).as("v"))
    }
    sig.select(col("id"), col("simhash"), explode(array(chunks: _*)).as("chunk"))
  }

  /** Build a parquet-backed, REUSABLE near-dup GRAPH artifact at `path` —
    * the "computed once per corpus generation" relation that cluster-size
    * stats, leakage-free splits, and triangle counting all consume (each
    * previously recomputed signatures + pairs + components from scratch,
    * ~3 s apiece at sf0.1 and the dominant corpus-hashing cost at 100 TB).
    * Layout (mirrors [[buildMinhashIndex]]):
    *   path/sigs        (id, simhash)       30-bit SimHash signatures
    *   path/pairs       (ia, ib, hamming)   exact pairs, hamming <= max_dist
    *   path/components  (id, canonical_id)  connected components over pairs
    *                                        (singletons included)
    *   path/meta        (max_dist)          parameters, enforced on reuse
    * At 100 TB one corpus-generation job writes the artifact; every
    * consumer (reporting, split assignment, graph analytics) is then a
    * parquet scan, and admission appends via [[appendToDedupGraph]] with
    * per-batch cost proportional to the batch's text — the corpus side
    * contributes only its saved signatures (no re-hashing).
    */
  def buildDedupGraph(corpus: DataFrame, idCol: String, textCol: String,
                      path: String, maxDist: Int = 3): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sigs = simhashFp30(corpus, idCol, textCol)
      .localCheckpoint(false) // feeds the parquet write + the pair join
    sigs.write.mode("overwrite").parquet(s"$path/sigs")
    val pairs = simhashExactPairsFromSigs(sigs, maxDist).localCheckpoint(false)
    pairs.write.mode("overwrite").parquet(s"$path/pairs")
    nearDupGroupsStar(sigs.select(col("id")), "id", pairs)
      .write.mode("overwrite").parquet(s"$path/components")
    Seq(maxDist).toDF("max_dist").write.mode("overwrite").parquet(s"$path/meta")
    ()
  }

  /** Takedown tombstones of a [[buildDedupGraph]] artifact: the ids
    * logically removed by [[removeFromDedupGraph]] (empty relation if no
    * takedown ever ran). Every reader anti-joins these, so a tombstone
    * takes effect the moment its append lands — before any component
    * repair or physical compaction.
    */
  def dedupGraphRemoved(spark: SparkSession, path: String): DataFrame = {
    resolveSwappedDir(spark, s"$path/removed")
    val p = new org.apache.hadoop.fs.Path(s"$path/removed")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$path/removed").distinct()
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("id")
    }
  }

  /** (id, simhash) signatures from a [[buildDedupGraph]] artifact,
    * takedowns excluded. distinct(): replayed appends can duplicate rows.
    */
  def dedupGraphSigs(spark: SparkSession, path: String): DataFrame = {
    resolveSwappedDir(spark, s"$path/sigs")
    spark.read.parquet(s"$path/sigs").distinct()
      .join(dedupGraphRemoved(spark, path), Seq("id"), "left_anti")
  }

  /** Near-dup pairs from a [[buildDedupGraph]] artifact, takedowns
    * excluded on BOTH endpoints. distinct(): replayed appends can leave
    * duplicate rows; hamming is a pure function of the pair, so row-dedup
    * restores the exact relation.
    */
  def dedupGraphPairs(spark: SparkSession, path: String): DataFrame = {
    resolveSwappedDir(spark, s"$path/pairs")
    val rm = dedupGraphRemoved(spark, path)
    spark.read.parquet(s"$path/pairs").distinct()
      .join(rm.select(col("id").as("ia")), Seq("ia"), "left_anti")
      .join(rm.select(col("id").as("ib")), Seq("ib"), "left_anti")
  }

  /** (id, canonical_id) components from a [[buildDedupGraph]] artifact,
    * takedowns excluded. Between a takedown's tombstone landing and its
    * component REPAIR completing, a component held together only by a
    * removed doc still reads as merged — the conservative direction
    * (admission over-rejects, splits never invent false pairs).
    */
  def dedupGraphComponents(spark: SparkSession, path: String): DataFrame = {
    resolveSwappedDir(spark, s"$path/components")
    // tombstone contract (advisor r15): removed ids LEAVE the relation
    // entirely, whereas a live recomputation over the post-takedown pair
    // set would keep a removed doc as a singleton component. No consumer
    // observes the difference today (takedowns mutate a separate
    // artifact path); a reader that needs takedown-surviving singletons
    // must union the corpus id set back in as (id, id) rows.
    spark.read.parquet(s"$path/components").distinct()
      .join(dedupGraphRemoved(spark, path), Seq("id"), "left_anti")
  }

  /** Append a batch to an existing [[buildDedupGraph]] artifact — the
    * admission-time growth path: only the BATCH text is hashed; the
    * corpus contributes its saved signatures. New pairs are
    * batch-vs-batch plus batch-vs-corpus (found via the same pigeonhole
    * chunk join, batch side against the union). Components are then
    * REBUILT from the full pair relation — edge-sized work (dup
    * clusters), orders of magnitude below the text hashing this append
    * avoids, and the only way to stay exact when a new doc bridges two
    * existing components.
    *
    * Id contract: document ids must be UNIQUE across the corpus and
    * content-stable — re-appending an existing id with different text
    * stores a second signature under that id, and the component relation
    * then carries the id twice (possibly under two canonicals). Replays
    * of the SAME content are safe (duplicate rows collapse in the
    * readers); id reuse with new content is caller error.
    *
    * Crash ordering: sigs are appended FIRST. A crash before the pair
    * append leaves this batch's pairs missing (components under-merged)
    * but FUTURE batches still collide with this batch's signatures, so
    * admission keeps rejecting its near-dups — the conservative side.
    * Re-appending the same batch after restart is safe: duplicate sig
    * rows only add redundant candidates and the readers row-dedup.
    */
  def appendToDedupGraph(batch: DataFrame, idCol: String, textCol: String,
                         path: String): Unit = {
    val spark = batch.sparkSession
    val maxDist = spark.read.parquet(s"$path/meta").head().getInt(0)
    // re-admission clears the batch ids' tombstones FIRST, so a doc taken
    // down and later re-licensed can return through the normal append.
    // Crash after the clear is safe: any resurfaced physical rows carry
    // the SAME content by the id contract, and the re-run re-appends.
    val rmPath = new org.apache.hadoop.fs.Path(s"$path/removed")
    val fs = rmPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rmPath)) {
      rewriteViaTmp(spark.read.parquet(s"$path/removed").distinct()
        .join(batch.select(col(idCol).cast("long").as("id")).distinct(),
          Seq("id"), "left_anti"),
        s"$path/removed")
    }
    val corpusSigs = dedupGraphSigs(spark, path) // takedowns excluded
    val batchSigs = simhashFp30(batch, idCol, textCol)
      .localCheckpoint(false) // sig append + two join consumers
    batchSigs.write.mode("append").parquet(s"$path/sigs")
    val allChunks = explodeSigChunks(corpusSigs.unionByName(batchSigs))
    val newPairs = explodeSigChunks(batchSigs).as("a")
      .join(allChunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("ia"),
        greatest(col("a.id"), col("b.id")).as("ib"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    // batch-vs-corpus candidates surface once per side order; the
    // least/greatest canonicalization + distinct collapses them, and
    // batch-vs-batch pairs (both ends in the chunk join) likewise
    newPairs.write.mode("append").parquet(s"$path/pairs")
    val allSigs = dedupGraphSigs(spark, path)
    // components rebuild goes through the same tmp+rename swap: a plain
    // overwrite deletes the live dir before writing, and a crash mid-write
    // would leave partial components for concurrent admission probes
    rewriteViaTmp(nearDupGroupsStar(allSigs.select(col("id")), "id",
      dedupGraphPairs(spark, path)), s"$path/components")
    ()
  }

  /** Takedown path of the [[buildDedupGraph]] artifact — the operation a
    * real 100 TB pipeline needs the day a GDPR/DMCA request lands:
    * logically remove documents and REPAIR the component relation, since
    * removing a doc can SPLIT a component it was bridging (A—X—B with X
    * removed must become {A}, {B}, never stay {A, B}).
    *
    * Mechanics, mirroring [[appendToDedupGraph]]'s crash-ordering
    * discipline:
    *  1. Tombstones append FIRST (`path/removed`): every reader
    *     ([[dedupGraphSigs]]/[[dedupGraphPairs]]/[[dedupGraphComponents]])
    *     anti-joins them, so the removed docs vanish from admission
    *     probes and reports the moment this lands. A crash after step 1
    *     leaves components transiently OVER-merged (a bridge doc's
    *     endpoints still share a canonical) — the conservative side, and
    *     re-running the takedown repairs it; replays are idempotent
    *     (duplicate tombstone rows collapse in the reader).
    *  2. Component repair recomputes ONLY the affected components (those
    *     containing a removed id): their surviving members re-cluster
    *     over surviving pairs; untouched components pass through
    *     unread-modified. The recompute is takedown-neighborhood-sized,
    *     never corpus-sized — at 100 TB a takedown touches a handful of
    *     dup clusters.
    *
    * Physical bytes: sigs/pairs keep the tombstoned rows until
    * [[compactDedupGraph]] rewrites them (storage reclaim is a separate,
    * schedulable concern — the semantic removal is complete after this
    * call). The components rewrite stages through a tmp sibling
    * ([[rewriteViaTmp]]) because its plan reads the files it replaces —
    * bounded memory at any corpus size, re-runnable on any crash.
    */
  def removeFromDedupGraph(remove: DataFrame, idCol: String,
                           path: String): Unit = {
    val spark = remove.sparkSession
    val rm = remove.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(false) // tombstone write + three join consumers
    rm.write.mode("append").parquet(s"$path/removed")
    // components BEFORE this takedown's tombstones (the repair input must
    // still see the removed ids to find their components) — read raw
    val comps = spark.read.parquet(s"$path/components").distinct()
      .localCheckpoint(false) // affected + untouched + member scans
    val affected = comps.join(rm, Seq("id"), "left_semi")
      .select(col("canonical_id")).distinct()
    val members = comps.join(affected, Seq("canonical_id"), "left_semi")
      .join(rm, Seq("id"), "left_anti")
      .select(col("id"))
    // surviving pairs restricted to the affected neighborhood (the
    // reader already excludes removed endpoints)
    val pairs = dedupGraphPairs(spark, path)
    val subPairs = pairs
      .join(members.select(col("id").as("ia")), Seq("ia"), "left_semi")
      .join(members.select(col("id").as("ib")), Seq("ib"), "left_semi")
    val repaired = nearDupGroupsStar(members, "id", subPairs)
    val untouched = comps.join(affected, Seq("canonical_id"), "left_anti")
      .join(rm, Seq("id"), "left_anti") // stale tombstones from a replay
    rewriteViaTmp(untouched.select(col("id"), col("canonical_id"))
      .unionByName(repaired.select(col("id"), col("canonical_id"))),
      s"$path/components")
  }

  /** Rewrite `target` from a plan that READS `target`: stage to a tmp
    * sibling first, then RENAME-SWAP it in (demote live to `__prev`,
    * promote tmp, drop `__prev`). Bounded executor memory at any
    * relation size (unlike an eager in-memory checkpoint of a
    * corpus-sized frame).
    *
    * The swap replaces the earlier copy-overwrite, whose recovery story
    * was unsound: `read(tmp).write.overwrite(target)` deletes the live
    * dir first, and a crash mid-copy left a PARTIAL target that a re-run
    * would read as input — permanently dropping corpus signatures from
    * the artifact. With renames every crash window leaves either the old
    * dir (under `__prev`, rolled back by [[resolveSwappedDir]]) or the
    * new one complete; the readers resolve before reading.
    */
  private def rewriteViaTmp(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    resolveSwappedDir(spark, target) // recover a crashed prior swap first
    val tmp = target + "__rewrite"
    df.write.mode("overwrite").parquet(tmp) // plan may read target: untouched here
    swapInDir(spark, tmp, target)
  }

  /** Promote a fully-written `tmp` dir over `target` by renames only. */
  private def swapInDir(spark: SparkSession, tmp: String, target: String): Unit = {
    val t = new org.apache.hadoop.fs.Path(target)
    val prev = new org.apache.hadoop.fs.Path(target + "__prev")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(prev)) fs.delete(prev, true) // leftover from an old crash
    def renameOrFail(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
      require(fs.rename(src, dst),
        s"filesystem rename $src -> $dst returned false — failing the " +
          "artifact rewrite loudly instead of silently losing it")
    if (fs.exists(t)) renameOrFail(t, prev)
    renameOrFail(new org.apache.hadoop.fs.Path(tmp), t)
    if (fs.exists(prev)) fs.delete(prev, true)
    ()
  }

  /** Roll back a crash between [[swapInDir]]'s demote and promote: the
    * live dir is missing but its `__prev` backup exists. Readers call
    * this so an admission probe after a mid-swap crash sees the old
    * artifact (the interrupted rewrite simply re-runs) instead of
    * failing on a missing dir.
    */
  private def resolveSwappedDir(spark: SparkSession, target: String): Unit = {
    val t = new org.apache.hadoop.fs.Path(target)
    val prev = new org.apache.hadoop.fs.Path(target + "__prev")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(t) && fs.exists(prev))
      require(fs.rename(prev, t), s"crash-recovery rename $prev -> $t returned false")
    ()
  }

  /** Physical compaction of a [[buildDedupGraph]] artifact: rewrite
    * sigs/pairs without tombstoned rows and clear the tombstone log —
    * the storage-reclaim half of [[removeFromDedupGraph]], schedulable
    * whenever (semantics never depend on it). Rewrites stage through a
    * tmp sibling ([[rewriteViaTmp]]) so executor memory stays bounded at
    * any corpus size; the tombstone log is deleted LAST, so a crash
    * mid-compaction only leaves already-excluded rows for the re-run.
    */
  def compactDedupGraph(spark: SparkSession, path: String): Unit = {
    rewriteViaTmp(dedupGraphSigs(spark, path), s"$path/sigs")
    rewriteViaTmp(dedupGraphPairs(spark, path), s"$path/pairs")
    val p = new org.apache.hadoop.fs.Path(s"$path/removed")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Duplicated-PASSAGE screen via winnowing fingerprints (the MOSS
    * document-fingerprinting scheme: Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
    * — catches long verbatim passages shared across documents that
    * whole-document jaccard misses (two long articles quoting the same
    * boilerplate paragraph sit far below any doc-level tau).
    *
    * Per document: hash every k-token shingle with the engine-portable
    * rolling fingerprint, slide a w-wide window over consecutive shingle
    * hashes, and keep the DISTINCT window minima as the document's
    * passage fingerprints (winnowing-by-value). Guarantee: a verbatim
    * run of >= k+w-1 shared tokens spans at least one full common hash
    * window, so both documents keep its minimum — every sufficiently
    * long shared passage is caught while only ~|shingles|/dup-run
    * minima (distinct window minima collapse across overlapping
    * windows) are ever indexed.
    *
    * Output: (id, n_fp, n_shared, shared_permille) per document with at
    * least one shingle — n_shared counts fingerprints appearing in >= 2
    * documents. Scale shape: fingerprint selection is map-only column
    * arithmetic; the only shuffles are the fingerprint-frequency agg and
    * the join back — both keyed on the winnowed minima, a small fraction
    * of the shingle stream. Every arithmetic step is replayed bit-for-bit
    * by the DuckDB oracle (q76).
    */
  def repeatedPassages(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 6, w: Int = 5): DataFrame =
    repeatedPassagesFromFp(winnowedDocFp(df, idCol, textCol, k, w))

  /** [[repeatedPassages]] over a precomputed (id, fp) winnow relation —
    * shared with the [[buildWinnowFpIndex]] artifact path so corpus
    * fingerprints hash once per generation, not once per report.
    */
  private[graft] def repeatedPassagesFromFp(docFp: DataFrame): DataFrame = {
    // per-doc distinct fps, so count(*) counts documents
    val shared = docFp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("fp"), lit(1L).as("__hit"))
    docFp.join(shared, Seq("fp"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .select(col("id"), col("n_fp"), col("n_shared"),
        call_function("div", col("n_shared") * 1000, col("n_fp")).as("shared_permille"))
  }

  /** Parquet-backed winnow-fingerprint index at `path` — the passage-
    * level sibling of [[buildDedupGraph]]: one corpus-generation job
    * hashes every document's winnowed fingerprints ([[winnowedDocFp]]),
    * and every consumer (repeated-passage scoring, pair attribution,
    * contamination screens) is then a parquet scan of (id, fp) rows.
    * Layout: path/fps (id, fp), path/meta (k, w).
    */
  def buildWinnowFpIndex(corpus: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int, path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    winnowedDocFp(corpus, idCol, textCol, k, w)
      .write.mode("overwrite").parquet(s"$path/fps")
    Seq((k, w)).toDF("k", "w").write.mode("overwrite").parquet(s"$path/meta")
    ()
  }

  /** (id, fp) rows from a [[buildWinnowFpIndex]] artifact. distinct():
    * replayed writes can duplicate rows; the relation is distinct by
    * construction, so row-dedup restores it exactly.
    */
  def winnowFps(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/fps").distinct()

  /** The winnowing fingerprint-selection stage shared by
    * [[repeatedPassages]] and [[repeatedPassagePairs]]: one (id, fp) row
    * per DISTINCT winnowed minimum per document. Checkpointed — every
    * caller consumes it at least twice.
    *
    * Two-stage rolling hash: each TOKEN is fingerprinted once (chars
    * walked once per token), then each position combines k token
    * fingerprints with the same (acc*31+x) mod 1e9+7 rule — k-times
    * cheaper than hashing concatenated shingle strings (no string
    * building, no re-walking shared characters) and still replayed
    * step for step by the SQL oracle. acc < 2^30, so acc*31+x < 2^36
    * — exact in int64.
    */
  private def winnowedDocFp(df: DataFrame, idCol: String, textCol: String,
                            k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val M = 1000000007L
    val tokFp = transform(split(col(textCol), " "),
      t => graft.functions.Converters.fingerprint64(t))
    val cnt = size(col("__tfp")) - (k - 1)
    val fpArr = when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        aggregate(slice(col("__tfp"), i, lit(k)), lit(0L),
          (acc, x) => (acc * 31 + x) % M)))
      .otherwise(array().cast("array<bigint>"))
    val L = size(col("__fp"))
    // one window per start position; a doc with fewer than w shingles
    // contributes its single overall minimum (slice clamps at the end)
    val wins = transform(sequence(lit(1), greatest(L - (w - 1), lit(1))),
      j => array_min(slice(col("__fp"), j, lit(w))))
    df.repartition(col(idCol))
      .select(col(idCol).as("id"), tokFp.as("__tfp"))
      .select(col("id"), fpArr.as("__fp"))
      .filter(L >= 1)
      .select(col("id"), explode(array_distinct(wins)).as("fp"))
      // at least two consumers downstream; tiny winnowed set
      .localCheckpoint(false)
  }

  /** Passage-level ATTRIBUTION: which documents share which repeated
    * passage. [[repeatedPassages]] scores each document's duplicated-
    * passage fraction but never names the other side; this emits the
    * actionable pair list (ia, ib, n_shared_fp) — every unordered
    * document pair sharing at least one winnowed passage fingerprint,
    * with the number of distinct fingerprints they share (ia < ib).
    *
    * Hot fingerprints (boilerplate shared by half the corpus — cookie
    * banners, licence headers) would blow the pair stream up
    * quadratically, so fingerprints in more than `maxDocsPerFp`
    * documents are EXCLUDED, the same frequency cap the boilerplate-
    * removal pass applies to hot lines: a fingerprint that common is
    * corpus boilerplate, not a passage match worth attributing. The
    * per-fp pair fan-out is therefore bounded by maxDocsPerFp², and the
    * whole pair stream by |shared fps| x maxDocsPerFp² — never by
    * corpus².
    *
    * Scale shape: fingerprint selection is map-only; the eligible-fp
    * filter is one agg on fp; the self-join is an equi-join on fp over
    * the capped fingerprint table; the final agg is keyed on the pair.
    * No all-pairs stage anywhere.
    */
  def repeatedPassagePairs(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 6, w: Int = 5,
                           maxDocsPerFp: Int = 64): DataFrame =
    repeatedPassagePairsFromFp(winnowedDocFp(df, idCol, textCol, k, w), maxDocsPerFp)

  /** [[repeatedPassagePairs]] over a precomputed (id, fp) winnow relation
    * (see [[buildWinnowFpIndex]]).
    */
  private[graft] def repeatedPassagePairsFromFp(docFp: DataFrame,
                                                maxDocsPerFp: Int): DataFrame = {
    require(maxDocsPerFp >= 2, s"need maxDocsPerFp >= 2, got $maxDocsPerFp")
    val eligible = docFp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2 && col("n_docs") <= maxDocsPerFp)
      .select(col("fp"))
    val e = docFp.join(eligible, Seq("fp"))
    e.as("a").join(e.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ia"), col("b.id").as("ib"))
      .agg(count(lit(1)).as("n_shared_fp"))
  }

  /** Benchmark-contamination screen: per corpus document, how many of its
    * distinct word n-gram shingles appear anywhere in a benchmark corpus —
    * the train/test decontamination step of a training-data pipeline (the
    * "13-gram overlap" family of checks). Output:
    * (id, n_shingles, n_hits, hit_permille), integer arithmetic only.
    *
    * Scale shape: the benchmark side is tiny relative to a 100 TB corpus,
    * so its deduplicated shingle set is BROADCAST and the membership probe
    * is a map-side join; per-document counts partial-aggregate before the
    * one shuffle on the document id. The corpus is scanned exactly once.
    */
  def ngramContamination(docs: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    val docSh = shingles(docs, idCol, textCol, n)
    val benchSh = broadcast(
      shingles(bench, idCol, textCol, n).select(col("shingle")).distinct()
        .withColumn("__hit", lit(1L)))
    docSh.join(benchSh, Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("id"), col("n_shingles"), col("n_hits"),
        call_function("div", col("n_hits") * 1000, col("n_shingles")).as("hit_permille"))
  }

  /** [[ngramContamination]] for benchmark sets TOO BIG TO BROADCAST as a
    * shingle table: probe the corpus against Spark's native Bloom filter
    * (the `BloomFilterAggregate` sketch the optimizer's runtime-filter
    * injection uses), then EXACT-verify only the candidates with the
    * real join. The bloom is a fixed-size binary (mBits bits however
    * many shingles the benchmark has) built by a map-side-combinable
    * aggregate; false positives cost verify work only and false
    * negatives cannot happen, so the output is bit-identical to
    * [[ngramContamination]] — approximate pruning, exact answer. The
    * shuffled verify join then moves only `hits + epsilon` rows instead
    * of every corpus shingle. (The hand-rolled [[bloomBitset]] family is
    * the engine-portable doc-level variant; this one rides the native
    * codegen'd sketch at shingle grain.)
    */
  def bloomNgramContamination(docs: DataFrame, bench: DataFrame,
                              idCol: String, textCol: String, n: Int,
                              expectedItems: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    // 8 bits/item ~ 2% fp; the aggregate rejects numBits beyond the
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits cap (2^26 by
    // default) with an opaque error — fail here with the actionable one
    require(expectedItems <= (1L << 23),
      s"expectedItems=$expectedItems needs ${expectedItems * 8} bloom bits, over the " +
        "default 2^26 runtime-filter cap; raise spark.sql.optimizer.runtime.bloomFilter.maxNumBits " +
        "and split the build, or shard the benchmark side")
    // two consumers each: bloom build + verify join / denominator + probe
    val benchSh = shingles(bench, idCol, textCol, n).select(col("shingle"))
      .distinct().localCheckpoint(false)
    val docSh = shingles(docs, idCol, textCol, n).localCheckpoint(false)
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(col("shingle"))),
      Literal(expectedItems), Literal(expectedItems * 8L))
    val bloom = benchSh.agg(
      GraftBridge.column(agg.toAggregateExpression()).as("__bf"))
    // might_contain demands a constant/scalar-subquery bloom operand —
    // the same wiring InjectRuntimeFilter uses; the subquery runs once
    val candidates = docSh
      .filter(GraftBridge.column(BloomFilterMightContain(
        GraftBridge.scalarSubquery(bloom),
        GraftBridge.expression(xxhash64(col("shingle"))))))
      .select(col("id"), col("shingle"))
    val hits = candidates.join(benchSh, Seq("shingle"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    docSh.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        call_function("div", coalesce(col("n_hits"), lit(0L)) * 1000,
          col("n_shingles")).as("hit_permille"))
  }

  /** Deterministic Bloom bitset of a corpus's content hashes, as ONE row
    * with an (word-index -> 64-bit word) map — the broadcastable "seen"
    * summary for [[bloomNewDocuments]]. kHashes bit positions per
    * document via seed-varied xxhash64; the bitset build is a map-side-
    * combinable bit_or aggregate over at most mBits/64 word keys, so the
    * single assembled row is bounded by the FILTER SIZE (mBits/8 bytes —
    * 128 KiB at the default 2^20 bits), never by the corpus. At 100 TB
    * build it once per corpus generation and persist/broadcast it across
    * batches (same amortization contract as [[buildMinhashIndex]]).
    */
  def bloomBitset(seen: DataFrame, textCol: String,
                  mBits: Int = 1 << 20, kHashes: Int = 5): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(kHashes >= 1, s"need kHashes >= 1, got $kHashes")
    val pos = array(bloomPositions(col(textCol), mBits, kHashes): _*)
    seen.select(explode(pos).as("__p"))
      .select((col("__p") / 64).cast("long").as("__w"),
        call_function("shiftleft", lit(1L), (col("__p") % 64).cast("int")).as("__bit"))
      .groupBy(col("__w")).agg(call_function("bit_or", col("__bit")).as("__word"))
      .groupBy()
      .agg(map_from_entries(sort_array(collect_list(struct(col("__w"), col("__word"))))).as("__bloom"))
  }

  /** Bloom-prefiltered incremental exact dedup — same RESULT as
    * [[exactNewDocuments]] (rows of `newDf` whose content hash is not in
    * `seenDf`), with the scale shape that function's scaladoc promises:
    * the corpus is never shuffled. A Bloom probe (pure column
    * arithmetic against the broadcast one-row bitset — no UDF) splits
    * the batch:
    *   - bloom-NEGATIVE rows have no false negatives, so they are
    *     admitted immediately, join-free — at a growing corpus's typical
    *     mostly-novel batch mix, that is most of the batch;
    *   - bloom-POSITIVE rows (true dups + ~0.1 % false positives at the
    *     default m=2^20/k=5 for corpora up to ~10^5 docs; size mBits for
    *     the real corpus cardinality) are exactly verified: the corpus
    *     is scanned map-side against the BROADCAST candidate hash set
    *     (inner join, corpus side streamed, never shuffled), and the
    *     surviving hits anti-join the candidates — both joins broadcast.
    * Result is exact regardless of the false-positive rate; the Bloom
    * only decides who pays for verification. The bitset itself is built
    * here per call (one corpus scan); amortize with [[bloomBitset]] +
    * a persisted/cached bitset row across batches.
    */
  /** The kHashes bit positions of one document in an mBits Bloom filter
    * (seed-varied xxhash64) — shared by build and probe so they can
    * never disagree.
    */
  private[graft] def bloomPositions(text: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map(j => pmod(xxhash64(text, lit(j)), lit(mBits.toLong)))

  /** Bloom membership probe as pure column arithmetic. `wordAt` maps a
    * word index (0-based long) to the 64-bit word column — a map lookup
    * for [[bloomBitset]] rows, an array element for a driver-held dense
    * bitset (see StatefulOps.streamingExactNovelDocuments).
    */
  private[graft] def bloomMight(text: Column, wordAt: Column => Column,
                                mBits: Int, kHashes: Int): Column =
    bloomPositions(text, mBits, kHashes).map { p =>
      (call_function("shiftright", wordAt((p / 64).cast("long")),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L)
    }.reduce(_ && _)

  def bloomNewDocuments(newDf: DataFrame, seenDf: DataFrame, textCol: String,
                        mBits: Int = 1 << 20, kHashes: Int = 5): DataFrame = {
    require(!newDf.columns.contains("__h"),
      "newDf may not already carry the internal column __h")
    val bits = bloomBitset(seenDf, textCol, mBits, kHashes)
    // try_element_at: ANSI-safe null (not an error) on a missing word key
    val might = bloomMight(col(textCol),
      w => coalesce(try_element_at(col("__bloom"), w), lit(0L)), mBits, kHashes)
    val probed = newDf.crossJoin(broadcast(bits))
      .withColumn("__might", might).drop("__bloom")
      .localCheckpoint(false) // two consumers (negative/positive split)
    val definiteNew = probed.filter(!col("__might")).drop("__might")
    val maybe = probed.filter(col("__might")).drop("__might")
      .withColumn("__h", md5(col(textCol)))
    val candidates = maybe.select(col("__h")).distinct()
    val hits = seenDf.select(md5(col(textCol)).as("__h"))
      .join(broadcast(candidates), Seq("__h")).distinct()
    val trulyNew = maybe.join(broadcast(hits), Seq("__h"), "left_anti").drop("__h")
    definiteNew.unionByName(trulyNew)
  }

  /** Edit-distance-verified fuzzy dedup: SimHash pigeonhole candidates
    * (guaranteed recall at Hamming <= maxDist) verified with EXACT
    * Levenshtein distance, reported as a permille of the longer text —
    * the character-level near-dup screen that catches small edits
    * n-gram Jaccard dilutes away. Output:
    * (ia, ib, lev, lev_permille) for pairs at or under `maxPermille`.
    *
    * Levenshtein is quadratic per pair, so it NEVER runs on the corpus —
    * only on the candidate pairs the banded screen emits (bounded by
    * collisions, not corpus²); texts join onto candidates by id, and
    * the verify itself is row-local codegen (`levenshtein` is built in,
    * identical DP in every engine — exact oracle parity).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int = 3,
                        maxPermille: Long = 200L): DataFrame =
    editDistancePairsFromCands(df,
      simhashExactPairs(df, idCol, textCol, maxDist).select(col("ia"), col("ib")),
      idCol, textCol, maxPermille)

  /** The Levenshtein-verify half of [[editDistancePairs]] over a
    * precomputed (ia, ib) candidate relation — e.g. the pair table of a
    * [[buildDedupGraph]] artifact, so admission-time fuzzy screens skip
    * the signature rebuild.
    */
  private[graft] def editDistancePairsFromCands(df: DataFrame, cands0: DataFrame,
                                                idCol: String, textCol: String,
                                                maxPermille: Long): DataFrame = {
    val cands = cands0.select(col("ia"), col("ib"))
    val t = df.select(col(idCol).as("__id"), col(textCol).as("__tx"))
    cands
      .join(t.as("ta"), col("ia") === col("ta.__id"))
      .join(t.as("tb"), col("ib") === col("tb.__id"))
      .select(col("ia"), col("ib"),
        levenshtein(col("ta.__tx"), col("tb.__tx")).cast("long").as("lev"),
        greatest(length(col("ta.__tx")), length(col("tb.__tx"))).cast("long").as("__len"))
      .filter(col("__len") > 0)
      .select(col("ia"), col("ib"), col("lev"),
        call_function("div", col("lev") * 1000, col("__len")).as("lev_permille"))
      .filter(col("lev_permille") <= maxPermille)
  }

  /** Cross-document EXACT repeated-span removal (the C4 "any three-sentence
    * span seen before is dropped" family, at k-token granularity): every
    * k-token span whose fingerprint occurs in >= 2 distinct documents is
    * kept only by its first-seen document (min id) and the covered tokens
    * are REMOVED from every other document's text. Within-doc repeats in
    * the owning document are untouched — this pass targets cross-document
    * contamination, not local repetition ([[graft.operators.TextOps.dedupSegmentsWithin]]
    * covers that). Output: (id, n_tokens, n_removed, clean_text).
    *
    * Span fingerprints reuse the winnowing two-stage rolling hash
    * ([[winnowedDocFp]]): per-token fingerprint once, then a k-token
    * combine with (acc*31+x) mod 1e9+7 — acc < 2^30 so int64-exact, and
    * the SQL oracle replays it step for step.
    *
    * Scale shape: the exploded (id, pos, h) span index is the only big
    * relation; it is localCheckpoint'd once (24 B/row — far smaller than
    * the text it indexes) because two consumers need it (the owner
    * aggregation and the banned-span join). Ownership is one groupBy(h);
    * the banned join is an equi-join on h; the rebuild is a row-local
    * lambda over the original text, re-read column-pruned from the
    * source. No all-pairs stage, no global window, no driver loop.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8): DataFrame = {
    val banned = bannedSpanStarts(df, idCol, textCol, k)
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .join(banned, Seq("id"), "left")
      .select(col("id"), col("__toks"),
        coalesce(col("__starts"), array().cast("array<int>")).as("__starts"))
      .select(col("id"), size(col("__toks")).as("n_tokens"),
        filter(col("__toks"), (_, i) =>
          not(exists(col("__starts"),
            s => i + 1 >= s && i + 1 <= s + lit(k) - 1))).as("__kept"))
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - size(col("__kept"))).as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean_text"))
  }

  /** The shared front half of the exact span-dedup family: (id, pos) of
    * every 1-based k-token span start whose fingerprint occurs in >= 2
    * distinct documents, in every document EXCEPT the first-seen (min id)
    * owner. Span identity is a TWO-LANE fingerprint (round 12): per-token
    * [[graft.functions.Converters.fingerprint64]]/[[graft.functions.Converters.fingerprintB]]
    * lanes, each combined over the k tokens with its own (mult, modulus)
    * roll — (acc*31+x) mod 1e9+7 and (acc*1000003+x) mod 998244353 — and
    * packed as h1*998244353 + h2 (< 2^60, int64-exact, SQL-replayable).
    * One 30-bit lane birthday-collides at ~45k distinct spans, and since
    * this family REMOVES text on fingerprint equality alone (no exact
    * verify — the whole point is never materializing cross-doc span
    * text), a collision was destructive; two independent lanes put the
    * expected collision count at corpus scale below 1e-4. The exploded
    * span index is localCheckpoint'd once because the owner aggregation
    * and the banned join both consume it; everything else is equi-joins
    * and one groupBy(h).
    */
  private def bannedSpanStarts(df: DataFrame, idCol: String, textCol: String,
                               k: Int): DataFrame = {
    require(k >= 2, s"need span length k >= 2, got $k")
    val M1 = 1000000007L
    val M2 = 998244353L
    val tokFp1 = transform(split(col(textCol), " "),
      t => graft.functions.Converters.fingerprint64(t))
    val tokFp2 = transform(split(col(textCol), " "),
      t => graft.functions.Converters.fingerprintB(t))
    val cnt = size(col("__tfp1")) - (k - 1)
    val spanArr = when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        aggregate(slice(col("__tfp1"), i, lit(k)), lit(0L),
          (acc, x) => (acc * 31 + x) % M1) * M2 +
          aggregate(slice(col("__tfp2"), i, lit(k)), lit(0L),
            (acc, x) => (acc * 1000003 + x) % M2)))
      .otherwise(array().cast("array<bigint>"))
    val ex = df.repartition(col(idCol))
      .select(col(idCol).as("id"), tokFp1.as("__tfp1"), tokFp2.as("__tfp2"))
      .select(col("id"), posexplode(spanArr))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("h"))
      .localCheckpoint(false)
    val owners = ex.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("__nd"), min(col("id")).as("owner"))
      .filter(col("__nd") >= 2)
      .select(col("h"), col("owner"))
    ex.join(owners, Seq("h"))
      .filter(col("id") =!= col("owner"))
      .select(col("id"), col("pos"))
  }

  /** Variable-length MAXIMAL repeated-span extraction — the
    * "deduplicate any repeat above a minimum length" semantics of
    * Lee et al. 2022 (Deduplicating Training Data Makes Language Models
    * Better, ExactSubstr), seeded at k-token granularity: a repeated
    * region of L >= k tokens yields L-k+1 consecutive banned k-span
    * starts, and two banned starts s1 < s2 cover contiguous tokens iff
    * s2 <= s1 + k — merging those runs reconstructs the maximal region,
    * so a 200-token verbatim quote reports as ONE (span_start, span_end,
    * span_len=200) row, not 193 overlapping k-spans. Positions are
    * 1-based inclusive token indexes in the non-owner document.
    *
    * Scale shape: identical to [[removeRepeatedSpans]] through the
    * banned-start relation (span index checkpointed once, equi-joins
    * only); the interval merge is gaps-and-islands — one id-partitioned
    * window (lag + running conditional sum) + one (id, island) groupBy,
    * no self-join, no global window, state bounded per document.
    */
  def maximalRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    bannedSpanStarts(df, idCol, textCol, k)
      .withColumn("__prev", lag(col("pos"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("pos") > col("__prev") + k, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(w))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (k - 1)).cast("long").as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"))
  }

  /** EXACT edit-distance pairs (Levenshtein <= `maxDist`) over SHORT
    * strings via the FastSS deletion neighborhood (Bocek et al. 2007):
    * every string is indexed under all variants obtainable by deleting up
    * to `maxDist` characters, pairs collide through a variant equi-join,
    * and the exact Levenshtein verify runs on candidates only. Recall is
    * GUARANTEED: for lev(a,b) <= k, deleting the aligned edit positions
    * (substituted/deleted on a's side, substituted/inserted on b's) leaves
    * equal strings of <= k deletions each — so every qualifying pair
    * shares a variant. Output: (ia, ib, sa, sb, lev) with ia < ib.
    *
    * Meant for compact codes — event-type journeys, state sequences, short
    * SKUs — where each string yields C(maxLen, <=maxDist) index keys (37
    * for 8/2): the index is a constant blowup of the input, the join is the
    * only shuffle, and the verify is a row-local DP on <= maxLen chars.
    * Both `maxDist` and `maxLen` are require-bounded because the key count
    * is combinatorial; hot variants are the residual skew dial (AQE
    * territory). Strings longer than `maxLen` fail loudly (raise_error)
    * rather than silently losing recall.
    */
  def fastSsPairs(df: DataFrame, idCol: String, strCol: String,
                  maxDist: Int = 2, maxLen: Int = 8): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"deletion-neighborhood size is C(maxLen, maxDist)-combinatorial; supported maxDist is 1..2, got $maxDist")
    require(maxLen >= 1 && maxLen <= 16,
      s"keys per row = sum C(maxLen, 0..maxDist); supported maxLen is 1..16, got $maxLen")
    // variant of __s with the (1-indexed, ascending) positions ps deleted:
    // concat of the kept runs; substring() with a non-positive length
    // yields "" so adjacent deletions need no special case
    def variant(ps: Seq[Int]): Column = {
      val starts = 1 +: ps.map(_ + 1)
      val ends = ps.map(_ - 1)
      val parts = starts.zip(ends).map { case (st, en) =>
        substring(col("__s"), st, en - st + 1)
      } :+ substring(col("__s"), starts.last, maxLen)
      concat(parts: _*)
    }
    val masks = (0 to maxDist).flatMap(k => (1 to maxLen).combinations(k))
    val guarded = when(length(col(strCol)) > maxLen,
        raise_error(concat(lit(s"fastSsPairs: string longer than maxLen=$maxLen: "),
          col(strCol))))
      .otherwise(col(strCol))
    val keyed = df.select(col(idCol).as("id"), guarded.as("__s"))
      .select(col("id"), col("__s"),
        explode(array_distinct(array(masks.map(variant): _*))).as("__v"))
      .localCheckpoint(false) // both sides of the variant equi-join
    keyed.as("a").join(keyed.as("b"),
        col("a.__v") === col("b.__v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        col("a.__s").as("sa"), col("b.__s").as("sb"))
      .distinct() // pairs colliding on several variants verify once
      .withColumn("lev", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("lev") <= maxDist)
  }
}
