package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with the query side broadcast — the
  * candidate side streams through executors, so the operator scales to any
  * corpus size as long as the query batch is broadcastable. Scale path: IVF
  * partitioning (coarse quantizer -> per-cell search) cuts the scanned
  * fraction to ~nprobe/ncells.
  */
object SimilarityOps {
  /** Cast to double once; all distance math stays in codegen'd
    * higher-order functions (no UDF).
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd allocation-free kernel (graft.functions.DoubleArrayDot). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.DoubleArrayDot(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** ROW-LOCAL k-means assignment against driver-collected centroids
    * (r15): the centroid set is parameter-bounded (k x dim), so it rides
    * into the plan as expression literals and the argmin is a pure
    * projection — no broadcast fan-out, no post-fanout corpus shuffle.
    * r16: one codegen'd loop ([[graft.functions.KmeansArgminLong]])
    * instead of the HOF chain (transform/aggregate/zip_with are
    * CodegenFallback — 16 interpreted lambda folds per row per round at
    * k=16). Arithmetic and (d2 asc, c_id asc) tie-break are identical to
    * both prior forms (`min_by(c_id, struct(d2, c_id))`, then
    * `array_min` over struct) — SimilaritySpec pins bit-equality with
    * the HOF form. Integer (2^20 fixed-point) variant.
    */
  private def argminCellLong(cents: Array[(Long, Array[Long])], xs: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.KmeansArgminLong(
      org.apache.spark.sql.GraftBridge.expression(xs),
      cents.map(_._1).toSeq, cents.map(_._2.toSeq).toSeq))

  /** [[argminCellLong]]'s double variant (the IVF build's raw-vector
    * distance): same left-to-right accumulation order, same tie-break.
    */
  private def argminCellDouble(cents: Array[(Long, Array[Double])], v: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.KmeansArgminDouble(
      org.apache.spark.sql.GraftBridge.expression(v),
      cents.map(_._1).toSeq, cents.map(_._2.toSeq).toSeq))

  /** Brute-force cosine top-k: for every query vector (filter `queryPred`),
    * the k nearest other vectors. Similarity is rounded to `roundDigits`
    * before ranking so results are reproducible across engines; ties break
    * on neighbor id.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryPred: Column, k: Int, roundDigits: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scoredQueryPairs(emb, idCol, vecCol, queryPred, roundDigits)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The shared query-vs-corpus scored relation of [[cosineTopK]] and
    * [[hardNegativeTopK]]: queries (filter `queryPred`, evaluated against
    * the caller's own columns before the internal renames) broadcast
    * against the streaming candidate corpus, cosine floored at
    * `roundDigits` for engine-stable ranking. Factored so the two rank
    * consumers cannot drift on the quantization/zero-norm contract.
    */
  private def scoredQueryPairs(emb: DataFrame, idCol: String, vecCol: String,
                               queryPred: Column, roundDigits: Int): DataFrame = {
    val base = emb.withColumn("__is_q", queryPred)
      .select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"), col("__is_q"))
      .withColumn("nrm", l2Norm(col("v")))
    val q = base.filter(col("__is_q"))
      .select(col("vid").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val joined = base.drop("__is_q").join(broadcast(q), col("vid") =!= col("q_id"))
    val factor = math.pow(10, roundDigits)
    val sim = floor(dot(col("qv"), col("v")) / (col("qn") * col("nrm")) * factor) / factor
    joined.select(col("q_id"), col("vid").as("neighbor_id"), sim.as("sim"))
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE
    * negative-sampling step): for each query, the k HIGHEST-similarity
    * candidates that are NOT near-duplicates (floored sim < dupTau) — the
    * closest-non-positive band where contrastive gradients carry the most
    * signal; sampling uniformly instead is the classic easy-negative
    * mistake. The dup screen runs BEFORE ranking, so a query surrounded
    * by duplicates still yields k true negatives.
    *
    * Scale shape: identical to [[cosineTopK]] — query batch broadcast,
    * candidate corpus streams (never shuffled), group-partitioned rank
    * window; the dup exclusion is the same row-local floored-cosine
    * compare, so no join against a dup-pair relation is needed (the
    * exclusion criterion IS the similarity threshold, mirroring
    * [[cosineNearDupPairs]]'s tau convention).
    */
  def hardNegativeTopK(emb: DataFrame, idCol: String, vecCol: String,
                       queryPred: Column, k: Int, dupTau: Double,
                       roundDigits: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scoredQueryPairs(emb, idCol, vecCol, queryPred, roundDigits)
      .filter(col("sim") < dupTau) // dup screen BEFORE ranking (see scaladoc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with similarity >=
    * tau (quantized with engine-stable floor). Exact all-pairs at a low
    * threshold is inherently O(n^2) *compute* — no metric pruning exists at
    * tau ~ 0.45 — so the scale lever is distributing that compute with
    * bounded memory: a triangle-blocked self-join. Vectors hash into
    * `nBlocks` blocks; the (bi <= bj) block-pair grid is broadcast (it is
    * B^2/2 tiny rows), and each of the ~B^2/2 tasks compares one
    * (n/B)x(n/B) tile. No full-corpus broadcast, shuffle keyed on block id,
    * per-task memory ~ 2n/B vectors. Pick nBlocks ~ sqrt(2 * parallelism)
    * at scale; for approximate-but-subquadratic dedup at high tau use
    * [[rpLshNearDupPairs]] instead.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         tau: Double, nBlocks: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("blk", pmod(hash(col("vid")), lit(nBlocks)))
    val blockPairs = (for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j))
      .toDF("bi", "bj")
    val a = base.select(col("vid").as("ida"), col("v").as("va"), col("nrm").as("na"), col("blk").as("ba"))
    val b = base.select(col("vid").as("idb"), col("v").as("vb"), col("nrm").as("nb"), col("blk").as("bb"))
    // same-block tiles order by id; cross-block tiles take every (a, b) pair
    // once (bi < bj) and normalize the id order afterwards — dot products
    // commute term-by-term, so the swap is float-exact.
    val cands = a.join(broadcast(blockPairs), col("ba") === col("bi"))
      .join(b, col("bb") === col("bj") && (col("bi") < col("bj") || col("ida") < col("idb")))
    val sim = floor(dot(col("va"), col("vb")) / (col("na") * col("nb")) * 10000.0) / 10000.0
    cands
      .select(least(col("ida"), col("idb")).as("ia"),
        greatest(col("ida"), col("idb")).as("ib"), sim.as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Deterministic random hyperplanes via an LCG (stable across JVMs). */
  private def hyperplanes(nBits: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 20240812L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(nBits)(Seq.fill(dim)(next()))
  }

  /** Random-projection LSH near-dup candidates with exact-cosine
    * verification — the scale path for embedding dedup when the corpus is
    * too large to broadcast. Sound only for genuinely close pairs: a
    * `bandBits`-bit band collides with probability (1-theta/pi)^bandBits,
    * so recall is ~1 for cosine >= ~0.9 with the defaults but collapses
    * for distant pairs — use [[cosineNearDupPairs]] when the threshold is
    * low and the corpus is broadcastable.
    */
  def rpLshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                        tau: Double, dim: Int,
                        nBands: Int = 32, bandBits: Int = 8): DataFrame = {
    val planes = typedlit(hyperplanes(nBands * bandBits, dim))
    val base = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val bits = transform(planes, h => (dot(h, col("v")) > 0).cast("int"))
    val withBits = base.withColumn("bits", bits)
    val bandStructs = (0 until nBands).map(b =>
      struct(lit(b).as("band"), slice(col("bits"), b * bandBits + 1, bandBits).as("sig")))
    // checkpoint barrier: the self-join consumes the exploded relation as
    // BOTH sides and Spark has no ReusedExchange across join children —
    // without it the full nBands*bandBits hyperplane signing (the
    // operator's dominant cost) executes twice (same discipline as
    // hammingPairs64/lshCandidatePairs/fastSsPairs)
    val exploded = withBits.select(col("vid"), explode(array(bandStructs: _*)).as("bs"))
      .localCheckpoint(false)
    val cands = exploded.as("a").join(exploded.as("b"),
        col("a.bs") === col("b.bs") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("ia"), col("b.vid").as("ib"))
      .distinct()
    val sides = base.select(col("vid"), col("v"), col("nrm"))
      .localCheckpoint(false) // two verify-side joins: norm pass runs once
    val sim = floor(dot(col("va"), col("vb")) / (col("na") * col("nb")) * 10000.0) / 10000.0
    cands
      .join(sides.select(col("vid").as("ia"), col("v").as("va"), col("nrm").as("na")), Seq("ia"))
      .join(sides.select(col("vid").as("ib"), col("v").as("vb"), col("nrm").as("nb")), Seq("ib"))
      .select(col("ia"), col("ib"), sim.as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the evaluation harness for the IVF/LSH operators. Both inputs are
    * (q_id, neighbor_id, rank<=k) shaped. Single-pass: one left join + one
    * aggregation, so each (potentially expensive) input pipeline executes
    * exactly once — a hit-semi-join + a separate totals aggregation would
    * re-execute the whole exact pipeline per consumer.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    // distinct on the probe side: a duplicate (q_id, neighbor_id) in
    // approx would fan the left join out and inflate BOTH recall terms
    // (top-k producers are duplicate-free, but raw candidate lists are
    // not); the result stays exactly |exact ∩ approx| / |exact|
    val marked = exact.select(col("q_id"), col("neighbor_id"))
      .join(approx.select(col("q_id"), col("neighbor_id")).distinct()
        .withColumn("__hit", lit(1)),
        Seq("q_id", "neighbor_id"), "left")
    marked.groupBy(col("q_id"))
      .agg((count(col("__hit")).cast("double") / count(lit(1))).as("recall"))
  }

  /** IVF-style approximate search: assign every vector to its nearest
    * coarse centroid, then search only within the query's own cell.
    * Centroids are a fixed-size (`nCentroids`) deterministic pseudo-random
    * sample — ordered by md5 of the id — so the coarse quantizer stays
    * constant-size as the corpus grows: the assignment join is n * k with
    * k fixed (and the centroid table always broadcastable), never n^2/c.
    * Approximate: neighbors in other cells are missed — that is the
    * recall/cost trade the operator buys.
    */
  /** Semantic dedup pairs (the SemDeDup recipe: Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding corpus, then search
    * for near-duplicate pairs (cosine >= tau) ONLY within each cluster —
    * the scale path for embedding dedup, replacing the corpus² pair space
    * with k cells of ~n/k (grow `nCentroids` with the corpus to keep
    * cells bounded). Approximate by design: cross-cluster pairs are the
    * sacrificed recall, exactly as in the paper.
    *
    * The k-means is `iters` Lloyd rounds in SCALED-INTEGER space so every
    * step is deterministic and engine-replayable: components are scaled
    * by 2^20 and floored (exact — power-of-two scaling), centroid
    * updates are integer sums + exact floor division (subtract pmod,
    * then divide — no double rounding at any magnitude), and assignment
    * is integer squared-L2 argmin with ties on centroid id. A float
    * k-means would diverge across engines on aggregation order; this one
    * cannot. Initial centroids are the md5-ordered deterministic sample
    * (same seedless scheme as [[ivfTopK]]). The final cosine verify runs
    * on the ORIGINAL doubles with the same left-to-right kernel and
    * floor quantization as [[cosineNearDupPairs]].
    *
    * Scale shape: per round, one ROW-LOCAL argmin assignment against the
    * driver-collected centroid literals (k·dim longs — parameter-bounded,
    * never data-sized) and one (cell, pos)-keyed update shuffle; the
    * pair join is an equi-join on the cell label. No all-pairs stage
    * anywhere, and the corpus is never shuffled for assignment (r15: the
    * previous broadcast-fanout + groupBy(vid) argmin shuffled the full
    * corpus — vectors and all — once per round).
    */
  def semanticNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                           tau: Double, nCentroids: Int = 16,
                           iters: Int = 2): DataFrame = {
    require(nCentroids >= 1 && iters >= 0,
      s"need nCentroids >= 1 and iters >= 0, got $nCentroids/$iters")
    val base = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("xs", transform(col("v"), x => floor(x * 1048576.0).cast("long")))
      // consumed by every assignment round and the pair join
      .localCheckpoint(false)
    // k centroid vectors to the driver: parameter-bounded (k x dim longs),
    // the same bounded-collect class as the sketch read-outs. Identical
    // arithmetic and (d2, c_id) tie-break to the former min_by form.
    var cents: Array[(Long, Array[Long])] = base
      .orderBy(md5(col("vid").cast("string").cast("binary")), col("vid"))
      .limit(nCentroids)
      .select(col("vid").as("c_id"), col("xs").as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def assign(c: Array[(Long, Array[Long])]): DataFrame =
      base.withColumn("cell", argminCellLong(c, col("xs")).getField("c_id"))
    for (_ <- 0 until iters) {
      val sums = assign(cents)
        .select(col("cell"), posexplode(col("xs")))
        .toDF("cell", "pos", "x")
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      // exact floor division: the numerator is made an exact multiple of n
      // first, so the integral divide is exact at any magnitude (the
      // 2^53 double-division trap IntervalOps documents)
      val mean = call_function("div", col("sx") - pmod(col("sx"), col("n")), col("n"))
      cents = sums.groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), mean.as("c")))).as("ps"))
        .select(col("cell").as("c_id"),
          transform(col("ps"), p => p.getField("c")).as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    }
    val fin = assign(cents).localCheckpoint(false)
    val sim = floor(dot(col("va"), col("vb")) / (col("na") * col("nb")) * 10000.0) / 10000.0
    fin.as("a").join(fin.as("b"),
        col("a.cell") === col("b.cell") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("ia"), col("b.vid").as("ib"),
        col("a.v").as("va"), col("b.v").as("vb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .select(col("ia"), col("ib"), sim.as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Per-label centroid outliers — the embedding-space mislabel/noise
    * screen of a labeled corpus: each vector's squared L2 distance to its
    * OWN label's centroid, ranked within the label, top `topK` flagged.
    * All arithmetic integer-exact (the q84 conventions: components
    * floor-scaled by 2^20, centroid means via the pmod-exact floor
    * division), so ranks are bit-identical across engines.
    * Output: (label, vid, d2, rk).
    *
    * Scale shape: centroid sums are one map-side-combinable aggregation
    * over the posexploded components (label x dim keys); centroids
    * broadcast (labels are few); the distance probe is row-local
    * zip_with over the broadcast join — the corpus is never shuffled.
    * The rank window partitions by label; with few, huge labels
    * pre-filter by a sampled distance threshold before ranking.
    */
  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val base = emb.select(col(idCol).as("vid"), col(labelCol).as("label"),
        transform(asDouble(col(vecCol)),
          x => floor(x * 1048576.0).cast("long")).as("xs"))
      .localCheckpoint(false) // two consumers: centroid sums + distance probe
    val sums = base.select(col("label"), posexplode(col("xs"))).toDF("label", "pos", "x")
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    // exact floor division at any magnitude/sign (see semanticNearDupPairs)
    val mean = call_function("div", col("sx") - pmod(col("sx"), col("n")), col("n"))
    val cents = sums.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("pos"), mean.as("c")))).as("ps"))
      .select(col("label"), transform(col("ps"), p => p.getField("c")).as("cv"))
    val d2 = aggregate(zip_with(col("xs"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("d2").desc, col("vid"))
    base.join(broadcast(cents), Seq("label"))
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("label"), col("vid"), col("d2"), col("rk"))
  }

  /** Per-vector symmetric int8 quantization — the storage/bandwidth step
    * before shipping an embedding corpus to an ANN index: each component
    * maps to round(x * 127 / max|x|), so a vector costs 1 byte/dim plus
    * one scale. Pure per-row column math (transform/array_max — all
    * codegen'd, no UDF, no shuffle); a 100 TB corpus quantizes as a
    * map-only stage. The rounding is floor(x + 0.5) — identical in every
    * IEEE engine, where round() half-even behavior differs — and the
    * per-vector scale is reported as floor(max|x| * 1e6) (single-op
    * quantization keeps the float→text step engine-exact). Zero vectors
    * quantize to all zeros.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xd = asDouble(col(vecCol))
    val maxAbs = array_max(transform(xd, x => abs(x)))
    val q = when(maxAbs === 0.0, transform(xd, _ => lit(0)))
      .otherwise(transform(xd, x => floor(x * 127.0 / maxAbs + 0.5).cast("int")))
    emb.select(col(idCol).as("id"),
      floor(maxAbs * 1000000.0).cast("long").as("maxabs_e6"),
      array_join(q, ",").as("q_csv"),
      size(q).cast("long").as("dim"))
  }

  /** Materialize the IVF index as a parquet artifact — the production
    * ANN shape ([[ivfTopK]] recomputes assignments per run; a real
    * pipeline builds the index once per corpus generation and every
    * query session probes it, the same build-once discipline as the
    * dedup-graph and postings artifacts). Layout:
    * `path/centroids` (c_id, cv) and `path/cells` (vid, cell, v, nrm)
    * PARTITIONED BY cell — a probe joining on the cell key can prune
    * unprobed cells at the file level (dynamic partition pruning), which
    * is exactly how an IVF index earns its keep at corpus scale. Same
    * deterministic md5-sampled centroids as [[ivfTopK]], so probes
    * reproduce its results bit-for-bit (q25's oracle checks q247).
    * Production storage would hold [[quantizeInt8]] codes instead of raw
    * doubles; the layout is unchanged.
    */
  def buildIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
                    path: String, nCentroids: Int = 16): Unit = {
    val base = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .localCheckpoint(false) // two consumers: centroid sample + assignment
    val cents = base
      .orderBy(md5(col("vid").cast("string").cast("binary")), col("vid"))
      .limit(nCentroids)
      .select(col("vid").as("c_id"), col("v").as("cv"))
    // row-local argmin against the driver-collected centroid literals —
    // same arithmetic/tie-break as the former min_by form, no corpus
    // shuffle for the assignment (r15; see kmeansAssignments)
    val centArr: Array[(Long, Array[Double])] = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val assigned = base
      .withColumn("cell", argminCellDouble(centArr, col("v")).getField("c_id"))
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    assigned.select(col("vid"), col("cell"), col("v"), col("nrm"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Probe a [[buildIvfIndex]] artifact: queries are index rows matching
    * `queryPred` (over the stored columns), candidates are the members
    * of each query's own cell, ranked by the same quantized cosine as
    * [[ivfTopK]]. The scan side is the parquet cells relation — the
    * query cells broadcast, so partition pruning confines IO to probed
    * cells.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queryPred: Column, k: Int): DataFrame = {
    val cells = spark.read.parquet(s"$path/cells")
    val q = cells.filter(queryPred)
      .select(col("vid").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val sim = floor(dot(col("qv"), col("v")) / (col("qn") * col("nrm")) * 10000.0) / 10000.0
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cells.join(broadcast(q), Seq("cell"))
      .filter(col("vid") =!= col("q_id"))
      .select(col("q_id"), col("vid").as("neighbor_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic k-means with Lloyd refinement, integer-exact: vectors
    * quantize to 2^20 fixed-point longs, initial centroids are the
    * md5-of-id sample (the [[ivfTopK]] seeding), and each Lloyd round is
    * (a) argmin-d² assignment against the broadcast centroids and (b) an
    * element-wise exact-floor-mean recompute — every step int64, so
    * clusterings are bit-identical on any engine/partitioning (the q250
    * oracle unrolls the same rounds in SQL). A cluster that loses all
    * members drops out (standard Lloyd behavior, deterministic here).
    * Output per surviving cluster: (c_id = seeding vector's id, n,
    * mean_d2_kibi = floor-mean of d²/1024 — pre-scaled so the inertia
    * sum stays in int64 at any corpus size).
    *
    * Scale shape: per round, ONE broadcast of k centroid vectors probed
    * map-side (no corpus shuffle for assignment — the groupBy keys on
    * the vector id only to argmin over k candidate rows) plus a
    * (cluster, dim)-keyed mean aggregation; state re-checkpoints per
    * round so lineage never compounds. The fixed-point zip_with math is
    * interpreted (HOF) — production at 100 TB swaps in the codegen'd
    * double kernel ([[dot]]) and keeps this exact path for audits.
    */
  def kmeansLloyd(emb: DataFrame, idCol: String, vecCol: String,
                  k: Int, rounds: Int): DataFrame =
    kmeansAssignments(emb, idCol, vecCol, k, rounds)
      .groupBy(col("cell").as("c_id"))
      .agg(count(lit(1)).as("n"),
        call_function("div",
          sum(call_function("div", col("d2"), lit(1024L))),
          count(lit(1))).as("mean_d2_kibi"))
      .orderBy(col("c_id"))

  /** [[kmeansLloyd]]'s per-point view: the same deterministic rounds,
    * returning the final assignment (vid, cell, d2) instead of the
    * per-cluster rollup — the relation cluster-conditioned screens
    * (label-noise audits, IVF list routing) consume directly.
    */
  def kmeansAssignments(emb: DataFrame, idCol: String, vecCol: String,
                        k: Int, rounds: Int): DataFrame = {
    require(k >= 2 && rounds >= 1, s"need k >= 2, rounds >= 1, got k=$k rounds=$rounds")
    val base = emb.select(col(idCol).as("vid"),
        transform(asDouble(col(vecCol)),
          x => floor(x * 1048576.0).cast("long")).as("xs"))
      .localCheckpoint(false) // probed by every round
    // driver-collected centroids (parameter-bounded, k x dim longs): the
    // assignment is a row-local argmin projection — the former broadcast
    // fan-out + groupBy(vid) shuffled the full corpus per round (r15)
    var cents: Array[(Long, Array[Long])] = base
      .orderBy(md5(col("vid").cast("string").cast("binary")), col("vid"))
      .limit(k)
      .select(col("vid").as("c_id"), col("xs").as("cxs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def assign() = base.withColumn("__m", argminCellLong(cents, col("xs")))
      .select(col("vid"), col("xs"), col("__m").getField("c_id").as("cell"),
        col("__m").getField("d2").as("d2"))
    for (_ <- 1 to rounds) {
      val assigned = assign()
      // exact element-wise floor mean (see centroidOutliers)
      val sums = assigned.select(col("cell"), posexplode(col("xs"))).toDF("cell", "pos", "x")
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      val mean = call_function("div", col("sx") - pmod(col("sx"), col("n")), col("n"))
      cents = sums.groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), mean.as("c")))).as("ps"))
        .select(col("cell").as("c_id"),
          transform(col("ps"), p => p.getField("c")).as("cxs"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    }
    assign().select(col("vid"), col("cell"), col("d2"))
  }

  /** Product quantization (Jégou et al. 2011, "Product quantization for
    * nearest neighbor search"): the vector splits into `m` contiguous
    * `subDim`-wide subspaces and each subspace learns its own k-entry
    * codebook by the [[kmeansLloyd]] discipline — 2^20 fixed-point
    * longs, md5-of-id seed sample (the SAME seed ids across subspaces,
    * sliced per subspace), integer-exact argmin assignment and
    * floor-mean refinement — so codebooks are bit-identical on any
    * engine. Output per (sub, c_id): (n, mean_d2_kibi), the per-cell
    * population and distortion an ANN index sizes its inverted lists
    * by; total PQ reconstruction error = Σ over subs of n·mean.
    *
    * Scale shape: the subspace explode is a bounded m× expansion
    * (m ≤ 16 enforced — PQ segment counts are small powers of two by
    * nature), after which every round is the kmeansLloyd plan per
    * subspace in ONE pass: m·k centroid rows broadcast, argmin
    * map-side, one (sub, cell, pos)-keyed mean aggregation. Rounds
    * re-checkpoint so lineage never compounds.
    */
  def productQuantize(emb: DataFrame, idCol: String, vecCol: String,
                      m: Int, subDim: Int, k: Int, rounds: Int): DataFrame = {
    require(m >= 2 && m <= 16, s"need 2..16 subspaces, got $m")
    require(subDim >= 1 && k >= 2 && rounds >= 1,
      s"need subDim >= 1, k >= 2, rounds >= 1, got $subDim/$k/$rounds")
    val full = emb.select(col(idCol).as("vid"),
        transform(asDouble(col(vecCol)),
          x => floor(x * 1048576.0).cast("long")).as("fxs"))
    val subs = full.select(col("vid"),
        explode(array((0 until m).map(i => lit(i)): _*)).as("sub"), col("fxs"))
      .select(col("vid"), col("sub"),
        slice(col("fxs"), col("sub") * subDim + 1, lit(subDim)).as("xs"))
      .localCheckpoint(false) // probed by every round
    var cents = subs.join(broadcast(
        full.orderBy(md5(col("vid").cast("string").cast("binary")), col("vid"))
          .limit(k).select(col("vid").as("c_id"))),
        col("vid") === col("c_id"))
      .select(col("sub"), col("c_id"), col("xs").as("cxs"))
      .localCheckpoint(false)
    val d2 = aggregate(zip_with(col("xs"), col("cxs"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    def assign() = subs.join(broadcast(cents), Seq("sub"))
      .withColumn("__d2", d2)
      .groupBy(col("sub"), col("vid"))
      .agg(min(struct(col("__d2"), col("c_id"))).as("__m"), first(col("xs")).as("xs"))
      .select(col("sub"), col("vid"), col("xs"),
        col("__m").getField("c_id").as("cell"), col("__m").getField("__d2").as("d2"))
    for (_ <- 1 to rounds) {
      val sums = assign()
        .select(col("sub"), col("cell"), posexplode(col("xs")))
        .toDF("sub", "cell", "pos", "x")
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      val mean = call_function("div", col("sx") - pmod(col("sx"), col("n")), col("n"))
      cents = sums.groupBy(col("sub"), col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), mean.as("c")))).as("ps"))
        .select(col("sub"), col("cell").as("c_id"),
          transform(col("ps"), p => p.getField("c")).as("cxs"))
        .localCheckpoint(false)
    }
    assign()
      .groupBy(col("sub"), col("cell").as("c_id"))
      .agg(count(lit(1)).as("n"),
        call_function("div",
          sum(call_function("div", col("d2"), lit(1024L))),
          count(lit(1))).as("mean_d2_kibi"))
      .orderBy(col("sub"), col("c_id"))
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-first traversal,
    * the 2-approximation): start from the smallest id, then k−1 rounds
    * of "add the point farthest from the chosen set" — the diversity
    * sampler that picks a maximally-spread representative subset of an
    * embedding corpus (coverage guarantee: every point is within the
    * last selection radius of some center). Deterministic and
    * integer-exact: 2^20 fixed-point d², smallest-id tie-break, so the
    * traversal is bit-identical on any engine. Output per round:
    * (round, c_id, sep_kibi = the selected point's min-d² to the prior
    * centers, /1024 — monotonically non-increasing by construction).
    *
    * Scale shape: the classic distributed Gonzalez — a per-point
    * min-distance column updated by ONE broadcast center per round
    * (map-side least()), one max-struct argmax aggregation per round,
    * k ≤ 64 rounds, re-checkpointed so lineage never compounds. No
    * pairwise joins anywhere.
    */
  def kCenterGreedy(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"need 2..64 centers, got $k")
    val base = emb.select(col(idCol).as("vid"),
        transform(asDouble(col(vecCol)),
          x => floor(x * 1048576.0).cast("long")).as("xs"))
      .localCheckpoint(false)
    val d2c = aggregate(zip_with(col("xs"), col("cxs"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val first = base.orderBy(col("vid")).limit(1)
      .select(col("vid").as("c_id"), col("xs").as("cxs"))
    var picks = Seq(first.select(lit(1L).as("round"), col("c_id"),
      lit(0L).as("sep_kibi")))
    // picked centers LEAVE the candidate pool: with them retained at
    // __md=0, a corpus holding duplicate vectors (every remaining min-d²
    // zero) would re-elect an already-picked center through the
    // smallest-vid tie-break and emit duplicate c_id rows — anti-joining
    // the pick out keeps the traversal a permutation of distinct points
    // (identical output on duplicate-free corpora, where a 0-distance
    // retained center could never win while any positive d² remained)
    var md = base
      .join(broadcast(first.select(col("c_id").as("vid"))), Seq("vid"), "left_anti")
      .crossJoin(broadcast(first.select(col("cxs"))))
      .select(col("vid"), col("xs"), d2c.as("__md"))
      .localCheckpoint(false)
    for (r <- 2 to k) {
      val nxt = md.agg(max(struct(col("__md"), (-col("vid")).as("__nv"))).as("__b"))
        .select((-col("__b.__nv")).as("c_id"), col("__b.__md").as("__sep"))
      val nxtFull = md.join(broadcast(nxt), col("vid") === col("c_id"))
        .select(col("c_id"), col("xs").as("cxs"), col("__sep"))
        .localCheckpoint(false) // one row
      picks = picks :+ nxtFull.select(lit(r.toLong).as("round"), col("c_id"),
        call_function("div", col("__sep"), lit(1024L)).as("sep_kibi"))
      md = md
        .join(broadcast(nxtFull.select(col("c_id").as("vid"))), Seq("vid"), "left_anti")
        .crossJoin(broadcast(nxtFull.select(col("cxs"))))
        .select(col("vid"), col("xs"), least(col("__md"), d2c).as("__md"))
        .localCheckpoint(false)
    }
    picks.reduce(_ unionByName _)
      .select(col("round"), col("c_id"), col("sep_kibi"))
      .orderBy(col("round"))
  }

  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, nCentroids: Int = 16): DataFrame = {
    val base = emb.withColumn("__is_q", queryPred)
      .select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"), col("__is_q"))
      .withColumn("nrm", l2Norm(col("v")))
    // md5-of-id ordering = a seedless deterministic shuffle both this
    // engine and an external SQL oracle can reproduce; TakeOrderedAndProject
    // keeps the global sort-limit cheap.
    val cents = base
      .orderBy(md5(col("vid").cast("string").cast("binary")), col("vid"))
      .limit(nCentroids)
      .select(col("vid").as("c_id"), col("v").as("cv"))
    val d2 = aggregate(zip_with(col("v"), col("cv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    // argmin over broadcast centroids via min_by: map-side combinable, no
    // window shuffle; ties break on centroid id for determinism
    val assigned = base.join(broadcast(cents), lit(true))
      .withColumn("d2", d2)
      .groupBy(col("vid"))
      .agg(min_by(col("c_id"), struct(col("d2"), col("c_id"))).as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        first(col("__is_q")).as("__is_q"))
    val q = assigned.filter(col("__is_q"))
      .select(col("vid").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val joined = assigned.drop("__is_q").join(broadcast(q), Seq("cell")).filter(col("vid") =!= col("q_id"))
    val sim = floor(dot(col("qv"), col("v")) / (col("qn") * col("nrm")) * 10000.0) / 10000.0
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    joined.select(col("q_id"), col("vid").as("neighbor_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Mutual-nearest-neighbor alignment between two embedding corpora —
    * the bitext-mining / cross-corpus record-alignment primitive
    * (Artetxe & Schwenk 2019 use the margin variant): a pair (a, b)
    * survives iff b is a's best match AND a is b's best match, the
    * strongest parameter-free precision filter over a similarity join.
    * Cosine quantized with the repo's floor(·1e4) contract; argmax ties
    * break toward the smaller id, so the alignment is replayable.
    * Output: (a_id, b_id, sim) for the mutual pairs.
    *
    * Scale shape: the scored pair stream broadcasts the RIGHT side —
    * pass the smaller corpus there (the classic probe/build choice); at
    * corpus×corpus scale neither side broadcasts, so pre-block both
    * sides with the SAME IVF coarse quantizer ([[ivfTopK]]'s cells) and
    * run this operator per cell-pair — mutual-best within probed cells
    * is the standard approximation. Both argmaxes are map-side
    * combinable struct-max aggregations; the mutuality check is one
    * equi-join on the (a, b) pair.
    */
  def mutualNearestPairs(left: DataFrame, right: DataFrame, idCol: String,
                         vecCol: String, roundDigits: Int = 4): DataFrame = {
    val factor = math.pow(10, roundDigits)
    val a = left.select(col(idCol).as("a_id"), asDouble(col(vecCol)).as("va"))
      .withColumn("na", l2Norm(col("va")))
    val b = right.select(col(idCol).as("b_id"), asDouble(col(vecCol)).as("vb"))
      .withColumn("nb", l2Norm(col("vb")))
    val pairs = a.join(broadcast(b), lit(true))
      .select(col("a_id"), col("b_id"),
        (floor(dot(col("va"), col("vb")) / (col("na") * col("nb")) * factor) / factor).as("sim"))
      .localCheckpoint(false) // argmax consumed from both directions
    val bestA = pairs.groupBy(col("a_id"))
      .agg(max(struct(col("sim"), (-col("b_id")).as("__nb"))).as("__m"))
      .select(col("a_id"), (-col("__m.__nb")).as("b_id"), col("__m.sim").as("sim"))
    val bestB = pairs.groupBy(col("b_id"))
      .agg(max(struct(col("sim"), (-col("a_id")).as("__na"))).as("__m"))
      .select(col("b_id").as("__b2"), (-col("__m.__na")).as("__a2"))
    bestA.join(bestB,
        col("a_id") === col("__a2") && col("b_id") === col("__b2"))
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Fixed-point linear projection of the embedding corpus through a
    * small dense matrix — the distributed half of every
    * random-projection / learned-linear-head feature transform (the
    * matrix itself comes from wherever: a trained head, a seeded random
    * projection). Each input float quantizes with one floor op
    * (floor(x · scale), the repo's cross-engine float contract) and the
    * output is the exact int64 matrix-vector product, so the transform
    * is bit-replayable on any engine.
    *
    * Output: (id, p0..p{k-1}) with pj = Σ_i floor(v_i·scale)·W(j)(i).
    *
    * Scale shape: the matrix rides the PLAN as literal arrays (a few KB
    * broadcast with the task binary — never a shuffle, never a join);
    * the product is row-local `zip_with`+`aggregate` inside codegen, so
    * the operator is map-only at any corpus size. int64 bound:
    * dim · scale · max|v| · max|W| per output cell — callers with big
    * dims/scales shrink one of them.
    */
  def projectFixedPoint(df: DataFrame, idCol: String, vecCol: String,
                        weights: Seq[Seq[Long]],
                        scale: Long = 1000L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_.length == weights.head.length),
      "weights must be a non-empty rectangular matrix")
    val qv = transform(col(vecCol),
      x => floor(x.cast("double") * scale).cast("long"))
    val base = df.select(col(idCol).as("id"), qv.as("__qv"))
    weights.zipWithIndex.foldLeft(base) { case (acc, (row, j)) =>
      acc.withColumn(s"p$j",
        aggregate(zip_with(col("__qv"), array(row.map(lit): _*), (a, b) => a * b),
          lit(0L), (s0, v) => s0 + v))
    }.drop("__qv")
  }
}
