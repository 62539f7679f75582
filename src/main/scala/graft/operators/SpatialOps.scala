package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance self-joins over planar integer coordinates via uniform grid
  * bucketing — the classic spatial-join decomposition (cell-partitioned
  * candidates, exact verify) that replaces the O(n²) cross product with
  * a cell-local equi-join. Coordinates are integers (microdegrees /
  * fixed-point meters), so the distance filter is exact int64 math and
  * bit-replayable on any engine.
  */
object SpatialOps {
  /** All unordered point pairs within `radius` (Euclidean, inclusive):
    * (id_a, id_b, dist2) with id_a < id_b and dist2 the exact squared
    * distance. `cell` is the grid pitch and must be >= radius so the
    * 3×3 cell neighborhood covers the radius — each probe row explodes
    * to its FORWARD half of that neighborhood (home cell + 4
    * lexicographically-forward neighbors) and equi-joins build rows on
    * THEIR home cell, so every qualifying pair is found exactly once
    * (see the offset-set comment in the body).
    *
    * Scale shape: the only shuffle is the equi-join on (cx, cy) — cost
    * ∝ sum over cells of |probe cell| × |build cell|, which for any
    * non-adversarial density is linear in points (pick `cell` ≈ radius
    * so occupancy stays O(1); a skewed megacity cell is AQE skew-join
    * territory, or salt the cell key upstream). The distance verify is
    * row-local int64 arithmetic inside codegen. Never a cross join, no
    * driver-side structures — this is how a 100 TB point corpus
    * neighbor-joins. Local A/B honesty note: on q303 at sf0.1 the
    * forward-offset halving is a WASH (5.88 vs 5.83 s cold min-of-3,
    * same conditions — the pair stage isn't that query's bottleneck);
    * it's kept for the 5/9 exploded-probe volume and pre-filter
    * candidate halving, which pay exactly when the pair stage IS the
    * bottleneck (dense corpora, radius ≈ cell occupancy spikes).
    */
  def gridNeighborPairs(points: DataFrame, idCol: String, xCol: String,
                        yCol: String, cell: Long, radius: Long): DataFrame = {
    // cell >= 1 as well: cell=0 (reachable via radius=0) makes pmod's
    // modulus zero — NULL cell keys, so the equi-join matches nothing and
    // the co-located-pairs case silently returned EMPTY instead of the
    // duplicate points (nearestNeighborGrid carries the same guard)
    require(cell >= 1 && cell >= radius && radius >= 0,
      s"need cell >= 1 and cell >= radius >= 0 so 3x3 neighborhoods cover the radius, got cell=$cell radius=$radius")
    // exact FLOOR bucketing (remainder-subtract then integral divide, the
    // IntervalOps trick): `div` alone truncates toward zero, which would
    // merge cells (-cell, 0) and [0, cell) for planes with negative
    // coordinates and silently lose cross-origin neighbor pairs
    def cellOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(cell)), lit(cell))
    val pts = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", cellOf(col("x")))
      .withColumn("cy", cellOf(col("y")))
      .localCheckpoint(false) // probe and build sides of the self-join
    // FORWARD-only neighborhood (round 13): the full 3x3 probe explode
    // visited every unordered cell pair TWICE (once from each side) and
    // relied on id_a < id_b to discard half the matches AFTER the join.
    // Exploding only the 5 forward offsets — the home cell plus its 4
    // lexicographically-forward neighbors — visits each unordered cell
    // pair exactly once (the set contains no offset together with its
    // negation), so the exploded probe side is 5/9 of the old one and
    // the candidate set halves BEFORE the distance filter. Home-cell
    // pairs still dedupe by id order; cross-cell pairs normalize to
    // (least, greatest) at projection. Output set is IDENTICAL (the
    // brute-force property specs pin it).
    val off = array(
      struct(lit(0L).as("ox"), lit(0L).as("oy")),
      struct(lit(0L).as("ox"), lit(1L).as("oy")),
      struct(lit(1L).as("ox"), lit(-1L).as("oy")),
      struct(lit(1L).as("ox"), lit(0L).as("oy")),
      struct(lit(1L).as("ox"), lit(1L).as("oy")))
    val probe = pts
      .withColumn("__o", explode(off))
      .select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("__o.ox")).as("cx"), (col("cy") + col("__o.oy")).as("cy"),
        (col("__o.ox") === 0L && col("__o.oy") === 0L).as("__home"))
    val build = pts.select(col("id").as("ib"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    // home cells order by id; cross-cell keeps the old <-comparison's
    // null/equal-id drop semantics (=!= is null-rejecting too), so a
    // contract-violating duplicate or null id can never emit MORE pairs
    // than the 3x3 form did
    probe.join(build, Seq("cx", "cy"))
      .filter((col("__home") && col("ia") < col("ib")) ||
        (!col("__home") && col("ia") =!= col("ib")))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist2"))
  }

  /** EXACT nearest neighbor: for every probe point the closest build
    * point (min squared Euclidean distance, ties to the smallest build
    * id), computed via expanding grid neighborhoods instead of a
    * probe × build cross product.
    *
    * Phase r (for each entry of `rings`, ascending) equi-joins the still-
    * unresolved probes' (2r+1)×(2r+1) cell neighborhood against the build
    * cells and takes the per-probe argmin. A probe RESOLVES in phase r
    * when its best candidate satisfies dist² < (r·cell)²: every
    * unexplored cell sits at Chebyshev ring ≥ r+1, whose points are at
    * Euclidean distance ≥ r·cell from anywhere in the probe's home cell,
    * strictly farther than the candidate — so the candidate is the global
    * argmin AND no unexplored facility can tie it (the strict inequality
    * is what makes the min-id tie-break exact, not just the distance).
    * Probes still unresolved after the last ring fall back to a brute
    * per-probe scan of all build points — by then that residual is the
    * empty-region tail (pick `cell` ≈ plane_extent/√|build| for O(1)
    * occupancy and the residual is a vanishing fraction; the fallback
    * keeps the operator total, never wrong).
    *
    * Scale shape: each phase is one equi-join on (cx, cy) with the probe
    * side exploded (2r+1)² ways — linear in unresolved probes with O(1)
    * cell occupancy; lineage is truncated per phase. The cross-join
    * exists ONLY for the post-rings residual. Never a full
    * probe × build product.
    */
  def nearestNeighborGrid(probe: DataFrame, idCol: String, xCol: String,
                          yCol: String, build: DataFrame, bidCol: String,
                          bxCol: String, byCol: String, cell: Long,
                          rings: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    require(cell >= 1, s"need a positive cell pitch, got $cell")
    require(rings.nonEmpty && rings.head >= 1 && rings == rings.sorted,
      s"rings must be ascending and start >= 1, got $rings")
    def cellOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(cell)), lit(cell))
    val b = build.select(col(bidCol).cast("long").as("nid"),
        col(bxCol).cast("long").as("bx"), col(byCol).cast("long").as("by"))
      .withColumn("bcx", cellOf(col("bx")))
      .withColumn("bcy", cellOf(col("by")))
      .localCheckpoint(false) // one build snapshot feeds every phase
    var unresolved = probe.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", cellOf(col("x")))
      .withColumn("cy", cellOf(col("y")))
      .localCheckpoint(false)
    val d2 = (col("x") - col("bx")) * (col("x") - col("bx")) +
      (col("y") - col("by")) * (col("y") - col("by"))
    var resolved: DataFrame = null
    for (r <- rings) {
      val cand = ringCandidates(unresolved, b, r)
      val best = cand.groupBy(col("id"))
        .agg(min(struct(d2.as("d2"), col("nid"))).as("__m"))
      val done = best.filter(col("__m.d2") < lit(r * cell) * lit(r * cell))
        .select(col("id"), col("__m.nid").as("nid"), col("__m.d2").as("dist2"))
        .localCheckpoint(false) // consumed by the union AND the anti-join
      resolved = if (resolved == null) done else resolved.union(done)
      unresolved = unresolved
        .join(done.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint(false)
    }
    // residual: probes in facility deserts wider than the last ring —
    // exact per-probe scan, bounded by the tail the rings left behind
    val brute = unresolved.crossJoin(
        b.select(col("nid"), col("bx"), col("by")))
      .groupBy(col("id"))
      .agg(min(struct(d2.as("d2"), col("nid"))).as("__m"))
      .select(col("id"), col("__m.nid").as("nid"), col("__m.d2").as("dist2"))
    resolved.union(brute)
  }

  /** One phase's candidate relation: the unresolved probes' (2r+1)²
    * neighborhood equi-joined to build cells. Factored out so the plan
    * probe below explains the SAME join the operator runs.
    */
  private def ringCandidates(unresolved: DataFrame, b: DataFrame, r: Int): DataFrame = {
    val offs = array((-r to r).map(o => lit(o.toLong)): _*)
    unresolved
      .withColumn("__ox", explode(offs))
      .withColumn("__oy", explode(offs))
      .join(b, col("cx") + col("__ox") === col("bcx") &&
        col("cy") + col("__oy") === col("bcy"))
  }

  /** Test-only plan probe: the phase-1 candidate join's physical plan
    * over a tiny fixture, explained BEFORE the per-phase lineage barrier
    * (localCheckpoint → Scan ExistingRDD) hides it — PlanSpec pins that
    * ring candidates form a hash equi-join on cells, never a cartesian.
    */
  private[graft] def nearestNeighborGridPlanProbe(
      spark: org.apache.spark.sql.SparkSession): String = {
    import spark.implicits._
    val u = Seq((1L, 10L, 10L, 0L, 0L), (2L, 510L, 510L, 5L, 5L))
      .toDF("id", "x", "y", "cx", "cy")
    val b = Seq((7L, 20L, 20L, 0L, 0L)).toDF("nid", "bx", "by", "bcx", "bcy")
    ringCandidates(u, b, 1).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** Exact integer ray-casting point-in-polygon: for a COMPILE-TIME
    * vertex list (geofences are small literals by nature), counts
    * horizontal-ray crossings with the straddle test cross-MULTIPLIED —
    * `(x−x1)(y2−y1) <vs> (x2−x1)(y−y1)`, comparison direction fixed per
    * edge at build time by sign(y2−y1) — so no division, no floats,
    * bit-identical on any engine. Points exactly ON an edge follow the
    * strict-inequality convention (deterministic, mirrored by the
    * oracle). Unrolled per edge: pure codegen'd column arithmetic, no
    * HOF, no UDF — a map-only geofence filter at any corpus size.
    */
  def insidePolygon(x: org.apache.spark.sql.Column,
                    y: org.apache.spark.sql.Column,
                    verts: Seq[(Long, Long)]): org.apache.spark.sql.Column = {
    require(verts.size >= 3, s"polygon needs >= 3 vertices, got ${verts.size}")
    val crossings = verts.zip(verts.tail :+ verts.head).map {
      case ((x1, y1), (x2, y2)) =>
        require(y1 != y2 || x1 != x2, "degenerate (repeated) vertex")
        val straddle = (lit(y1) > y) =!= (lit(y2) > y)
        val lhs = (x - lit(x1)) * lit(y2 - y1)
        val rhs = lit(x2 - x1) * (y - lit(y1))
        val cross = if (y2 > y1) lhs < rhs else lhs > rhs
        when(straddle && cross, 1L).otherwise(0L)
    }.reduce(_ + _)
    pmod(crossings, lit(2L)) === 1L
  }

  /** EXACT grid-decomposed DBSCAN (Ester et al. 1996) over planar integer
    * coordinates: a point is `core` when its eps-neighborhood (itself
    * included, the paper's convention) holds >= `minPts` points; core
    * points within eps of each other share a cluster (connected
    * components of the core graph, labeled by min core id); a non-core
    * point within eps of a core is `border` and — where the paper leaves
    * the choice scan-order-dependent — joins its MINIMUM-labeled core
    * neighbor's cluster, making the output deterministic and
    * engine-replayable; everything else is `noise` (cluster -1).
    *
    * Scale shape: candidates come from [[gridNeighborPairs]] (cell-local
    * equi-join, exact int64 verify — never the n² product; the pair
    * relation persists once and feeds the degree count, the core graph,
    * and the border assignment), and the component labeling is
    * [[DedupOps.nearDupGroups]]'s checkpointed min-label propagation with
    * node-sized state. Cluster diameter in HOPS is the propagation depth
    * dial (maxIter doubles it per unit); a percolated plane — eps far
    * above the density threshold — is a parameter bug, not a plan shape.
    */
  def dbscanGrid(points: DataFrame, idCol: String, xCol: String,
                 yCol: String, cell: Long, eps: Long,
                 minPts: Long): DataFrame = {
    require(minPts >= 1, s"need minPts >= 1, got $minPts")
    val pts = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .localCheckpoint(false) // feeds the pair join and the final rebase
    val pairs = gridNeighborPairs(pts, "id", "x", "y", cell, eps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b")))
      .groupBy(col("id")).agg(count(lit(1)).as("__nb"))
    val core = pts.join(deg, Seq("id"), "left")
      .filter(coalesce(col("__nb"), lit(0L)) + 1L >= minPts)
      .select(col("id"))
      .localCheckpoint(false) // three consumers below
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(core.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_a").as("ia"), col("id_b").as("ib"))
    // star contraction, not the label-prop chain: identical canonical
    // assignments (q71 pins the two closures equal), O(log) rounds on
    // deep chains — and DBSCAN's sub-percolation regime still pays per
    // label-prop round, so the cheaper closure is ~2x for free (the
    // same swap q73's funnel made in round 9)
    val grp = DedupOps.nearDupGroupsStar(core, "id", coreEdges)
    val adj = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val border = adj
      .join(core, Seq("id"), "left_anti")
      .join(grp.select(col("id").as("nb"), col("canonical_id")), Seq("nb"))
      .groupBy(col("id")).agg(min(col("canonical_id")).as("__bcl"))
    val out = pts.select(col("id"))
      .join(grp.withColumnRenamed("canonical_id", "__ccl"), Seq("id"), "left")
      .join(border, Seq("id"), "left")
      .select(col("id"),
        when(col("__ccl").isNotNull, lit("core"))
          .when(col("__bcl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__ccl"), col("__bcl"), lit(-1L)).as("cluster"))
      // EAGER checkpoint (r16 re-measure, flipping the r12 lazy verdict
      // under the current plan shape): materializing `out` while `pairs`
      // is still cached spares the final action a full grid-join recompute
      // — fresh-JVM q303 paired mins 3.96/4.18 s eager vs 4.38/4.69 lazy.
      // Also the scale-right choice: at corpus scale the recomputed
      // neighbor join dwarfs any materialization stall.
      .localCheckpoint(true)
    pairs.unpersist()
    out
  }

  /** Andrew's monotone chain over DISTINCT points sorted ascending by
    * (x, y): strict turns only (`<= 0` pops), so collinear boundary
    * points are NOT vertices — a point on the segment between two hull
    * vertices is a convex combination of others, matching the
    * Carathéodory criterion the q337 oracle establishes independently.
    * All orientation tests are int64 cross products (coordinates are
    * bounded integer planes), no floats anywhere.
    */
  private def chain(sorted: IndexedSeq[(Long, Long)]): IndexedSeq[(Long, Long)] = {
    if (sorted.size <= 2) return sorted
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Iterator[(Long, Long)]) = {
      val h = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (p <- ps) {
        while (h.size >= 2 && cross(h(h.size - 2), h(h.size - 1), p) <= 0)
          h.remove(h.size - 1)
        h += p
      }
      h
    }
    val lower = half(sorted.iterator)
    val upper = half(sorted.reverseIterator)
    (lower.dropRight(1) ++ upper.dropRight(1)).toIndexedSeq
  }

  /** Per-group convex-hull vertex census: (group, n_points, n_hull) over
    * distinct integer points, hull = STRICT vertices (collinear boundary
    * points excluded — see [[chain]]).
    *
    * Scale shape: the hull operator is MERGEABLE — hull(A ∪ B) =
    * hull(hull(A) ∪ hull(B)) — so `preReduce > 1` first splits each
    * group into that many deterministic coordinate-hash shards, computes
    * each shard's local hull (flatMapGroups, state = one shard), and
    * only the surviving vertices (typically O(log n) of a random cloud)
    * reach the per-group final chain. With preReduce the per-task memory
    * is O(group/preReduce) at level 1 and O(survivors) at level 2 — the
    * same two-level combine discipline as a partial aggregate, which is
    * how a corpus-scale group hulls without ever holding the group. The
    * census output is salt-invariant (pinned by spec).
    *
    * mapGroups (not a join cascade) is the honest tool here: the chain
    * is a genuinely sequential stack scan — O(n log n) per group vs the
    * Θ(n⁴) declarative Carathéodory test, which the oracle uses at a
    * capped sample size precisely because it is plan-hostile.
    */
  def hullVertexCensus(points: DataFrame, groupCol: String, xCol: String,
                       yCol: String, preReduce: Int = 0): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col(groupCol).cast("long").as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .distinct()
      .localCheckpoint(false) // census + hull consumers
    val np = pts.groupBy(col("g")).agg(count(lit(1)).as("n_points"))
    val ds = pts.as[(Long, Long, Long)]
    val reduced =
      if (preReduce <= 1) ds
      else ds.groupByKey { case (g, x, y) =>
          (g, java.lang.Math.floorMod(x * 31L + y, preReduce.toLong))
        }.flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Long)]) =>
          chain(it.map(t => (t._2, t._3)).toIndexedSeq.sorted)
            .map { case (x, y) => (key._1, x, y) }
        }
    val hull = reduced.groupByKey(_._1).mapGroups { (g, it) =>
      (g, chain(it.map(t => (t._2, t._3)).toIndexedSeq.sorted).size.toLong)
    }.toDF("g", "n_hull")
    np.join(hull, Seq("g"))
      .select(col("g").as(groupCol), col("n_points"), col("n_hull"))
  }
}
