package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph computation in the pregel join-aggregate shape: each
  * round is one equi-join of the edge list against the current vertex
  * state plus one aggregation on the destination — the form that scales
  * with shuffle partitions and needs no driver-side adjacency. The edge
  * relation is checkpointed once and reused by every round, and vertex
  * state is checkpointed per round so the plan never accretes lineage
  * (the same barrier discipline as [[DedupOps.nearDupGroups]]).
  */
object GraphOps {
  /** Integer-exact PageRank with a fixed iteration count. Ranks are
    * scaled longs (r0 = `scale`), the damping update is
    *   r'(v) = div(scale * (dampDen - dampNum), dampDen)
    *           + sum over in-edges (u,v) of div(r(u) * dampNum, dampDen * deg(u))
    * — every step integer floor arithmetic, so the result is
    * bit-identical on any engine, partition order, or parallelism (the
    * oracle replays it in SQL with `//`). Dangling-node mass is dropped
    * (the standard simplification); feed an undirected edge list (both
    * directions) if every node must have out-degree >= 1.
    *
    * Scale shape: degree is one aggregation on src; each round is an
    * equi-join on src (edge relation reused from its one checkpoint —
    * for multi-hour runs on preemptible nodes swap for a replicated
    * persist, see [[DedupOps]]) followed by a groupBy on dst; vertex
    * state is node-sized. Hot hubs are AQE skew-join territory; no
    * windows, no driver-side collect.
    */
  def pageRankScaled(edges: DataFrame, srcCol: String, dstCol: String,
                     iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
                     scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(dampNum > 0 && dampDen > dampNum, s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val base = scale * (dampDen - dampNum) / dampDen
    val deg = edges.groupBy(col(srcCol).as("__src")).agg(count(lit(1)).as("__deg"))
    // NOT pre-hashed on __src (r15, measured): the per-round join
    // broadcasts the node-sized rank relation at bench scale, so a
    // pre-hash would only add a build-time exchange (q88 A/B read flat
    // 3.12 -> 3.25); at a scale where ranks stop broadcasting, add the
    // pathThroughput-style repartition(__src) here
    val ed = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(deg, Seq("__src"))
      .localCheckpoint(false) // reused by every round
    val nodes = ed.select(col("__src").as("node"))
      .union(ed.select(col("__dst"))).distinct()
      .localCheckpoint(false) // reused by every round's rebase
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 0 until iters) {
      val contribs = ed.join(ranks, col("__src") === col("node"))
        .select(col("__dst").as("node"),
          call_function("div", col("rank") * dampNum, col("__deg") * dampDen).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"), (lit(base) + coalesce(col("__in"), lit(0L))).as("rank"))
        .localCheckpoint(false) // bound lineage across rounds
    }
    ranks
  }

  /** Personalized PageRank (random walk with restart): identical integer
    * arithmetic to [[pageRankScaled]], but the teleport mass lands ONLY
    * on the seed set — the "importance relative to THESE nodes" measure
    * behind related-entity ranking and seed-expansion labeling
    * (Jeh & Widom 2003). Seeds start at `scale`, everything else at 0;
    * each round v receives div(scale·(dampDen−dampNum), dampDen) iff v
    * is a seed, plus the damped in-neighbor contributions. Nodes = edge
    * endpoints ∪ seeds.
    *
    * Scale shape: exactly [[pageRankScaled]] — one checkpointed edge
    * relation, per-round equi-join + dst aggregation, node-sized state
    * re-checkpointed per round.
    */
  def personalizedPageRankScaled(edges: DataFrame, srcCol: String,
                                 dstCol: String, seeds: DataFrame,
                                 seedCol: String, iters: Int,
                                 dampNum: Long = 85L, dampDen: Long = 100L,
                                 scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(dampNum > 0 && dampDen > dampNum, s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val base = scale * (dampDen - dampNum) / dampDen
    // endpoints cast long like the seeds (the labelPropagation/bellmanFord
    // convention): seeds-only casting made the nodes union and the seed
    // join resolve through implicit coercion — string edge ids would
    // compare as DOUBLE against the long seeds (precision loss past 2^53)
    val deg = edges.groupBy(col(srcCol).cast("long").as("__src"))
      .agg(count(lit(1)).as("__deg"))
    val ed = edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .join(deg, Seq("__src"))
      .localCheckpoint(false) // reused by every round
    val sd = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("__seed", lit(true))
    val nodes = ed.select(col("__src").as("node"))
      .union(ed.select(col("__dst"))).union(sd.select(col("node"))).distinct()
      .join(sd, Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(false)).as("__seed"))
      .localCheckpoint(false) // reused by every round's rebase
    var ranks = nodes.select(col("node"),
      when(col("__seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
    for (_ <- 0 until iters) {
      val contribs = ed.join(ranks, col("__src") === col("node"))
        .select(col("__dst").as("node"),
          call_function("div", col("rank") * dampNum, col("__deg") * dampDen).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("__seed"), lit(base)).otherwise(lit(0L))
            + coalesce(col("__in"), lit(0L))).as("rank"))
        .localCheckpoint(false) // bound lineage across rounds
    }
    ranks
  }

  /** Market-basket co-occurrence: the top-k item pairs appearing together
    * in the most baskets (the candidate-pair step of A-Priori / the
    * "frequently bought together" signal). Within-basket duplicates
    * collapse first, so a pair counts once per basket. Output:
    * (i1, i2, n) with i1 < i2, top k by count (deterministic tie-break).
    *
    * Scale shape: the pair stream is an equi-self-join on the BASKET id,
    * so it is bounded by sum(basket_size²) — basket-bounded, never
    * corpus² (baskets are small by nature; cap pathological baskets
    * upstream if a feed can produce them). Counts aggregate map-side on
    * the pair; the top-k is a TakeOrdered, never a global sort.
    */
  def itemCooccurrence(df: DataFrame, basketCol: String, itemCol: String,
                       minCount: Long = 2L, k: Int = 50): DataFrame =
    coPairCounts(df, basketCol, itemCol, minCount)
      .orderBy(col("n").desc, col("i1"), col("i2"))
      .limit(k)

  /** The full co-occurrence pair relation behind [[itemCooccurrence]]:
    * (i1, i2, n) with i1 < i2 and n >= minCount baskets containing both.
    * This IS the co-purchase graph's edge list — [[labelPropagation]]
    * and [[bfsHops]] consume it directly. Same basket-bounded self-join
    * shape (cost ∝ sum(basket_size²), never corpus²).
    */
  def coPairCounts(df: DataFrame, basketCol: String, itemCol: String,
                   minCount: Long = 2L): DataFrame = {
    val items = df.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint(false) // both sides of the self-join
    items.as("a").join(items.as("b"),
        col("a.bk") === col("b.bk") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i1"), col("b.item").as("i2"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Two-step funnel conversion per entity: the first `fromState` event,
    * and whether a `toState` event follows within `horizon` (same time
    * unit as `orderCol`, inclusive). Output one row per entity that
    * reached the first step: (key, from_t, to_t, converted, delta) with
    * to_t/delta null when unconverted. `toState` at the exact same
    * instant counts (>=) — ties inside one tick are funnel progress,
    * not time travel.
    *
    * Scale shape: the first-step relation is one aggregation on the
    * key; the second step is an equi-join on the key over ONLY
    * `toState` events (filter pushed to the scan) followed by a min
    * aggregation — no window over raw events, no ordering of the full
    * stream.
    */
  def funnelConversion(df: DataFrame, keyCol: String, orderCol: String,
                       stateCol: String, fromState: String, toState: String,
                       horizon: Long): DataFrame = {
    require(horizon >= 0, s"need horizon >= 0, got $horizon")
    val first = df.filter(col(stateCol) === fromState)
      .groupBy(col(keyCol).as("key")).agg(min(col(orderCol)).as("from_t"))
    val next = df.filter(col(stateCol) === toState)
      .select(col(keyCol).as("nkey"), col(orderCol).as("__t"))
    // the horizon lives IN the join condition: an out-of-window toState
    // must leave the entity present-but-unconverted, not drop it
    first.join(next,
        col("key") === col("nkey") &&
          col("__t") >= col("from_t") && col("__t") <= col("from_t") + horizon,
        "left")
      .groupBy(col("key"), col("from_t"))
      .agg(min(col("__t")).as("to_t"))
      .select(col("key"), col("from_t"), col("to_t"),
        col("to_t").isNotNull.as("converted"),
        (col("to_t") - col("from_t")).as("delta"))
  }

  /** The sequencing + pair-count stage of [[transitionMatrix]], exposed
    * pre-barrier so plan guards can see the entity-partitioned window
    * (the checkpoint snapshots lineage and hides upstream stages from
    * explain).
    */
  private[graft] def transitionCounts(df: DataFrame, keyCol: String,
                                      orderCols: Seq[org.apache.spark.sql.Column],
                                      stateCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    // NULL states are excluded BEFORE sequencing (round-14 review): a
    // stateless event is not a step of the chain. Previously a
    // (NULL -> X) pair entered the counts but the row-total equi-join in
    // transitionMatrix dropped it (null != null), so those transitions
    // silently vanished from the matrix while to-NULL steps were
    // filtered — neither exclusion nor category semantics.
    df.filter(col(stateCol).isNotNull)
      .select(col(keyCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state")).agg(count(lit(1)).as("n"))
  }

  /** Rolling time-window spike detection over a keyed event stream: per
    * (key, day) counts, a trailing `windowDays`-day RANGE window (value
    * range, not row count — gap days correctly shrink the window), and
    * an integer-exact spike flag
    *   n * cnt_w * spikeDen > sum_w * spikeNum
    * i.e. today's count exceeds (spikeNum/spikeDen) x the trailing
    * average, with the comparison cross-multiplied so no division
    * happens at all. Output: (key, day, n, sum_w, cnt_w, spike).
    *
    * Scale shape: the raw stream collapses to (key, day) counts first —
    * map-side combinable, keys x days rows — and the RANGE window
    * partitions by the key, so no global sort ever forms. The trailing
    * window is value-based (rangeBetween on the day number), the shape
    * that stays correct under sparse/gappy keys.
    */
  def rollingSpikes(df: DataFrame, keyCol: String, dayCol: String,
                    windowDays: Int, spikeNum: Long,
                    spikeDen: Long): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    require(spikeNum > 0 && spikeDen > 0, s"need positive spike ratio, got $spikeNum/$spikeDen")
    val daily = df.groupBy(col(keyCol).as("key"), col(dayCol).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("sum_w", sum(col("n")).over(w))
      .withColumn("cnt_w", count(lit(1)).over(w))
      .select(col("key"), col("day"), col("n"), col("sum_w"), col("cnt_w"),
        (col("n") * col("cnt_w") * spikeDen > col("sum_w") * spikeNum).as("spike"))
  }

  /** First-order Markov transition matrix of per-entity ordered event
    * sequences — the trajectory/session-modeling statistic of an event
    * stream: for every observed (from_state, to_state) step, its count
    * and the integer-scaled MLE transition probability
    * div(n * scale, total-steps-out-of-from_state). Integer floor
    * arithmetic only, so the matrix is bit-identical across engines.
    * Output: (from_state, to_state, n, p_scaled).
    *
    * Scale shape: one window partitioned by the ENTITY key (per-entity
    * sequences are bounded; never a global sort), then count aggregation
    * on the (from, to) pair; row totals derive from the pair counts —
    * states x states rows, not event rows — so the raw stream is
    * sequenced exactly once. `orderCols` must totally order each
    * entity's events (tie-break with a unique id) or the lead() step is
    * nondeterministic.
    */
  def transitionMatrix(df: DataFrame, keyCol: String,
                       orderCols: Seq[org.apache.spark.sql.Column],
                       stateCol: String, scale: Long = 1000L): DataFrame = {
    // two consumers of the pair counts: row totals + probability join
    val n = transitionCounts(df, keyCol, orderCols, stateCol)
      .localCheckpoint(false)
    val tot = n.groupBy(col("from_state")).agg(sum(col("n")).as("__tot"))
    n.join(tot, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        call_function("div", col("n") * scale, col("__tot")).as("p_scaled"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007, the LPA variant GraphX ships) with a DETERMINISTIC update:
    * every node simultaneously adopts the most frequent label among its
    * neighbors, ties broken toward the SMALLEST label — so the result is
    * a pure function of the edge set and the round count, bit-identical
    * on any engine or parallelism (asynchronous/randomized LPA is not
    * replayable; the sync+min-tie contract is). Input edges are treated
    * as undirected (symmetrized + deduped here); initial label = node id.
    * Output: (node, lbl) for every edge endpoint after `iters` rounds.
    *
    * Scale shape: identical to [[pageRankScaled]] — per round one
    * equi-join of the (checkpointed) symmetric edge list against the
    * node-sized label relation, one (node, lbl) count aggregation, one
    * max-of-struct argmax; state re-checkpoints per round so lineage
    * stays flat. Hot hubs are AQE skew-join territory. Sync LPA on a
    * bipartite-ish graph can oscillate — `iters` is a hard bound, not a
    * convergence test, exactly so the cost is fixed and replayable.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    val sym = ed.union(ed.select(col("__d").as("__s"), col("__s").as("__d")))
      .filter(col("__s") =!= col("__d")).distinct()
      .localCheckpoint(false) // reused by every round
    var labels = sym.select(col("__s").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(false)
    for (_ <- 0 until iters) {
      labels = sym.join(labels, col("__s") === col("node"))
        .groupBy(col("__d").as("nd"), col("lbl"))
        .agg(count(lit(1)).as("__c"))
        // argmax by (count, then smallest label): labels are node ids >= 0
        .groupBy(col("nd").as("node"))
        .agg(max(struct(col("__c"), (-col("lbl")).as("__nl"))).as("__m"))
        .select(col("node"), (-col("__m.__nl")).as("lbl"))
        .localCheckpoint(false) // bound lineage across rounds
    }
    labels
  }

  /** Neighbor-set similarity ("related items"): for every node pair
    * sharing at least one neighbor, the common-neighbor count and the
    * Jaccard of their neighbor SETS, J = |N(a)∩N(b)| / (deg a + deg b −
    * |∩|), as integer ppm. Top `k` pairs by (jaccard, then ids) — the
    * link-prediction / item-item collaborative-filtering primitive.
    * Edges are symmetrized + deduped here, like [[labelPropagation]].
    *
    * Scale shape: the pair stream is the canonical TWO-HOP equi-join on
    * the shared neighbor (e1.s = e2.s, d1 < d2) — cost Σ_x deg(x)²,
    * hub-bounded, never |V|²; real corpora cap or sample mega-hubs
    * upstream (the same hot-key discipline as the shingle DF cap in
    * [[DedupOps]]). Degrees are one aggregation; the top-k is a
    * TakeOrdered, never a global sort.
    */
  def commonNeighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
                            k: Int): DataFrame = {
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    val sym = ed.union(ed.select(col("__d").as("__s"), col("__s").as("__d")))
      .filter(col("__s") =!= col("__d")).distinct()
      .localCheckpoint(false) // degree agg + both two-hop sides
    val deg = sym.groupBy(col("__d").as("v")).agg(count(lit(1)).as("dg"))
    val pairs = sym.as("e1").join(sym.as("e2"),
        col("e1.__s") === col("e2.__s") && col("e1.__d") < col("e2.__d"))
      .groupBy(col("e1.__d").as("a"), col("e2.__d").as("b"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(deg.select(col("v").as("a"), col("dg").as("__da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("dg").as("__db")), Seq("b"))
      .select(col("a"), col("b"), col("c"),
        call_function("div", col("c") * 1000000L,
          col("__da") + col("__db") - col("c")).as("jac_ppm"))
      .orderBy(col("jac_ppm").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Fixed-round Bellman–Ford: single-source(-set) shortest WEIGHTED
    * distances after `rounds` synchronous relaxations — exact for every
    * node whose shortest path uses <= `rounds` edges (the distributed
    * SSSP form; nodes not yet reached are absent). Directed edges as
    * given, non-negative integer weights. Deterministic: min-aggregation
    * over (distance) with no tie ambiguity — distances are values, not
    * picks.
    *
    * Scale shape: [[pageRankScaled]]'s discipline — edge relation
    * checkpointed once; each round is one equi-join of edges against
    * the node-sized distance relation, one union, one min-aggregation,
    * re-checkpointed. Relaxation count bounds cost on adversarial
    * diameters exactly like [[bfsHops]]' maxHops.
    */
  def bellmanFordDistances(edges: DataFrame, srcCol: String, dstCol: String,
                           weightCol: String, seeds: DataFrame, seedCol: String,
                           rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"), col(weightCol).cast("long").as("__w"))
      .localCheckpoint(false) // reused by every round
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    for (_ <- 0 until rounds) {
      dist = ed.join(dist, col("__s") === col("node"))
        .select(col("__d").as("node"), (col("dist") + col("__w")).as("dist"))
        .union(dist)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(false) // bound lineage across rounds
    }
    dist
  }

  /** Fixed-round k-core peeling: `rounds` synchronous rounds of "drop
    * every node with degree < k, then induce the subgraph on the
    * survivors" — the dense-core extractor (community cores, spam/bot
    * rings, the warm-up filter before expensive clique work). Exact
    * k-core needs peeling to a fixpoint; a FIXED round count makes the
    * cost bounded and the result replayable (it converges to the true
    * core once no round removes a node — real graphs peel in a handful
    * of rounds; raise `rounds` until the spec's fixpoint check holds if
    * exactness matters). Edges symmetrized + deduped as in
    * [[labelPropagation]]. Output: (node, deg) — degrees IN the induced
    * subgraph after the last round.
    *
    * Scale shape: per round one degree aggregation + two semi-joins to
    * induce the surviving subgraph; state re-checkpoints per round so
    * lineage stays flat. Never materializes anything beyond the
    * (shrinking) edge relation.
    */
  def kCoreMembers(edges: DataFrame, srcCol: String, dstCol: String,
                   k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    var cur = ed.union(ed.select(col("__d").as("__s"), col("__s").as("__d")))
      .filter(col("__s") =!= col("__d")).distinct()
      .localCheckpoint(false)
    for (_ <- 0 until rounds) {
      val alive = cur.groupBy(col("__d").as("node")).agg(count(lit(1)).as("__dg"))
        .filter(col("__dg") >= k).select(col("node"))
        .localCheckpoint(false) // both semi-joins below
      cur = cur
        .join(alive.select(col("node").as("__s")), Seq("__s"), "left_semi")
        .join(alive.select(col("node").as("__d")), Seq("__d"), "left_semi")
        .localCheckpoint(false) // bound lineage across rounds
    }
    cur.groupBy(col("__d").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Multi-source BFS: the minimum hop distance from any seed node,
    * capped at `maxHops` (unreached nodes are absent). Classic frontier
    * iteration — round h joins the previous frontier against the edge
    * list and anti-joins the visited set, so each round's cost is
    * proportional to the frontier's out-edges, never the whole graph,
    * and a node is settled exactly once (BFS layering makes the first
    * discovery the minimum distance; no min-agg re-visits needed).
    * Edges are directed as given; symmetrize upstream for undirected
    * reachability. Output: (node, hops).
    *
    * Scale shape: edge relation checkpointed once; visited/frontier are
    * node-sized and re-checkpoint per round. The per-round emptiness
    * probe is `frontier.isEmpty` — a limit-1 scan, not a count. This is
    * the join-anti-join form that survives 100 TB edge lists (no driver
    * adjacency, no global windows); `maxHops` bounds worst-case rounds
    * on adversarial diameters.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"need maxHops >= 0, got $maxHops")
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
      .localCheckpoint(false) // reused by every round
    var visited = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint(false)
    var frontier = visited
    var h = 0L
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      frontier = ed.join(frontier, col("__s") === col("node"))
        .select(col("__d").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(false)
      visited = visited.union(frontier).localCheckpoint(false)
    }
    visited
  }

  /** Time-RESPECTING reachability (temporal BFS / contagion spread):
    * over edges (src, dst, t), a node v is reachable at time t' iff some
    * edge (u, v, t'=t) has t >= the time u itself was reached — paths
    * must move forward in time, the semantics behind contact tracing,
    * info-cascade, and recall-propagation questions that plain BFS
    * (which happily walks a Tuesday edge after a Friday one) gets
    * wrong. Seeds start at `t0`. `rounds` fixed relaxation rounds
    * (temporal diameter bound); output (node, earliest) — the earliest
    * time each reached node can be infected.
    *
    * Scale shape: each round is one equi-join of the edge relation
    * (checkpointed once) against the current arrival state + a dst-keyed
    * min aggregation — the pregel discipline of [[pageRankScaled]];
    * state is node-sized, re-checkpointed per round. The time filter is
    * a row-local post-join predicate on the src equi-join.
    */
  def temporalReachability(edges: DataFrame, srcCol: String, dstCol: String,
                           tCol: String, seeds: DataFrame, seedCol: String,
                           t0: Column, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"), col(tCol).cast("long").as("__t"))
      // NOT pre-hashed on __s (r15, measured): the arrival relation
      // broadcasts at bench scale, so a pre-hash only added an exchange
      // (q256 A/B read 4.33 -> 4.83); see pathThroughput for the
      // non-broadcastable case where the pre-hash pays
      .localCheckpoint(false) // reused by every round
    var arr = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("earliest", t0.cast("long"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val relaxed = ed.join(arr, col("__s") === col("node"))
        .filter(col("__t") >= col("earliest"))
        .select(col("__d").as("node"), col("__t").as("earliest"))
      arr = arr.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("earliest")).as("earliest"))
        .localCheckpoint(false)
    }
    arr
  }

  /** Hierarchy (BOM / org-chart) subtree rollup — the recursive-CTE
    * aggregation Spark SQL lacks, expressed as a depth-bounded iterative
    * closure. `nodes` carries one row per node: `idCol`, `parentCol`
    * (null for roots), `valueCol` (long). Output per node: `node`,
    * `depth` (proper-ancestor count, 0 at roots), `n_desc` (subtree size
    * including self), `subtree_value` (sum of `valueCol` over the
    * subtree including self).
    *
    * Fails loudly (require) if the frontier is non-empty after
    * `maxDepth` rounds — a cycle or an underestimated depth must never
    * silently truncate a rollup.
    *
    * Scale shape: round k joins the (node, k-th ancestor) frontier to
    * the parent edge relation — every shuffle keys on the ancestor id;
    * the closure materializes n·depth rows (depth is log-ish for any
    * sane hierarchy, and `maxDepth` caps it), each round
    * localCheckpointed so the lineage never compounds. The rollup is
    * one aggregation keyed on the ancestor. No windows, no driver-side
    * row data — the only driver probe is the frontier-emptiness check,
    * the same discipline as [[bfsHops]].
    */
  def subtreeRollup(nodes: DataFrame, idCol: String, parentCol: String,
                    valueCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"need maxDepth >= 1, got $maxDepth")
    val base = nodes.select(col(idCol).cast("long").as("__id"),
      col(parentCol).cast("long").as("__p"),
      col(valueCol).cast("long").as("__v"))
      .localCheckpoint(false) // reused by every round
    val edges = base.select(col("__id").as("__c"), col("__p").as("__a"))
      .filter(col("__a").isNotNull)
      .localCheckpoint(false)
    var closure = base.select(col("__id").as("node"), col("__id").as("anc"))
      .localCheckpoint(false)
    var frontier = closure
    var k = 0L
    while (k < maxDepth && !frontier.isEmpty) {
      k += 1
      frontier = frontier.join(edges, col("anc") === col("__c"))
        .select(col("node"), col("__a").as("anc"))
        .localCheckpoint(false)
      closure = closure.union(frontier).localCheckpoint(false)
    }
    // completeness = nothing lies BEYOND the accumulated closure: probe
    // one more (non-accumulated) step. Testing the LAST frontier itself
    // spuriously aborted when the hierarchy depth EQUALED maxDepth — the
    // distance-maxDepth pairs are in the closure and the rollup is exact;
    // only a non-empty step past them means truncation (or a cycle).
    val beyond = frontier.join(edges, col("anc") === col("__c"))
    require(beyond.isEmpty,
      s"hierarchy deeper than maxDepth=$maxDepth (or cyclic) — refusing to truncate the rollup")
    val rolled = closure
      .join(base.select(col("__id").as("node"), col("__v")), Seq("node"))
      .groupBy(col("anc"))
      .agg(count(lit(1)).as("n_desc"), sum(col("__v")).as("subtree_value"))
    val depths = closure.groupBy(col("node"))
      .agg((count(lit(1)) - 1L).as("depth"))
    depths.join(rolled, col("node") === col("anc"))
      .select(col("node"), col("depth"), col("n_desc"), col("subtree_value"))
  }

  /** Harmonic centrality of a PIVOT SAMPLE, hop-bounded: for each seed,
    * H = Σ_{v reached, d(seed,v) ≤ maxHops} 1/d — emitted integer-exact
    * as h_scaled = Σ LCM(1..maxHops)/d (every term divides evenly, no
    * float sum). Sampled pivots are the standard scale move for
    * centrality (Eppstein–Wang): exact values for the sample, pivot
    * count the cost dial — never all-pairs BFS. The hop cap bounds both
    * semantics (local centrality) and cost.
    *
    * Scale shape: [[bfsHops]]'s frontier discipline carrying the seed
    * id through every round — per-round cost is one edge equi-join
    * against the (seed, node) frontier + an anti-join against the
    * visited relation, both keyed, all localCheckpointed; state is
    * (seeds × reach)-sized. Isolated seeds (nothing reached) are absent
    * from the output, matching the oracle's dist > 0 filter.
    */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         seeds: DataFrame, seedCol: String,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 20, s"need 1 <= maxHops <= 20, got $maxHops")
    val lcm = QualityOps.lcmTo(maxHops)
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
      .localCheckpoint(false) // reused by every round
    var visited = seeds.select(col(seedCol).cast("long").as("src")).distinct()
      .withColumn("node", col("src"))
      .withColumn("hops", lit(0L))
      .localCheckpoint(false)
    var frontier = visited
    var h = 0L
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      frontier = ed.join(frontier, col("__s") === col("node"))
        .select(col("src"), col("__d").as("node")).distinct()
        .join(visited, Seq("src", "node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(false)
      visited = visited.unionByName(frontier).localCheckpoint(false)
    }
    visited.filter(col("hops") > 0L)
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("n_reached"),
        sum(call_function("div", lit(lcm), col("hops"))).as("h_scaled"))
  }

  /** k-truss decomposition, rounds-bounded (Cohen 2008, "Trusses:
    * cohesive subgraphs for social network analysis"): iteratively peel
    * every edge supported by fewer than k−2 triangles until the edge
    * set is stable — the community-core structure one rung above k-core
    * (membership requires TRIANGLES, not mere degree). `rounds` peels
    * are unrolled; extra rounds past convergence are no-ops, so a
    * rounds-bounded run equals the fixpoint once the fixture converges
    * (callers pick rounds from the graph's peel depth). Output: the
    * surviving edges with their support IN the truss,
    * (a, b, support), a < b, ordered.
    *
    * Scale shape: per round, ONE wedge self-join oriented low-to-high
    * (each triangle generated exactly once, a < b < c — the standard
    * compact-forward plan whose work is O(Σ d(v)²) on the pruned set,
    * shrinking every round) plus an edge-keyed support count; the edge
    * set re-checkpoints per round so lineage never compounds.
    */
  def kTruss(edges: DataFrame, aCol: String, bCol: String,
             k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && k <= 16, s"need 3 <= k <= 16, got $k")
    require(rounds >= 1 && rounds <= 8, s"need 1..8 rounds, got $rounds")
    val norm = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct()
    def support(e: DataFrame): DataFrame = {
      val tri = e.as("e1").join(e.as("e2"),
          col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        .join(e.as("e3"),
          col("y") === col("e3.a") && col("z") === col("e3.b"))
        .select(col("x"), col("y"), col("z"))
      tri.select(col("x").as("a"), col("y").as("b"))
        .unionAll(tri.select(col("x").as("a"), col("z").as("b")))
        .unionAll(tri.select(col("y").as("a"), col("z").as("b")))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    }
    var e = norm.localCheckpoint(false)
    for (_ <- 1 to rounds) {
      e = e.join(support(e), Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .select(col("a"), col("b"))
        .localCheckpoint(false)
    }
    // LEFT join: a rounds-bounded peel can leave survivors whose support
    // dropped to ZERO in the final edge set — an inner join silently
    // peeled them once more, so the output no longer replayed exactly
    // `rounds` peels (converged runs are unaffected: every survivor has
    // support >= k-2 > 0 there)
    e.join(support(e), Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
      .orderBy(col("a"), col("b"))
  }

  /** Integer-exact HITS (Kleinberg 1999) over a directed edge list:
    * `iters` mutual-reinforcement rounds of authority = Σ hub of
    * in-neighbors, hub = Σ authority of out-neighbors, each side
    * max-normalized to `scale` by floor division (the top hub and top
    * authority always land exactly at `scale`, so scores are comparable
    * across rounds and engines — no float L2 norm to drift). Returns one
    * row per node and side: (node, side∈{hub,auth}, score).
    *
    * Unlike [[pageRankScaled]] the two score vectors live on DIFFERENT
    * node sets (sources vs destinations) — on a bipartite graph such as
    * customer→supplier trade this is the "good buyers vs good products"
    * decomposition PageRank can't express.
    *
    * Overflow bound (ENFORCED by the caller's data contract, documented
    * not checked): raw sums are ≤ max-degree·scale ≤ ~1e10 at 1e4-degree
    * hubs; ·scale again in the normalize stays < 2^63. At 100 TB keep
    * scale at 1e6 and degree under ~9e5, or pre-aggregate multi-edges.
    *
    * Scale shape: the pregel discipline — edge relation checkpointed
    * once, each half-round one equi-join + one dst/src aggregation, the
    * per-round max a one-row broadcast (driver-bounded scalar, the
    * RangePrefix tradition), vertex state node-sized and re-checkpointed
    * per round. Hot authorities are AQE skew-join territory.
    */
  def hitsScaled(edges: DataFrame, srcCol: String, dstCol: String,
                 iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val ed = edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .distinct().localCheckpoint(false) // reused by every half-round
    // NOT pre-hashed per join key (r15, measured): the score relations
    // broadcast at bench scale, so two extra pre-hashed edge copies only
    // added their checkpoint materializations (q302 A/B read
    // 2.89 -> 4.03 with them)
    val hubs = ed.select(col("__src").as("node")).distinct()
      .localCheckpoint(false)
    val auths = ed.select(col("__dst").as("node")).distinct()
      .localCheckpoint(false)
    var h = hubs.withColumn("h", lit(scale))
    var a = auths.withColumn("a", lit(0L)) // overwritten by round 1
    for (_ <- 0 until iters) {
      val araw = ed.join(h, col("__src") === col("node"))
        .groupBy(col("__dst").as("node")).agg(sum(col("h")).as("__ar"))
      val amax = araw.agg(max(col("__ar")).as("__am"))
      // every dst has in-degree >= 1 by construction, so araw covers
      // auths exactly; the join is a rebase, not a left-fill
      a = auths.join(araw, Seq("node"))
        .crossJoin(broadcast(amax))
        .select(col("node"),
          call_function("div", col("__ar") * scale, col("__am")).as("a"))
        .localCheckpoint(false)
      val hraw = ed.join(a, col("__dst") === col("node"))
        .groupBy(col("__src").as("node")).agg(sum(col("a")).as("__hr"))
      val hmax = hraw.agg(max(col("__hr")).as("__hm"))
      h = hubs.join(hraw, Seq("node"))
        .crossJoin(broadcast(hmax))
        .select(col("node"),
          call_function("div", col("__hr") * scale, col("__hm")).as("h"))
        .localCheckpoint(false)
    }
    h.select(col("node"), lit("hub").as("side"), col("h").as("score"))
      .unionByName(
        a.select(col("node"), lit("auth").as("side"), col("a").as("score")))
  }

  /** Degree assortativity (Newman 2002) over an undirected unique-edge
    * list, in EXACT integer moments: over the M = 2m directed endpoint
    * pairs (x, y) = (deg(u), deg(v)),
    *   num = M·Σxy − (Σx)²,   den = M·Σx² − (Σx)²
    * (Σx = Σy and Σx² = Σy² by symmetry), r = num/den. One row out:
    * (m_edges, num, den, r_ppm), where r_ppm is the floor-div ppm
    * computed POSITIVE-SHIFTED — (num + den)·1e6 div den − 1e6 — so
    * trunc-vs-floor integer-division semantics can never diverge
    * between engines on a negative r (num ≥ −den by Cauchy–Schwarz, so
    * the shifted numerator is ≥ 0).
    *
    * int64 bound: M·Σx² then ·1e6 — safe while 2m·Σdeg² < ~9e12
    * (rescale the ppm step past that). REGULAR graphs (all degrees
    * equal: cycles, perfect matchings, cliques) have den = 0 and report
    * r_ppm = NULL — assortativity is undefined at zero degree variance.
    *
    * Scale shape: one degree aggregation, two equi-joins of the edge
    * list against the node-sized degree relation, one global moment
    * aggregate — no windows, no self-join, map-side partials all the
    * way down. Hot hubs skew the degree join: AQE skew-join territory.
    */
  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("__a"),
      col(bCol).cast("long").as("__b"))
    val sym = e.union(e.select(col("__b").as("__a"), col("__a").as("__b")))
      .localCheckpoint(false) // feeds the degree build and both probes
    val deg = sym.groupBy(col("__a").as("__n")).agg(count(lit(1)).as("__deg"))
    val m = sym
      .join(deg.select(col("__n").as("__a"), col("__deg").as("__dx")), Seq("__a"))
      .join(deg.select(col("__n").as("__b"), col("__deg").as("__dy")), Seq("__b"))
      .agg(count(lit(1)).as("__m2"), sum(col("__dx")).as("__sx"),
        sum(col("__dx") * col("__dx")).as("__sxx"),
        sum(col("__dx") * col("__dy")).as("__sxy"))
    // den = M·Σx² − (Σx)² is EXACTLY 0 for any regular graph (cycle,
    // perfect matching, clique — all endpoint degrees equal, zero degree
    // variance): assortativity is undefined there, so r_ppm is an
    // explicit NULL rather than whatever a div-by-zero happens to yield
    // in a given engine. The convention holds in both directions: the
    // q318-family guards use the same explicit when(den === 0, null).
    val den = col("__m2") * col("__sxx") - col("__sx") * col("__sx")
    m.select(
      call_function("div", col("__m2"), lit(2L)).as("m_edges"),
      (col("__m2") * col("__sxy") - col("__sx") * col("__sx")).as("num"),
      den.as("den"),
      when(den === 0L, lit(null).cast("long")).otherwise(
        call_function("div",
          (col("__m2") * col("__sxy") - col("__sx") * col("__sx") + den) * 1000000L,
          den) - 1000000L).as("r_ppm"))
  }

  /** Shortest-path throughput centrality from a seed set — the exact
    * integer core of Brandes' betweenness (Brandes 2001) without the
    * fractional pair-dependency normalization: for every seed s and
    * node v, σ(s,v) counts shortest s→v paths (the forward BFS sigma
    * accumulation) and τ(s,v) counts shortest-path-DAG suffixes from v
    * (the backward level-by-level accumulation, τ = 1 + Σ τ(successor)).
    * The reported statistic, throughput(v) = Σ_s σ(s,v)·τ(s,v), is the
    * EXACT number of (s, t, P) triples where P is a shortest s→t path
    * passing through v (t ranges over all nodes, including v itself) —
    * an integer, so the oracle can replay it bit-for-bit where true
    * betweenness' σ_sv·σ_vt/σ_st fractions could not. Hop distance is
    * capped at `rounds` (paths longer than the cap don't count — the
    * documented contract, same as [[bfsHops]]).
    *
    * Feed a SYMMETRIC edge list for undirected graphs. Seeds outside
    * the graph contribute a singleton (σ=τ=1) row for themselves.
    *
    * Scale shape: the pregel discipline — edge relation checkpointed
    * once; each forward round one equi-join + one (seed, node)
    * aggregation + one anti-join against the seen set; each backward
    * round one equi-join against the next level's τ state; all state
    * is (seeds × reached nodes)-sized, checkpointed per round so the
    * plan never accretes lineage. σ·τ products stay in int64 while
    * path counts are < ~3e9 per (seed, node) — sparse co-purchase
    * territory; cap `rounds` lower on dense graphs.
    */
  def pathThroughput(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val ed = edges.select(col(srcCol).cast("long").as("__s"),
        col(dstCol).cast("long").as("__d"))
      .distinct()
      // NO pre-hash on __s (r16 revert of the r15 edge pre-hash): the r15
      // driver run read q310 0.79x, and the r16 fresh-JVM A/B confirms —
      // 32-core min 2.13 s without vs 2.35 s with (6 samples each). Same
      // verdict as the pageRank/temporal/HITS A/Bs (r15): the per-round
      // probe side is small enough that the joins never shuffle the frozen
      // edges, so the build-time exchange is pure cost. Becomes right only
      // at a scale where the per-round join side stops broadcasting.
      .localCheckpoint(false) // reused by every round, both sweeps
    val l0 = seeds.select(col(seedCol).cast("long").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(1L).as("sig"))
      .localCheckpoint(false)
    val levels = scala.collection.mutable.ArrayBuffer(l0)
    var seen = l0.select(col("seed"), col("node")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val nxt = levels.last.join(ed, col("node") === col("__s"))
        .groupBy(col("seed"), col("__d"))
        .agg(sum(col("sig")).as("sig"))
        .select(col("seed"), col("__d").as("node"), col("sig"))
        .join(seen, Seq("seed", "node"), "left_anti")
        .localCheckpoint(false)
      seen = seen.union(nxt.select(col("seed"), col("node")))
        .localCheckpoint(false)
      levels += nxt
    }
    // backward: τ at the deepest level is 1 (only the empty suffix);
    // each shallower level sums its DAG successors' τ over the edges
    var tau = levels(rounds).select(col("seed"), col("node"), lit(1L).as("tau"))
      .localCheckpoint(false)
    val contribs = scala.collection.mutable.ArrayBuffer(
      levels(rounds).select(col("node"), col("sig").as("__pt")))
    for (r <- rounds - 1 to 0 by -1) {
      val lvl = levels(r)
      tau = lvl.as("v")
        .join(ed, col("v.node") === col("__s"), "left")
        .join(tau.as("w"),
          col("__d") === col("w.node") && col("v.seed") === col("w.seed"), "left")
        .groupBy(col("v.seed").as("seed"), col("v.node").as("node"))
        .agg(coalesce(sum(col("w.tau")), lit(0L)).as("__st"))
        .select(col("seed"), col("node"), (col("__st") + 1L).as("tau"))
        .localCheckpoint(false)
      contribs += lvl.join(tau, Seq("seed", "node"))
        .select(col("node"), (col("sig") * col("tau")).as("__pt"))
    }
    contribs.reduce(_ union _)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_sources"), sum(col("__pt")).as("throughput"))
  }
}
