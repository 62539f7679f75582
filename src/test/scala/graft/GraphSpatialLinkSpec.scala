package graft

import graft.operators.{GraphOps, LinkageOps, QualityOps, SamplingOps, SimilarityOps, SpatialOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: label propagation, BFS hops, grid spatial join,
  * Benford screen, strided interleave, fixed-point projection, record
  * linkage, postings-index BM25 serving.
  */
class GraphSpatialLinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- labelPropagation ----------------------------------------------------

  test("labelPropagation: disjoint triangles converge to their min node id") {
    val ed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val got = GraphOps.labelPropagation(ed, "a", "b", 2)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)))
  }

  test("labelPropagation: one round of the hand-computed min-tie argmax") {
    // triangle only: after ONE sync round each node holds the min of its
    // NEIGHBOR ids (all neighbor labels distinct -> count tie -> min)
    val ed = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val got = GraphOps.labelPropagation(ed, "a", "b", 1)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  // ---- bfsHops -------------------------------------------------------------

  test("bfsHops: directed path layering, cap, and graph-less seeds") {
    val ed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(1L, 99L).toDF("n") // 99 has no edges: present at hop 0
    val got = GraphOps.bfsHops(ed, "s", "d", seeds, "n", 3)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (99L, 0L)))
  }

  test("bfsHops: min distance wins when layers overlap") {
    // 1->3 directly and 1->2->3: node 3 must settle at hop 1, not 2
    val ed = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val got = GraphOps.bfsHops(ed, "s", "d", Seq(1L).toDF("n"), "n", 5)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 1L)))
  }

  // ---- gridNeighborPairs ---------------------------------------------------

  test("gridNeighborPairs: equals brute force on a hash-scattered point set") {
    val pts = (1L to 60L).map { i =>
      val x = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"px$i")) % 1000L
      val y = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"py$i")) % 1000L
      (i, x, y)
    }
    val df = pts.toDF("id", "x", "y")
    val got = SpatialOps.gridNeighborPairs(df, "id", "x", "y", 200L, 200L)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq
    val brute = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts if i < j
      d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) if d2 <= 200L * 200L
    } yield (i, j, d2)).sorted
    assert(got === brute && brute.nonEmpty)
  }

  test("gridNeighborPairs: cross-cell neighbors survive, radius is inclusive") {
    val df = Seq((1L, 149L, 0L), (2L, 151L, 0L), (3L, 149L, 150L), (4L, 5000L, 5000L))
      .toDF("id", "x", "y")
    // cell pitch 150: ids 1/2 straddle a cell boundary at distance 2
    val got = SpatialOps.gridNeighborPairs(df, "id", "x", "y", 150L, 150L)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq
    // (2,3) is at dist² 22504 > 150²: just outside, must be excluded
    assert(got === Seq((1L, 2L, 4L), (1L, 3L, 22500L)))
    intercept[IllegalArgumentException] {
      SpatialOps.gridNeighborPairs(df, "id", "x", "y", 100L, 150L)
    }
  }

  test("gridNeighborPairs: cross-origin pairs survive on negative planes") {
    // truncating division would fold cells (-cell, 0) and [0, cell)
    // together AND separate these two points into non-adjacent cells'
    // neighborhoods incorrectly; exact floor bucketing keeps them at
    // adjacent cells -1 and 0
    val df = Seq((1L, -3L, 0L), (2L, 3L, 0L), (3L, -450L, -450L)).toDF("id", "x", "y")
    val got = SpatialOps.gridNeighborPairs(df, "id", "x", "y", 100L, 100L)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 36L)))
    // brute-force parity on a random mixed-sign cloud
    val pts = (1L to 40L).map { i =>
      val x = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"nx$i")) % 700L - 350L
      val y = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"ny$i")) % 700L - 350L
      (i, x, y)
    }
    val got2 = SpatialOps.gridNeighborPairs(pts.toDF("id", "x", "y"),
      "id", "x", "y", 150L, 150L).as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts if i < j
      d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) if d2 <= 150L * 150L
    } yield (i, j, d2)).sorted
    assert(got2 === brute && brute.nonEmpty)
  }

  // ---- nearestNeighborGrid -------------------------------------------------

  test("nearestNeighborGrid: equals brute force, incl. the desert-probe fallback") {
    val fac = (1L to 25L).map { i =>
      val x = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"fx$i")) % 1000L
      val y = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"fy$i")) % 1000L
      (i, x, y)
    }
    // probe 61 sits ~40 cells away from the cloud: no ring reaches it, so
    // it must resolve through the residual brute branch — still exact
    val prb = (1L to 60L).map { i =>
      val x = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"qx$i")) % 1000L
      val y = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"qy$i")) % 1000L
      (i, x, y)
    } :+ (61L, 9000L, 9000L)
    val got = SpatialOps.nearestNeighborGrid(prb.toDF("id", "x", "y"),
        "id", "x", "y", fac.toDF("fid", "fx", "fy"), "fid", "fx", "fy", 200L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = prb.map { case (i, xi, yi) =>
      val (d2, f) = fac.map { case (j, xj, yj) =>
        ((xi - xj) * (xi - xj) + (yi - yj) * (yi - yj), j)
      }.min
      (i, f, d2)
    }.sorted
    assert(got === brute && got.size === prb.size)
  }

  test("nearestNeighborGrid: exact min-id tie across a cell boundary") {
    // probe at x=200 (a cell edge, pitch 100) equidistant from facilities
    // at 150 and 250 sitting in DIFFERENT cells: distance ties at 50² and
    // the strict d2 < (r*cell)² resolve rule must still pick fid 1 —
    // resolution happens only in the ring that has seen both
    val prb = Seq((10L, 200L, 0L)).toDF("id", "x", "y")
    val fac = Seq((2L, 250L, 0L), (1L, 150L, 0L)).toDF("fid", "fx", "fy")
    val got = SpatialOps.nearestNeighborGrid(prb, "id", "x", "y",
      fac, "fid", "fx", "fy", 100L).as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((10L, 1L, 2500L)))
  }

  test("nearestNeighborGrid: negative-plane probes bucket by exact floor") {
    val prb = Seq((1L, -3L, -3L)).toDF("id", "x", "y")
    val fac = Seq((7L, 3L, 3L), (8L, -500L, -500L)).toDF("fid", "fx", "fy")
    val got = SpatialOps.nearestNeighborGrid(prb, "id", "x", "y",
      fac, "fid", "fx", "fy", 100L).as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 7L, 72L)))
  }

  // ---- benfordScreen -------------------------------------------------------

  test("benfordScreen: digit extraction, ppm shares, nonpositive exclusion") {
    val df = Seq(("a", 100L), ("a", 2345L), ("a", 31L), ("a", 999L),
      ("a", 0L), ("a", -5L), ("b", 777L)).toDF("g", "cents")
    val got = QualityOps.benfordScreen(df, "g", col("cents"))
      .orderBy(col("group"), col("digit")).collect()
    val a = got.filter(_.getAs[String]("group") == "a")
    assert(a.map(r => (r.getAs[Int]("digit"), r.getAs[Long]("n"),
      r.getAs[Long]("ppm"))).toSeq ===
      Seq((1, 1L, 250000L), (2, 1L, 250000L), (3, 1L, 250000L), (9, 1L, 250000L)))
    val d9 = a.last
    assert(d9.getAs[Long]("benford_ppm") === 45757L)
    assert(d9.getAs[Long]("dev_ppm") === 250000L - 45757L)
    val b = got.filter(_.getAs[String]("group") == "b")
    assert(b.map(r => (r.getAs[Int]("digit"), r.getAs[Long]("ppm"))).toSeq ===
      Seq((7, 1000000L)))
  }

  // ---- stridedInterleave ---------------------------------------------------

  test("stridedInterleave: 75/25 weights give 3:1 proportional prefixes") {
    val docs = ((1 to 8).map(i => (s"a$i", "a")) ++ (1 to 8).map(i => (s"b$i", "b")))
      .toDF("id", "src")
    val wts = Seq(("a", 750L), ("b", 250L)).toDF("group", "permille")
    val got = SamplingOps.stridedInterleave(docs, "id", "src", wts)
      .orderBy(col("ikey"), col("group"), col("rnk"))
      .select(col("group")).as[String].collect().toSeq
    assert(got.take(8).count(_ == "a") === 6)
    assert(got.take(8).count(_ == "b") === 2)
    // stride formula itself: rank r of group w gets ((2r-1)*500000)//w
    val keys = SamplingOps.stridedInterleave(docs, "id", "src", wts)
      .filter(col("group") === "b").orderBy(col("rnk"))
      .select(col("ikey")).as[Long].collect().toSeq
    assert(keys === Seq(2000L, 6000L, 10000L, 14000L, 18000L, 22000L, 26000L, 30000L))
  }

  test("stridedInterleave: weight-0 groups are excluded") {
    val docs = Seq(("x", "a"), ("y", "b")).toDF("id", "src")
    val wts = Seq(("a", 1000L), ("b", 0L)).toDF("group", "permille")
    val got = SamplingOps.stridedInterleave(docs, "id", "src", wts)
      .select(col("group")).as[String].collect().toSeq
    assert(got === Seq("a"))
  }

  // ---- projectFixedPoint ---------------------------------------------------

  test("projectFixedPoint: exact fixed-point matrix-vector product") {
    val df = Seq((1L, Seq(0.5f, -0.25f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("id", "v")
    val w = Seq(Seq(1L, 2L), Seq(3L, 4L))
    val got = SimilarityOps.projectFixedPoint(df, "id", "v", w, 1000L)
      .orderBy(col("id")).as[(Long, Long, Long)].collect().toSeq
    // q(1) = [500, -250]: p0 = 500 - 500 = 0, p1 = 1500 - 1000 = 500
    // q(2) = [1000, 1000]: p0 = 3000, p1 = 7000
    assert(got === Seq((1L, 0L, 500L), (2L, 3000L, 7000L)))
  }

  // ---- linkPairs -----------------------------------------------------------

  test("linkPairs: agreement flags, additive score, three-way decision") {
    val left = Seq((1L, "ann", 10L, "blk")).toDF("lid", "lname", "lbal", "blk")
    val right = Seq((9L, "ann", 10L, "blk"), (8L, "ann", 11L, "blk"),
      (7L, "bob", 11L, "blk")).toDF("rid", "rname", "rbal", "blk")
    val got = LinkageOps.linkPairs(left, right, "blk", Seq(
      LinkageOps.Agreement("name", col("lname") === col("rname"), 20L, -10L),
      LinkageOps.Agreement("bal", col("lbal") === col("rbal"), 12L, -4L)),
      10L, 30L)
      .select(col("rid"), col("name_agree"), col("bal_agree"), col("score"), col("cls"))
      .orderBy(col("rid")).collect()
    // rid 7: -10 - 4 = -14 dropped; rid 8: 20 - 4 = 16 possible; rid 9: 32 link
    assert(got.map(_.getAs[Long]("rid")).toSeq === Seq(8L, 9L))
    assert(got.map(_.getAs[Long]("score")).toSeq === Seq(16L, 32L))
    assert(got.map(_.getAs[String]("cls")).toSeq === Seq("possible", "link"))
    assert(got.map(_.getAs[Boolean]("bal_agree")).toSeq === Seq(false, true))
  }

  test("linkPairs: null comparisons count as disagreement") {
    val left = Seq((1L, null.asInstanceOf[String], "blk")).toDF("lid", "lname", "blk")
    val right = Seq((9L, "ann", "blk")).toDF("rid", "rname", "blk")
    val got = LinkageOps.linkPairs(left, right, "blk", Seq(
      LinkageOps.Agreement("name", col("lname") === col("rname"), 20L, -10L)),
      -100L, 5L).select(col("name_agree"), col("score")).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Boolean]("name_agree") === false)
    assert(got.head.getAs[Long]("score") === -10L)
  }

  // ---- commonNeighborJaccard -----------------------------------------------

  test("commonNeighborJaccard: 4-cycle diagonals share both neighbors") {
    val ed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = GraphOps.commonNeighborJaccard(ed, "a", "b", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // N(1)=N(3)={2,4}, N(2)=N(4)={1,3}: the diagonals have c=2 over a
    // union of 2 -> Jaccard 1.0; adjacent pairs share nothing
    assert(got === Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("commonNeighborJaccard: partial overlap computes the exact ppm") {
    // star 0-{1,2,3} plus edge 1-2: N(1)={0,2}, N(2)={0,1}, N(3)={0}
    val ed = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("a", "b")
    val got = GraphOps.commonNeighborJaccard(ed, "a", "b", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // (1,2): common {0} of union {0,1,2} -> 333333 ppm
    // (1,3): common {0} of union {0,2} -> 500000; (2,3): same
    // (0,1): N(0)={1,2,3}, N(1)={0,2}: common {2} of union 4 -> 250000
    // (0,2): common {1} / 4 -> 250000; (0,3) common {} absent
    assert(got === Seq((1L, 3L, 1L, 500000L), (2L, 3L, 1L, 500000L),
      (1L, 2L, 1L, 333333L), (0L, 1L, 1L, 250000L), (0L, 2L, 1L, 250000L)))
  }

  // ---- quantileNormalize ---------------------------------------------------

  test("quantileNormalize: per-group ranks map onto global order statistics") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("b", 10L, 5L), ("b", 20L, 6L)).toDF("g", "v", "id")
    val got = graft.operators.SketchOps.quantileNormalize(df, "g", "v", "id")
      .orderBy(col("id")).select(col("qnorm")).as[Long].collect().toSeq
    // global sorted: 1,2,3,4,10,20 (N=6); a (n=4) -> ranks 1,2,4,6;
    // b (n=2) -> ranks 1,6
    assert(got === Seq(1L, 2L, 4L, 20L, 1L, 20L))
  }

  test("quantileNormalize: singleton group lands on the global lower median") {
    val df = Seq(("a", 5L, 1L), ("b", 1L, 2L), ("b", 2L, 3L), ("b", 3L, 4L))
      .toDF("g", "v", "id")
    val got = graft.operators.SketchOps.quantileNormalize(df, "g", "v", "id")
      .orderBy(col("id")).select(col("qnorm")).as[Long].collect().toSeq
    // global sorted: 1,2,3,5 (N=4); a singleton -> rank (4+1)//2 = 2 -> 2;
    // b (n=3) -> ranks 1, 1+(1*3)//2=2, 4 -> 1,2,5
    assert(got === Seq(2L, 1L, 2L, 5L))
  }

  // ---- replayEvaluate ------------------------------------------------------

  test("replayEvaluate: matched-rounds estimator with empty-policy zeroes") {
    val logged = Seq(("A", 100L), ("B", 200L), ("A", 300L)).toDF("arm", "cents")
    val got = graft.operators.PolicyOps.replayEvaluate(logged, "arm",
      col("cents"), Seq(("allA", lit("A")), ("never", lit("C"))))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("allA", 2L, 400L, 200000L), ("never", 0L, 0L, 0L)))
  }

  // ---- compactionPlan ------------------------------------------------------

  test("compactionPlan: size-descending quota bins within one file of target") {
    val files = Seq((1L, 9L), (2L, 7L), (3L, 5L), (4L, 3L), (5L, 1L))
      .toDF("fid", "bytes")
    val got = graft.operators.MaintenanceOps.compactionPlan(files, "fid", "bytes", 10L)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // desc order 9,7,5,3,1 with exclusive cumsums 0,9,16,21,24:
    // bins 0,0,1,2,2 -> (bin, n, sum, first, last)
    assert(got === Seq((0L, 2L, 16L, 1L, 2L), (1L, 1L, 5L, 3L, 3L),
      (2L, 2L, 4L, 4L, 5L)))
  }

  // ---- bellmanFordDistances ------------------------------------------------

  test("bellmanFordDistances: relaxation rounds tighten the weighted path") {
    val ed = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L)).toDF("s", "d", "w")
    val seeds = Seq(1L).toDF("n")
    val r1 = GraphOps.bellmanFordDistances(ed, "s", "d", "w", seeds, "n", 1)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    // one round only relaxes direct edges: 3 is 25 away
    assert(r1 === Seq((1L, 0L), (2L, 10L), (3L, 25L)))
    val r2 = GraphOps.bellmanFordDistances(ed, "s", "d", "w", seeds, "n", 2)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    // the second round finds the two-edge 20 path through 2
    assert(r2 === Seq((1L, 0L), (2L, 10L), (3L, 20L)))
  }

  // ---- kCoreMembers --------------------------------------------------------

  test("kCoreMembers: peels the tail, keeps the triangle, cascades to empty") {
    val ed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.kCoreMembers(ed, "a", "b", 2, 2)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // path graph at k=2 peels from both ends until nothing remains
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(GraphOps.kCoreMembers(path, "a", "b", 2, 3).count() === 0L)
    // one round is NOT enough for the cascade: the middle still stands
    assert(GraphOps.kCoreMembers(path, "a", "b", 2, 1).count() === 3L)
  }

  // ---- intervalUnionLength -------------------------------------------------

  test("intervalUnionLength: merge, touch, containment, islands") {
    val df = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 30L, 40L), // overlap + gap
      ("b", 0L, 10L), ("b", 10L, 20L), // touching merges
      ("c", 0L, 100L), ("c", 10L, 20L), ("c", 150L, 160L)) // containment
      .toDF("k", "s", "e")
    val got = graft.operators.TemporalOps.intervalUnionLength(df, "k", "s", "e")
      .orderBy(col("key")).as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 2L, 30L), ("b", 2L, 1L, 20L), ("c", 3L, 2L, 110L)))
  }

  // ---- fifoMatch -------------------------------------------------------------

  test("fifoMatch: oldest-first allocation, exact split across lots") {
    // supply lots 10 then 5; demands 7 then 6: FIFO gives
    // d1 <- 7 of lot1; d2 <- 3 of lot1 + 3 of lot2
    val sup = Seq(("k", 1L, 10L, 1L), ("k", 2L, 5L, 2L)).toDF("k", "id", "q", "t")
    val dem = Seq(("k", 11L, 7L, 1L), ("k", 12L, 6L, 2L)).toDF("k", "id", "q", "t")
    val got = graft.operators.TemporalOps.fifoMatch(sup, dem, "k", "id", "q", "t", "id")
      .orderBy(col("supply_id"), col("demand_id"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("k", 1L, 11L, 7L), ("k", 1L, 12L, 3L), ("k", 2L, 12L, 3L)))
    // allocations conserve: each demand fully served while supply lasts
    assert(got.filter(_._3 == 12L).map(_._4).sum === 6L)
  }

  test("fifoMatch: zero-quantity rows allocate nothing; edge cases hold") {
    val sup = Seq(("k", 1L, 10L, 1L), ("k", 2L, 0L, 2L)).toDF("k", "id", "q", "t")
    val dem = Seq(("k", 11L, 0L, 1L), ("k", 12L, 10L, 2L)).toDF("k", "id", "q", "t")
    val got = graft.operators.TemporalOps.fifoMatch(sup, dem, "k", "id", "q", "t", "id")
      .as[(String, Long, Long, Long)].collect().toSeq
    // only the real 10-unit lot serves the real 10-unit demand
    assert(got === Seq(("k", 1L, 12L, 10L)))
    // adjacent intervals never cross-allocate at the shared boundary
    val s2 = Seq(("k", 1L, 10L, 1L), ("k", 2L, 5L, 2L)).toDF("k", "id", "q", "t")
    val d2x = Seq(("k", 11L, 10L, 1L)).toDF("k", "id", "q", "t")
    val g2 = graft.operators.TemporalOps.fifoMatch(s2, d2x, "k", "id", "q", "t", "id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(g2 === Seq(("k", 1L, 11L, 10L)))
  }

  test("edge cases: self-loops drop, maxHops 0, coincident points, reserved names") {
    // a self-loop never counts as a neighbor
    val ed = Seq((1L, 1L), (1L, 2L)).toDF("a", "b")
    assert(GraphOps.labelPropagation(ed, "a", "b", 1)
      .orderBy(col("node")).as[(Long, Long)].collect().toSeq ===
      Seq((1L, 2L), (2L, 1L)))
    // maxHops 0 returns exactly the seed layer
    assert(GraphOps.bfsHops(ed, "a", "b", Seq(1L).toDF("n"), "n", 0)
      .as[(Long, Long)].collect().toSeq === Seq((1L, 0L)))
    // coincident points pair at distance 0
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L)).toDF("id", "x", "y")
    assert(SpatialOps.gridNeighborPairs(pts, "id", "x", "y", 10L, 10L)
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 2L, 0L)))
    // reserved-name guard fires before any execution
    intercept[IllegalArgumentException] {
      SamplingOps.stridedInterleave(
        Seq(("x", "a", 1L)).toDF("id", "src", "rnk"), "id", "src",
        Seq(("a", 1000L)).toDF("group", "permille"))
    }
  }

  // ---- lorenzGini ----------------------------------------------------------

  test("lorenzGini: hand-computed buckets, shares, and rank-formula gini") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (7L, 4L)).toDF("v", "id")
    val got = graft.operators.SketchOps.lorenzGini(df, "v", "id", 2)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // ranks 1..4 over 1,1,1,7: sixi = 34, tot = 10,
    // gini = ((68 - 50) div 4) * 1e6 div 10 = 400000
    assert(got === Seq(
      (0L, 2L, 2L, 200000L, 200000L, 400000L),
      (1L, 2L, 8L, 800000L, 1000000L, 400000L)))
    // perfectly equal corpus -> gini 0
    val eq = Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)).toDF("v", "id")
    val g0 = graft.operators.SketchOps.lorenzGini(eq, "v", "id", 2)
      .select(col("gini_ppm")).distinct().as[Long].collect().toSeq
    assert(g0 === Seq(0L))
  }

  // ---- timeWeightedAverage -------------------------------------------------

  test("timeWeightedAverage: piecewise integral, single-instant exclusion, ties") {
    val df = Seq(
      ("a", 0L, 10L, 1L), ("a", 10L, 20L, 2L), ("a", 30L, 99L, 3L),
      ("b", 5L, 42L, 4L), // single point: no span, excluded
      ("c", 0L, 5L, 5L), ("c", 0L, 7L, 6L), ("c", 10L, 1L, 7L))
      .toDF("k", "t", "v", "tie")
    val got = graft.operators.TemporalOps.timeWeightedAverage(df, "k", "t", "v", "tie")
      .orderBy(col("key")).as[(String, Long, Long, Long)].collect().toSeq
    // a: 10*10 + 20*20 = 500 over span 30 -> 16
    // c: the t=0 tie gives the first point duration 0 -> 7*10 = 70 / 10 -> 7
    assert(got === Seq(("a", 3L, 30L, 16L), ("c", 3L, 10L, 7L)))
  }

  // ---- disorderProfile -----------------------------------------------------

  test("disorderProfile: lateness behind the prior running max, digit buckets") {
    val ev = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 15L), ("k", 4L, 9L))
      .toDF("key", "arr", "t")
    val got = graft.operators.TemporalOps.disorderProfile(ev, "key", "arr", "t")
      .as[(Long, Long, Long)].collect().toSeq
    // arr 1 and 2 are in order (late 0); arr 3 is 5 behind (1 digit);
    // arr 4 is 11 behind (2 digits)
    assert(got === Seq((0L, 2L, 0L), (1L, 1L, 5L), (2L, 1L, 11L)))
  }

  // ---- mutualNearestPairs --------------------------------------------------

  test("mutualNearestPairs: only mutual best matches survive") {
    val left = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.7f, 0.7f)))
      .toDF("id", "v")
    val right = Seq((11L, Seq(1.0f, 0.01f)), (12L, Seq(0.1f, 0.9f)))
      .toDF("id", "v")
    val got = SimilarityOps.mutualNearestPairs(left, right, "id", "v")
      .orderBy(col("a_id")).as[(Long, Long, Double)].collect().toSeq
    // 1<->11 and 2<->12 are mutual; 3's best is 11, but 11's best is 1,
    // so 3 aligns to nothing
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 11L), (2L, 12L)))
    assert(got.head._3 === 0.9999)
  }

  // ---- postings index ------------------------------------------------------

  test("postings index: build/serve round-trip equals corpus-side bm25TopK") {
    val docs = Seq(
      (1L, "spark join vector stream"),
      (2L, "join join filter slow"),
      (3L, "vector vector vector"),
      (4L, "stream filter slow slow"),
      (5L, "totally unrelated words here")).toDF("id", "text")
    val queries = Seq((1, Seq("join", "vector")), (2, Seq("stream", "slow")))
    val path = java.nio.file.Files.createTempDirectory("graft_postings_test").toString
    TextOps.buildPostingsIndex(docs, "id", "text", path)
    val fromIdx = TextOps.bm25TopKFromIndex(spark, path, queries, 10)
      .orderBy(col("query_id"), col("rk"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    val direct = TextOps.bm25TopK(docs, "id", "text", queries, 10)
      .orderBy(col("query_id"), col("rk"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(fromIdx === direct && direct.nonEmpty)
    // partition-pruning surface: postings are laid out as bucket=N dirs
    val bucketDirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSeq
    assert(bucketDirs.nonEmpty)
  }

  // ---- hullVertexCensus ------------------------------------------------------

  /** Independent brute: a point is a hull vertex iff NOT covered by a
    * non-degenerate triangle of others nor collinearly straddled by two
    * others (Carathéodory) — the same criterion the q337 oracle runs in
    * SQL, here as the spec's ground truth against the monotone chain.
    */
  private def bruteHullCount(pts: Seq[(Long, Long)]): Long = {
    val s = pts.distinct
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def covered(p: (Long, Long)): Boolean = {
      val others = s.filterNot(_ == p)
      val tri = others.combinations(3).exists { case Seq(a, b, c) =>
        cross(a, b, c) != 0 && {
          val s1 = cross(a, b, p); val s2 = cross(b, c, p); val s3 = cross(c, a, p)
          (s1 >= 0 && s2 >= 0 && s3 >= 0) || (s1 <= 0 && s2 <= 0 && s3 <= 0)
        }
      }
      def seg = others.combinations(2).exists { case Seq(a, b) =>
        cross(a, b, p) == 0 &&
          p._1 >= math.min(a._1, b._1) && p._1 <= math.max(a._1, b._1) &&
          p._2 >= math.min(a._2, b._2) && p._2 <= math.max(a._2, b._2)
      }
      tri || seg
    }
    s.count(p => !covered(p)).toLong
  }

  test("hullVertexCensus: square fixture — edge midpoints and interior are not vertices") {
    val pts = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L), // corners
      (5L, 0L), (10L, 5L), (5L, 10L), (0L, 5L),               // edge midpoints
      (5L, 5L), (3L, 7L), (5L, 5L))                           // interior + dup
      .map { case (x, y) => (1L, x, y) }.toDF("g", "x", "y")
    val got = SpatialOps.hullVertexCensus(pts, "g", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 4L))) // 10 distinct points, 4 strict vertices
  }

  test("hullVertexCensus: fully collinear group keeps only the endpoints") {
    val pts = (0L to 4L).map(i => (7L, i * 3L, i * 6L)).toDF("g", "x", "y")
    val got = SpatialOps.hullVertexCensus(pts, "g", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 5L, 2L)))
  }

  test("hullVertexCensus: equals the Carathéodory brute on LCG clouds; salt-invariant") {
    // deterministic LCG clouds, two groups with collinear-prone small range
    var seed = 20260815L
    def nxt(m: Long): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed % m }
    val pts = for (g <- 1L to 2L; _ <- 1 to 20) yield (g, nxt(15L), nxt(15L))
    val df = pts.toDF("g", "x", "y")
    val want = pts.groupBy(_._1).view.mapValues(ps =>
      bruteHullCount(ps.map(t => (t._2, t._3)))).toMap
    for (pre <- Seq(0, 5)) { // unsalted and two-level hull-merge agree
      val got = SpatialOps.hullVertexCensus(df, "g", "x", "y", preReduce = pre)
        .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
      assert(got === want, s"preReduce=$pre")
    }
  }
}
