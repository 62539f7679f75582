package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: FastSS deletion-neighborhood edit-distance pairs. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def levRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("fastSsPairs: equals brute-force Levenshtein on hash-scattered codes") {
    // variable-length strings over a 5-letter alphabet, like compact
    // journey encodings; includes exact dups (lev 0) and indel shifts
    val strs = (1L to 80L).map { i =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"fs$i"))
      val len = 6 + (h % 3L).toInt // 6..8
      (i, (0 until len).map(p => ('a' + ((h >> (p * 3)) & 3L).toInt).toChar).mkString)
    }
    val got = DedupOps.fastSsPairs(strs.toDF("id", "s"), "id", "s", 2, 8)
      .select(col("ia"), col("ib"), col("lev"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = (for {
      (i, si) <- strs; (j, sj) <- strs if i < j
      d = levRef(si, sj) if d <= 2
    } yield (i, j, d.toLong)).sorted
    assert(got === brute && brute.nonEmpty)
    // sanity: the alphabet/length mix actually exercises indels
    assert(strs.map(_._2.length).distinct.size > 1)
  }

  test("fastSsPairs: shifted journeys collide through the indel variant") {
    // hamming distance 8 but lev 2 (drop head, append tail): the pair
    // MUST surface — this is what position-blocked schemes miss
    val df = Seq((1L, "xabcdefg"), (2L, "abcdefgy")).toDF("id", "s")
    val got = DedupOps.fastSsPairs(df, "id", "s", 2, 8)
      .select(col("ia"), col("ib"), col("lev"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L)))
  }

  test("sequentialPairSupport: equals brute-force subsequence containment") {
    import graft.operators.TemporalOps
    // hash-scattered event streams over a 4-item alphabet, uneven lengths
    val rows = (1L to 30L).flatMap { u =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"sq$u"))
      val len = 1 + (h % 10L).toInt // 1..10 events, some beyond maxLen 8
      (0 until len).map(i => (u, s"e${(h >> (i * 2)) & 3L}", i.toLong, i.toLong))
    }
    val got = TemporalOps.sequentialPairSupport(
        rows.toDF("u", "it", "ord", "tie"), "u", "it", "ord", "tie", 8, 1L)
      .as[(String, String, Long)].collect().toSeq.sorted
    val brute = rows.groupBy(_._1).values.map { evs =>
      val seq8 = evs.sortBy(e => (e._3, e._4)).map(_._2).take(8)
      (for { i <- seq8.indices; j <- (i + 1) until seq8.length }
        yield (seq8(i), seq8(j))).toSet
    }.toSeq.flatten.groupBy(identity).map { case (p, hits) =>
      (p._1, p._2, hits.size.toLong)
    }.toSeq.sorted
    assert(got === brute && brute.nonEmpty)
    // set semantics: a user repeating (a, b) twice still counts once —
    // pinned via a hand fixture
    val fix = Seq((1L, "a", 0L), (1L, "b", 1L), (1L, "a", 2L), (1L, "b", 3L),
      (2L, "a", 0L), (2L, "b", 1L))
    val got2 = TemporalOps.sequentialPairSupport(
        fix.map(t => (t._1, t._2, t._3, t._3)).toDF("u", "it", "ord", "tie"),
        "u", "it", "ord", "tie", 8, 2L)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(got2 === Seq(("a", "b", 2L))) // never 3, never (b, a) at 2
  }

  test("fastSsPairs: strings past maxLen fail loudly, never lose recall") {
    val df = Seq((1L, "abcdefghi"), (2L, "abcdefgh")).toDF("id", "s")
    val e = intercept[Exception] {
      DedupOps.fastSsPairs(df, "id", "s", 2, 8).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      DedupOps.fastSsPairs(df, "id", "s", 3, 8)
    }
  }

  test("anonymityLadder: known census on a planted fixture; one Expand, no join") {
    // 2 cities nested in 1 state; sensitive diagnosis d1/d2.
    // city A: 3 rows 2 diagnoses, city B: 2 rows 1 diagnosis
    val rows = Seq(
      ("A", "S", "d1"), ("A", "S", "d1"), ("A", "S", "d2"),
      ("B", "S", "d2"), ("B", "S", "d2"))
    val df = rows.toDF("city", "state", "diag")
    val got = graft.operators.PrivacyOps.anonymityLadder(
        df, Seq(Seq("city"), Seq("state")), "diag", 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // level 0 (city): groups {A:3, B:2}; B below k=3; min_l = 1 (B all d2)
      (0L, 2L, 2L, 1L, 2L, 1L),
      // level 1 (state): one group of 5, k ok, l = 2
      (1L, 1L, 5L, 0L, 0L, 2L)))
    // plan: a single grouping-sets aggregation — Expand, no Join anywhere
    val plan = graft.operators.PrivacyOps.anonymityLadder(
      df, Seq(Seq("city"), Seq("state")), "diag", 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Join"))
  }

  test("goldenRecord: each survivorship rule picks its documented winner") {
    import graft.operators.LinkageOps._
    val recs = Seq(
      // cluster 1: longest name wins (tie broken lexicographically),
      // latest recency wins cents (tie by rid), majority seg with
      // smallest-value tie-break; nulls never survive
      (1L, 1L, 1L, "Ann Lee", 100L, "A"),
      (1L, 2L, 2L, "Ann Le", 200L, null.asInstanceOf[String]),
      (1L, 3L, 2L, "Bob Lee", 300L, "B"),
      (1L, 4L, 1L, null.asInstanceOf[String], 400L, "B"),
      // cluster 2: singleton
      (2L, 9L, 1L, "Solo", 50L, "Z"))
      .toDF("cluster", "rid", "recency", "name", "cents", "seg")
    val got = goldenRecord(recs, "cluster", Seq(
        Longest("name", "g_name"), LatestBy("cents", "recency", "rid", "g_cents"),
        Majority("seg", "g_seg")))
      .as[(Long, Long, String, Long, String)].collect().toSeq.sortBy(_._1)
    // longest names are "Ann Lee"/"Bob Lee" (7 chars) -> lex smallest "Ann Lee";
    // latest = recency 2, tie rid 2 < 3 -> cents 200; majority seg = B (2 votes)
    assert(got === Seq((1L, 4L, "Ann Lee", 200L, "B"), (2L, 1L, "Solo", 50L, "Z")))
    // all-null source yields null, not a crash
    val gotNull = goldenRecord(
        Seq((1L, null.asInstanceOf[String])).toDF("cluster", "x"),
        "cluster", Seq(Majority("x", "gx")))
      .select(col("gx")).as[Option[String]].collect()
    assert(gotNull.toSeq === Seq(None))
  }

  test("subtreeRollup: planted 3-level tree; cycle fails loudly") {
    // 1 -> {2, 3}, 2 -> {4}; values 1,10,100,1000
    val nodes = Seq((1L, Option.empty[Long], 1L), (2L, Some(1L), 10L),
      (3L, Some(1L), 100L), (4L, Some(2L), 1000L))
      .toDF("id", "parent", "v")
    val got = graft.operators.GraphOps.subtreeRollup(nodes, "id", "parent", "v", 5)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 0L, 4L, 1111L), (2L, 1L, 2L, 1010L),
      (3L, 1L, 1L, 100L), (4L, 2L, 1L, 1000L)))
    // a 2-cycle must hit the maxDepth require, never silently truncate
    val cyc = Seq((1L, Some(2L), 1L), (2L, Some(1L), 1L)).toDF("id", "parent", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.GraphOps.subtreeRollup(cyc, "id", "parent", "v", 4).collect()
    }
    assert(e.getMessage.contains("maxDepth"))
  }

  test("prfBm25: fbTerms=0 degenerates to bm25TopK; expansion rescues a co-topic doc") {
    import graft.operators.TextOps
    // docs 1-3 carry the query term "cat" together with "lion"; doc 4
    // never says "cat" but is saturated with the feedback term "lion";
    // doc 5 is off-topic noise
    val docs = Seq(
      (1L, "cat lion cat roar x y z"),
      (2L, "cat lion den x y z w"),
      (3L, "cat lion cub x y z w"),
      (4L, "lion lion lion pride x y"),
      (5L, "dog bark fetch x y z w"))
      .toDF("doc_id", "text")
    val qs = Seq((1, Seq("cat")))
    val plain = TextOps.bm25TopK(docs, "doc_id", "text", qs, 10)
      .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
    val noExp = TextOps.prfBm25(docs, "doc_id", "text", qs, 3, 0, 10)
      .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
    assert(noExp === plain) // zero expansion terms == plain BM25 ranking
    assert(!plain.contains(4L)) // "lion"-only doc is invisible to "cat"
    val exp = TextOps.prfBm25(docs, "doc_id", "text", qs, 3, 1, 10)
      .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
    assert(exp.contains(4L) && !exp.contains(5L)) // feedback finds it; noise stays out
  }

  test("decileLift: perfect ranking puts all positives in the top slices") {
    // 20 rows, 4 positives with the 4 highest scores -> quintile 1
    // captures all of them: capture 1000pm, lift = 5x base rate
    val rows = (1L to 20L).map(i => (i, 21L - i, i <= 4L))
    val got = graft.operators.QualityOps.decileLift(
        rows.toDF("id", "score", "y"), "score", "id", col("y"), 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.head === ((1L, 4L, 4L, 4L, 1000L, 5000L)))
    assert(got.map(_._2).sum === 20L && got.size === 5)
    // every later slice adds nothing: capture stays 1000, lift decays 1/k
    assert(got.map(_._5) === Seq(1000L, 1000L, 1000L, 1000L, 1000L))
    assert(got.map(_._6) === Seq(5000L, 2500L, 1666L, 1250L, 1000L))
  }

  test("conformalCoverage: +1-adjusted rank, saturation flag on tiny calibration") {
    import graft.operators.QualityOps
    // group A: 9 calibration scores 10..90 -> k = ceil(10*0.9) = 9 ->
    // threshold 90; test 5 values, 3 <= 90 -> coverage 600pm
    val cal = ((1L to 9L).map(i => ("A", i, i * 10L)) :+ ("B", 1L, 5L))
      .toDF("g", "k", "s")
    val tst = (Seq(10L, 50L, 90L, 91L, 200L).zipWithIndex.map {
      case (v, i) => ("A", 100L + i, v) } :+ ("B", 200L, 4L))
      .toDF("g", "k", "s")
    val got = QualityOps.conformalCoverage(cal, tst, "g", "s", "k", 100L)
      .as[(String, Long, Long, Long, Boolean, Long)].collect().toSeq
    // B: n_cal 1 -> k = ceil(2*0.9) = 2 > 1 -> capped at max, saturated
    assert(got === Seq(("A", 9L, 5L, 90L, false, 600L),
      ("B", 1L, 1L, 5L, true, 1000L)))
  }

  test("constellation match survives a corrupted peak and votes concentrate") {
    import graft.operators.MultimodalOps
    // two 12-peak tracks with hash-scattered magnitudes
    def mag(track: Long, t: Long): Long = math.floorMod(
      graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"au$track:$t")), 129L)
    val peaks = (for (tr <- Seq(1L, 2L); t <- 0L until 12L)
      yield (tr, t, mag(tr, t))).toDF("media_id", "t", "a")
    val trackLm = MultimodalOps.constellationLandmarks(peaks, "media_id", "t", "a", 3)
    // snippet: track 1 windows 4..9 shifted to 0..5, with the peak at
    // source t=6 CORRUPTED — landmarks touching it break, the rest align
    val snip = (0L until 6L).map { t =>
      val srcT = t + 4L
      (100L, t, if (srcT == 6L) (mag(1L, srcT) + 7L) % 129L else mag(1L, srcT))
    }.toDF("media_id", "t", "a")
    val snipLm = MultimodalOps.constellationLandmarks(snip, "media_id", "t", "a", 3)
      .withColumnRenamed("media_id", "snip_id")
    val got = MultimodalOps.constellationMatch(trackLm, snipLm, "media_id", "snip_id")
      .select(col("snip_id"), col("media_id"), col("offset_w"), col("votes"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size === 1)
    val (sid, tid, off, votes) = got.head
    assert((sid, tid, off) === ((100L, 1L, 4L)))
    // 6 peaks, maxDt 3 -> 12 clean landmarks; corrupting one peak breaks
    // at most 5 (3 incoming + up to 3 outgoing, edge-limited) — the
    // surviving majority still out-votes any collision
    assert(votes >= 7L, s"votes=$votes")
  }

  test("maintainJoin: delta-join identity equals full recompute, multiset-exactly") {
    import graft.operators.MaintenanceOps
    val aOld = Seq((1L, "x"), (2L, "y")).toDF("ak", "av")
    val aDelta = Seq((3L, "z"), (2L, "y2")).toDF("ak", "av") // new key + second row on key 2
    val bOld = Seq((1L, 10L), (3L, 30L)).toDF("bk", "bv")
    val bDelta = Seq((2L, 20L), (1L, 11L), (3L, 31L)).toDF("bk", "bv")
    val oldView = aOld.join(bOld, col("ak") === col("bk"))
    val maintained = MaintenanceOps.maintainJoin(
      oldView, aOld, aDelta, bOld, bDelta, "ak", "bk")
    val full = aOld.unionByName(aDelta)
      .join(bOld.unionByName(bDelta), col("ak") === col("bk"))
    // multiset equality: group-count both sides and compare
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(df.columns.map(col): _*).count()
        .as[(Long, String, Long, Long, Long)].collect().toSeq.sorted
    assert(counts(maintained) === counts(full))
    assert(maintained.count() === 6L) // and the fixture exercises every delta term
  }

  test("AhoCorasick: counts equal brute-force substring positions, nested and overlapping") {
    import graft.functions.AhoCorasick
    // nested ("a" in "aa" in "aab") and self-overlapping ("aa" in "aaa")
    val patterns = Seq("a", "aa", "aab", "ba", "zz")
    val ac = AhoCorasick.build(patterns)
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    // hash-scattered texts over a 3-char alphabet maximize overlap
    val texts = (1 to 60).map { k =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"ac$k"))
      (0 until 20).map(i => "ab z".charAt(((h >> (i % 16)) & 3L).toInt)).mkString
    } :+ "aaabaab" :+ ""
    texts.foreach { t =>
      val got = ac.countAll(t)
      patterns.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) === brute(t, p), s"pattern '$p' in '$t'")
      }
    }
  }

  test("shapleyAttribution: hand-computed coalition game + efficiency identity") {
    import graft.operators.PolicyOps
    // u1 {A} conv, u2 {A,B} conv, u3 {B} no-conv, u4 {} conv (baseline)
    val ev = Seq((1L, "A"), (1L, "buy"), (2L, "A"), (2L, "B"), (2L, "buy"),
      (3L, "B"), (4L, "buy")).toDF("u", "t")
    val got = PolicyOps.shapleyAttribution(ev, "u", "t", Seq("A", "B"),
        col("t") === "buy")
      .as[(String, Long)].collect().toSeq
    // v(∅)=1, v({A})=2, v({B})=1, v({A,B})=3 -> φ_A·2!=3, φ_B·2!=1
    assert(got === Seq(("A", 3L), ("B", 1L)))
    // efficiency: Σφ·k! = k!·(v(full) − v(∅)) = 2·2
    assert(got.map(_._2).sum === 4L)
  }

  test("insidePolygon: convex and concave membership, pure column arithmetic") {
    import graft.operators.SpatialOps
    val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    // U-shaped concave polygon: the notch (5,6) is OUTSIDE
    val ushape = Seq((0L, 0L), (10L, 0L), (10L, 10L), (7L, 10L),
      (7L, 4L), (3L, 4L), (3L, 10L), (0L, 10L))
    val pts = Seq((1L, 5L, 5L), (2L, 15L, 5L), (3L, 5L, 6L), (4L, 1L, 9L),
      (5L, 5L, 2L)).toDF("id", "x", "y")
    val got = pts.select(col("id"),
        SpatialOps.insidePolygon(col("x"), col("y"), square).as("sq"),
        SpatialOps.insidePolygon(col("x"), col("y"), ushape).as("u"))
      .as[(Long, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, true, false),  // center: in square, in the U's notch void
      (2L, false, false), // right of both
      (3L, true, false),  // notch interior
      (4L, true, true),   // left arm of the U
      (5L, true, true)))  // base of the U
  }

  test("temporalReachability: paths must move forward in time") {
    import graft.operators.GraphOps
    // A-(5)->B, B-(3)->C: C is NOT reachable through B (3 < 5 — plain
    // BFS would take it); B-(7)->D is; A-(10)->C rescues C directly
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L), (1L, 3L, 10L))
      .toDF("s", "d", "t")
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val got = GraphOps.temporalReachability(edges, "s", "d", "t",
        seeds, "n", lit(0L), 4)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 7L)))
  }

  test("kmeansLloyd: refinement never increases inertia; runs are bit-identical") {
    import graft.operators.SimilarityOps
    // two well-separated 4-dim blobs with deterministic jitter
    val emb = (1L to 40L).map { i =>
      val c = if (i <= 20) 10.0f else -10.0f
      val j = (i % 5).toFloat * 0.01f
      (i, Seq(c + j, c - j, c + 2 * j, c))
    }.toDF("vec_id", "embedding")
    def inertia(rounds: Int): Long =
      SimilarityOps.kmeansLloyd(emb, "vec_id", "embedding", 2, rounds)
        .as[(Long, Long, Long)].collect().map(r => r._2 * r._3).sum
    val i1 = inertia(1); val i2 = inertia(2); val i3 = inertia(3)
    // Lloyd monotonicity (floor rounding can wiggle a cluster by ±1 kibi
    // per member; allow that slack and nothing more)
    assert(i2 <= i1 + 40L, s"i1=$i1 i2=$i2")
    assert(i3 <= i2 + 40L, s"i2=$i2 i3=$i3")
    val run1 = SimilarityOps.kmeansLloyd(emb, "vec_id", "embedding", 2, 2)
      .as[(Long, Long, Long)].collect().toSeq
    val run2 = SimilarityOps.kmeansLloyd(emb, "vec_id", "embedding", 2, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(run1 === run2 && run1.map(_._2).sum === 40L)
  }

  test("spearmanCorr: perfect monotone, perfect reverse, and a hand case") {
    import graft.operators.QualityOps
    // group a: y = 2x (rho = 1); group b: y = -x (rho = -1)
    val mono = (1L to 10L).map(i => ("a", i, i, 2 * i)) ++
      (1L to 10L).map(i => ("b", i, i, -i))
    val got = QualityOps.spearmanCorr(
        mono.toDF("g", "k", "x", "y"), "g", "x", "y", "k")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 10L, 0L, 1000000L), ("b", 10L, 330L, -1000000L)))
    // hand case: ranks x = 1,2,3,4; y-order swaps the middle two
    // d = (0,1,-1,0), sum_d2 = 2, rho = 1 - 12/60 = 0.8
    val hand = Seq((1L, 10L, 1L), (2L, 20L, 3L), (3L, 30L, 2L), (4L, 40L, 9L))
      .toDF("k", "x", "y").withColumn("g", lit("h"))
    val h = QualityOps.spearmanCorr(hand, "g", "x", "y", "k")
      .as[(String, Long, Long, Long)].collect().head
    assert(h === (("h", 4L, 2L, 800000L)))
  }

  test("spearmanCorr: single-row group emits rho 0, not a divide error") {
    import graft.operators.QualityOps
    val one = Seq(("s", 1L, 5L, 7L)).toDF("g", "k", "x", "y")
    val got = QualityOps.spearmanCorr(one, "g", "x", "y", "k")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("s", 1L, 0L, 0L)))
  }

  test("averagePrecisionAtK: textbook list and the all-misses guard") {
    import graft.operators.QualityOps
    // rel at ranks 1,3,5 of 5: AP = (1/3)(1 + 2/3 + 3/5) = 34/45
    val rows = Seq(("q1", 1L, true), ("q1", 2L, false), ("q1", 3L, true),
      ("q1", 4L, false), ("q1", 5L, true),
      ("q2", 1L, false), ("q2", 2L, false))
    val got = QualityOps.averagePrecisionAtK(
        rows.toDF("q", "r", "rel"), "q", "r", col("rel"), 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("q1", 3L, 34L * 1000000L / 45L), ("q2", 0L, 0L)))
  }

  test("contingencyAssociation: exact independence gives chi2 = 0; " +
    "perfect association gives v2 = 1e6") {
    import graft.operators.QualityOps
    // 2x2 uniform: every margin product equals N*O exactly
    val indep = Seq(("p", "u"), ("p", "v"), ("q", "u"), ("q", "v"))
    val gi = QualityOps.contingencyAssociation(indep.toDF("a", "b"), "a", "b")
      .select("chi2_ppm", "v2_ppm").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(gi === Seq((0L, 0L)))
    // diagonal-only 2x2: chi2 = N, V = 1
    val diag = Seq(("p", "u"), ("p", "u"), ("q", "v"), ("q", "v"))
    val gd = QualityOps.contingencyAssociation(diag.toDF("a", "b"), "a", "b")
      .select("chi2_ppm", "v2_ppm").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(gd === Seq((4000000L, 1000000L)))
  }

  test("cupedAdjust: a covariate-explained imbalance adjusts away") {
    import graft.operators.QualityOps
    // y = x + 5 exactly; treat arm saw higher x by luck of assignment.
    // theta = 1e6 and the adjusted means collapse to the same value
    val rows = Seq((true, 100L), (true, 120L), (false, 80L), (false, 60L))
      .map { case (t, x) => (t, x, x + 5L) }
    val got = QualityOps.cupedAdjust(rows.toDF("t", "x", "y"),
        col("t"), col("x"), col("y"))
      .as[(Boolean, Long, Long, Long, Long)].collect().toSeq
    val theta = got.head._5
    assert(theta === 1000000L)
    val adj = got.map(_._4)
    assert(adj.distinct.size === 1, s"adjusted means differ: $got")
    // raw means differ by the planted 40-unit imbalance
    val raw = got.map(_._3)
    assert((raw.max - raw.min) === 40000L)
  }

  test("nelsonAalen: hand-computed hazard steps; additive cumhaz") {
    import graft.operators.TemporalOps
    // t=1: d=2 of r=10 -> 200000; t=2: d=3 of r=8 -> 375000; t=3: d=5 of r=5 -> 1e6
    val exits = Seq((1L, 2L), (2L, 3L), (3L, 5L)).toDF("t", "d")
    val got = TemporalOps.nelsonAalen(exits, "t", "d")
      .orderBy(col("t")).as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 2L, 200000L, 200000L),
      (2L, 8L, 3L, 375000L, 575000L), (3L, 5L, 5L, 1000000L, 1575000L)))
  }

  test("voiceActivitySegments: islands merge, clicks drop, indices re-rank") {
    import graft.operators.MultimodalOps
    // synthesize via the real stub decode so the operator's own energy
    // path is exercised; then recompute islands in plain Scala
    val docs = Seq((7L, "the quick brown fox"), (8L, ""), (9L, "abcabcabc"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast(org.apache.spark.sql.types.BinaryType).as("c"))
    val thr = 1024L
    val got = MultimodalOps.voiceActivitySegments(docs, "doc_id", "c", 96, 16, thr, 2)
      .orderBy(col("media_id"), col("seg_idx"))
      .as[(Long, Long, Int, Int, Long, Long)].collect().toSeq
    val expect = Seq(7L -> "the quick brown fox", 8L -> "", 9L -> "abcabcabc")
      .flatMap { case (id, text) =>
        val s = MultimodalOps.decodeAudioStub(id, text.getBytes("UTF-8"), 96)
        val en = (0 until 6).map(w => (w, (w * 16 until (w + 1) * 16).map(j => math.abs(s(j)).toLong).sum))
        val act = en.filter(_._2 >= thr)
        // islands over consecutive window indices
        val segs = act.foldLeft(List.empty[List[(Int, Long)]]) {
          case (acc, (w, e)) => acc match {
            case h :: t if h.head._1 == w - 1 => ((w, e) :: h) :: t
            case _ => List((w, e)) :: acc
          }
        }.reverse.map(_.reverse).filter(_.size >= 2)
        segs.zipWithIndex.map { case (seg, i) =>
          (id, i.toLong, seg.head._1, seg.last._1, seg.size.toLong, seg.map(_._2).sum)
        }
      }
    assert(got === expect && expect.nonEmpty)
  }

  test("jackknifeRatio: hand case incl. the degenerate single-block guard") {
    import graft.operators.QualityOps
    val blocks = Seq(("a", 1L, 10L), ("b", 2L, 10L), ("c", 3L, 10L))
      .toDF("g", "num", "den")
    val got = QualityOps.jackknifeRatio(blocks, "g", "num", "den")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // N=6 D=30: loo_a = 5/20 = 250000, loo_b = 4/20 = 200000, loo_c = 150000
    // mean = 200000; ss = 2*50000^2 = 5e9; var = 2*5e9/3 = 3333333333
    assert(got === Seq(("a", 1L, 10L, 250000L, 200000L, 3333333333L),
      ("b", 2L, 10L, 200000L, 200000L, 3333333333L),
      ("c", 3L, 10L, 150000L, 200000L, 3333333333L)))
    val single = QualityOps.jackknifeRatio(
        Seq(("only", 5L, 10L)).toDF("g", "num", "den"), "g", "num", "den")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // removing the only block empties the denominator -> loo 0, var 0
    assert(single === Seq(("only", 5L, 10L, 0L, 500000L, 0L)))
  }

  test("mannKendall: monotone series, tie correction, single-point guard") {
    import graft.operators.TemporalOps
    // up: strictly increasing -> S = C(5,2) = 10, no ties, var18 = 5*4*15
    // fl: flat -> S = 0, one tie group of 5 absorbs ALL the variance
    // dn: strictly decreasing with one repeat -> hand-counted
    val rows = Seq.tabulate(5)(i => ("up", i.toLong, (10 + i).toLong)) ++
      Seq.tabulate(5)(i => ("fl", i.toLong, 7L)) ++
      Seq(("dn", 1L, 9L), ("dn", 2L, 9L), ("dn", 3L, 5L), ("dn", 4L, 1L)) ++
      Seq(("one", 1L, 3L))
    val got = TemporalOps.mannKendall(rows.toDF("g", "t", "v"), "g", "t", "v")
      .as[(String, Long, Long, Long)].collect().toSeq
    // dn pairs: (9,9)=0 (9,5)x2=-2 (9,1)x2=-2 (5,1)=-1 -> S=-5;
    // var18 = 4*3*13 - 2*1*9 = 156 - 18 = 138
    assert(got === Seq(
      ("dn", 4L, -5L, 138L),
      ("fl", 5L, 0L, 5L * 4L * 15L - 5L * 4L * 15L),
      ("one", 1L, 0L, 0L),
      ("up", 5L, 10L, 5L * 4L * 15L)))
  }

  test("harmonicCentrality: hand graph — path and hub score exactly") {
    import graft.operators.GraphOps
    // path 1-2-3-4 plus hub 10 joined to 2: undirected (both directions)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 2L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val seeds = Seq(1L, 10L, 99L).toDF("id") // 99 is isolated
    val got = GraphOps.harmonicCentrality(edges, "s", "d", seeds, "id", 3)
      .orderBy(col("node")).as[(Long, Long, Long)].collect().toSeq
    // from 1: d(2)=1, d(3)=2, d(10)=2, d(4)=3 -> 6 + 3 + 3 + 2 = 14
    // from 10: d(2)=1, d(1)=2, d(3)=2, d(4)=3 -> 6 + 3 + 3 + 2 = 14
    // 99: nothing reached -> absent
    assert(got === Seq((1L, 4L, 14L), (10L, 4L, 14L)))
  }

  test("logRank: identical arms give E = O exactly; hand-computed variance") {
    import graft.operators.TemporalOps
    // symmetric arms: same exit schedule -> n_a = n_b at every step,
    // so e_a = d/2 per step and O_a - E_a = 0 exactly (1000-scaled)
    val sym = Seq((1L, true, 2L), (1L, false, 2L), (2L, true, 3L), (2L, false, 3L))
    val g1 = TemporalOps.logRank(sym.toDF("t", "arm", "d"), "t", col("arm"), "d")
      .as[(Long, Long, Long, Long)].collect().head
    assert(g1._1 === 5L && g1._2 === 5L && g1._3 === 5000L)
    // hand case: t=1 d_a=1 d_b=0 (na=2 nb=1); t=2 d_a=1 d_b=1 (na=1 nb=1)
    // e = 1000*1*2/3 + 1000*2*1/2 = 666 + 1000 = 1666
    // v = ((1e6*1*2//3)*1//3)*2//2 + ((1e6*2*1//2)*1//2)*0//1
    //   = (666666//3)*2//2 + 0 = 222222
    val hand = Seq((1L, true, 1L), (2L, true, 1L), (2L, false, 1L))
    val g2 = TemporalOps.logRank(hand.toDF("t", "arm", "d"), "t", col("arm"), "d")
      .as[(Long, Long, Long, Long)].collect().head
    assert(g2 === ((2L, 1L, 1666L, 222222L)))
  }

  test("competingRisks: hand-computed AJ increments; mass conserves to 1e6") {
    import graft.operators.TemporalOps
    val exits = Seq((1L, 1L, 1L), (2L, 2L, 0L), (3L, 0L, 6L)).toDF("t", "d1", "d2")
    val got = TemporalOps.competingRisks(exits, "t", "d1", "d2")
      .orderBy(col("t"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 10L, 1L, 1L, 800000L, 100000L, 100000L),
      (2L, 8L, 2L, 0L, 600000L, 300000L, 100000L),
      (3L, 6L, 0L, 6L, 0L, 300000L, 700000L)))
    // exact conservation at every step on this divisor-friendly fixture
    got.foreach { r => assert(r._5 + r._6 + r._7 === 1000000L) }
  }

  test("tCloseness: hand EMD against the POOLED marginal, zero cells counted") {
    import graft.operators.PrivacyOps
    // values 1..3, global marginal g = (5,2,2)/9 (the classes' own rows
    // pool into it — the distance is vs the TABLE, not vs uniform).
    // A = (2,2,2)/6: cumdiffs -2/9, -1/9, 0 -> EMD = (3/9)/2 = 1/6
    // B = (3,0,0)/3: cumdiffs 4/9, 2/9, 0 -> EMD = (6/9)/2 = 1/3
    //   (bands 2,3 are ZERO cells for B and still carry mass)
    val rows =
      Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 1L), ("A", 2L), ("A", 3L)) ++
      Seq(("B", 1L), ("B", 1L), ("B", 1L))
    val got = PrivacyOps.tCloseness(rows.toDF("qi", "v"), Seq("qi"), "v", 200000L)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(("A", 6L, 166666L, false), ("B", 3L, 333333L, true)))
  }

  test("damerauLevenshtein: full-DL pins, byte-level unicode, BFS oracle") {
    import graft.functions.TextCodec
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def dl(a: String, b: String) = TextCodec.damerauLevenshtein(u8(a), u8(b))
    // FULL Damerau (Lowrance-Wagner), not OSA: CA->AC->ABC is 2
    assert(dl("CA", "ABC") === 2)
    assert(dl("ab", "ba") === 1)
    assert(dl("abcdef", "abdcef") === 1)
    assert(dl("", "abc") === 3 && dl("abc", "") === 3 && dl("abc", "abc") === 0)
    // byte-level (the DuckDB contract): 2-byte a-umlaut vs 'a' = 2 edits;
    // a 4-byte astral codepoint transposes as byte rotation = 2
    assert(dl("hällo", "hallo") === 2)
    assert(dl("𝄞a", "a𝄞") === 2)
    // independent oracle: BFS over the {a,b} edit graph (ins/del/sub/
    // adjacent-transpose, unit cost) for ALL pairs of {a,b}-strings of
    // length <= 4 — unrestricted DL is exactly this shortest path
    val alpha = Seq('a', 'b')
    val strs = (0 to 4).flatMap(n =>
      Seq.fill(n)(alpha).foldLeft(Seq("")) { (acc, cs) =>
        acc.flatMap(p => cs.map(c => p + c))
      }).distinct
    def neighbors(s: String): Seq[String] = {
      val ins = for (i <- 0 to s.length; c <- alpha if s.length < 5)
        yield s.substring(0, i) + c + s.substring(i)
      val del = for (i <- 0 until s.length)
        yield s.substring(0, i) + s.substring(i + 1)
      val sub = for (i <- 0 until s.length; c <- alpha if s(i) != c)
        yield s.substring(0, i) + c + s.substring(i + 1)
      val tra = for (i <- 0 until s.length - 1 if s(i) != s(i + 1))
        yield s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
      ins ++ del ++ sub ++ tra
    }
    def bfs(a: String, b: String): Int = {
      if (a == b) return 0
      var frontier = Set(a)
      var seen = Set(a)
      var depth = 0
      while (depth < 8) {
        depth += 1
        frontier = frontier.flatMap(neighbors).diff(seen)
        if (frontier.contains(b)) return depth
        seen = seen ++ frontier
      }
      depth
    }
    for (x <- strs; y <- strs)
      assert(dl(x, y) === bfs(x, y), s"dl($x, $y)")
  }

  test("markovAttribution: hand-iterated chain, removal pins, ppm floors") {
    import graft.operators.PolicyOps
    // u1 c->CONV; u2 c->NULL; u3 v->CONV; u4 v->c->CONV
    // matrix: START->c 2, START->v 2, c->CONV 2, c->NULL 1, v->CONV 1,
    // v->c 1; n: START 4, c 3, v 2. Converged ppm by hand:
    //   full: c=666666, v=floor((1e6+666666)/2)=833333,
    //         START=floor((2*666666+2*833333)/4)=749999
    //   remove c (pin 0): v=500000, START=floor(2*500000/4)=250000
    //   remove v (pin 0): c=666666, START=floor(2*666666/4)=333333
    val evs = Seq(
      (1L, "c", 1L), (1L, "p", 2L),
      (2L, "c", 1L),
      (3L, "v", 1L), (3L, "p", 2L),
      (4L, "v", 1L), (4L, "c", 2L), (4L, "p", 3L))
      .toDF("u", "ch", "t")
    val got = PolicyOps.markovAttribution(evs, "u", "ch", Seq("c", "v"), "p",
      Seq(col("t")), 12)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val (ec, ev2) = (749999L - 250000L, 749999L - 333333L)
    val tot = ec + ev2
    assert(got === Seq(
      ("c", 749999L, 250000L, ec, Math.floorDiv(1000000L * ec, tot)),
      ("v", 749999L, 333333L, ev2, Math.floorDiv(1000000L * ev2, tot))))
    // efficiency sanity: attributions sum to <= 1e6 and > 99% of it
    val s2 = got.map(_._5).sum
    assert(s2 <= 1000000L && s2 > 990000L)
  }

  test("syllablePack: word/run/mono counting, separators, empty") {
    import graft.functions.TextCodec
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def unpack(p: Long) = (p >> 42 & 0x1FFFFF, p >> 21 & 0x1FFFFF, p & 0x1FFFFF)
    assert(unpack(TextCodec.syllablePack(u8("hello world"))) === ((2L, 3L, 1L)))
    // vowel-less word: 0 syllables and NOT monosyllabic; y is a vowel
    assert(unpack(TextCodec.syllablePack(u8("aa bb a"))) === ((3L, 2L, 2L)))
    assert(unpack(TextCodec.syllablePack(u8("rhythm"))) === ((1L, 1L, 1L)))
    // runs split by consonants: a-e-io = 3 runs in one word
    assert(unpack(TextCodec.syllablePack(u8("catequious"))) === ((1L, 3L, 0L)))
    assert(unpack(TextCodec.syllablePack(u8(""))) === ((0L, 0L, 0L)))
    assert(unpack(TextCodec.syllablePack(u8("  x  "))) === ((1L, 0L, 0L)))
  }

  test("changepointSplit: hand argmax, smallest-t tie, <2-point drop") {
    import graft.operators.TemporalOps
    val df = Seq(
      ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 10L), ("A", 4L, 10L),
      ("B", 1L, 5L), ("B", 2L, 5L), ("B", 3L, 5L),
      ("C", 9L, 7L)) // single point: no candidate split
      .toDF("k", "t", "v")
    val got = TemporalOps.changepointSplit(df, "k", "t", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // A: split after t=2 -> score 0 + 400000/2 = 200000, gain 100000
    // B: constant -> all splits tie at 75000, smallest t wins, gain 0
    assert(got === Seq(
      ("A", 2L, 4L, 100000L, 0L, 10000L),
      ("B", 1L, 3L, 0L, 5000L, 5000L)))
  }

  test("cohensKappa: textbook contingency table, degenerate guard") {
    import graft.operators.QualityOps
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(15)(("y", "y")) ++
      Seq.fill(5)(("x", "y")) ++ Seq.fill(10)(("y", "x"))
    val got = QualityOps.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // n=50 agree=35 src=25*30+25*20=1250 -> po .7 pe .5 kappa .4
    assert(got === ((50L, 35L, 700000L, 500000L, 400000L)))
    val deg = QualityOps.cohensKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(deg === ((2L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("offPolicyValue: hand IPW/DR, truncating negative residuals") {
    import graft.operators.PolicyOps
    // ctx 0: x{100,200} y{50,70} -> best x (m=150000 milli-cents, p=.5);
    //   ipw terms 200,400 -> 150000; dr residuals -100000/+100000 -> 150000
    // ctx 1: x{300} y{900,1000,1400} -> best y (m=1100000, p=.75);
    //   ipw 1200+1333+1866=4399 -> 1099750; dr -266666-133333+400000=+1
    //   (asymmetric TRUNCATION toward zero) -> 1//4=0 -> 1100000
    val log = Seq(
      (0L, "x", 100L), (0L, "x", 200L), (0L, "y", 50L), (0L, "y", 70L),
      (1L, "x", 300L), (1L, "y", 900L), (1L, "y", 1000L), (1L, "y", 1400L))
      .toDF("ctx", "arm", "r")
    val got = PolicyOps.offPolicyValue(log, "ctx", "arm", col("r"))
      .as[(Long, Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 4L, "x", 500000L, 105000L, 150000L, 150000L),
      (1L, 4L, "y", 750000L, 900000L, 1099750L, 1100000L)))
  }

  test("interleaveSchedule: round-robin with dropout is a permutation") {
    import graft.operators.SamplingOps
    // A{a1,a2,a3} B{b1} C{c1,c2} by id order ->
    // round 1: a1,b1,c1; round 2: a2,c2 (B exhausted); round 3: a3
    val docs = Seq(("a1", "A"), ("a2", "A"), ("a3", "A"), ("b1", "B"),
      ("c1", "C"), ("c2", "C")).toDF("id", "g")
    val got = SamplingOps.interleaveSchedule(docs, "g", "id", Seq(col("id")))
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a1", "A", 1L), (2L, "b1", "B", 1L), (3L, "c1", "C", 1L),
      (4L, "a2", "A", 2L), (5L, "c2", "C", 2L), (6L, "a3", "A", 3L)))
    assert(got.map(_._1) === (1L to 6L))
  }

  test("kCenterGreedy: hand 1-D traversal, non-increasing radii") {
    import graft.operators.SimilarityOps
    // line points 0, .001, .5, 1 -> start id1; farthest id4; then id3
    val emb = Seq((1L, Seq(0.0f)), (2L, Seq(0.001f)), (3L, Seq(0.5f)),
      (4L, Seq(1.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.kCenterGreedy(emb, "vec_id", "embedding", 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 0L),
      (2L, 4L, 1048576L * 1048576L / 1024L),
      (3L, 3L, 524288L * 524288L / 1024L)))
    assert(got.map(_._3).drop(1) === got.map(_._3).drop(1).sorted.reverse)
  }

  test("bcubedClusterAudit: hand cells, perfect-match identity") {
    import graft.operators.QualityOps
    // sys {1,2}{3} vs gold {1}{2,3}: every item 1/2 pure except the
    // singletons -> prec = rec = f1 = 2/3
    val sys = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("id", "c")
    val gold = Seq((1L, "X"), (2L, "Y"), (3L, "Y")).toDF("id", "g")
    val got = QualityOps.bcubedClusterAudit(sys, "id", "c", gold, "id", "g")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got === ((3L, 2L, 2L, 666666L, 666666L, 666666L)))
    // identical clusterings -> exactly 1.0 everywhere
    val same = QualityOps.bcubedClusterAudit(sys, "id", "c", sys, "id", "c")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(same === ((3L, 2L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("vOptimalHistogram: hand DP over frequencies [10,10,1,1,9,9]") {
    import graft.operators.SketchOps
    // enumerated splits: after band 2 -> 0 + 64000 (best); after 3 ->
    // 54000 + 42667; after 4 -> 81000 + 0
    val rows = Seq.fill(10)(1L) ++ Seq.fill(10)(2L) ++ Seq(3L, 4L) ++
      Seq.fill(9)(5L) ++ Seq.fill(9)(6L)
    val got = SketchOps.vOptimalHistogram(rows.toDF("band"), "band", 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, 2L, 20L, 0L),
      (2L, 3L, 6L, 4L, 20L, 64000L)))
  }

  test("rakeKeywords: hand deg/freq, multiplicity, tie on phrase") {
    import graft.operators.TextOps
    // runs: "red fox" x2, "quick fox" x1; every word scores 2000 ->
    // both phrases score 4000, tie broken on the text
    val docs = Seq((1L, "red fox the quick fox"), (2L, "the red fox"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, "doc_id", "text", Seq("the"), 4, 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("quick fox", 2L, 1L, 4000L), ("red fox", 2L, 2L, 4000L)))
  }

  test("wilcoxonSignedRank: hand ranks with ties, zero-pair drop") {
    import graft.operators.QualityOps
    // diffs 4, -2, 2 (zero dropped); |d| ties {2,2} share r2 = 3, |4|
    // gets r2 = 6 -> W2+ = 9, W2- = 3; var48 = 2*3*4*7 - (8-2) = 162
    val pairs = Seq((5L, 1L), (1L, 3L), (7L, 5L), (4L, 4L)).toDF("x", "y")
    val got = QualityOps.wilcoxonSignedRank(pairs, "x", "y")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(got === ((3L, 9L, 3L, 6L, 162L, false)))
  }

  test("systematicPps: hand grid points, heavy-item multiplicity") {
    import graft.operators.SamplingOps
    // W=20, k=2 -> grid {5, 15}: id1 [0,10) takes 5, id3 [11,20) takes 15
    val a = SamplingOps.systematicPps(
      Seq((1L, 10L), (2L, 1L), (3L, 9L)).toDF("id", "n"), "id", "n", 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a === Seq((1L, 10L, 10L, 1L), (3L, 9L, 20L, 1L)))
    // W=22, k=4 -> grid {2, 8, 13, 19}: the heavy item draws ALL four
    val b = SamplingOps.systematicPps(
      Seq((1L, 20L), (2L, 1L), (3L, 1L)).toDF("id", "n"), "id", "n", 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(b === Seq((1L, 20L, 20L, 4L)))
    assert(b.map(_._4).sum === 4L)
  }

  test("gapFillInterpolate: hand lerp, present rows pass through") {
    import graft.operators.TemporalOps
    val df = Seq(("A", "2020-01-01", 10L), ("A", "2020-01-04", 4L))
      .toDF("k", "day", "v")
      .select(col("k"), to_date(col("day")).as("day"), col("v"))
    val got = TemporalOps.gapFillInterpolate(df, "k", "day", "v")
      .select(col("key"), col("day").cast("string"), col("v_e3"), col("filled"))
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("A", "2020-01-01", 10000L, false),
      ("A", "2020-01-02", 8000L, true),
      ("A", "2020-01-03", 6000L, true),
      ("A", "2020-01-04", 4000L, false)))
  }

  test("streamingDiversityAdmission: packing invariant, replay idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("kc_stream").toString + "/centers"
    val admitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = StatefulOps.streamingDiversityAdmission(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      1000000L, dir) { (adm, bid) =>
        admitted ++= adm.collect().map(r => (bid, r.getAs[Long]("vec_id")))
        ()
      }.start()
    // batch 1: 1 admits (empty corpus); 2 is 1's near-twin -> in-batch
    // greedy rejects it
    ms.addData((1L, Seq(0.0f)), (2L, Seq(0.001f)))
    q.processAllAvailable()
    // batch 2: 3 is far from 1 -> admits; 4 is 3's twin (in-batch
    // reject); 5 is 1's twin (corpus reject)
    ms.addData((3L, Seq(0.5f)), (4L, Seq(0.501f)), (5L, Seq(0.0005f)))
    q.processAllAvailable()
    q.stop()
    assert(admitted.toSeq.map(_._2) === Seq(1L, 3L))
    // restart + replay of batch 2's content: the same-id screen lets 3
    // re-admit (its own center), twins still reject -> idempotent
    val admitted2 = scala.collection.mutable.ArrayBuffer[Long]()
    val ms2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StatefulOps.streamingDiversityAdmission(
      ms2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      1000000L, dir) { (adm, _) =>
        admitted2 ++= adm.collect().map(_.getAs[Long]("vec_id"))
        ()
      }.start()
    ms2.addData((3L, Seq(0.5f)), (4L, Seq(0.501f)), (5L, Seq(0.0005f)))
    q2.processAllAvailable()
    q2.stop()
    assert(admitted2.toSeq === Seq(3L))
    // the artifact holds exactly the packing, deduped across the replay
    val centers = spark.read.parquet(dir).distinct()
      .select("id").as[Long].collect().sorted.toSeq
    assert(centers === Seq(1L, 3L))
  }

  test("hitsScaled: planted bipartite fixture, hand-computed round") {
    // a10 bought by 1,2,3; a11 only by 1 -> 1 is the top hub, a10 the
    // top authority; the minor hub/authority scores floor exactly
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("cust", "supp")
    val got = graft.operators.GraphOps
      .hitsScaled(edges, "cust", "supp", 1, scale = 1000L)
      .as[(Long, String, Long)].collect().toSeq.sorted
    // round 1: ar = (a10=3000, a11=1000), max 3000 -> a = (1000, 333);
    // hr = (h1=1333, h2=1000, h3=1000), max 1333 -> h = (1000, 750, 750)
    assert(got === Seq((1L, "hub", 1000L), (2L, "hub", 750L),
      (3L, "hub", 750L), (10L, "auth", 1000L), (11L, "auth", 333L)))
  }

  test("hitsScaled: equals a driver power-iteration reference, 2 rounds") {
    val edges = (1L to 200L).map { i =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"hits$i"))
      ((h % 23L) + 1L, ((h >> 8) % 11L) + 100L)
    }.distinct
    val got = graft.operators.GraphOps
      .hitsScaled(edges.toDF("s", "t"), "s", "t", 2)
      .as[(Long, String, Long)].collect().toSeq.sorted
    // reference: same integer arithmetic, driver maps
    var h = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 0 until 2) {
      val ar = edges.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      val am = ar.values.max
      a = ar.view.mapValues(v => v * 1000000L / am).toMap
      val hr = edges.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      val hm = hr.values.max
      h = hr.view.mapValues(v => v * 1000000L / hm).toMap
    }
    val want = (h.map { case (n, v) => (n, "hub", v) } ++
      a.map { case (n, v) => (n, "auth", v) }).toSeq.sorted
    assert(got === want && h.nonEmpty && a.nonEmpty)
  }

  test("dbscanGrid: planted core/border/noise fixture, two clusters") {
    // cluster 1: 1,2,3 mutually within eps=10 (all core); 4 is within
    // eps of core 2 only and has a 2-point neighborhood -> border.
    // cluster 8: 8,9,10 (core). 5,6 are a pair — each sees 2 < minPts=3
    // and no core -> noise; 7 isolated -> noise.
    val pts = Seq(
      (1L, 0L, 0L), (2L, 5L, 0L), (3L, 0L, 5L), (4L, 14L, 0L),
      (5L, 100L, 100L), (6L, 105L, 100L), (7L, 200L, 200L),
      (8L, 50L, 0L), (9L, 55L, 0L), (10L, 50L, 5L)).toDF("id", "x", "y")
    val got = graft.operators.SpatialOps
      .dbscanGrid(pts, "id", "x", "y", 10L, 10L, 3L)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (4L, "border", 1L), (5L, "noise", -1L), (6L, "noise", -1L),
      (7L, "noise", -1L), (8L, "core", 8L), (9L, "core", 8L),
      (10L, "core", 8L)))
  }

  test("q301 average precision: equals a driver brute-force AP at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q301_average_precision")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val (dx, dy) = (x.map(_.toDouble), y.map(_.toDouble))
      val d = dx.zip(dy).map { case (p, q) => p * q }.sum
      math.floor(d / (math.sqrt(dx.map(v => v * v).sum) *
        math.sqrt(dy.map(v => v * v).sum)) * 10000.0) / 10000.0
    }
    val want = emb.filter(_._1 % 41 == 0).map { case (qid, qv, ql) =>
      val top = emb.filter(_._1 != qid)
        .map { case (nid, nv, nl) => (nid, cos(qv, nv), nl) }
        .sortBy { case (nid, s, _) => (-s, nid) }.take(10)
      val rels = top.zipWithIndex.map { case ((_, _, nl), i) =>
        (i + 1, if (nl == ql) 1L else 0L) }
      val nRel = rels.map(_._2).sum
      val s = rels.scanLeft((0, 0L)) { case ((_, c), (rk, r)) => (rk, c + r) }
        .tail.zip(rels).map { case ((rk, cum), (_, r)) =>
          r * cum * (2520L / rk) }.sum
      (qid, nRel, if (nRel > 0) s * 1000000L / (2520L * nRel) else 0L)
    }.toSeq.sortBy(_._1)
    assert(got === want && want.exists(_._2 > 0))
  }

  test("degreeAssortativity: exact moments vs brute force on a hashed graph") {
    // deterministic pseudo-random sparse graph (hash-derived endpoints)
    val edges = (1L to 120L).map { i =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"as$i"))
      val a = math.floorMod(h, 30L); val b = math.floorMod(h >> 8, 30L)
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val got = graft.operators.GraphOps
      .degreeAssortativity(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().head
    // brute: directed endpoint-degree pairs over both orientations
    val sym = edges ++ edges.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val pairs = sym.map { case (a, b) => (deg(a), deg(b)) }
    val m2 = pairs.size.toLong
    val sx = pairs.map(_._1).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val (num, den) = (m2 * sxy - sx * sx, m2 * sxx - sx * sx)
    assert(got === ((m2 / 2, num, den, (num + den) * 1000000L / den - 1000000L)))
    assert(num != 0L) // the fixture actually has degree correlation signal
  }

  test("pathThroughput: equals brute-force shortest-path enumeration") {
    // small hash-derived graph; brute enumerates ALL simple paths up to
    // the hop cap from each seed, keeps exactly the shortest ones per
    // (seed, target), and tallies every node on every surviving path —
    // a reference with none of the sigma/tau machinery
    val cap = 4
    val edges = (1L to 60L).map { i =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"pt$i"))
      (math.floorMod(h, 16L), math.floorMod(h >> 7, 16L))
    }.filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 3L, 7L)
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    // brute BFS distances per seed (hop-capped)
    def dists(s: Long): Map[Long, Int] = {
      var d = Map(s -> 0); var frontier = Seq(s)
      for (r <- 1 to cap) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Seq()))
          .distinct.filterNot(d.contains)
        d = d ++ frontier.map(_ -> r)
      }
      d
    }
    // all simple paths from s of length <= cap, via DFS
    def paths(s: Long): Seq[Seq[Long]] = {
      def go(p: Seq[Long]): Seq[Seq[Long]] =
        if (p.length > cap) Seq(p)
        else p +: adj.getOrElse(p.last, Seq()).filterNot(p.contains)
          .flatMap(n => go(p :+ n))
      go(Seq(s))
    }
    val tally = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val srcs = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    for (s <- seeds; dm = dists(s); p <- paths(s)
         if p.length - 1 == dm.getOrElse(p.last, -1); v <- p) {
      tally(v) += 1L
      srcs(v) = srcs(v) + s
    }
    val got = graft.operators.GraphOps.pathThroughput(
        sym.toDF("s", "d"), "s", "d", seeds.toDF("seed"), "seed", cap)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val want = tally.toSeq.map { case (v, t) => (v, srcs(v).size.toLong, t) }.sorted
    assert(got === want)
    // signal check: some node other than a seed carries real throughput
    assert(want.exists { case (v, _, t) => !seeds.contains(v) && t > seeds.size })
  }

  test("weightedGroupMedian == unweighted median of the weight-expanded multiset") {
    val rows = (1L to 200L).map { i =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"wm$i"))
      (s"g${math.floorMod(h, 3L)}", math.floorMod(h >> 5, 50L),
        1L + math.floorMod(h >> 11, 5L), i)
    }
    val got = graft.operators.SketchOps.weightedGroupMedian(
        rows.toDF("g", "v", "w", "tie"), "g", "v", "w", "tie")
      .as[(String, Long, Long)].collect().toSeq.sorted
    // expand each row into w copies and take the plain lower median
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val expanded = rs.toSeq.sortBy(r => (r._2, r._4))
        .flatMap(r => Seq.fill(r._3.toInt)(r._2))
      (g, expanded.size.toLong, expanded((expanded.size - 1) / 2))
    }.toSeq.sorted
    assert(got === want && want.size == 3)
  }

  test("runsTest: streaks and alternation score as designed") {
    // key "streak": below-below-(median, dropped)-above-above-above
    // key "pingpong": below-above-below-above-(median, dropped)-above
    val rows =
      Seq(("streak", 1L, 1.0), ("streak", 2L, 2.0), ("streak", 3L, 3.0),
        ("streak", 4L, 4.0), ("streak", 5L, 5.0), ("streak", 6L, 6.0),
        ("pingpong", 1L, 1.0), ("pingpong", 2L, 9.0), ("pingpong", 3L, 2.0),
        ("pingpong", 4L, 8.0), ("pingpong", 5L, 3.0), ("pingpong", 6L, 7.0),
        ("flat", 1L, 5.0), ("flat", 2L, 5.0)) // all == median: dropped
        .zipWithIndex.map { case ((k, t, v), i) => (k, t, v, i.toLong) }
    val got = graft.operators.TemporalOps.runsTest(
        rows.toDF("k", "t", "v", "tie"), "k", "t", "v", "tie")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // streak: median 3 dropped; signs b,b,a,a,a -> 2 runs, n1=3, n2=2
    assert(got("streak") === (("streak", 3L, 2L, 2L,
      1000000L + 2L * 3L * 2L * 1000000L / 5L,
      2L * 5L * 1000000L / (5L + 12L))))
    // pingpong: lower median of (1,2,3,7,8,9) = 3 dropped;
    // signs b,a,b,a,a -> 4 runs
    assert(got("pingpong") === (("pingpong", 3L, 2L, 4L,
      1000000L + 2L * 3L * 2L * 1000000L / 5L,
      4L * 5L * 1000000L / (5L + 12L))))
    assert(!got.contains("flat"))
  }

  test("isotonicFit == stack PAVA reference, and is monotone") {
    // planted non-monotone rate curve with unequal bin weights
    val bins = Seq((0L, 10L, 1L), (1L, 20L, 6L), (2L, 10L, 2L),
      (3L, 40L, 20L), (4L, 10L, 4L), (5L, 20L, 18L))
    val got = graft.operators.SketchOps.isotonicFit(
        bins.toDF("bin", "n", "np"), "bin", "n", "np")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // reference: classic pool-adjacent-violators with exact rational
    // pools, compared by cross-multiplication; ppm floored from the
    // SAME double division the operator performs
    val stack = scala.collection.mutable.Stack[(Long, Long, Int)]() // (pos, n, width)
    for ((_, n, p) <- bins) {
      var (cp, cn, cw) = (p, n, 1)
      while (stack.nonEmpty && stack.top._1 * cn >= cp * stack.top._2) {
        val (p2, n2, w2) = stack.pop(); cp += p2; cn += n2; cw += w2
      }
      stack.push((cp, cn, cw))
    }
    val fits = stack.toSeq.reverse.flatMap { case (p, n, w) =>
      Seq.fill(w)(math.floor(p.toDouble / n.toDouble * 1000000d).toLong)
    }
    val want = bins.zip(fits).map { case ((b, n, p), f) => (b, n, p, f) }
    assert(got === want)
    assert(got.map(_._4) === got.map(_._4).sorted) // monotone non-decreasing
    assert(got.map(_._4).distinct.size > 1) // pools actually formed
  }

  test("sharded gap detection == global reference, incl. boundary-spanning and whole-missing shards") {
    // the q311 plan as a function, on a fixture the sf tables don't
    // exercise: a gap SPANNING a 4096-shard boundary (4090..4101
    // missing), an entire missing shard (8192..12287), and in-shard
    // singles — the shard-local window + shards-level boundary walk
    // must reproduce the global-window gap list exactly
    import org.apache.spark.sql.expressions.Window
    val keep = (1L to 16383L).filterNot(i =>
      (i >= 4090L && i <= 4101L) || (i >= 8192L && i <= 12287L) || i % 501L == 0L)
    val ids = keep.toDF("id")
      .withColumn("shard", call_function("div", col("id"), lit(4096L)))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
    val inner = ids.withColumn("prev", lag(col("id"), 1).over(w))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1L)
      .select((col("prev") + 1L).as("gs"), (col("id") - 1L).as("ge"))
    val bounds = ids.groupBy(col("shard"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    val wb = Window.partitionBy(lit(0)).orderBy(col("shard"))
    val cross = bounds.withColumn("pmx", lag(col("mx"), 1).over(wb))
      .filter(col("pmx").isNotNull && col("mn") - col("pmx") > 1L)
      .select((col("pmx") + 1L).as("gs"), (col("mn") - 1L).as("ge"))
    val got = inner.union(cross).as[(Long, Long)].collect().toSeq.sorted
    val want = keep.zip(keep.tail).filter { case (a, b) => b - a > 1 }
      .map { case (a, b) => (a + 1, b - 1) }.sorted
    assert(got === want)
    // the fixture really exercises both special paths
    assert(want.contains((4090L, 4101L)) &&
      want.exists { case (a, b) => a <= 8192L && b >= 12287L })
  }

  test("max drawdown: hand equity curve, earliest-trough tie") {
    // +5 +5 -12 (dd 12) +20 -3 -9 (dd 12 again, later -> not reported)
    val rows = Seq((1L, 5.0), (2L, 5.0), (3L, -12.0), (4L, 20.0),
      (5L, -3.0), (6L, -9.0)).map { case (t, v) => (7L, t, t, v) }
    val ev = rows.toDF("user_id", "t", "event_id", "value")
      .select(col("user_id"), col("t"), col("event_id"),
        floor(col("value") * 100d).cast("long").as("c"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = ev.withColumn("bal", sum(col("c")).over(w))
      .withColumn("dd", max(col("bal")).over(w) - col("bal"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("dd"), (-col("t")).as("nt"),
        (-col("event_id")).as("ni"))).as("m"))
      .select(col("user_id"), col("m.dd"), (-col("m.nt")), (-col("m.ni")))
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((7L, 1200L, 3L, 3L))) // dd=12.00 at t=3, not the later tie at t=6
  }

  test("streamingKmvDistinct: cross-batch end-state equals the batch sketch; replays absorbed") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{KmvEvent, KmvReadout}
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KmvEvent]
    val q = StatefulOps.streamingKmvDistinct(ms.toDS())
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(StatefulOps.UpdateMode).start()
    val b1 = (1 to 300).map(i => KmvEvent("a", s"value-$i")) :+ KmvEvent("b", "x")
    val b2 = (200 to 500).map(i => KmvEvent("a", s"value-$i"))
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable() // replayed batch
    q.stop()
    val last = spark.table("kmv_out").as[KmvReadout].collect()
      .zipWithIndex.groupBy(_._1.key).map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
    val batch = graft.operators.SketchOps.kmvDistinct(
      (b1 ++ b2).map(e => (e.key, e.value)).toDF("key", "v"), Seq("key"), "v")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("distinct_est")).toMap
    // min-k state is monotone: the replayed batch moved nothing but n_values
    assert(last("a").distinct_est === batch("a"),
      "KMV end-state must equal the batch sketch bit-for-bit")
    assert(last("b").distinct_est === batch("b") && batch("b") === 1.0)
    assert(last("a").n_values === (b1.size - 1) + 2 * b2.size)
    // the estimator really is in sketch mode for key a (500 distinct > k)
    assert(last("a").distinct_est > 64.0)
  }

  test("streamingFunnel: cross-batch cascade equals the min-time recurrence; replays absorbed") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelReadout}
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "signup", "purchase")
    val b1 = Seq(
      FunnelEvent("u1", "view", 10), FunnelEvent("u1", "click", 10), // same tick: strict > blocks
      FunnelEvent("u1", "click", 12), FunnelEvent("u1", "signup", 11), // pre-click signup ignored
      FunnelEvent("u2", "click", 5), // click before any view: stuck at 0
      FunnelEvent("u3", "view", 1), FunnelEvent("u3", "click", 2),
      FunnelEvent("u3", "signup", 3), FunnelEvent("u3", "purchase", 4),
      FunnelEvent("u4", "view", 7), FunnelEvent("u4", "other", 8)) // unknown step ignored
    val b2 = Seq(
      FunnelEvent("u1", "signup", 20), FunnelEvent("u1", "purchase", 19), // 19 < signup t: blocked
      FunnelEvent("u2", "view", 30), FunnelEvent("u2", "click", 31),
      FunnelEvent("u4", "click", 40))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelEvent]
    val q = StatefulOps.streamingFunnel(ms.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(StatefulOps.UpdateMode).start()
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable() // replayed batch
    q.stop()
    val last = spark.table("funnel_out").as[FunnelReadout].collect()
      .zipWithIndex.groupBy(_._1.user).map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
    // independent reference: the q315 min-time recurrence over b1 ++ b2
    val all = (b1 ++ b2).groupBy(_.user)
    def cascade(evs: Seq[FunnelEvent]): (Int, Long) = {
      var t = Long.MinValue; var k = 0
      var advanced = true
      while (advanced && k < stages.size) {
        val nxt = evs.filter(e => e.step == stages(k) && e.t > t)
        if (nxt.isEmpty) advanced = false
        else { t = nxt.map(_.t).min; k += 1 }
      }
      (k, if (t == Long.MinValue) 0L else t)
    }
    for ((u, evs) <- all) {
      val (k, t) = cascade(evs)
      assert(last(u).stage_reached === k, s"user $u stage")
      assert(last(u).t_last === t, s"user $u time")
    }
    assert(last("u1").stage_reached === 3) // view@10, click@12, signup@20; purchase@19 blocked
    assert(last("u2").stage_reached === 2) // pre-view click never counts
    assert(last("u3").stage_reached === 4)
    assert(last("u4").stage_reached === 2)
  }
}
