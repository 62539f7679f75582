package graft

import graft.operators.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash-LSH verified pairs equal brute-force jaccard pairs (recall check)") {
    val docs = Tables.documents(spark, sf)
    val brute = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.7)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute)
    assert(brute.nonEmpty) // the testdata plants near-dups; empty would be vacuous
  }

  test("exact duplicates: synthetic dup collapses to one keeper") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = DedupOps.exactDuplicates(df, "doc_id", "text")
      .orderBy("keep_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("simhash: identical docs get identical signatures, near-dups small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words describing some other topic entirely here"),
    ).toDF("doc_id", "text")
    val sig = DedupOps.simhash64(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) > 8)
    val pairs = DedupOps.simhashPairs(df, "doc_id", "text", 3)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("frequency-capped jaccardPairs equals the uncapped scan; release() unpersists") {
    val docs = Tables.documents(spark, sf)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = toSet(DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.6, Int.MaxValue))
    val rel = DedupOps.jaccardPairsReleasable(docs, "doc_id", "text", 3, 0.6, 64)
    assert(toSet(rel.df) == uncapped)
    assert(uncapped.nonEmpty)
    rel.release() // must not throw; cache entry dropped
  }

  test("prefix-filtered jaccard equals the uncapped brute-force scan on testdata") {
    val docs = Tables.documents(spark, sf)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = toSet(DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.6, Int.MaxValue))
    val rel = DedupOps.jaccardPairsPrefixReleasable(docs, "doc_id", "text", 3, 0.6)
    assert(toSet(rel.df) == uncapped)
    assert(uncapped.nonEmpty)
    rel.release()
  }

  test("property: prefix-filtered jaccard equals brute force on generated corpora") {
    // ScalaCheck generators driven with fixed seeds (same idiom as
    // PropertySpec): small vocab + repeated phrases force shared shingles,
    // hot shingles, and size-skewed pairs — the cases that stress the
    // prefix/length/positional filters
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "boiler", "plate", "x")
    val docGen = Gen.choose(3, 14).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 12).flatMap(nd => Gen.listOfN(nd, docGen))
    for (seedNo <- 1L to 8L) {
      val corpus = corpusGen(Gen.Parameters.default, Seed(seedNo)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val tau = if (seedNo % 2 == 0) 0.6 else 0.5
      // brute force in plain Scala over distinct word-3-gram sets
      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sets = corpus.map { case (i, t) => i -> shingleSet(t) }.toMap
      val expected = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= tau
      } yield (ia, ib, j)).toSet
      val got = DedupOps.jaccardPairsPrefix(
        corpus.toDF("doc_id", "text"), "doc_id", "text", 3, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"seed=$seedNo tau=$tau corpus=$corpus")
    }
  }

  test("property: prefix-filtered binary cosine equals brute force on generated corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "boiler", "plate", "x")
    val docGen = Gen.choose(3, 14).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 12).flatMap(nd => Gen.listOfN(nd, docGen))
    for (seedNo <- 1L to 8L) {
      val corpus = corpusGen(Gen.Parameters.default, Seed(seedNo)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // exact rationals: 4/5 and 7/10
      val (p, q) = if (seedNo % 2 == 0) (4, 5) else (7, 10)
      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sets = corpus.map { case (i, t) => i -> shingleSet(t) }.toMap
      // brute-force set cosine via the integer inequality o²q² >= p²·na·nb
      val expected = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        o = (sa & sb).size.toLong
        if o * o * q * q >= p.toLong * p * sa.size * sb.size
      } yield (ia, ib, o, sa.size.toLong, sb.size.toLong)).toSet
      val r = DedupOps.cosinePairsPrefixReleasable(
        corpus.toDF("doc_id", "text"), "doc_id", "text", 3, p, q)
      val got = r.df.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toSet
      r.release()
      assert(got == expected, s"seed=$seedNo tau=$p/$q corpus=$corpus")
    }
  }

  test("property: one-sided containment equals brute force on generated corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "boiler", "plate", "x")
    val docGen = Gen.choose(3, 14).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 12).flatMap(nd => Gen.listOfN(nd, docGen))
    for (seedNo <- 1L to 8L) {
      val corpus = corpusGen(Gen.Parameters.default, Seed(seedNo)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val tau = if (seedNo % 2 == 0) 0.8 else 0.7
      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sets = corpus.map { case (i, t) => i -> shingleSet(t) }.toMap
      // brute-force DIRECTIONAL containment |A∩B| / |A|
      val expected = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia != ib && sa.nonEmpty && sb.nonEmpty
        c = (sa & sb).size.toDouble / sa.size
        if c >= tau
      } yield (ia, ib, c)).toSet
      val r = DedupOps.containmentPairsReleasable(
        corpus.toDF("doc_id", "text"), "doc_id", "text", 3, tau)
      val got = r.df.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      r.release()
      assert(got == expected, s"seed=$seedNo tau=$tau corpus=$corpus")
    }
  }

  test("property: valueRuns partitions each key's timeline exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val evGen = Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf("u", "v")
      t <- Gen.choose(1L, 12L)
      v <- Gen.oneOf("a", "b", "c")
    } yield (k, t, v)))
    for (seedNo <- 1L to 6L) {
      val evs = evGen(Gen.Parameters.default, Seed(seedNo)).get
        .zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val runs = graft.operators.TemporalOps.valueRuns(
        evs.toDF("k", "t", "tie", "v"), "k", col("t"), col("tie"), "v")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) Long.MaxValue else r.getLong(4),
          r.getBoolean(5)))
      // (1) event counts conserve per key; (2) exactly one current run per
      // key; (3) the half-open chain closes: non-current valid_tos are
      // exactly the valid_froms minus the chain head (multiset equality —
      // robust to runs sharing a valid_from when values flip within one
      // ord tick, which this generator produces)
      evs.groupBy(_._1).foreach { case (k, kevs) =>
        val kr = runs.filter(_._1 == k)
        assert(kr.map(_._4).sum == kevs.size, s"seed=$seedNo key=$k count")
        assert(kr.count(_._6) == 1, s"seed=$seedNo key=$k current")
        val tos = kr.filter(!_._6).map(_._5).sorted.toSeq
        val froms = kr.map(_._3).sorted.toSeq
        assert(tos == froms.drop(1) || froms.isEmpty,
          s"seed=$seedNo key=$k chain break: tos=$tos froms=$froms")
      }
    }
  }

  test("lane-packed minhash signatures equal unpacked per-permutation mins") {
    val docs = Tables.documents(spark, sf)
    val k = 96
    val hashed = docs.repartition(col("doc_id"))
      .select(col("doc_id").as("id"), split(col("text"), " ").as("__toks"))
      .select(col("id"),
        explode(array_distinct(DedupOps.hashedShingleArrayFromTokens(col("__toks"), 3))).as("h"))
    // reference: one plain `min` agg per permutation over the SAME
    // 15-bit lane arithmetic the packed kernel uses
    val (as, bs) = DedupOps.coeffs(k)
    val p = DedupOps.MinhashPrime
    val hh = pmod(col("h"), lit(p))
    val refAggs = (0 until k).map(i =>
      min(shiftrightunsigned((lit(as(i)) * hh + lit(bs(i))) % p, 16)).as(s"mh$i"))
    val ref = hashed.groupBy(col("id")).agg(refAggs.head, refAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    val packed = DedupOps.minhashSignaturesFromHashes(hashed, k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    assert(packed.keySet == ref.keySet)
    assert(packed.keySet.nonEmpty)
    packed.foreach { case (id, sig) => assert(sig == ref(id), s"doc $id") }
  }

  test("PackedLaneMin: SWAR lane mins equal per-lane scala mins on random lanes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val laneGen = Gen.choose(0L, 0x7FFEL) // 15-bit payloads
    val rowGen = Gen.listOfN(4, laneGen).map(ls =>
      ls.zipWithIndex.map { case (v, j) => v << (16 * j) }.reduce(_ | _))
    val rowsGen = Gen.choose(1, 40).flatMap(m => Gen.listOfN(m, rowGen))
    for (seedNo <- 1L to 10L) {
      val rows = rowsGen(Gen.Parameters.default, Seed(seedNo)).get
      val expected = (0 until 4).map(j =>
        rows.map(v => (v >>> (16 * j)) & 0xFFFFL).min)
      val got = rows.map(v => (1L, v)).toDF("id", "packed")
        .groupBy(col("id"))
        .agg(org.apache.spark.sql.GraftBridge.column(
          graft.functions.PackedLaneMin(
            org.apache.spark.sql.GraftBridge.expression(col("packed")))
            .toAggregateExpression()).as("pm"))
        .head().getLong(1)
      val gotLanes = (0 until 4).map(j => (got >>> (16 * j)) & 0xFFFFL)
      assert(gotLanes == expected, s"seed=$seedNo rows=$rows")
    }
  }

  test("minhash index round-trips through parquet; joinAgainstIndex equals direct cross join") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft_mh_idx_spec").toString
    DedupOps.buildMinhashIndex(corpus, "doc_id", "text", path)
    // artifact sanity: all three relations exist and the meta pins params
    val meta = spark.read.parquet(s"$path/meta").head()
    assert((meta.getInt(0), meta.getInt(1), meta.getInt(2)) == ((3, 96, 48)))
    assert(spark.read.parquet(s"$path/docs").count() == corpus.count())
    assert(spark.read.parquet(s"$path/bands").count() == 48 * spark.read.parquet(s"$path/docs").filter(size(col("hs")) > 0).count())
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIndex = toSet(DedupOps.joinAgainstMinhashIndex(batch, "doc_id", "text", path, 0.7))
    val direct = toSet(DedupOps.minhashNearDupJoin(batch, corpus, "doc_id", "text", 3, 0.7))
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty)
  }

  test("repeatedPassages: planted >= k+w-1 token passage always fingerprint-shared") {
    // k=6, w=5: guarantee threshold is a 10-token verbatim run. Docs 1/2
    // embed the same 10-token passage in unrelated contexts; doc 3 is
    // disjoint vocabulary
    val passage = (0 until 10).map(i => s"p$i").mkString(" ")
    val df = Seq(
      (1L, s"a0 a1 a2 a3 $passage a4 a5 a6 a7"),
      (2L, s"b0 b1 b2 b3 b4 b5 $passage b6 b7"),
      (3L, (0 until 25).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val got = DedupOps.repeatedPassages(df, "doc_id", "text", 6, 5)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 >= 1, s"doc 1 must share a fingerprint: $byId")
    assert(byId(2L)._3 >= 1, s"doc 2 must share a fingerprint: $byId")
    assert(byId(3L)._3 == 0, s"doc 3 shares nothing: $byId")
    // permille arithmetic: n_shared*1000 div n_fp
    got.foreach { case (_, nfp, nsh, pm) => assert(pm == nsh * 1000 / nfp) }
    // a doc shorter than one full window still fingerprints (single min)
    val tiny = Seq((9L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text") // 2 shingles < w
    val t = DedupOps.repeatedPassages(tiny, "doc_id", "text", 6, 5).collect()
    assert(t.length == 1 && t.head.getLong(1) == 1L) // 2 hashes, 1 window-min set entry... n_fp >= 1
  }

  test("pageRankScaled: hand-computed path graph, symmetry, exact integer ranks") {
    // undirected path 1-2-3: deg 1,2,1. Two rounds by hand:
    //   r1 = (575000, 1850000, 575000); r2 = (936250, 1127500, 936250)
    val ed = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = graft.operators.GraphOps.pageRankScaled(ed, "src", "dst", 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 936250L), (2L, 1127500L), (3L, 936250L)),
      got.toSeq.toString)
    // center of a 5-point star dominates; leaves tie exactly
    val star = (2L to 6L).flatMap(i => Seq((1L, i), (i, 1L))).toDF("src", "dst")
    val s = graft.operators.GraphOps.pageRankScaled(star, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((3L to 6L).forall(i => s(i) == s(2L)), s.toString)
    assert(s(1L) > s(2L), s.toString)
  }

  test("transitionMatrix: hand-computed counts and floor probabilities; no cross-user steps") {
    // user 1: a b a b -> steps ab, ba, ab; user 2: a c -> ac
    // counts ab=2 ba=1 ac=1; out-totals a=3 b=1; p = 666, 1000, 333
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "c"))
      .toDF("user_id", "seq", "state")
    val got = graft.operators.GraphOps.transitionMatrix(
      ev, "user_id", Seq(col("seq")), "state")
      .orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "b", 2L, 666L), ("a", "c", 1L, 333L),
      ("b", "a", 1L, 1000L)), got.toSeq.toString)
  }

  test("editDistancePairs: planted dups verify with exact levenshtein; candidates bounded") {
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // plant one verbatim copy of the first doc under a fresh id
    val copy = base.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val got = DedupOps.editDistancePairs(base.unionByName(copy), "doc_id", "text", 3, 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "testdata plants near-dups; empty would be vacuous")
    assert(got.forall { case (ia, ib, _, p) => ia < ib && p <= 500L })
    assert(got.exists(t => t._2 == 100000L && t._3 == 0L),
      s"the planted verbatim copy must verify at lev 0: ${got.toSeq}")
  }

  test("madOutliers: hand-computed MAD flags only the true outlier") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L), ("a", 100.0, 4L))
      .toDF("g", "v", "tie")
    // median = 2 (rank 2 of 4), devs 1,0,1,98 -> MAD = 1; only 100 flags
    val got = graft.operators.SketchOps.madOutliers(df, "g", "v", "tie", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("a", 4L, 100.0, 2.0, 1.0)), got.toSeq.toString)
  }

  test("kmvOverlap: estimates land near the true union/intersection; disjoint sets read zero") {
    val a = (1L to 1000L).toDF("ka")
    val b = (500L to 1500L).toDF("kb")
    val r = graft.operators.SketchOps.kmvOverlap(a, "ka", b, "kb", 64).head()
    val (ku, ppm, uEst, iEst) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(ku == 64L)
    // truth: union 1500, intersect 501 — KMV at k=64 is well within 2x
    assert(uEst > 750 && uEst < 3000, s"union_est $uEst")
    assert(iEst > 170 && iEst < 1100, s"intersect_est $iEst")
    assert(ppm > 100000L && ppm < 700000L, s"resemblance $ppm")
    val d = graft.operators.SketchOps.kmvOverlap(
      a, "ka", (5000L to 5999L).toDF("kb"), "kb", 64).head()
    assert(d.getLong(1) == 0L && d.getDouble(3) == 0.0,
      s"disjoint sets must read zero overlap: $d")
  }

  test("exactGroupMedian: lower median, no float averaging, per-group") {
    val df = Seq(("a", 3.0, 1L), ("a", 1.0, 2L), ("a", 2.0, 3L),
      ("b", 1.0, 4L), ("b", 2.0, 5L), ("b", 3.0, 6L), ("b", 4.0, 7L),
      ("c", 9.0, 8L))
      .toDF("g", "v", "tie")
    val got = graft.operators.SketchOps.exactGroupMedian(df, "g", "v", "tie")
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // odd -> true median; even -> LOWER median (rank (n+1) div 2)
    assert(got.toSeq == Seq(("a", 3L, 2.0), ("b", 4L, 2.0), ("c", 1L, 9.0)),
      got.toSeq.toString)
  }

  test("rrfFuse: hand-computed reciprocal ranks; missing docs contribute zero") {
    // c(1)=16393, c(2)=16129 -> B fused 32522, A 16393, C 16129
    val ra = Seq((1, 10L, 1L), (1, 20L, 2L)).toDF("query_id", "id", "rk")
    val rb = Seq((1, 20L, 1L), (1, 30L, 2L)).toDF("query_id", "id", "rk")
    val got = TextOps.rrfFuse(Seq(ra, rb), 60L, 10)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((20L, 32522L, 1L), (10L, 16393L, 2L),
      (30L, 16129L, 3L)), got.toSeq.toString)
  }

  test("ngramNovelty: first owner counts novel, repeats don't; short docs report zero") {
    val df = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "z z"))
      .toDF("doc_id", "text")
    val got = TextOps.ngramNovelty(df, "doc_id", "text", 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 1000L), (2L, 2L, 1L, 500L),
      (3L, 0L, 0L, 0L)), got.toSeq.toString)
  }

  test("asofJoinNearest: picks the closer side; equal distance resolves backward; no-match nulls") {
    val left = Seq((1L, "k", 10L), (2L, "k", 20L), (3L, "k", 100L),
      (4L, "e", 5L), (5L, "t", 10L))
      .toDF("lid", "k", "lt")
    val right = Seq(("k", 7L, 1L, "r7"), ("k", 12L, 2L, "r12"), ("k", 30L, 3L, "r30"),
      ("t", 8L, 4L, "t8"), ("t", 12L, 5L, "t12"))
      .toDF("k", "rt", "tie", "v")
    val got = graft.operators.AsofOps.asofJoinNearest(
      left, right, "k", col("lt"), col("rt"), "tie", Seq("v"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)).getOrElse("-"),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))
    // lid1: 12 (d2) beats 7 (d3); lid2: 12 (d8) beats 30 (d10);
    // lid3: 30 is nearest; lid4: key 'e' has no rights -> nulls;
    // lid5: 8 and 12 both d2 -> backward (8) wins the tie
    assert(got.toSeq == Seq((1L, "r12", 2L), (2L, "r12", -8L),
      (3L, "r30", -70L), (4L, "-", Long.MinValue), (5L, "t8", -2L)),
      got.toSeq.toString)
  }

  test("asofJoinForward: smallest right >= left; inclusive; equal-time tie picks highest") {
    val left = Seq((1L, "k", 10L), (2L, "k", 25L), (3L, "k", 100L))
      .toDF("lid", "k", "lt")
    val right = Seq(("k", 10L, 7L, "at10a"), ("k", 10L, 8L, "at10b"),
      ("k", 30L, 9L, "at30"))
      .toDF("k", "rt", "tie", "v")
    val got = graft.operators.AsofOps.asofJoinForward(
      left, right, "k", col("lt"), col("rt"), "tie", Seq("v"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)).getOrElse("-")))
    // lid1: rt=10 inclusive, tie 8 wins; lid2: next is rt=30; lid3: none
    assert(got.toSeq == Seq((1L, "at10b"), (2L, "at30"), (3L, "-")),
      got.toSeq.toString)
  }

  test("itemCooccurrence: within-basket dups count once; ordered pairs; top-k tie-break") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "b"), // dup b collapses
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "b"), (3L, "c"),
      (4L, "z")) // singleton basket -> no pairs
      .toDF("bk", "item")
    val got = graft.operators.GraphOps.itemCooccurrence(df, "bk", "item", 1L, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 2L), ("b", "c", 2L), ("a", "c", 1L)),
      got.toSeq.toString)
  }

  test("funnelConversion: in-window converts, out-of-window stays present-unconverted, pre-step ignored") {
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 15L, "purchase"),   // converts, delta 5
      (2L, 10L, "signup"), (2L, 100L, "purchase"),  // out of horizon 20
      (3L, 10L, "signup"),                          // never converts
      (4L, 5L, "purchase"), (4L, 10L, "signup"),    // purchase BEFORE signup ignored
      (5L, 10L, "purchase"))                        // no signup: not in funnel
      .toDF("user_id", "t", "state")
    val got = graft.operators.GraphOps.funnelConversion(
      ev, "user_id", "t", "state", "signup", "purchase", 20L)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got.toSeq == Seq((1L, 10L, true, 5L), (2L, 10L, false, -1L),
      (3L, 10L, false, -1L), (4L, 10L, false, -1L)), got.toSeq.toString)
  }

  test("dsirWeights: target-like docs outscore off-target docs; averages are per-token") {
    // target slice speaks only 'aa'; 'zz'/'yy' appear only off-target
    val docs = Seq((1L, "aa aa aa", "t"), (2L, "aa aa aa", "t"),
      (3L, "zz yy zz", "o"), (4L, "aa zz aa", "o"))
      .toDF("doc_id", "text", "grp")
    val got = TextOps.dsirWeights(docs, "doc_id", "text",
      docs.filter(col("grp") === "t"), 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == got(2L)) // identical docs, identical score
    assert(got(1L) > got(4L) && got(4L) > got(3L),
      s"target-resemblance ordering broke: $got")
  }

  test("bm25TopK: hand-computed scores; rarer term outscores common term") {
    // 3 docs, dl=2, sumdl=6, N=3; term x in d1,d2 (df=2), a in d1,d3
    // idf = div(1e6*3, 5) = 600000; tf_part = div(264e6, 264) = 1e6
    // -> every hit scores exactly 600000, rank ties break by id
    val df = Seq((1L, "x a"), (2L, "x b"), (3L, "a b")).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(df, "doc_id", "text",
      Seq((1, Seq("x")), (2, Seq("a"))), 10)
      .orderBy("query_id", "rk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, 1L, 600000L, 1L), (1, 2L, 600000L, 2L),
      (2, 1L, 600000L, 1L), (2, 3L, 600000L, 2L)), got.toSeq.toString)
    // rarer term beats common term for the same tf/dl: d1 holds both
    val df2 = Seq((1L, "r c"), (2L, "c z"), (3L, "c y"), (4L, "c w"))
      .toDF("doc_id", "text")
    val s = TextOps.bm25TopK(df2, "doc_id", "text",
      Seq((1, Seq("r")), (2, Seq("c"))), 10)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(s((1, 1L)) > s((2, 1L)),
      s"idf must favor the rare term: ${s.toSeq.sorted}")
  }

  test("bigramLmScore: hand-computed MLE, shared-start discrimination, degenerate docs") {
    // model: ab x3, ba x2, ac x1, xy x1; starts a=4, b=2, x=1
    // P(ab)=750000 P(ba)=1000000 P(ac)=250000 P(xy)=1000000
    val df = Seq(
      (1L, "a b a b a b"), // (3*750000 + 2*1000000) / 5 = 850000
      (2L, "x y"),         // 1000000
      (3L, "a c"),         // 250000
      (4L, ""))            // no bigrams -> 0
      .toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(df, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 5L, 850000L), (2L, 1L, 1000000L),
      (3L, 1L, 250000L), (4L, 0L, 0L)), got.toSeq.toString)
  }

  test("rollingSpikes: trailing range window flags the burst; gap days shrink the window") {
    // key A: one event/day on days 1..7, ten on day 8 -> day 8 spikes
    // (10*7*2=140 > 16*3=48); day 1 alone never spikes vs itself.
    // key B: bursts on days 1 and 100 — the RANGE window must NOT span
    // the gap, so day 100 compares against itself only (no spike).
    val rows = (1L to 7L).map(dy => ("A", dy)) ++ Seq.fill(10)(("A", 8L)) ++
      Seq.fill(3)(("B", 1L)) ++ Seq.fill(5)(("B", 100L))
    val got = graft.operators.GraphOps.rollingSpikes(
      rows.toDF("k", "day"), "k", "day", 7, 3L, 2L)
      .orderBy("key", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.filter(_._1 == "A").map(_._6).toSeq ==
      Seq(false, false, false, false, false, false, false, true), got.toSeq.toString)
    val day8 = got.find(r => r._1 == "A" && r._2 == 8L).get
    assert(day8 == (("A", 8L, 10L, 16L, 7L, true)), day8.toString)
    val b100 = got.find(r => r._1 == "B" && r._2 == 100L).get
    assert(b100 == (("B", 100L, 5L, 5L, 1L, false)),
      s"gap must reset the trailing window: $b100")
  }

  test("collocations: hand-computed PMI ratios and deterministic tie-break") {
    // bigrams xy=2 yx=1 xz=1, N=4; starts x=3 y=1; ends y=2 x=1 z=1
    // pmi(y,x)=4000000, pmi(x,y)=1333333, pmi(x,z)=1333333 (tie -> w2 order)
    val df = Seq((1L, "x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val got = TextOps.collocations(df, "doc_id", "text", minCount = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("y", "x", 1L, 4000000L), ("x", "y", 2L, 1333333L),
      ("x", "z", 1L, 1333333L)), got.toSeq.toString)
  }

  test("calibratedQualityAdmit: per-source floor cut; tiny sources admit nothing below the bar") {
    val df = Seq((1L, "A", 40L), (2L, "A", 30L), (3L, "A", 20L), (4L, "A", 10L),
      (5L, "B", 99L))
      .toDF("doc_id", "source", "quality")
    val got = TextOps.calibratedQualityAdmit(df, "doc_id", "source", "quality", 500L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    // A admits top 2 of 4; B's single doc fails 1*1000 <= 500*1
    assert(got.toSeq == Seq((1L, 1L, true), (2L, 2L, true), (3L, 3L, false),
      (4L, 4L, false), (5L, 1L, false)), got.toSeq.toString)
  }

  test("centroidOutliers: exact integer distances to the label centroid, ranked") {
    val df = Seq((1L, Array(0f, 0f), 7), (2L, Array(2f, 2f), 7), (3L, Array(10f, 10f), 7))
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.centroidOutliers(df, "vec_id", "embedding", "label", 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // centroid = (4194304, 4194304) exactly (scaled 2^20); d2 hand-computed
    assert(got.toSeq == Seq((3L, 79164837199872L, 1L), (1L, 35184372088832L, 2L)),
      got.toSeq.toString)
  }

  test("bloomNewDocuments == exactNewDocuments, even with a tiny saturated filter") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val seen = docs.filter(col("doc_id") % 2 === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = ids(DedupOps.exactNewDocuments(batch, seen, "text"))
    assert(expect.nonEmpty)
    assert(ids(DedupOps.bloomNewDocuments(batch, seen, "text")) == expect)
    // 128-bit filter: nearly every probe is a false positive — the exact
    // verify arm must still produce the identical admission set
    assert(ids(DedupOps.bloomNewDocuments(batch, seen, "text", mBits = 128, kHashes = 2))
      == expect)
    // empty corpus: everything is novel, no false negatives possible
    assert(ids(DedupOps.bloomNewDocuments(batch, seen.limit(0), "text")) == ids(batch))
  }

  test("removeRepeatedSpans: later doc loses the shared span, owner keeps it; short docs untouched") {
    // docs 1/2 share an 8-token span; doc 1 (min id) owns it and keeps
    // every token, doc 2 loses exactly the 8 covered tokens. Doc 3 is
    // shorter than k and must pass through whole. Doc 4 repeats a span
    // WITHIN itself only — cross-doc pass must not touch it.
    val span = (0 until 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"a0 a1 $span a2"),
      (2L, s"b0 $span b1 b2"),
      (3L, "t0 t1 t2"),
      (4L, s"w0 $span w1 $span w2".replace("s", "z"))) // within-doc repeat, distinct tokens
      .toDF("doc_id", "text")
    val got = DedupOps.removeRepeatedSpans(df, "doc_id", "text", 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got(0) == ((1L, 11, 0, s"a0 a1 $span a2")), s"owner changed: ${got(0)}")
    assert(got(1) == ((2L, 11, 8, "b0 b1 b2")), s"later doc not cleaned: ${got(1)}")
    assert(got(2) == ((3L, 3, 0, "t0 t1 t2")), s"short doc changed: ${got(2)}")
    assert(got(3)._3 == 0 && got(3)._4.startsWith("w0"),
      s"within-doc repeat must survive a cross-doc pass: ${got(3)}")
    // overlapping shared spans in one doc: union of covered ranges removed
    val df2 = Seq(
      (1L, s"$span s8"),   // 9 tokens: spans at pos 1 and 2 both shared
      (2L, s"x $span s8")) // same two spans, shifted
      .toDF("doc_id", "text")
    val got2 = DedupOps.removeRepeatedSpans(df2, "doc_id", "text", 8)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    assert(got2(0)._2 == 0 && got2(1)._2 == 9,
      s"overlap union: owner intact, doc 2 loses all 9 covered tokens: ${got2.toSeq}")
    assert(got2(1)._3 == "x", s"doc 2 keeps only the unshared prefix: ${got2.toSeq}")
  }

  test("maximalRepeatedSpans: a planted long quote is ONE maximal span; disjoint repeats stay separate") {
    // doc 2 copies a 40-token quote from doc 1: with k=8 that is 33
    // consecutive banned starts, which must merge into exactly ONE
    // maximal span of length 40 at the planted position. A second,
    // disjoint 8-token repeat later in doc 2 must stay its own island.
    val quote = (0 until 40).map(i => s"q$i").mkString(" ")
    val block = (0 until 8).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, s"$quote filler0 $block"),
      (2L, s"pre0 pre1 $quote mid0 mid1 mid2 $block post0"))
      .toDF("doc_id", "text")
    val got = DedupOps.maximalRepeatedSpans(df, "doc_id", "text", 8)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // owner (doc 1) reports nothing; doc 2: quote at tokens 3..42,
    // block at tokens 46..53
    assert(got.toSeq == Seq((2L, 3L, 42L, 40L), (2L, 46L, 53L, 8L)),
      s"expected one 40-token span + one 8-token span: ${got.toSeq}")
    // adjacency merge: two shared k-blocks touching back-to-back (gap 0)
    // are contiguous coverage and must merge into one 16-token span
    val a = (0 until 8).map(i => s"a$i").mkString(" ")
    val b = (0 until 8).map(i => s"b$i").mkString(" ")
    val df2 = Seq((1L, s"$a $b"), (2L, s"x0 $a $b x1")).toDF("doc_id", "text")
    val got2 = DedupOps.maximalRepeatedSpans(df2, "doc_id", "text", 8)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got2.toSeq == Seq((2L, 2L, 17L, 16L)),
      s"adjacent shared blocks must merge: ${got2.toSeq}")
  }

  test("learnBpeMerges: hand-computed rounds, non-overlapping fold, lexicographic tie-break") {
    // corpus: one doc "aaaa aaaa ba ca". Round 1: (a,a) appears 3x in
    // each "aaaa" -> cnt 6, beats (b,a)/(c,a) at 1. Re-segmentation must
    // fold LEFT-TO-RIGHT NON-OVERLAPPING: "aaaa" -> [aa, aa] (not
    // [aa, a, a]). Round 2: (aa,aa) cnt 2. Round 3: (b,a) vs (c,a) tie
    // at 1 -> pair-ASC adopts (b,a).
    val df = Seq((1L, "aaaa aaaa ba ca")).toDF("doc_id", "text")
    val got = TextOps.learnBpeMerges(df, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L),
      (3L, "b", "a", "ba", 1L)), got.toString)
    // requesting more rounds than the corpus supports fails loudly
    val ex = intercept[IllegalArgumentException] {
      TextOps.learnBpeMerges(Seq((1L, "ab")).toDF("doc_id", "text"), "text", 2)
    }
    assert(ex.getMessage.contains("no adjacent pairs"), ex.getMessage)
  }

  test("scrubPii: redacts emails/phones/ips, counts each class, leaves near-misses alone") {
    val df = Seq(
      (1L, "write to bob42@mail7.com or call 555-123-4567 now"),
      (2L, "server at 10.0.255.3 responded"),
      (3L, "version 1.2 costs 12-34 dollars at 99-999-9999x"), // near-misses: no 4-group ip, wrong phone shape
      (4L, "two mails a@b.io c1@d2.net and ip 1.2.3.4"))
      .toDF("doc_id", "text")
    val got = TextOps.scrubPii(df, "doc_id", "text").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got(0) == ((1L, 1L, 1L, 0L, "write to <EMAIL> or call <PHONE> now")), got(0).toString)
    assert(got(1) == ((2L, 0L, 0L, 1L, "server at <IP> responded")), got(1).toString)
    assert(got(2)._2 == 0L && got(2)._3 == 0L && got(2)._4 == 0L, got(2).toString)
    assert(got(3) == ((4L, 2L, 0L, 1L, "two mails <EMAIL> <EMAIL> and ip <IP>")), got(3).toString)
  }

  test("repeatedPassagePairs: planted shared paragraph surfaces as a pair; hot fps capped out") {
    // docs 1/2 embed the same 10-token passage (>= k+w-1 with k=6, w=5) —
    // they MUST surface as a pair. Docs 20..25 all share one boilerplate
    // passage; with maxDocsPerFp=4 its fingerprints are in 6 > 4 docs, so
    // NO boilerplate pairs may appear.
    val passage = (0 until 10).map(i => s"p$i").mkString(" ")
    val boiler = (0 until 10).map(i => s"h$i").mkString(" ")
    val df = (Seq(
      (1L, s"a0 a1 a2 a3 $passage a4 a5 a6 a7"),
      (2L, s"b0 b1 b2 b3 b4 b5 $passage b6 b7"),
      (3L, (0 until 25).map(i => s"c$i").mkString(" "))) ++
      (20L until 26L).map(i => (i, s"x${i}a x${i}b $boiler x${i}c")))
      .toDF("doc_id", "text")
    val pairs = DedupOps.repeatedPassagePairs(df, "doc_id", "text", 6, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (ia, ib, n) => ia == 1L && ib == 2L && n >= 1 },
      s"planted passage pair (1,2) missing: ${pairs.toSeq}")
    assert(pairs.forall { case (ia, ib, _) => ia < ib }, s"unordered pair: ${pairs.toSeq}")
    assert(!pairs.exists { case (ia, _, _) => ia >= 20L },
      s"boilerplate (6 docs > cap 4) must not pair: ${pairs.toSeq}")
    // with the cap lifted the boilerplate group pairs all-vs-all
    val uncapped = DedupOps.repeatedPassagePairs(df, "doc_id", "text", 6, 5, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert((20L until 26L).combinations(2).forall { c =>
      uncapped.contains((c(0), c(1))) }, s"uncapped boilerplate pairs missing")
  }

  test("keepBestPerGroup: exactly one survivor per component, and it maximizes the ordering") {
    // components from an explicit pair list: {1,2,3} and {10,11}; 20 is a
    // singleton. Quality picks 2 (not min-id 1) and 11; singletons keep
    // themselves.
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ia", "ib")
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L), (11L, 4L), (20L, 0L))
      .toDF("doc_id", "quality")
    val groups = DedupOps.nearDupGroups(ids, "doc_id", pairs)
    val got = DedupOps.keepBestPerGroup(groups, scored, "doc_id",
      Seq(col("quality").desc))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // exactly one kept row per component
    val byGroup = got.groupBy(_._2)
    assert(byGroup.forall { case (_, rows) => rows.count(_._5) == 1 },
      s"not exactly one survivor per component: ${got.toSeq}")
    // every row agrees on its component's kept_id, and it maximizes
    // (quality desc, id asc)
    byGroup.foreach { case (_, rows) =>
      val kept = rows.map(_._4).distinct
      assert(kept.length == 1)
      val best = rows.map(r => (r._1, r._3)).minBy { case (id, q) => (-q, id) }._1
      assert(kept.head == best, s"kept ${kept.head} != best $best in ${rows.toSeq}")
    }
    // quality ties at 9 within {1,2,3} break to the smaller id 2
    assert(got.find(_._1 == 2L).exists(_._5))
    assert(got.find(_._1 == 20L).exists(r => r._4 == 20L && r._5))
  }

  test("dfCap: hot-shingle intersections still counted exactly; all-hot pairs are the documented miss") {
    // docs 1,2: share 3 rare + 3 hot shingles -> must surface with EXACT
    // jaccard 6/7 (hot contribution added back). filler docs pairwise share
    // ONLY hot shingles -> the documented miss under the cap.
    val filler = (10L until 18L).map(i => (i, s"filler$i the quick brown fox jumps"))
    val corpus = Seq(
      (1L, "u1 u2 u3 the quick brown fox jumps"),
      (2L, "u1 u2 u3 the quick brown fox jumps extra")) ++ filler
    val df = corpus.toDF("doc_id", "text")
    val capped = DedupOps.jaccardPairs(df, "doc_id", "text", 3, 0.6, dfCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = DedupOps.jaccardPairs(df, "doc_id", "text", 3, 0.6, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped.contains((1L, 2L, 6.0 / 7.0)))
    assert(capped.forall { case (a, b, _) => (a, b) == ((1L, 2L)) }) // filler pairs missed by design
    assert(uncapped.count { case (a, b, _) => a >= 10L && b >= 10L } > 0) // they DO qualify uncapped
    assert((capped -- uncapped).isEmpty) // cap never invents pairs or distorts values
  }

  test("simhashExactPairs equals brute-force Hamming scan over simhashFp30") {
    val docs = Tables.documents(spark, sf)
    val sigs = DedupOps.simhashFp30(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val got = DedupOps.simhashExactPairs(docs, "doc_id", "text", 3)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // testdata plants exact dups -> hamming-0 pairs exist
  }

  test("blocked cosineNearDupPairs covers every block-pair tile exactly once") {
    // ids chosen hash-arbitrarily; nBlocks > 1 forces same-block AND
    // cross-block tiles, including pairs where the lower id hashes to the
    // HIGHER block (the order-normalization arm)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    def pairsWith(b: Int) = SimilarityOps.cosineNearDupPairs(df, "vec_id", "embedding", 0.3, b)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairsWith(1) // single block = plain all-pairs reference
    assert(pairsWith(4) == one)
    assert(pairsWith(7) == one)
    assert(one.nonEmpty)
    assert(one.forall { case (a, b) => a < b })
  }

  test("semanticNearDupPairs: pairs are a subset of brute force; tight clusters fully recovered") {
    // two tight clusters around orthogonal anchors + noise vectors: the
    // within-cluster near-dup pairs must survive the cluster-then-pair
    // path (they land in one cell — k-means separates orthogonal
    // anchors), and everything reported must agree with brute force
    val anchorA = Array.tabulate(8)(j => if (j < 4) 1.0f else 0.0f)
    val anchorB = Array.tabulate(8)(j => if (j >= 4) 1.0f else 0.0f)
    def jitter(base: Array[Float], id: Int) =
      base.zipWithIndex.map { case (x, j) => x + 0.01f * ((id * 7 + j) % 5) }
    val vecs = (0 until 6).map(i => (i.toLong, jitter(anchorA, i))) ++
      (6 until 12).map(i => (i.toLong, jitter(anchorB, i))) ++
      (12 until 40).map(i =>
        (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val sem = SimilarityOps.semanticNearDupPairs(df, "vec_id", "embedding", 0.99, 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = SimilarityOps.cosineNearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sem.toSet.subsetOf(brute), "semantic pairs must agree with brute force")
    // the jittered clusters sit at cosine ~0.999+; all within-cluster
    // pairs must be recovered (cross-cluster ones are the allowed miss)
    val semSet = sem.map(p => (p._1, p._2)).toSet
    for (g <- Seq(0L until 6L, 6L until 12L); a <- g; b <- g if a < b)
      assert(semSet.contains((a, b)), s"cluster pair ($a,$b) missed: $semSet")
    assert(sem.forall { case (a, b, c) => a < b && c >= 0.99 })
  }

  test("ivfTopK: fixed centroid count independent of corpus size; cell-local results") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimilarityOps.ivfTopK(df, "vec_id", "embedding", col("vec_id") < 4, 3, nCentroids = 8)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // every q_id emits at most k ranked rows, ranks contiguous from 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("nearDupGroups: components collapse to min id; singletons self-canonical") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    // chain 1-2-3, pair 5-6, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("ia", "ib")
    val got = DedupOps.nearDupGroups(ids, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("deterministic sampling: stable across runs, strata thresholds respected") {
    import graft.operators.SamplingOps
    val docs = Tables.documents(spark, sf)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(SamplingOps.sampleByPct(docs, "doc_id", 50))
    val s2 = ids(SamplingOps.sampleByPct(docs, "doc_id", 50).repartition(7))
    assert(s1 == s2) // stable under re-partitioning / re-runs
    assert(s1.nonEmpty && s1.size < 500)
    // monotone: a smaller pct is a subset of a larger one
    assert(ids(SamplingOps.sampleByPct(docs, "doc_id", 10)).subsetOf(s1))
    val tagged = docs.select(col("doc_id"),
      SamplingOps.splitTag(col("doc_id"), 90).as("split"))
    val counts = tagged.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "holdout"))
    assert(counts("train") > counts("holdout"))
  }

  test("packSequences: concat-then-chunk spans with exact boundary straddling") {
    import graft.operators.SamplingOps
    val docs = Seq((1L, 3L), (2L, 5L), (3L, 4L)).toDF("doc_id", "n_toks")
    val got = SamplingOps.packSequences(docs, "doc_id", "n_toks", 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // cumsum 3, 8, 12 over seqLen=4:
    //  doc1: starts at 0 in seq 0, ends in seq 0
    //  doc2: starts at offset 3 of seq 0, straddles into seq 1
    //  doc3: starts exactly at seq 2's boundary, fills it
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, 0L),
      (2L, 3L, 0L, 3L, 1L),
      (3L, 8L, 2L, 0L, 2L)))
  }

  test("KMV sketch: partitioning-invariant, exact under k, ~10% accurate over k") {
    import graft.operators.SketchOps
    // 40 distinct values < k=64 -> estimate is EXACT
    val small = (0 until 120).map(i => ("g", s"v${i % 40}")).toDF("g", "v")
    val exact = SketchOps.kmvDistinct(small, Seq("g"), "v", k = 64)
      .head.getDouble(1)
    assert(exact == 40.0)
    // 2000 distinct values >> k -> estimator within ~3/sqrt(k) relative error
    val big = (0 until 2000).map(i => ("g", s"value$i")).toDF("g", "v")
    val est = SketchOps.kmvDistinct(big, Seq("g"), "v", k = 64).head.getDouble(1)
    assert(math.abs(est - 2000.0) / 2000.0 < 3.0 / math.sqrt(64.0), s"est=$est")
    // deterministic under re-partitioning (merge path exercised)
    val est7 = SketchOps.kmvDistinct(big.repartition(7), Seq("g"), "v", k = 64)
      .head.getDouble(1)
    assert(est == est7)
  }

  test("exactPercentiles returns the order statistics at floor((n-1)q)") {
    import graft.operators.SketchOps
    val df = (1L to 100L).map(i => (i, i * 10)).toDF("id", "len")
    val got = SketchOps.exactPercentiles(df, "len", "id", Seq(0.0, 0.5, 1.0))
      .orderBy("q").collect().map(r => (r.getDouble(0), r.getLong(1)))
    // sorted lens are 10..1000; index floor(99*q): 0 -> 10, 49 -> 500, 99 -> 1000
    assert(got.toSeq == Seq((0.0, 10L), (0.5, 500L), (1.0, 1000L)))
  }

  test("cleanWebText strips tags, decodes entities once, never double-decodes") {
    import graft.operators.TextOps
    val got = Seq(
      "<p>a</p><p>b</p>", // tag boundary must not fuse words
      "x &amp;lt; y", // literal "&lt;" after ONE decode, not "<"
      "  a\t\tb&nbsp;&nbsp;c  ",
      "&quot;q&quot; &amp; &#39;s&#39;")
      .toDF("t").select(TextOps.cleanWebText(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("a b", "x &lt; y", "a b c", "\"q\" & 's'"))
  }

  test("redactPii scrubs emails and phone shapes, leaves prose alone") {
    import graft.operators.TextOps
    val got = Seq(
      "mail a.b+c@sub.example.org now",
      "call +1 (555) 867-5309 today",
      "short 12345 id and year 2024 stay",
      "both x@y.io and 555 123 4567 here")
      .toDF("t").select(TextOps.redactPii(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq(
      "mail [EMAIL] now",
      "call [PHONE] today",
      "short 12345 id and year 2024 stay",
      "both [EMAIL] and [PHONE] here"))
  }

  test("cross-corpus minhash join equals brute cross-jaccard; exact admission drops seen content") {
    def doc(k: Int) = (0 until 25).map(j => s"w${(k + j) % 50}").mkString(" ")
    // even ids = the "seen" corpus; odd ids = the incoming batch with two
    // planted near-dups of even docs (one mutated, one verbatim)
    val evens = (0 until 5).map(k => (2L * k, doc(5 * k)))
    val mutated = doc(10).split(" ").dropRight(1).mkString(" ") + " zz" // ~ doc id 4
    val odds = Seq((11L, mutated), (13L, doc(15)), (15L, doc(40)))
    val df = (evens ++ odds).toDF("doc_id", "text")
    val a = df.filter(col("doc_id") % 2 === 1)
    val b = df.filter(col("doc_id") % 2 === 0)
    val got = DedupOps.minhashNearDupJoin(a, b, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = (evens ++ odds).map { case (i, t) => (i, sh(t)) }
    val expect = (for {
      (ia, sa) <- all if ia % 2 == 1
      (ib, sb) <- all if ib % 2 == 0
      inter = sa.intersect(sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.7
    } yield (ia, ib, j)).toSet
    assert(expect.nonEmpty && got == expect) // both planted dups, nothing else
    val admitted = DedupOps.exactNewDocuments(a, b, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(11L, 15L)) // 13 is a verbatim copy of seen doc 6
  }

  test("histogramQuantiles: partition-invariant, lower-bound within bucket error") {
    import graft.operators.SketchOps
    val vals = (1L to 1000L).map(i => (i, (i * i) % 5000))
    val df = vals.toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      SketchOps.histogramQuantiles(d, "v", Seq(0.5, 0.9)).orderBy("q")
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val got = run(df)
    assert(got.toSeq == run(df.repartition(7)).toSeq) // merge-order invariant
    val sorted = vals.map(_._2).sorted
    got.foreach { case (q, est) =>
      val exact = sorted(math.floor((sorted.size - 1) * q).toInt)
      // the estimate is the containing bucket's LOWER bound, and octave
      // buckets have width <= lower/4: est <= exact < est * 1.25 (+slack
      // for the tiny linear buckets)
      assert(est <= exact, s"q=$q: lower bound $est exceeds exact $exact")
      assert(exact < est.toDouble * 1.25 + 4, s"q=$q: est $est too far below exact $exact")
    }
  }

  test("asofJoin: inclusive point-in-time lookup, tuple-consistent null payloads") {
    import graft.operators.AsofOps
    val left = Seq((101L, 1L, 10L), (102L, 1L, 20L), (103L, 1L, 4L), (104L, 2L, 50L))
      .toDF("oid", "k", "t")
    val right = Seq(
      (1L, Some(5L), 7L, "a"), // k=1 t=5
      (1L, Some(20L), 8L, null.asInstanceOf[String]), // equal-time inclusive; null member
      (1L, Some(20L), 9L, "dup"), // same (k, t): max tie-break (9) must win
      (2L, None, 99L, "nullt"), // NULL time never matches (dropped up front)
      (3L, Some(1L), 1L, "other")).toDF("k", "t2", "eid", "v")
    val got = AsofOps.asofJoin(left, right, "k", col("t"), col("t2"), "eid", Seq("eid", "v"))
      .select(col("oid"), col("eid"), col("v")).orderBy("oid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2))))
    assert(got.toSeq == Seq(
      (101L, Some(7L), Some("a")), // latest at/before 10 is t=5
      (102L, Some(9L), Some("dup")), // t=20 inclusive; tie-break keeps eid 9
      (103L, None, None), // nothing at/before 4
      (104L, None, None))) // only a NULL-time right row for this key
    // payload names colliding with left columns are rejected, not nulled
    intercept[IllegalArgumentException](
      AsofOps.asofJoin(left.withColumnRenamed("oid", "v"), right, "k",
        col("t"), col("t2"), "eid", Seq("eid", "v")))
  }

  test("empty-input edges: packing, percentiles, and sketches return empty, not errors") {
    import graft.operators.{SamplingOps, SketchOps}
    val emptyDocs = Seq.empty[(Long, Long)].toDF("doc_id", "n_toks")
    assert(SamplingOps.packSequences(emptyDocs, "doc_id", "n_toks", 4).count() == 0)
    val emptyVals = Seq.empty[(Long, Long)].toDF("id", "len")
    val pct = SketchOps.exactPercentiles(emptyVals, "len", "id", Seq(0.5))
    assert(pct.count() == 0 && pct.columns.toSeq == Seq("q", "value"))
    val hist = SketchOps.histogramQuantiles(emptyVals, "len", Seq(0.5))
    assert(hist.count() == 0 && hist.columns.toSeq == Seq("q", "est"))
    // all-zero tokens: every row excluded before the prefix sum
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "n_toks")
    assert(SamplingOps.packSequences(zeros, "doc_id", "n_toks", 4).count() == 0)
    // out-of-range quantiles rejected loudly, not silently dropped
    intercept[IllegalArgumentException](
      SketchOps.exactPercentiles(Seq((1L, 2L)).toDF("id", "len"), "len", "id", Seq(1.5)))
    intercept[IllegalArgumentException](
      SketchOps.histogramQuantiles(Seq((1L, 2L)).toDF("id", "len"), "len", Seq(-0.1)))
  }

  test("histogramQuantilesByGroup matches the global form per group") {
    import graft.operators.SketchOps
    val vals = (1L to 600L).map(i => (i, s"g${i % 3}", (i * 37) % 4000))
    val df = vals.toDF("id", "g", "v")
    val grouped = SketchOps.histogramQuantilesByGroup(df, Seq("g"), "v", Seq(0.5, 0.9))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val global = SketchOps.histogramQuantiles(
        df.filter(col("g") === g), "v", Seq(0.5, 0.9))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
      for (q <- Seq(0.5, 0.9))
        assert(grouped((g, q)) == global(q), s"group $g q=$q")
    }
  }

  test("cosineTopK: self-similar planted vector ranks first") {
    val base = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 37 + j * 11) % 31) * 0.1f + 0.1f)))
    // vec 30 = scaled near-copy of vec 0 (same direction -> cosine 1)
    val rows = base :+ (30L, base.head._2.map(x => x * 1.5f))
    val df = rows.toDF("vec_id", "embedding")
    val got = SimilarityOps.cosineTopK(df, "vec_id", "embedding", col("vec_id") === 0, 3)
    val top = got.orderBy("rank").collect()
    assert(top.head.getLong(1) == 30L) // nearest neighbor of 0 is its copy
    assert(top.head.getDouble(2) >= 0.9999)
  }

  test("rp-LSH finds planted high-cosine near-dups; recall harness scores IVF") {
    // 60 random-ish vectors + 3 planted copies (cosine ~1 with their source)
    val rnd = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j + 1).toFloat)))
    val planted = Seq(100L -> 0, 101L -> 7, 102L -> 23).map { case (id, src) =>
      (id, rnd(src)._2.map(x => x * 1.2f + 0.001f))
    }
    val df = (rnd ++ planted).toDF("vec_id", "embedding")
    val got = SimilarityOps.rpLshNearDupPairs(df, "vec_id", "embedding", 0.98, dim = 16)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilarityOps.cosineNearDupPairs(df, "vec_id", "embedding", 0.98)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(got) || got == brute) // verification keeps only real pairs
    assert(got == brute)
    assert(Set((0L, 100L), (7L, 101L), (23L, 102L)).subsetOf(got))

    val exact = SimilarityOps.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 3, 5)
    val recall = SimilarityOps.recallAtK(exact, exact).collect()
    assert(recall.forall(_.getDouble(1) == 1.0)) // self-recall is perfect
  }

  test("langId follows marker-count argmax with declaration-order ties") {
    val df = Seq(
      (1L, "the cat and the dog of the house"), // en markers dominate
      (2L, "el perro de la casa que ladra"),    // es markers
      (3L, "xyz qqq www"),                      // no markers: tie -> first lang (en)
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("en", "es", "en"))
  }

  test("qualityScore is integer-valued in [0,1000] and favors longer docs") {
    val df = Seq(
      (1L, "a b", 3L),
      (2L, ("the word " * 60).trim, 599L),
    ).toDF("doc_id", "text", "n_chars")
    val got = df.select(TextOps.qualityScore(col("text"), col("n_chars")).as("q"))
      .collect().map(_.getLong(0))
    assert(got.forall(q => q >= 0 && q <= 1000))
    assert(got(1) > got(0))
  }

  test("snapshotDiff: classifies insert/update/delete, drops unchanged, null-safe values") {
    val oldS = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, Some("c"), 30.0), (4L, None: Option[String], 40.0))
      .toDF("pk", "name", "bal")
    val newS = Seq((2L, Some("b"), 21.0), (3L, Some("c"), 30.0),
      (4L, None: Option[String], 40.0), (5L, Some("e"), 50.0))
      .toDF("pk", "name", "bal")
    val got = graft.operators.CdcOps.snapshotDiff(
        oldS, newS, Seq("pk"), Seq("name", "bal"))
      .orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // pk1 deleted, pk2 bal changed, pk3 unchanged (dropped),
    // pk4 both-null name unchanged (null-safe — dropped), pk5 inserted
    assert(got.toSeq == Seq((1L, "delete"), (2L, "update"), (5L, "insert")),
      got.toSeq.toString)
  }

  test("containmentPairs: embedded quote detected directionally at containment 1.0") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val sub = (10 to 19).map(i => s"w$i").mkString(" ") // verbatim span of `long`
    val other = (100 to 139).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, long), (2L, sub), (3L, other)).toDF("doc_id", "text")
    val r = DedupOps.containmentPairsReleasable(df, "doc_id", "text", 3, 0.9)
    val got = r.df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    r.release()
    // all 8 of doc2's 3-grams appear in doc1 -> (2 contained-in 1) at 1.0;
    // the reverse direction is 8/38 and the unrelated doc never pairs —
    // symmetric jaccard (8/38) would miss this quote entirely
    assert(got == Set((2L, 1L, 1.0)), got.toString)
  }

  test("cmsTokenEstimates: one-sided error holds; tiny vocab reads exact") {
    val df = Seq((1L, "a a a b b c"), (2L, "a b z")).toDF("doc_id", "text")
    val got = graft.operators.SketchOps.cmsTokenEstimates(df, "text", 1024, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, n, est) => est >= n },
      s"CMS must never undercount: ${got.toSeq}")
    // 4 tokens in 1024 buckets x 4 rows: no row collides, estimates exact
    assert(got.toSeq.map(x => (x._1, x._2)) ==
      Seq(("a", 4L), ("b", 3L), ("c", 1L), ("z", 1L)), got.toSeq.toString)
    assert(got.forall { case (_, n, est) => est == n }, got.toSeq.toString)
  }

  test("leak-free split: near-dup pair lands in the SAME split by construction") {
    val base = ("the quick brown fox jumped over the lazy dog and ran far away " * 4).trim
    val docs = Seq((1L, base), (2L, base + " extra"), (3L, "completely different text " * 8))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashExactPairs(docs, "doc_id", "text", 3)
    assert(pairs.count() >= 1, "planted near-dup must pair")
    val grp = DedupOps.nearDupGroupsStar(docs.select(col("doc_id")), "doc_id", pairs)
    val bkt = pmod(graft.functions.Converters.fingerprint64(
      col("canonical_id").cast("string")), lit(100L))
    val split = grp.select(col("id"), when(bkt < 80, "train")
      .when(bkt < 90, "val").otherwise("test").as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(split(1L) == split(2L), s"cluster split apart: $split")
  }

  test("sortedNeighborhoodPairs: adjacent-sorting near-dups found; far-sorting ones missed (the documented heuristic)") {
    val a = "alpha beta gamma delta epsilon " + ("shared tail words here now " * 6).trim
    val b = "alpha beta gamma delta epsilon " + ("shared tail words here now " * 6).trim + " extra"
    // same content as a but a prefix that sorts far away -> window never sees it
    val c = "zulu yankee xray whiskey victor " + ("shared tail words here now " * 6).trim
    val far = "totally unrelated content " * 8
    val df = Seq((1L, a, "en"), (2L, b, "en"), (3L, c, "en"), (4L, far.trim, "en"))
      .toDF("doc_id", "text", "lang")
    val got = DedupOps.sortedNeighborhoodPairs(df, "doc_id", "text", col("lang"), 3, 2, 0.5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"adjacent near-dup missed: $got")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      s"SNM should miss the far-sorting dup (heuristic recall): $got")
  }

  test("QualityOps.report: nulls violate predicates; unique and FK rules count exactly") {
    import graft.operators.QualityOps._
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None: Option[Double]),
      (2L, Some(2.0))).toDF("k", "v")
    val ref = Seq(1L, 2L).toDF("rk")
    val got = report(df, Seq(
      PredicateRule("v_nonneg", col("v") < 0),
      UniqueRule("k_unique", Seq("k")),
      ReferentialRule("k_fk", "k", ref, "rk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // v_nonneg: -1 violates AND the null row violates (unevaluable != pass);
    // k_unique: 4 rows, 3 distinct; k_fk: k=3 missing from ref
    assert(got.toSeq == Seq(("k_fk", 1L, false), ("k_unique", 1L, false),
      ("v_nonneg", 2L, false)), got.toSeq.toString)
  }

  test("triangle enumeration: planted triangle counts once per node; open wedge counts zero") {
    // edges: triangle {1,2,3} + wedge 3-4, 4-5 (no closing 3-5)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val got = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").count().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)), got.toSeq.toString)
  }

  test("valueRuns: gaps-and-islands intervals, half-open valid_to, value revisits split runs") {
    val df = Seq(("u", 1L, 1L, "x"), ("u", 2L, 2L, "x"), ("u", 3L, 3L, "y"),
      ("u", 4L, 4L, "x"), ("v", 1L, 5L, "z"))
      .toDF("k", "t", "tie", "v")
    val got = graft.operators.TemporalOps.valueRuns(df, "k", col("t"), col("tie"), "v")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    // u: x[1,3) n=2, y[3,4) n=1, x[4,-) n=1 current; v: z[1,-) current
    assert(got.toSeq == Seq(
      ("u", "x", 1L, 2L, 3L, false), ("u", "y", 3L, 1L, 4L, false),
      ("u", "x", 4L, 1L, -1L, true), ("v", "z", 1L, 1L, -1L, true)),
      got.toSeq.toString)
  }

  test("bpeMergeTokens replays the merge table by hand and via SQL") {
    // "the": (t,h)->th, (th,e)->the = 1 token / 2 merges;
    // "scan": (a,n), (s,c), (sc,an) = 1 token / 3 merges
    val df = Seq(
      (1L, "the the scan"), // 3 tokens, 10 symbols, 7 merges
      (2L, "a a a a"),      // no rule touches bare "a": 4 tokens, 0 merges
      (3L, ""),             // empty text: 0 tokens
      (4L, "zzz")           // no applicable rule: 3 single-char tokens
    ).toDF("id", "text")
    val got = df.select(col("id"), TextOps.bpeMergeTokens(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 4L, 3L -> 0L, 4L -> 3L))
    // SQL surface
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_bpe_tokens('the the scan') AS n")
      .head().getLong(0)
    assert(viaSql == 3L)
  }

  test("bpeMergeTokens merges a run left-to-right like exhaustive BPE") {
    // "ananan": (a,n) pass -> an an an (3 tokens); the run case where a
    // naive overlapping replace would miscount
    val got = Seq((1L, "ananan"), (2L, "ththe"))
      .toDF("id", "text")
      .select(col("id"), TextOps.bpeMergeTokens(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "ththe": (t,h) pass -> th th e; (th,e): th the -> 2 tokens
    assert(got == Map(1L -> 3L, 2L -> 2L))
  }

  test("Bpe fast evaluator equals the literal framed-replace chain replay") {
    // r15: BpeTokenCount moved off the unfolded builtin replace() chain
    // to graft.functions.Bpe. The helper's slowCount IS the literal
    // chain (same regex framing, same ordered literal replaces, same
    // separator count), so fast == slow on every input pins the
    // evaluator to the old semantics — including the inputs that route
    // to the fallback ('|', line terminators) and astral pairs.
    val rnd = new scala.util.Random(42)
    val alphabet = "anthequrybslowjcmgkvfdipz |\n\r😀𝄞"
    val cps = alphabet.codePoints().toArray
    def randText(): String = {
      val sb = new StringBuilder
      val len = rnd.nextInt(60)
      (0 until len).foreach(_ => sb.appendAll(Character.toChars(cps(rnd.nextInt(cps.length)))))
      sb.toString
    }
    (1 to 500).foreach { _ =>
      val s = randText()
      val spaces = s.count(_ == ' ').toLong
      val fast = graft.functions.Bpe.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val slow = graft.functions.Bpe.slowCount(s, spaces)
      assert(fast == slow, s"divergence on ${s.map(c => f"\\u$c%04x").mkString}")
    }
    // the decorated q229 shape explicitly
    val astral = "😀the quick batch 𝄞the𪛖 a😀b"
    assert(graft.functions.Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(astral)) ==
      graft.functions.Bpe.slowCount(astral, astral.count(_ == ' ').toLong))
  }

  test("bloomNgramContamination equals the broadcast-exact contamination") {
    // approximate pruning + exact verify must be bit-identical to the
    // broadcast path, whatever the bloom's false-positive rate — force a
    // tiny, collision-prone filter to make that claim earn its keep
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = rows(DedupOps.ngramContamination(corpus, bench, "doc_id", "text", 3))
    val viaBloom = rows(DedupOps.bloomNgramContamination(
      corpus, bench, "doc_id", "text", 3, expectedItems = 64))
    assert(viaBloom == exact)
    assert(exact.exists(_._3 > 0)) // hits exist, or the test is vacuous
  }

  test("repetitionMetrics: exact ppm fractions and short-doc zeros") {
    val df = Seq(
      (1L, "x y x y x"), // bigrams xy,yx,xy,yx: top 2/4, dup 4/4
      (2L, "solo"),      // < 2 tokens: no bigrams
      (3L, "p q r")      // 2 distinct bigrams: top 1/2, dup 0
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((4L, 500000L, 1000000L)),
      2L -> ((0L, 0L, 0L)),
      3L -> ((2L, 500000L, 0L))))
  }
}
