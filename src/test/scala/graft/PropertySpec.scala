package graft

import graft.operators.CdcOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for dedup-buffer invariants (SURVEY §5: last-wins,
  * inheritance idempotency, batch-splitting equivalence). ScalaCheck
  * generators driven directly with fixed seeds (scalatestplus is not on
  * the offline classpath) — deterministic and reproducible.
  */
object PropertySpec {
  case class Ev(pk: Long, off: Long, v: String, del: Boolean)
}

class PropertySpec extends AnyFunSuite {
  import PropertySpec.Ev
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = Constants.ToastPlaceholder

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 30)
    evs <- Gen.listOfN(n, for {
      pk <- Gen.choose(1L, 5L)
      v <- Gen.oneOf(Gen.alphaStr.map(_.take(4)), Gen.const(T), Gen.const(null: String))
      del <- Gen.prob(0.2)
    } yield (pk, v, del))
  } yield evs.zipWithIndex.map { case ((pk, v, del), i) => Ev(pk, i.toLong, v, del) }

  private def samples(count: Int): Seq[List[Ev]] =
    (0 until count).flatMap(i =>
      evGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: lastWins equals a sequential map replay") {
    for (evs <- samples(15) if evs.nonEmpty) {
      val df = evs.toDF()
      val got = CdcOps.lastWins(df, Seq("pk"), Seq(col("off")))
        .collect().map(r => r.getAs[Long]("pk") -> r.getAs[Long]("off")).toMap
      val expect = evs.groupBy(_.pk).map { case (pk, es) => pk -> es.map(_.off).max }
      assert(got == expect, s"events: $evs")
    }
  }

  test("property: toastInherit is idempotent and matches buffered replay") {
    for (evs <- samples(15) if evs.nonEmpty) {
      val df = evs.toDF()
      def run(d: org.apache.spark.sql.DataFrame) =
        CdcOps.toastInherit(d, Seq("pk"), Seq(col("off")), Seq("v"))
      val once = run(df).orderBy("pk", "off").collect()
        .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("off"), r.getAs[String]("v")))
      val twice = run(run(df)).orderBy("pk", "off").collect()
        .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("off"), r.getAs[String]("v")))
      assert(once.toSeq == twice.toSeq, s"idempotency broke on: $evs")
      // buffered replay: InsertRow semantics (table_data.go:195-208)
      val expect = evs.groupBy(_.pk).flatMap { case (pk, es) =>
        var buf: Option[String] = None
        es.sortBy(_.off).map { e =>
          val healed = if (e.v == T && buf.isDefined) buf.get else e.v
          buf = if (healed == T) buf else Some(healed)
          (pk, e.off, healed)
        }
      }.toSet
      assert(once.toSet == expect, s"replay mismatch on: $evs")
    }
  }

  test("property: merging batch-by-batch equals one merged batch (hard delete)") {
    for (evs <- samples(15) if evs.size >= 2) {
      val empty = Seq.empty[(Long, Long, String)].toDF("pk", "off", "v")
      def asChanges(es: Seq[Ev]) =
        es.toDF().withColumnRenamed("del", Constants.DeleteCol)
      def merge(base: org.apache.spark.sql.DataFrame, es: Seq[Ev]) =
        CdcOps.mergeApply(base, asChanges(es), Seq("pk"), Seq(col("off")))
      val (b1, b2) = evs.splitAt(evs.size / 2)
      val stepwise = merge(merge(empty, b1), b2)
        .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
      val oneShot = merge(empty, evs)
        .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
      assert(stepwise == oneShot, s"batch-split equivalence broke on: $evs")
    }
  }

  test("property: nearDupGroups equals driver-side union-find on random graphs") {
    val pairGen = for {
      n <- Gen.choose(2, 14) // node ids 0..n
      m <- Gen.choose(0, 12)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, es.distinct)
    (0 until 8).foreach { seed =>
      val (n, es) = pairGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      // reference implementation: plain union-find
      val parent = scala.collection.mutable.Map((0L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expected = (0L to n.toLong).map { i =>
        i -> (0L to n.toLong).filter(j => find(j) == find(i)).min
      }.toMap
      val got = graft.operators.DedupOps.nearDupGroups(
        (0L to n.toLong).toDF("doc_id"), "doc_id",
        if (es.isEmpty) Seq.empty[(Long, Long)].toDF("ia", "ib") else es.toDF("ia", "ib"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed edges=$es")
    }
  }

  test("property: nearDupGroupsStar equals union-find; handles deep chains") {
    import graft.operators.DedupOps
    val pairGen = for {
      n <- Gen.choose(2, 14)
      m <- Gen.choose(0, 12)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, es.distinct)
    (0 until 6).foreach { seed =>
      val (n, es) = pairGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val parent = scala.collection.mutable.Map((0L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expected = (0L to n.toLong).map { i =>
        i -> (0L to n.toLong).filter(j => find(j) == find(i)).min
      }.toMap
      val got = DedupOps.nearDupGroupsStar(
        (0L to n.toLong).toDF("doc_id"), "doc_id",
        if (es.isEmpty) Seq.empty[(Long, Long)].toDF("ia", "ib") else es.toDF("ia", "ib"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed edges=$es")
    }
    // a 120-node path: diameter 119 >> label-prop's default round budget,
    // but star contraction collapses it in O(log) rounds
    val path = (0L until 119L).map(i => (i, i + 1))
    val got = DedupOps.nearDupGroupsStar(
      (0L to 119L).toDF("doc_id"), "doc_id", path.toDF("ia", "ib"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.forall(_._2 == 0L))
  }

  test("property: two-pass packSequences equals a single global prefix sum") {
    import graft.operators.SamplingOps
    val gen = for {
      n <- Gen.choose(0, 60)
      toks <- Gen.listOfN(n, Gen.choose(0L, 9L))
    } yield toks
    (0 until 10).foreach { seed =>
      val toks = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      // arbitrary input partitioning: the range-partitioned two-pass form
      // must produce the same layout regardless of how rows arrive
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_toks").repartition(1 + seed % 5)
      val got = SamplingOps.packSequences(df, "doc_id", "n_toks", 4)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      var acc = 0L
      val expect = toks.zipWithIndex.flatMap { case (t, i) =>
        val start = acc
        acc += t
        if (t > 0) Some((i.toLong, t, start, start / 4, start % 4, (acc - 1) / 4)) else None
      }
      assert(got.toSeq == expect, s"seed=$seed toks=$toks")
    }
  }

  test("property: range-partitioned exactPercentiles equals global order statistics") {
    import graft.operators.SketchOps
    val gen = for {
      n <- Gen.choose(1, 80)
      vs <- Gen.listOfN(n, Gen.choose(0L, 50L)) // heavy ties stress the tie-break
    } yield vs
    (0 until 10).foreach { seed =>
      val vs = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "len").repartition(1 + seed % 7)
      val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
      val got = SketchOps.exactPercentiles(df, "len", "id", qs)
        .orderBy("q").collect().map(r => (r.getDouble(0), r.getLong(1)))
      val sorted = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.sorted.map(_._1)
      val expect = qs.map(q => (q, sorted(math.floor((vs.size - 1) * q).toInt)))
      assert(got.toSeq == expect, s"seed=$seed vs=$vs")
    }
  }

  test("property: fingerprint64 is stable and in [0, 1e9+7)") {
    val strs = (0 until 20).flatMap(i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(i.toLong)))
    val out = strs.toDF("s")
      .select(col("s"), graft.functions.Converters.fingerprint64(col("s")).as("fp"))
      .collect()
    val again = strs.toDF("s")
      .select(graft.functions.Converters.fingerprint64(col("s"))).collect().map(_.getLong(0))
    out.map(_.getLong(1)).zip(again).foreach { case (a, b) => assert(a == b) }
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  // ---- round-4 operators --------------------------------------------------

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      words <- Gen.choose(1, 40)
      toks <- Gen.listOfN(words, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def docSamples(count: Int): Seq[List[(Long, String)]] =
    (0 until count).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(1000L + i)))

  test("property: non-overlapping chunks reconstruct the document exactly") {
    import graft.operators.SamplingOps
    for (docs <- docSamples(10)) {
      val df = docs.toDF("doc_id", "text")
      val rebuilt = SamplingOps.chunkDocuments(df, "doc_id", "text", 7, 7)
        .groupBy("id")
        .agg(array_join(transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          x => x.getField("chunk_text")), " ").as("re"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.foreach { case (id, t) => assert(rebuilt(id) == t, s"doc $id") }
    }
  }

  test("property: canonicalizeUrl is idempotent") {
    import graft.operators.TextOps
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp", "")
      www <- Gen.oneOf("", "WWW.", "www.")
      host <- Gen.oneOf("Site.com", "a.b.ORG")
      port <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/X", "/X/Y/", "//")
      q <- Gen.oneOf("", "?id=1", "?utm_s=2", "?utm_s=2&id=1", "?id=1&utm_s=2&utm_t=3")
      frag <- Gen.oneOf("", "#f")
    } yield (if (scheme.isEmpty) "" else scheme + "://") + www + host + port + path + q + frag
    val urls = (0 until 120).flatMap(i => urlGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = urls.toDF("url")
    val out = df.select(
      TextOps.canonicalizeUrl(col("url")).as("c1"),
      TextOps.canonicalizeUrl(TextOps.canonicalizeUrl(col("url"))).as("c2"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  test("property: quantizeInt8 bounds and extreme mapping") {
    import graft.operators.SimilarityOps
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(6, Gen.choose(-8.0f, 8.0f)).map(_.toSeq)
    val vecs = (0 until 40).flatMap(i => vecGen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val out = SimilarityOps.quantizeInt8(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect()
    out.foreach { r =>
      val q = r.getString(2).split(",").map(_.toInt)
      assert(q.forall(x => x >= -127 && x <= 127), r.getString(2))
      val (_, v) = vecs(r.getLong(0).toInt)
      if (v.exists(_ != 0f)) {
        val maxAbs = v.map(math.abs).max
        // the max-magnitude component maps to +-127 exactly
        val i = v.indexWhere(x => math.abs(x) == maxAbs)
        assert(math.abs(q(i)) == 127, s"v=$v q=${q.toSeq}")
      }
    }
  }

  test("property: token-budget sample takes a quality-prefix within budget") {
    import graft.operators.SamplingOps
    for (docs <- docSamples(8)) {
      val df = docs.toDF("id", "text")
        .withColumn("grp", (col("id") % 2).cast("string"))
        .withColumn("qual", length(col("text")).cast("long"))
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      val kept = SamplingOps.sampleToTokenBudget(df, "grp", "qual", "id", "toks", 30L)
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"), r.getAs[Long]("toks")))
      // per-group token sum within budget
      kept.groupBy(_._1).foreach { case (g, rows) =>
        assert(rows.map(_._3).sum <= 30L, s"group $g over budget")
      }
      // admitted set is a PREFIX of the (qual desc, id) ordering per group
      val full = df.collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"),
        r.getAs[Long]("qual"), r.getAs[Long]("toks")))
      full.groupBy(_._1).foreach { case (g, rows) =>
        val order = rows.sortBy(r => (-r._3, r._2)).map(_._2)
        val keptIds = kept.filter(_._1 == g).map(_._2).toSet
        val prefixLen = order.takeWhile(keptIds.contains).length
        assert(prefixLen == keptIds.size, s"group $g kept a non-prefix")
      }
    }
  }

  test("property: wordpiece expression equals a naive greedy reference") {
    import graft.functions.Wordpiece
    // independent reference: plain substring + Set membership, the
    // textbook greedy longest-match — no packed keys, no binary search
    val sets = Map(4 -> Wordpiece.v4.toSet, 3 -> Wordpiece.v3.toSet,
      2 -> Wordpiece.v2.toSet)
    def naiveWord(w: String): Long = {
      var i = 0; var n = 0L
      while (i < w.length) {
        val step = (4 to 2 by -1).find(l =>
          i + l <= w.length && sets(l)(w.substring(i, i + l))).getOrElse(
          // codepoint semantics: an astral surrogate pair is ONE token
          if (i + 1 < w.length && Character.isHighSurrogate(w.charAt(i)) &&
            Character.isLowSurrogate(w.charAt(i + 1))) 2 else 1)
        i += step; n += 1
      }
      n
    }
    def naive(text: String): Long = text.split(" ", -1).map(naiveWord).sum
    // generator biased toward vocab-piece collisions: words stitched from
    // pieces, plain chars, and junk — plus targeted edge strings
    val pieceGen = Gen.oneOf(
      Gen.oneOf(Wordpiece.v4 ++ Wordpiece.v3 ++ Wordpiece.v2),
      Gen.alphaLowerStr.map(_.take(3)), Gen.oneOf("x", "q", "7", "_", "é"))
    val wordGen = Gen.choose(0, 5).flatMap(k => Gen.listOfN(k, pieceGen).map(_.mkString))
    val textGen = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    val texts = (0 until 300).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", " ", "  ", "the", "thethe", "windowindow", "a  b", "sortsort",
        // astral plane: emoji and a CJK-B ideograph count ONE token per
        // codepoint (the oracle counts codepoints, not UTF-16 units)
        "a😀b", "😀😀", "the😀",
        "𝄞 sort 𪛖", "café😀")
    // 1) static counter matches the naive reference
    texts.foreach { t =>
      assert(Wordpiece.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) == naive(t),
        s"static counter diverges on '$t'")
    }
    // 2) the codegen expression path agrees too
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        graft.functions.Converters.wordpieceTokens(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naive(t), s"expression diverges on '$t'")
    }
  }

  test("property: bloomNewDocuments equals exactNewDocuments on random corpora, any filter size") {
    import graft.operators.DedupOps
    // tiny vocab -> heavy cross-corpus duplication; tiny filters -> heavy
    // false-positive pressure on the verify arm
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val textGen = Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, textGen))
    for (i <- 0 until 10) {
      val batch = corpusGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
        .zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val seen = corpusGen.apply(Gen.Parameters.default, Seed(1000L + i)).get
        .zipWithIndex.map { case (t, j) => (10000L + j, t) }
      if (batch.nonEmpty) {
        val bdf = batch.toDF("doc_id", "text")
        val sdf = seen.toDF("doc_id", "text")
        def ids(d: org.apache.spark.sql.DataFrame) =
          d.select("doc_id").collect().map(_.getLong(0)).toSet
        val expect = ids(DedupOps.exactNewDocuments(bdf, sdf, "text"))
        for ((m, k) <- Seq((64, 2), (1 << 12, 5))) {
          val got = ids(DedupOps.bloomNewDocuments(bdf, sdf, "text", m, k))
          assert(got == expect, s"seed=$i mBits=$m k=$k: $got != $expect")
        }
      }
    }
  }

  test("property: BPE expression equals a naive Sennrich apply_bpe reference") {
    import graft.functions.BpeMerges
    // independent reference: explicit symbol lists, one leftmost-first
    // non-overlapping pass per rule in table order — the textbook
    // apply_bpe semantics the framed replace chain claims to reproduce
    def naiveWord(w: String): Long = {
      var syms: List[String] = w.map(_.toString).toList
      for ((a, b) <- BpeMerges.rules) {
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toList
      }
      syms.length.toLong
    }
    def naive(text: String): Long = text.split(" ", -1).map(naiveWord).sum
    // generator biased toward rule collisions: corpus words (fully
    // mergeable), rule-side fragments, and junk — plus run/cascade edges
    val frag = BpeMerges.rules.flatMap { case (a, b) => Seq(a, b, a + b) }.distinct
    val wordGen = Gen.oneOf(
      Gen.oneOf("the", "scan", "batch", "query", "window", "stream", "hash"),
      Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, Gen.oneOf(frag)).map(_.mkString)),
      Gen.alphaLowerStr.map(_.take(5)))
    val textGen = Gen.choose(0, 10).flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    val texts = (0 until 250).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(1000L + i))) ++
      Seq("", " ", "a  b", "ananan", "aaaa", "ththe", "thethethe",
        "windowindow", "scanscan", "strstrstream")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        graft.operators.TextOps.bpeMergeTokens(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naive(t), s"BPE diverges on '$t': got ${got(i.toLong)}, want ${naive(t)}")
    }
  }

  test("property: dedup-graph multi-batch append equals a one-shot build") {
    import graft.operators.DedupOps
    // small vocab + planted exact dups straddling batch boundaries, so
    // appends must both find cross-batch pairs and bridge components
    val wordGen = Gen.oneOf("the", "quick", "brown", "fox", "jumps", "over")
    val textGen = Gen.choose(8, 14).flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    for (seed <- 0 until 3) {
      val texts = (0 until 18).flatMap(i =>
        textGen.apply(Gen.Parameters.default, Seed(seed * 100L + i)))
      // plant dups across future batch boundaries (batches split by index % 3)
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (i % 5 == 0 && i >= 3) texts(i - 3) else t)
      }
      val full = docs.toDF("doc_id", "text").localCheckpoint(false)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ddg_prop$seed").toString
      DedupOps.buildDedupGraph(
        docs.filter(_._1 % 3 == 0).toDF("doc_id", "text"), "doc_id", "text", dir, 3)
      for (b <- 1 to 2)
        DedupOps.appendToDedupGraph(
          docs.filter(_._1 % 3 == b).toDF("doc_id", "text"), "doc_id", "text", dir)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def comps(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expPairs = pairs(DedupOps.simhashExactPairs(full, "doc_id", "text", 3))
      assert(pairs(DedupOps.dedupGraphPairs(spark, dir)) == expPairs, s"seed=$seed pairs")
      val expComps = comps(DedupOps.nearDupGroupsStar(
        full.select(col("doc_id")), "doc_id",
        DedupOps.simhashExactPairs(full, "doc_id", "text", 3)))
      assert(comps(DedupOps.dedupGraphComponents(spark, dir)) == expComps, s"seed=$seed comps")
    }
  }

  test("property: gridNeighborPairs equals brute force on random point clouds") {
    import graft.operators.SpatialOps
    val ptGen = for {
      n <- Gen.choose(0, 40)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 500L); y <- Gen.choose(0L, 500L)
      } yield (x, y))
    } yield pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    for (seed <- 0 until 8) {
      val pts = ptGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      if (pts.nonEmpty) {
        for ((cell, r) <- Seq((100L, 100L), (250L, 37L))) {
          val got = SpatialOps.gridNeighborPairs(
            pts.toDF("id", "x", "y"), "id", "x", "y", cell, r)
            .as[(Long, Long, Long)].collect().toSeq.sorted
          val brute = (for {
            (i, xi, yi) <- pts; (j, xj, yj) <- pts if i < j
            d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) if d2 <= r * r
          } yield (i, j, d2)).sorted
          assert(got == brute, s"seed=$seed cell=$cell r=$r")
        }
      }
    }
  }

  test("property: intervalUnionLength equals a sequential sweep merge") {
    import graft.operators.TemporalOps
    val ivGen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, for {
      s <- Gen.choose(0L, 300L); len <- Gen.choose(0L, 80L)
    } yield (s, s + len)))
    for (seed <- 0 until 10) {
      val ivs = ivGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      if (ivs.nonEmpty) {
        val got = TemporalOps.intervalUnionLength(
          ivs.map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e"), "k", "s", "e")
          .as[(String, Long, Long, Long)].collect().toSeq
        // driver-side sweep: merge sorted intervals, sum island lengths
        var islands = 0L; var covered = 0L
        var curS = Long.MinValue; var curE = Long.MinValue
        ivs.sorted.foreach { case (s, e) =>
          if (curE == Long.MinValue || s > curE) {
            if (curE != Long.MinValue) covered += curE - curS
            islands += 1; curS = s; curE = e
          } else curE = math.max(curE, e)
        }
        covered += curE - curS
        assert(got == Seq(("k", ivs.size.toLong, islands, covered)), s"seed=$seed")
      }
    }
  }

  test("property: bellmanFord at n rounds equals driver Dijkstra on random graphs") {
    import graft.operators.GraphOps
    val gGen = for {
      n <- Gen.choose(2, 8)
      m <- Gen.choose(1, 16)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, (n - 1).toLong); t <- Gen.choose(0L, (n - 1).toLong)
        w <- Gen.choose(1L, 20L)
      } yield (s, t, w))
    } yield (n, edges.filter(e => e._1 != e._2))
    for (seed <- 0 until 8) {
      val (n, edges) = gGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      if (edges.nonEmpty) {
        val got = GraphOps.bellmanFordDistances(
          edges.toDF("s", "d", "w"), "s", "d", "w", Seq(0L).toDF("n"), "n", n)
          .as[(Long, Long)].collect().toMap
        // driver Dijkstra from node 0
        val adj = edges.groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
        val dist = scala.collection.mutable.Map(0L -> 0L)
        val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(Ordering.by(-_._1))
        while (pq.nonEmpty) {
          val (dd, u) = pq.dequeue()
          if (dist.get(u).contains(dd))
            adj.getOrElse(u, Nil).foreach { case (v, w) =>
              if (dist.get(v).forall(_ > dd + w)) { dist(v) = dd + w; pq.enqueue((dd + w, v)) }
            }
        }
        assert(got == dist.toMap, s"seed=$seed n=$n edges=$edges")
      }
    }
  }

  test("property: labelPropagation equals a driver sync-LPA reference on random graphs") {
    import graft.operators.GraphOps
    val gGen = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(1, 20)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, (n - 1).toLong); b <- Gen.choose(0L, (n - 1).toLong)
      } yield (a, b))
    } yield edges.filter(e => e._1 != e._2)
    for (seed <- 0 until 8) {
      val edges = gGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      if (edges.nonEmpty) {
        val rounds = 1 + seed % 3
        val got = GraphOps.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds)
          .as[(Long, Long)].collect().toMap
        // driver reference: symmetric adjacency, sync rounds, (count desc,
        // label asc) argmax
        val sym = (edges ++ edges.map(_.swap)).distinct
        val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
        var lbl = adj.keys.map(v => v -> v).toMap
        for (_ <- 0 until rounds)
          lbl = adj.map { case (v, ns) =>
            val counts = ns.map(lbl).groupBy(identity).view.mapValues(_.size)
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          }
        assert(got == lbl, s"seed=$seed rounds=$rounds")
      }
    }
  }

  test("property: kCoreMembers equals driver peeling on random graphs") {
    import graft.operators.GraphOps
    val gGen = Gen.choose(1, 18).flatMap(m => Gen.listOfN(m, for {
      a <- Gen.choose(0L, 7L); b <- Gen.choose(0L, 7L)
    } yield (a, b)))
    for (seed <- 0 until 8) {
      val edges = gGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val k = 2 + seed % 2
        val rounds = 3
        val got = GraphOps.kCoreMembers(edges.toDF("a", "b"), "a", "b", k, rounds)
          .as[(Long, Long)].collect().toMap
        var sym = (edges ++ edges.map(_.swap)).distinct.toSet
        for (_ <- 0 until rounds) {
          val deg = sym.groupBy(_._2).view.mapValues(_.size).toMap
          val alive = deg.filter(_._2 >= k).keySet
          sym = sym.filter(e => alive(e._1) && alive(e._2))
        }
        val expect = sym.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        assert(got == expect, s"seed=$seed k=$k")
      }
    }
  }

  test("property: commonNeighborJaccard equals brute-force set math") {
    import graft.operators.GraphOps
    val gGen = Gen.choose(1, 16).flatMap(m => Gen.listOfN(m, for {
      a <- Gen.choose(0L, 6L); b <- Gen.choose(0L, 6L)
    } yield (a, b)))
    for (seed <- 0 until 8) {
      val edges = gGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = GraphOps.commonNeighborJaccard(edges.toDF("a", "b"), "a", "b", 1000)
          .as[(Long, Long, Long, Long)].collect().toSeq.sorted
        val sym = (edges ++ edges.map(_.swap)).distinct
        val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = adj.keys.toSeq.sorted
        val brute = (for {
          a <- nodes; b <- nodes if a < b
          c = (adj(a) & adj(b)).size if c > 0
          u = (adj(a) | adj(b)).size
        } yield (a, b, c.toLong, c.toLong * 1000000L / u)).sorted
        assert(got == brute, s"seed=$seed")
      }
    }
  }

  test("property: quantileNormalize emits global order statistics, rank-monotone per group") {
    import graft.operators.SketchOps
    val vGen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c"); v <- Gen.choose(0L, 50L)
    } yield (g, v)))
    for (seed <- 0 until 8) {
      val rows = vGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val out = SketchOps.quantileNormalize(rows.toDF("g", "v", "id"), "g", "v", "id")
        .as[(Long, String, Long, Long)].collect().toSeq
      val globalVals = rows.map(_._2).toSet
      assert(out.map(_._4).forall(globalVals.contains), s"seed=$seed: qnorm not a data value")
      // within a group, qnorm is monotone in the (v, id) rank order
      out.groupBy(_._2).foreach { case (g, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._1)).map(_._4)
        assert(sorted == sorted.sorted, s"seed=$seed group=$g not monotone")
      }
      assert(out.size == rows.size, s"seed=$seed row count")
    }
  }

  test("property: byteCappedChunks partitions the order exactly, every budget holds") {
    import graft.operators.CdcOps
    val rowsGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 120L)))
    for (seed <- 0 until 8) {
      val weights = rowsGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val rows = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val cap = 100L
      val got = CdcOps.byteCappedChunks(rows.toDF("off", "b"),
          Seq(org.apache.spark.sql.functions.col("off")),
          org.apache.spark.sql.functions.col("b"), cap)
        .select("off", "b", "__chunk")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      // no row lost or duplicated
      assert(got.map(_._1) == rows.map(_._1), s"seed=$seed rows")
      // chunk ids are non-decreasing in order (contiguity)
      val chunks = got.map(_._3)
      assert(chunks == chunks.sorted, s"seed=$seed contiguity")
      // exact rule: chunk = exclusive prefix div cap — replay the scan
      var pref = 0L
      got.foreach { case (off, b, c) =>
        assert(c == pref / cap, s"seed=$seed off=$off expected ${pref / cap} got $c")
        pref += b
      }
      // budget: each chunk's total <= cap + its own crossing row
      got.groupBy(_._3).foreach { case (c, rs) =>
        val total = rs.map(_._2).sum
        val maxRow = rs.map(_._2).max
        assert(total <= cap + maxRow, s"seed=$seed chunk=$c total=$total")
      }
    }
  }
}
