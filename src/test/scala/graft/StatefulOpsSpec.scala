package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KeyedChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = Constants.ToastPlaceholder

  test("mergePayload: toast fields inherit, real fields overwrite") {
    val prev = """{"a":"x","b":"y"}"""
    val next = s"""{"a":"$T","b":"z","c":1}"""
    assert(StatefulOps.mergePayload(prev, next) == """{"a":"x","b":"z","c":1}""")
  }

  test("cross-batch stateful last-wins inherits TOAST values over batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedChange]
    val q = StatefulOps.lastWinsStream(ms.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update()).start()

    // batch 1: key A gets a real doc value
    ms.addData(KeyedChange("A", 1L, """{"doc":"original","n":1}""", deleted = false))
    q.processAllAvailable()
    // batch 2 (separate flush window!): toast update — the reference's
    // per-flush buffer could NOT heal this; the state store does
    ms.addData(KeyedChange("A", 2L, s"""{"doc":"$T","n":2}""", deleted = false))
    // stale out-of-order event must not regress the state
    ms.addData(KeyedChange("A", 0L, """{"doc":"stale","n":0}""", deleted = false))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("state_out").as[KeyedChange].collect()
      .filter(_.pk == "A").maxBy(_.off)
    assert(last.off == 2L)
    assert(last.payload == """{"doc":"original","n":2}""")
  }

  test("watermarked windowed aggregation closes windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = ms.toDF().toDF("ts", "event_type", "value")
    val q = StatefulOps.windowedCounts(df, "ts", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    ms.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 10:50:00"), "view", 5.0))
    q.processAllAvailable()
    // advance event time far past the watermark -> hour-10 windows close
    ms.addData((ts("2024-01-01 13:00:00"), "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L, 5.0)))
  }

  test("streaming banded admission rejects index near-dups, grows the index with admissions") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // corpus: one 20-token document; τ=0.7 3-gram jaccard catches
    // single-token edits (15 of 21 shingles shared ≈ 0.714)
    val base = (0 until 20).map(i => s"w$i").mkString(" ")
    def edited(tag: String) = ((0 until 20).map(i => s"w$i").updated(10, tag)).mkString(" ")
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    graft.operators.DedupOps.buildMinhashIndex(corpus, "doc_id", "text", path)

    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = ms.toDF().toDF("ts", "doc_id", "text")
    // batchId -> admitted doc ids (no-data micro-batches may interleave,
    // so assert on the union rather than batch positions)
    val admitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StatefulOps.streamingNovelDocuments(
      df, "doc_id", "text", "ts", path, 0.7) { (adm, bid) =>
        admitted ++= adm.collect().map(r => (bid, r.getLong(1)))
        ()
      }.start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val novel = "completely different content " + (0 until 16).map(i => s"x$i").mkString(" ")
    // batch 1: near-dup of the CORPUS doc rejected; novel doc admitted
    ms.addData(
      (ts("2024-01-01 10:00:00"), 1L, edited("edit1")),
      (ts("2024-01-01 10:00:10"), 2L, novel))
    q.processAllAvailable()
    // batch 2: exact copy of the admitted doc -> exact gate; near-dup of
    // the corpus -> index; near-dup of batch-1's ADMITTED doc -> grown
    // index; plus one genuinely new doc
    val novel2 = "another unrelated document " + (0 until 16).map(i => s"y$i").mkString(" ")
    ms.addData(
      (ts("2024-01-01 10:01:00"), 3L, novel), // exact dup of doc 2
      (ts("2024-01-01 10:01:10"), 4L, edited("edit2")), // corpus near-dup
      (ts("2024-01-01 10:01:20"), 5L, novel.replace("x7", "zz")), // near-dup of admitted doc 2
      (ts("2024-01-01 10:01:30"), 6L, novel2))
    q.processAllAvailable()
    q.stop()

    assert(admitted.map(_._2).sorted.toSeq == Seq(2L, 6L))
    // doc 2 (batch 1) was admitted strictly before doc 6 (batch 2)
    assert(admitted.find(_._2 == 2L).get._1 < admitted.find(_._2 == 6L).get._1)
    // the grown index now holds corpus + admitted docs 2 and 6
    val idxIds = spark.read.parquet(s"$path/docs").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(idxIds == Set(100L, 2L, 6L))
  }

  test("streaming exact-dedup admits only the first copy within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = ms.toDF().toDF("ts", "doc_id", "text")
    val q = StatefulOps.streamingNewDocuments(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    ms.addData(
      (ts("2024-01-01 10:00:00"), 1L, "alpha"),
      (ts("2024-01-01 10:00:30"), 2L, "alpha"), // same content, same batch
      (ts("2024-01-01 10:01:00"), 3L, "beta"))
    q.processAllAvailable()
    ms.addData((ts("2024-01-01 10:02:00"), 4L, "alpha")) // dup, next batch
    q.processAllAvailable()
    q.stop()

    // the in-batch winner among the two same-batch 'alpha' copies is
    // nondeterministic (whichever the shuffle delivers first) — assert on
    // content membership, not on which doc_id survived
    val admitted = spark.table("dedup_out").collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(admitted.map(_._2).sorted.toSeq == Seq("alpha", "beta"))
    assert(admitted.collect { case (id, "alpha") => id }.forall(Set(1L, 2L)))
    assert(admitted.collect { case (id, "beta") => id }.toSeq == Seq(3L))
    // schema passthrough: internal hash column must not leak
    assert(!spark.table("dedup_out").columns.contains("__content_hash"))
  }

  test("streaming session_window: gap splits sessions; bridging event merges them") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = StatefulOps.streamingSessions(
      ms.toDF().toDF("ts", "user_id", "v"), "user_id", "ts", "v",
      "5 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    // user 1: two bursts 20 min apart -> two sessions; the second burst's
    // events land within one gap of each other -> one merged session
    ms.addData(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:02:00"), 1L, 2.0),
      (ts("2024-01-01 10:22:00"), 1L, 4.0),
      (ts("2024-01-01 10:25:00"), 1L, 8.0))
    q.processAllAvailable()
    // watermark advances past both session ends -> both emit
    ms.addData((ts("2024-01-01 11:00:00"), 2L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 10:22:00.0", 2L, 12.0)), got.toSeq.toString)
  }

  test("streaming bloom admission: full-history rejection; restart reseeds the bitset") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_bloomidx")
      .toString + "/idx"
    val admitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = StatefulOps.streamingExactNovelDocuments(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", path) { (adm, bid) =>
        admitted ++= adm.collect().map(r => (bid, r.getAs[Long]("doc_id")))
        ()
      }.start()
    ms.addData((1L, "alpha doc"), (2L, "beta doc"))
    q.processAllAvailable()
    // next batch: exact dup of an EARLIER BATCH (different id) rejected;
    // within-batch twin copies collapse to one; novel admitted
    ms.addData((3L, "alpha doc"), (4L, "gamma doc"), (5L, "gamma doc"))
    q.processAllAvailable()
    q.stop()
    assert(admitted.map(_._2).sorted.toSeq.filterNot(_ == 5L) == Seq(1L, 2L, 4L)
      && admitted.size == 3, admitted.toSeq.toString)
    // restart against the same index: the driver bitset reseeds from the
    // persisted hashes, so dups of pre-restart admissions still reject
    val admitted2 = scala.collection.mutable.ArrayBuffer[Long]()
    val ms2 = MemoryStream[(Long, String)]
    val q2 = StatefulOps.streamingExactNovelDocuments(
      ms2.toDF().toDF("doc_id", "text"), "doc_id", "text", path) { (adm, _) =>
        admitted2 ++= adm.collect().map(_.getAs[Long]("doc_id"))
        ()
      }.start()
    ms2.addData((6L, "beta doc"), (7L, "delta doc"))
    q2.processAllAvailable()
    q2.stop()
    assert(admitted2.toSeq == Seq(7L), admitted2.toSeq.toString)
    // the index holds exactly the four admitted content hashes
    assert(spark.read.parquet(path).count() == 4)
    assert(spark.read.parquet(path).select("__h").distinct().count() == 4)
  }

  test("streaming near-dup admission: corpus + within-batch rejection, artifact grows with admissions") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val dir = java.nio.file.Files.createTempDirectory("graft_ndadm").toString + "/graph"
    val tX = "alpha beta gamma delta epsilon zeta eta theta"
    val tY = "spark window merge batch filter column vector order"
    val tZ = "one two three four five six seven eight nine ten"
    val tW = "red green blue yellow purple orange pink black white"
    // seed corpus: one admitted doc X
    DedupOps.buildDedupGraph(Seq((100L, tX)).toDF("doc_id", "text"),
      "doc_id", "text", dir, 3)
    val admitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = StatefulOps.streamingNearDupAdmission(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", dir) { (adm, bid) =>
        admitted ++= adm.collect().map(r => (bid, r.getAs[Long]("doc_id")))
        ()
      }.start()
    // batch 1: corpus dup rejects (1 ~ X); within-batch twins collapse to
    // the min id (2 over 3); fresh doc admits (4)
    ms.addData((1L, tX), (2L, tY), (3L, tY), (4L, tZ))
    q.processAllAvailable()
    // batch 2: dup of a PRIOR BATCH admission rejects (5 ~ 2's text);
    // fresh admits (6)
    ms.addData((5L, tY), (6L, tW))
    q.processAllAvailable()
    q.stop()
    assert(admitted.map(_._2).sorted.toSeq == Seq(2L, 4L, 6L), admitted.toSeq.toString)
    // the artifact grew with exactly the admissions; components cover them
    val compIds = DedupOps.dedupGraphComponents(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(compIds == Set(100L, 2L, 4L, 6L), compIds.toString)
    // a new query against the same artifact still rejects old admissions
    val admitted2 = scala.collection.mutable.ArrayBuffer[Long]()
    val ms2 = MemoryStream[(Long, String)]
    val q2 = StatefulOps.streamingNearDupAdmission(
      ms2.toDF().toDF("doc_id", "text"), "doc_id", "text", dir) { (adm, _) =>
        admitted2 ++= adm.collect().map(_.getAs[Long]("doc_id"))
        ()
      }.start()
    ms2.addData((7L, tW), (8L, tX), (9L, "totally fresh words appear here now finally indeed"))
    q2.processAllAvailable()
    q2.stop()
    assert(admitted2.toSeq == Seq(9L), admitted2.toSeq.toString)

    // takedown composes with admission: doc 100 (whose signature was the
    // ONLY thing blocking X-content) is removed — its tombstone must stop
    // it from black-holing future arrivals of that content, and the
    // re-arrival is admitted through the normal probe
    DedupOps.removeFromDedupGraph(Seq(100L).toDF("doc_id"), "doc_id", dir)
    val admitted3 = scala.collection.mutable.ArrayBuffer[Long]()
    val ms3 = MemoryStream[(Long, String)]
    val q3 = StatefulOps.streamingNearDupAdmission(
      ms3.toDF().toDF("doc_id", "text"), "doc_id", "text", dir) { (adm, _) =>
        admitted3 ++= adm.collect().map(_.getAs[Long]("doc_id"))
        ()
      }.start()
    ms3.addData((10L, tX), (11L, tY)) // tY still blocked by admission 2
    q3.processAllAvailable()
    q3.stop()
    assert(admitted3.toSeq == Seq(10L), admitted3.toSeq.toString)
    val compIds3 = DedupOps.dedupGraphComponents(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(compIds3 == Set(2L, 4L, 6L, 9L, 10L), compIds3.toString)
  }

  test("streamIntervalJoin: horizon-bounded stream-stream pairs, watermark drops the straggler") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val clicks = MemoryStream[(String, Timestamp, Long)]
    val purchases = MemoryStream[(String, Timestamp, Long)]
    val out = StatefulOps.streamIntervalJoin(
      clicks.toDF().toDF("user", "click_ts", "click_id"),
      purchases.toDF().toDF("user", "purchase_ts", "purchase_id"),
      "user", "click_ts", "purchase_ts", "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    // u1: purchase 30 min after click -> pair; purchase 90 min after -> out
    // of horizon; u2: purchase BEFORE its click -> no pair
    clicks.addData(("u1", ts(0), 1L), ("u2", ts(50), 2L))
    purchases.addData(("u1", ts(30), 100L), ("u1", ts(90), 101L), ("u2", ts(40), 102L))
    q.processAllAvailable()
    // advance both watermarks far past the horizon, then send a straggler
    // click at ts(5): its side's watermark has moved on -> dropped, so the
    // in-horizon purchase at ts(30) must NOT gain a second attribution
    clicks.addData(("u9", ts(400), 9L))
    purchases.addData(("u9", ts(401), 900L))
    q.processAllAvailable()
    clicks.addData(("u1", ts(5), 3L))
    purchases.addData(("u1", ts(402), 903L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_out")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 100L), (9L, 900L)), rows.toString)
  }

  test("streamingHeavyHitters: exact under capacity, SpaceSaving bounds past it") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{HHEvent, HHReadout}
    val runIdx = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(capacity: Int, batches: Seq[Seq[HHEvent]]): Seq[HHReadout] = {
      val ms = MemoryStream[HHEvent]
      val name = s"hh_out_${capacity}_${runIdx.incrementAndGet()}"
      val q = StatefulOps.streamingHeavyHitters(ms.toDS(), capacity)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // final readout per (key, item): the last batch's emission
      import spark.implicits._
      spark.table(name).as[HHReadout].collect().toSeq
    }
    def occ(key: String, s: String): Seq[HHEvent] =
      s.split(" ").toSeq.map(HHEvent(key, _))
    // under capacity: end-state counts equal a plain groupBy count even
    // across a mid-key batch split, err stays 0
    val small = run(8, Seq(occ("k", "a a b c"), occ("k", "b a c c c")))
    val last = small.groupBy(r => (r.key, r.item))
      .map { case (_, rs) => rs.maxBy(_.cnt) }.toSeq
    assert(last.map(r => (r.item, r.cnt, r.err)).toSet ===
      Set(("a", 3L, 0L), ("b", 2L, 0L), ("c", 4L, 0L)))
    // past capacity: state stays capacity-bounded, every item with true
    // count > N/capacity is tracked, and cnt overcounts by at most err
    val truth = Map("x" -> 6L, "y" -> 4L, "z" -> 2L, "w" -> 1L)
    val stream = occ("k", "x x x y y z x w x y z x y")
    val big = run(2, Seq(stream.take(7), stream.drop(7)))
    val fin = big.groupBy(_.item).map { case (_, rs) => rs.maxBy(_.cnt) }.toSeq
      .sortBy(-_.cnt)
    assert(fin.size <= 2, fin.toString)
    val n = truth.values.sum
    truth.filter(_._2 > n / 2).keys.foreach { hot =>
      assert(fin.exists(_.item == hot), s"guarantee broken: $hot missing from $fin")
    }
    fin.foreach { r =>
      assert(r.cnt >= truth(r.item) && r.cnt - r.err <= truth(r.item),
        s"count bounds broken for $r (truth ${truth(r.item)})")
    }
    // deterministic replay: re-running the identical batches from scratch
    // yields the identical final state (the sorted-fold contract)
    val big2 = run(2, Seq(stream.take(7), stream.drop(7)))
    val fin2 = big2.groupBy(_.item).map { case (_, rs) => rs.maxBy(_.cnt) }.toSeq
      .sortBy(-_.cnt)
    assert(fin.map(r => (r.item, r.cnt, r.err)) === fin2.map(r => (r.item, r.cnt, r.err)))
  }

  test("rateLimitStream: event-time token bucket — burst, starvation, refill, cross-batch state") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{RateEvent, RateDecision}
    val ms = MemoryStream[RateEvent]
    // rate 1 token / 100 ms, burst 2
    val q = StatefulOps.rateLimitStream(ms.toDS(), 1L, 100L, 2L)
      .writeStream.format("memory").queryName("rate_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: t=0,10,20 — burst of 2 admits, third starves
    ms.addData(RateEvent("k", 0L, 1L), RateEvent("k", 10L, 2L), RateEvent("k", 20L, 3L))
    q.processAllAvailable()
    // batch 2: t=120 refills ONE token (one full period since t=0) -> admit;
    // t=130 starves again; other key has its own untouched bucket
    ms.addData(RateEvent("k", 120L, 4L), RateEvent("k", 130L, 5L),
      RateEvent("other", 0L, 6L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rate_out").as[RateDecision].collect()
      .sortBy(r => (r.key, r.ts)).map(r => (r.key, r.id, r.admitted)).toSeq
    assert(got == Seq(("k", 1L, true), ("k", 2L, true), ("k", 3L, false),
      ("k", 4L, true), ("k", 5L, false), ("other", 6L, true)), got.toString)
  }

  // ---- streaming curation funnel ---------------------------------------

  private def funnelDirs(): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    (s"$base/hidx", s"$base/graph", s"$base/ledger")
  }

  private def emptyGraph(dir: String): Unit =
    graft.operators.DedupOps.buildDedupGraph(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", dir, 3)

  // the q73 composition over an arbitrary frame, for equivalence pinning
  private def batchFunnel(docs: org.apache.spark.sql.DataFrame,
                          minQ: Long, budget: Long): Seq[(Long, String, Long, Long)] = {
    import graft.operators.{DedupOps, SamplingOps, TextOps}
    import org.apache.spark.sql.functions._
    val keepers = DedupOps.exactDuplicates(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val d1 = docs.join(keepers, "doc_id")
    val pairs = DedupOps.simhashExactPairs(d1, "doc_id", "text", 3)
    val groups = DedupOps.nearDupGroupsStar(d1.select(col("doc_id")), "doc_id", pairs)
    val canon = d1.join(groups.filter(col("id") === col("canonical_id"))
      .select(col("id").as("doc_id")), "doc_id")
    val t = canon
      .withColumn("quality", TextOps.qualityScore(col("text"), col("n_chars")))
      .filter(col("quality") >= minQ)
      .select(col("doc_id"), col("lang"), col("quality"),
        TextOps.wordCount(col("text")).cast("long").as("n_tokens"))
    SamplingOps.sampleToTokenBudget(t, "lang", "quality", "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
  }

  private val tEn1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val tEn1Near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
  private val tEn2 = "spark window merge batch filter column vector order shuffle join codegen plan"
  private val tEn3 = "one two three four five six seven eight nine ten eleven twelve"
  private val tDe1 = "rot gruen blau gelb lila orange rosa schwarz weiss braun"
  private val tDe2 = "ein zwei drei vier fuenf sechs sieben acht neun zehn"
  private val tDe3 = "montag dienstag mittwoch donnerstag freitag samstag sonntag januar februar maerz"
  private val tJunk = "a a a a a a"

  private def doc(id: Long, text: String, lang: String): (Long, String, String, Long) =
    (id, text, lang, text.length.toLong)

  test("streaming curation funnel: a single batch equals the composed batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    // precondition for the near-dup stage: the planted variant really is
    // within Hamming 3 of its original under simhashFp30
    val sigs = graft.operators.DedupOps.simhashFp30(
      Seq((1L, tEn1), (2L, tEn1Near)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 3,
      s"fixture drift: planted near-dup pair is no longer within distance 3")
    val docs = Seq(
      doc(1L, tEn1, "en"),  // admitted
      doc(2L, tEn1, "en"),  // exact dup of 1 -> rejected
      doc(3L, tEn1Near, "en"), // near dup of 1 -> rejected
      doc(4L, tEn2, "en"),  // admitted (24 of 30 en tokens spent)
      doc(5L, tEn3, "en"),  // quality-clean but busts the en budget
      doc(6L, tJunk, "en"), // quality reject
      doc(7L, tDe1, "de"))  // admitted (other language, own budget)
    val expected = batchFunnel(docs.toDF("doc_id", "text", "lang", "n_chars"), 150L, 30L)
    assert(expected.map(_._1) == Seq(1L, 4L, 7L), s"fixture drift: $expected")
    val (hidx, graph, ledger) = funnelDirs()
    emptyGraph(graph)
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = StatefulOps.streamingCurationFunnel(
      ms.toDF().toDF("doc_id", "text", "lang", "n_chars"), "doc_id", "text",
      "lang", "n_chars", hidx, graph, ledger, 150L, 30L) { (adm, _) =>
        out ++= adm.collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("lang"), r.getAs[Long]("quality"), r.getAs[Long]("n_tokens")))
        ()
      }.start()
    ms.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    assert(out.sortBy(_._1).toSeq == expected, s"streaming != batch: $out vs $expected")
  }

  test("streaming curation funnel: cross-batch artifacts, budget ledger, replay idempotence") {
    implicit val sqlCtx = spark.sqlContext
    val (hidx, graph, ledger) = funnelDirs()
    emptyGraph(graph)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def run(data: Seq[(Long, String, String, Long)]): Seq[Long] = {
      val before = out.size
      val ms = MemoryStream[(Long, String, String, Long)]
      val q = StatefulOps.streamingCurationFunnel(
        ms.toDF().toDF("doc_id", "text", "lang", "n_chars"), "doc_id", "text",
        "lang", "n_chars", hidx, graph, ledger, 150L, 30L) { (adm, bid) =>
          out ++= adm.collect().map(r => (bid, r.getAs[Long]("doc_id")))
          ()
        }.start()
      ms.addData(data: _*)
      q.processAllAvailable()
      q.stop()
      out.drop(before).map(_._2).sorted.toSeq
    }
    // batch 1: two en docs (24/30 tokens) + one de doc (10/30)
    assert(run(Seq(doc(1L, tEn1, "en"), doc(4L, tEn2, "en"), doc(7L, tDe1, "de")))
      == Seq(1L, 4L, 7L))
    // batch 2: exact dup of 1 (rejected), near dup of 1 (rejected), en doc
    // over remaining budget (rejected), de doc within budget (admitted)
    val batch2 = Seq(doc(10L, tEn1, "en"), doc(11L, tEn1Near, "en"),
      doc(12L, tEn3, "en"), doc(13L, tDe2, "de"))
    assert(run(batch2) == Seq(13L))
    // replay of batch 2 (same rows, artifacts already grown): the id-aware
    // probes must RE-ADMIT the same subset, not reject it against its own
    // earlier appends
    assert(run(batch2) == Seq(13L), "replayed batch must re-emit its admissions")
    // after the replay the ledger holds duplicate rows for 13; they must
    // not double-count: de has spent 20 of 30, so a fresh 10-token de doc
    // still fits exactly
    assert(run(Seq(doc(14L, tDe3, "de"))) == Seq(14L),
      "replay double-counted the budget ledger")
    // and the budget is now exhausted for de
    assert(run(Seq(doc(15L, "acht sieben sechs fuenf vier drei zwei eins null minus", "de")))
      == Seq.empty, "de budget should be exhausted at 30 tokens")
  }

  test("streamingTwap: final readout ≡ batch operator across a mid-key split") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{TwapEvent, TwapReadout}
    val events = Seq(
      TwapEvent("a", 0L, 10L), TwapEvent("a", 10L, 20L), TwapEvent("a", 30L, 99L),
      TwapEvent("c", 0L, 5L), TwapEvent("c", 10L, 1L))
    val ms = MemoryStream[TwapEvent]
    val q = StatefulOps.streamingTwap(ms.toDS())
      .writeStream.format("memory").queryName("twap_out")
      .outputMode(OutputMode.Append()).start()
    ms.addData(events.take(2): _*) // a's integral must continue across batches
    q.processAllAvailable()
    ms.addData(events.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val finalByKey = spark.table("twap_out").as[TwapReadout].collect()
      .groupBy(_.key).map { case (k, rs) => rs.maxBy(_.n_points) }
      .toSeq.sortBy(_.key).map(r => (r.key, r.n_points, r.span, r.twap))
    val batch = graft.operators.TemporalOps.timeWeightedAverage(
      events.toDF("k", "t", "v").withColumn("tie", org.apache.spark.sql.functions.col("t")), "k", "t", "v", "tie")
      .orderBy(org.apache.spark.sql.functions.col("key")).as[(String, Long, Long, Long)].collect().toSeq
    assert(finalByKey === batch)
    // a: 10*10 + 20*20 = 500 over 30 -> 16; c: 5*10 = 50 over 10 -> 5
    assert(batch === Seq(("a", 3L, 30L, 16L), ("c", 2L, 10L, 5L)))
  }

  test("streamingCoverage: final readout ≡ batch interval union across a mid-island split") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{CoverageEvent, CoverageReadout}
    val events = Seq(
      CoverageEvent("a", 0L, 10L), CoverageEvent("a", 5L, 20L), // overlap
      CoverageEvent("a", 30L, 40L), // gap -> second island
      CoverageEvent("b", 0L, 100L), CoverageEvent("b", 10L, 20L)) // containment
    val ms = MemoryStream[CoverageEvent]
    val q = StatefulOps.streamingCoverage(ms.toDS())
      .writeStream.format("memory").queryName("cov_out")
      .outputMode(OutputMode.Append()).start()
    ms.addData(events.take(2): _*) // a's open island must cross the batch
    q.processAllAvailable()
    ms.addData(events.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val finalByKey = spark.table("cov_out").as[CoverageReadout].collect()
      .groupBy(_.key).map { case (_, rs) => rs.maxBy(_.n_intervals) }
      .toSeq.sortBy(_.key).map(r => (r.key, r.n_intervals, r.n_islands, r.covered))
    val batch = graft.operators.TemporalOps.intervalUnionLength(
      events.toDF("k", "s", "e"), "k", "s", "e")
      .orderBy(org.apache.spark.sql.functions.col("key"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(finalByKey === batch)
    assert(batch === Seq(("a", 3L, 2L, 30L), ("b", 2L, 1L, 100L)))
  }

  test("streamingDisorderProfile: replayed batch re-emits identically (idempotent max state)") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{ArrivalEvent, LatenessRow}
    val b1 = Seq(ArrivalEvent("u", 1L, 100L), ArrivalEvent("u", 2L, 200L))
    val b2 = Seq(ArrivalEvent("u", 3L, 150L)) // 50 behind
    val ms = MemoryStream[ArrivalEvent]
    val q = StatefulOps.streamingDisorderProfile(ms.toDS())
      .writeStream.format("memory").queryName("disorder_replay_out")
      .outputMode(OutputMode.Append()).start()
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable() // at-least-once replay
    q.stop()
    val rows = spark.table("disorder_replay_out").as[LatenessRow].collect().toSeq
    // the replayed event re-emits with the SAME lateness (running max is
    // idempotent), so a (key, arr) dedupe downstream recovers exact counts
    val arr3 = rows.filter(_.arr == 3L)
    assert(arr3.length === 2 && arr3.forall(_.late === 50L))
    assert(rows.map(r => (r.key, r.arr, r.late)).distinct.sorted ===
      Seq(("u", 1L, 0L), ("u", 2L, 0L), ("u", 3L, 50L)))
  }

  test("streamingDisorderProfile: lateness ≡ batch profile, state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{ArrivalEvent, LatenessRow}
    val events = Seq(
      ArrivalEvent("u", 1L, 100L), ArrivalEvent("u", 2L, 200L),
      ArrivalEvent("u", 3L, 150L), // 50 behind the running max
      ArrivalEvent("u", 4L, 190L), // 10 behind
      ArrivalEvent("v", 1L, 500L), ArrivalEvent("v", 2L, 480L)) // 20 behind
    val ms = MemoryStream[ArrivalEvent]
    val q = StatefulOps.streamingDisorderProfile(ms.toDS())
      .writeStream.format("memory").queryName("disorder_out")
      .outputMode(OutputMode.Append()).start()
    // split MID-KEY so the running max must survive the batch boundary
    ms.addData(events.take(2): _*)
    q.processAllAvailable()
    ms.addData(events.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("disorder_out").as[LatenessRow].collect().toSeq
    assert(rows.sortBy(r => (r.key, r.arr)).map(r => (r.key, r.late)) ===
      Seq(("u", 0L), ("u", 0L), ("u", 50L), ("u", 10L), ("v", 0L), ("v", 20L)))
    // histogram of the emitted rows == the batch operator on the same data
    val streamHist = rows.groupBy(_.bucket)
      .map { case (b, rs) => (b, rs.size.toLong, rs.map(_.late).max) }
      .toSeq.sortBy(_._1)
    val batchHist = graft.operators.TemporalOps.disorderProfile(
      events.toDF("key", "arr", "t"), "key", "arr", "t")
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamHist === batchHist)
  }

  test("streamingCusumDrift: final readout ≡ batch cusumAlarms across a mid-shift split") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{DriftEvent, DriftReadout}
    import org.apache.spark.sql.functions.{col, lit}
    // key a: on-target at 100 then a sustained +30 shift from t=4 —
    // target 100, slack 10, threshold 50 alarms at t=6 (20+20+20 >= 50
    // after three shifted points, S resets nothing before the shift);
    // key b: one spike, never sustained -> no alarm
    val events = Seq(
      DriftEvent("a", 1L, 100L), DriftEvent("a", 2L, 95L), DriftEvent("a", 3L, 105L),
      DriftEvent("a", 4L, 130L), DriftEvent("a", 5L, 130L), DriftEvent("a", 6L, 130L),
      DriftEvent("a", 7L, 130L),
      DriftEvent("b", 1L, 100L), DriftEvent("b", 2L, 140L), DriftEvent("b", 3L, 100L))
    val ms = MemoryStream[DriftEvent]
    val q = StatefulOps.streamingCusumDrift(ms.toDS(), 100L, 10L, 50L)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode(OutputMode.Append()).start()
    ms.addData(events.filter(_.t <= 4): _*) // split lands mid-shift for a
    q.processAllAvailable()
    ms.addData(events.filter(_.t > 4): _*)
    q.processAllAvailable()
    q.stop()
    val finalByKey = spark.table("drift_out").as[DriftReadout].collect()
      .groupBy(_.key).map { case (_, rs) => rs.maxBy(_.n_points) }
      .toSeq.sortBy(_.key)
      .map(r => (r.key, r.n_points, r.max_cusum, r.first_alarm_t))
    val batch = graft.operators.TemporalOps.cusumAlarms(
      events.toDF("k", "t", "v"), "k", "t", "v", lit(100L), lit(10L), lit(50L))
      .orderBy(col("key")).as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(finalByKey === batch)
    // a alarms at t=6 (S = 20+20+20 = 60 >= 50); b's lone spike stays below
    assert(batch === Seq(("a", 7L, 80L, Some(6L)), ("b", 3L, 30L, None)))
  }

  test("streamingEwma: final readout ≡ batch ewmaSeries last row across a batch split") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{EwmaEvent, EwmaReadout}
    import org.apache.spark.sql.functions.col
    // key a rises then FALLS (negative deviations exercise the floor
    // step); key b is a constant series (smoother must hold it exactly)
    val events = Seq(
      EwmaEvent("a", 1L, 100L), EwmaEvent("a", 2L, 180L), EwmaEvent("a", 3L, 60L),
      EwmaEvent("a", 4L, 20L), EwmaEvent("a", 5L, 300L),
      EwmaEvent("b", 1L, 42L), EwmaEvent("b", 2L, 42L), EwmaEvent("b", 3L, 42L))
    val ms = MemoryStream[EwmaEvent]
    val q = StatefulOps.streamingEwma(ms.toDS(), 8L)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append()).start()
    ms.addData(events.filter(_.t <= 3): _*) // split lands mid-descent for a
    q.processAllAvailable()
    ms.addData(events.filter(_.t > 3): _*)
    q.processAllAvailable()
    q.stop()
    val finalByKey = spark.table("ewma_out").as[EwmaReadout].collect()
      .groupBy(_.key).map { case (_, rs) => rs.maxBy(_.n_points) }
      .toSeq.sortBy(_.key).map(r => (r.key, r.n_points, r.e))
    val batch = graft.operators.TemporalOps.ewmaSeries(
        events.toDF("k", "t", "v"), "k", "t", "v", 8L)
      .groupBy(col("key"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max_by(col("e"), col("t")).as("e"))
      .orderBy(col("key")).as[(String, Long, Long)].collect().toSeq
    assert(finalByKey === batch)
    // b's constant series stays pinned at 42*8 exactly
    assert(batch.find(_._1 == "b").get._3 === 336L)
  }

  test("streamingQuantiles: GK rank bound holds at n=1000, exact at tiny n, state compresses") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.{QuantEvent, QuantReadout}
    // values 1..1000 in hash-scattered order, split across two batches —
    // each value IS its own rank, so the bound check is direct
    val vals = (1L to 1000L).sortBy(v =>
      graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"gk$v")))
    val ms = MemoryStream[QuantEvent]
    val q = StatefulOps.streamingQuantiles(ms.toDS(), 10L) // eps = 1%
      .writeStream.format("memory").queryName("gk_out")
      .outputMode(OutputMode.Append()).start()
    ms.addData(vals.take(400).map(QuantEvent("a", _)) :+ QuantEvent("b", 3L): _*)
    q.processAllAvailable()
    ms.addData(vals.drop(400).map(QuantEvent("a", _)) ++
      Seq(QuantEvent("b", 1L), QuantEvent("b", 5L), QuantEvent("b", 2L), QuantEvent("b", 4L)): _*)
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("gk_out").as[QuantReadout].collect()
      .groupBy(_.key).map { case (_, rs) => rs.maxBy(_.n) }.toSeq.sortBy(_.key)
    val a = fin.head
    assert(a.n === 1000L)
    // GK invariant g+d <= 2εn => every rank query within 2εn = 20
    assert(math.abs(a.p50 - 500L) <= 20L, s"p50=${a.p50}")
    assert(math.abs(a.p95 - 950L) <= 20L, s"p95=${a.p95}")
    assert(math.abs(a.p99 - 990L) <= 20L, s"p99=${a.p99}")
    // the summary actually compresses: far fewer tuples than observations
    assert(a.n_tuples < 250L, s"n_tuples=${a.n_tuples}")
    // tiny n: no compression yet -> exact ceil-rank order statistics
    val b = fin(1)
    assert((b.n, b.p50, b.p95, b.p99) === ((5L, 3L, 5L, 5L)))
  }
}
