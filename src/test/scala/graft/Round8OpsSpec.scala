package graft

import graft.operators.{FrontierOps, QualityOps, SamplingOps, SketchOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions: HLL sketch, Pareto frontier, mixing weights,
  * shard export, rank-sum AUC.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- hllDistinct ---------------------------------------------------------

  test("hllDistinct: estimate lands within the m=64 error envelope and dedupes inherently") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("g", "v")
    val est = SketchOps.hllDistinct(df, Seq("g"), "v")
      .select(col("hll_est")).as[Long].head()
    // 1.04/sqrt(64) = 13 % standard error; allow 3 sigma
    assert(math.abs(est - n) < n * 0.39, s"estimate $est too far from $n")
    // duplicated input rows must not move a distinct-count estimate
    val dup = df.union(df).union(df)
    val est2 = SketchOps.hllDistinct(dup, Seq("g"), "v")
      .select(col("hll_est")).as[Long].head()
    assert(est2 === est)
  }

  test("hllDistinct: n_values counts input rows per group; groups are independent") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "v")
    val out = SketchOps.hllDistinct(df, Seq("g"), "v")
      .orderBy(col("g")).collect()
    assert(out.map(_.getAs[Long]("n_values")).toSeq === Seq(3L, 1L))
    // group b saw one value: the RAW estimator's documented floor is
    // alpha*m^2/(m-1+eps) ~ alpha*m ~ 46 — the small-range regime the
    // scaladoc sends to exact counting (no linear-counting correction,
    // deliberately: it would need a cross-engine log)
    val estB = out(1).getAs[Long]("hll_est")
    assert(estB >= 45L && estB <= 47L, s"singleton raw-HLL floor, got $estB")
  }

  // ---- paretoFrontier2D ----------------------------------------------------

  test("paretoFrontier2D: dominance semantics incl. equal-cell ties, vs brute force") {
    val pts = Seq(
      (1L, 10L, 1L), (2L, 8L, 5L), (3L, 8L, 5L),  // (8,5) tied twice: both survive
      (4L, 8L, 4L),                                  // dominated by (8,5) (strict y)
      (5L, 9L, 5L),                                  // dominates (8,5)? 9>8, 5=5 -> yes
      (6L, 10L, 0L), (7L, 5L, 7L), (8L, 5L, 6L), (9L, 4L, 7L))
    val df = pts.toDF("id", "x", "y")
    val got = FrontierOps.paretoFrontier2D(df, "x", "y")
      .select(col("id")).as[Long].collect().sorted.toSeq
    // brute force dominance
    val sky = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).sorted
    assert(got === sky)
    assert(got.contains(5L) && !got.contains(2L),
      "(9,5) dominates the (8,5) ties (strict in x)")
  }

  test("paretoFrontier2D: single partition boundary cases and y-type guard") {
    // strictly decreasing staircase: every point is on the frontier
    val stairs = (1L to 100L).map(i => (i, i, 101L - i)).toDF("id", "x", "y")
    assert(FrontierOps.paretoFrontier2D(stairs, "x", "y").count() === 100L)
    // strictly increasing: only the max survives
    val ramp = (1L to 100L).map(i => (i, i, i)).toDF("id", "x", "y")
    val top = FrontierOps.paretoFrontier2D(ramp, "x", "y")
      .select(col("id")).as[Long].collect().toSeq
    assert(top === Seq(100L))
    val intY = Seq((1, 2)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      FrontierOps.paretoFrontier2D(intY, "x", "y")
    }
    assert(e.getMessage.contains("BIGINT"))
  }

  // ---- mixingWeights -------------------------------------------------------

  test("mixingWeights: permille sum to exactly 1000 with largest-remainder bumps") {
    val df = Seq.tabulate(300)(i => (s"s${i % 3}", "a b c")) // 3 sources, equal
      .toDF("src", "text")
    val out = SamplingOps.mixingWeights(df, "src", size(split(col("text"), " ")).cast("long"))
      .collect()
    assert(out.map(_.getAs[Long]("permille")).sum === 1000L)
    // equal sources: 334/333/333, bump to the lexicographically first
    assert(out.map(r => (r.getAs[String]("group"), r.getAs[Long]("permille"))).toSeq ===
      Seq(("s0", 334L), ("s1", 333L), ("s2", 333L)))
  }

  test("mixingWeights: temperature flattens the distribution; empty corpus is defined") {
    // 10000 vs 100 tokens = 100:1 raw, sqrt -> 10:1
    val df = (Seq.fill(100)(("big", Seq.fill(100)("t").mkString(" "))) ++
      Seq(("small", Seq.fill(100)("t").mkString(" ")))).toDF("src", "text")
    val out = SamplingOps.mixingWeights(df, "src", size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getAs[String]("group") -> r.getAs[Long]("permille")).toMap
    assert(out("big") === 909L && out("small") === 91L) // 10:1, not 100:1
    val empty = Seq(("a", ""), ("b", "")).toDF("src", "text")
    val z = SamplingOps.mixingWeights(empty, "src", lit(0L))
      .collect().map(_.getAs[Long]("permille")).toSeq
    assert(z === Seq(0L, 0L)) // defined zeros, no divide error
  }

  // ---- shardAssignments ----------------------------------------------------

  test("shardAssignments: total order, dense positions, deterministic across runs") {
    val df = (1L to 500L).map(i => (i, s"payload$i")).toDF("id", "payload")
    val a = SamplingOps.shardAssignments(df, "id", 8).cache()
    try {
      assert(a.count() === 500L)
      // positions are dense 1..n_s within every shard
      val dense = a.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
      assert(dense.count() === 0L)
      // deterministic: identical assignment on recompute
      val b = SamplingOps.shardAssignments(df, "id", 8)
      assert(a.join(b, Seq("id"))
        .filter(a("shard") =!= b("shard") || a("pos") =!= b("pos")).count() === 0L)
    } finally a.unpersist()
    val reserved = df.withColumnRenamed("payload", "pos")
    val e = intercept[IllegalArgumentException] {
      SamplingOps.shardAssignments(reserved, "id", 8)
    }
    assert(e.getMessage.contains("reserved"))
  }

  // ---- theilSenTrend / cusumAlarms -----------------------------------------

  test("theilSenTrend: hand-computed median slope, outlier robustness, truncation quantizer") {
    import graft.operators.TemporalOps
    // clean ramp +2/day with one wild outlier day: pairwise slopes'
    // median stays 2000 milli (robustness); least-squares would not
    val pts = Seq((0L, 10L), (1L, 12L), (2L, 14L), (3L, 116L), (4L, 18L))
      .map { case (t, v) => ("k", t, v) }
    val out = TemporalOps.theilSenTrend(pts.toDF("key", "t", "v"), "key", "t", "v")
      .head()
    assert(out.getAs[Long]("n_points") === 5L && out.getAs[Long]("n_pairs") === 10L)
    assert(out.getAs[Long]("sen_slope_milli") === 2000L)
    // negative slope truncates toward zero in BOTH engines: (-7)/2 -> -3500
    val down = Seq(("d", 0L, 7L), ("d", 2L, 0L)).toDF("key", "t", "v")
    assert(TemporalOps.theilSenTrend(down, "key", "t", "v")
      .head().getAs[Long]("sen_slope_milli") === -3500L)
    // single-point keys vanish (no pairs)
    val single = Seq(("s", 0L, 1L)).toDF("key", "t", "v")
    assert(TemporalOps.theilSenTrend(single, "key", "t", "v").count() === 0L)
  }

  test("cusumAlarms: prefix-sum closed form equals the sequential recursion; alarm timing") {
    import graft.operators.TemporalOps
    // series with a level shift at t=5: target 10, slack 1, threshold 6
    val vs = Seq(10L, 9L, 11L, 10L, 9L, 14L, 15L, 14L, 15L, 14L)
    val df = vs.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      .toDF("key", "t", "v")
    val out = TemporalOps.cusumAlarms(df, "key", "t", "v",
      lit(10L), lit(1L), lit(6L)).head()
    // sequential reference
    var s = 0L; var mx = 0L; var alarm = Option.empty[Long]
    vs.zipWithIndex.foreach { case (v, t) =>
      s = math.max(0L, s + v - 10L - 1L); mx = math.max(mx, s)
      if (alarm.isEmpty && s >= 6L) alarm = Some(t.toLong)
    }
    assert(out.getAs[Long]("max_cusum") === mx)
    assert(out.getAs[Long]("first_alarm_t") === alarm.get)
    assert(mx > 0L && alarm.nonEmpty, "fixture must actually alarm")
    // a spiky but unshifted series never alarms (the q93 complement)
    val spiky = Seq(10L, 30L, 10L, 9L, 10L, 31L, 10L, 9L, 10L, 10L)
      .zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      .toDF("key", "t", "v")
    val o2 = TemporalOps.cusumAlarms(spiky, "key", "t", "v",
      lit(10L), lit(5L), lit(40L)).head()
    assert(o2.isNullAt(o2.fieldIndex("first_alarm_t")))
  }

  test("cusumAlarms: randomized equivalence with the sequential recursion across keys") {
    import graft.operators.TemporalOps
    val rows = for (k <- 0 until 7; t <- 0 until 40) yield {
      val v = math.abs((k * 7919 + t * 104729) % 23).toLong
      (s"k$k", t.toLong, v)
    }
    val out = TemporalOps.cusumAlarms(rows.toDF("key", "t", "v"), "key", "t", "v",
      lit(11L), lit(1L), lit(15L))
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("max_cusum"),
          Option(r.getAs[java.lang.Long]("first_alarm_t")).map(_.toLong))).toMap
    rows.groupBy(_._1).foreach { case (k, series) =>
      var s = 0L; var mx = 0L; var alarm = Option.empty[Long]
      series.sortBy(_._2).foreach { case (_, t, v) =>
        s = math.max(0L, s + v - 11L - 1L); mx = math.max(mx, s)
        if (alarm.isEmpty && s >= 15L) alarm = Some(t)
      }
      assert(out(k) === ((mx, alarm)), s"key $k")
    }
  }

  // ---- luhn / scrubCards ---------------------------------------------------

  test("LuhnValid: checksum arithmetic, length bounds, non-digits, SQL surface") {
    import graft.functions.TextCodec
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    assert(TextCodec.luhnValid(u8("4532015112830366")))
    assert(TextCodec.luhnValid(u8("4111111111111111")))
    assert(!TextCodec.luhnValid(u8("4532015112830367"))) // off-by-one check digit
    assert(!TextCodec.luhnValid(u8("453201511283036"))) // 15 digits, bad sum
    assert(TextCodec.luhnValid(u8("4222222222222"))) // 13-digit valid Visa test PAN
    assert(!TextCodec.luhnValid(u8("123456789012"))) // under 13 digits
    assert(!TextCodec.luhnValid(u8("45320151128303669999"))) // over 19
    assert(!TextCodec.luhnValid(u8("4532a15112830366"))) // non-digit
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_luhn_valid('4532015112830366') AS a, graft_luhn_valid('4532015112830367') AS b")
      .head()
    assert(viaSql.getBoolean(0) && !viaSql.getBoolean(1))
  }

  test("scrubCards: only checksum-valid runs are redacted") {
    import graft.operators.TextOps
    val df = Seq(
      (1L, "pay with 4532015112830366 not order 4532015112830367 thanks"),
      (2L, "no cards here 12345"),
      (3L, "two: 4111111111111111 and 4532015112830366")
    ).toDF("doc_id", "text")
    val out = TextOps.scrubCards(df, "doc_id", "text")
      .orderBy(col("id")).collect()
    assert(out(0).getAs[Long]("n_digit_runs") === 2L)
    assert(out(0).getAs[Long]("n_valid_cards") === 1L)
    assert(out(0).getAs[String]("clean_text") ===
      "pay with <CARD> not order 4532015112830367 thanks")
    assert(out(1).getAs[Long]("n_valid_cards") === 0L)
    assert(out(1).getAs[String]("clean_text") === "no cards here 12345")
    assert(out(2).getAs[Long]("n_valid_cards") === 2L)
    assert(out(2).getAs[String]("clean_text") === "two: <CARD> and <CARD>")
  }

  // ---- kaplanMeier ---------------------------------------------------------

  test("kaplanMeier: hand-computed survival steps with per-step truncation") {
    import graft.operators.TemporalOps
    val exits = Seq((1L, 10L), (2L, 5L), (3L, 5L)).toDF("day", "n")
    val out = TemporalOps.kaplanMeier(exits, "day", "n")
      .orderBy(col("t")).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_churn"), r.getAs[Long]("surv_ppm"))).toSeq
    // risks: 20, 10, 5; S: 1e6*10/20=500000, *5/10=250000, *0/5=0
    assert(out === Seq((1L, 20L, 10L, 500000L), (2L, 10L, 5L, 250000L),
      (3L, 5L, 5L, 0L)))
    // per-step truncation: risks 3,2,1 -> 1e6*2/3 = 666666 (truncated),
    // then 666666*1/2 = 333333, then 0
    val thirds = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("day", "n")
    val t3 = TemporalOps.kaplanMeier(thirds, "day", "n")
      .orderBy(col("t")).collect().map(_.getAs[Long]("surv_ppm")).toSeq
    assert(t3 === Seq(666666L, 333333L, 0L))
  }

  // ---- rankSumAuc ----------------------------------------------------------

  test("rankSumAuc: hand-computed midrank ties, perfect separation, degenerate class") {
    // scores: pos {3, 2}, neg {2, 1}: pairs (3>2)=1, (3>1)=1, (2=2)=.5, (2>1)=1
    // AUC = 3.5/4 = 0.875
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false)).toDF("s", "y")
    val r = QualityOps.rankSumAuc(df, col("s"), col("y")).head()
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Long]("auc_ppm") === 875000L)
    val perfect = Seq((10L, true), (9L, true), (1L, false)).toDF("s", "y")
    assert(QualityOps.rankSumAuc(perfect, col("s"), col("y"))
      .head().getAs[Long]("auc_ppm") === 1000000L)
    val inverted = Seq((1L, true), (9L, false)).toDF("s", "y")
    assert(QualityOps.rankSumAuc(inverted, col("s"), col("y"))
      .head().getAs[Long]("auc_ppm") === 0L)
    val onlyPos = Seq((1L, true)).toDF("s", "y")
    assert(QualityOps.rankSumAuc(onlyPos, col("s"), col("y"))
      .head().getAs[Long]("auc_ppm") === 0L) // defined, not a divide error
  }

  // ---- streamingHllDistinct ------------------------------------------------

  test("streamingHllDistinct: cross-batch end-state equals the batch sketch; replays absorbed") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{HllEstimate, HllEvent}
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[HllEvent]
    val q = StatefulOps.streamingHllDistinct(ms.toDS())
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(StatefulOps.UpdateMode).start()
    val b1 = (1 to 300).map(i => HllEvent("a", s"value-$i")) :+ HllEvent("b", "x")
    val b2 = (200 to 500).map(i => HllEvent("a", s"value-$i"))
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable() // replayed batch
    q.stop()
    // per key: the LAST emitted estimate is the running state
    val last = spark.table("hll_out").as[HllEstimate].collect()
      .zipWithIndex.groupBy(_._1.key).map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
    val batch = SketchOps.hllDistinct(
      (b1 ++ b2).map(e => (e.key, e.value)).toDF("key", "v"), Seq("key"), "v")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("hll_est")).toMap
    assert(last("a").hll_est === batch("a"), "register maxima must match the batch sketch")
    assert(last("b").hll_est === batch("b"))
    // the replay moved n_values (diagnostic) but not the estimate
    assert(last("a").n_values === (b1.size - 1) + 2 * b2.size)
  }

  test("rankSumAuc: agrees with brute-force pair counting on random data") {
    val rows = (1 to 200).map { i =>
      val score = (i * 2654435761L) % 17 // heavy ties
      val label = ((i * 40503L) % 97) < 40
      (score, label)
    }
    val df = rows.toDF("s", "y")
    val got = QualityOps.rankSumAuc(df, col("s"), col("y")).head().getAs[Long]("auc_ppm")
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val want = u2 * 1000000L / (2L * pos.size * neg.size)
    assert(got === want)
  }
}
