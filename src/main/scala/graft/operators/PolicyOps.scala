package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline policy evaluation over logged interaction data — the replay
  * method (Li et al. 2011, "Unbiased Offline Evaluation of
  * Contextual-bandit-based News Article Recommendation"): a candidate
  * policy is scored on exactly the logged rounds where its choice
  * coincides with the logged action, whose observed reward is then an
  * unbiased sample of the policy's reward (under uniform logging).
  */
object PolicyOps {
  /** Replay-evaluate `policies` — (name, the arm that policy picks for
    * each logged row, as a Column over the input) — against the logged
    * `armCol`/`rewardCents`. Output one row per policy:
    * (policy, n_matched, sum_cents, avg_cents_e3) with the average as
    * an exact milli-cent integer (floor), 0 for a policy that never
    * matches. Ordered by policy name.
    *
    * Scale shape: one filtered single-row aggregate per policy over the
    * same scan (Spark shares the cached/source scan across the union;
    * policy count is small by nature). The match predicate and reward
    * are row-local codegen; the result is policies-sized. Policy-choice
    * columns needing their own windows/joins (a per-user sticky arm, a
    * broadcast best-arm) are built by the CALLER on the input frame —
    * this operator is the estimator, not the feature plumbing.
    */
  def replayEvaluate(logged: DataFrame, armCol: String, rewardCents: Column,
                     policies: Seq[(String, Column)]): DataFrame = {
    require(policies.nonEmpty, "replayEvaluate needs at least one policy")
    require(policies.map(_._1).distinct.length == policies.length,
      "policy names must be unique")
    policies.map { case (name, choice) =>
      logged.filter(col(armCol) === choice)
        .agg(count(lit(1)).as("n_matched"),
          coalesce(sum(rewardCents), lit(0L)).as("sum_cents"))
        .select(lit(name).as("policy"), col("n_matched"), col("sum_cents"),
          when(col("n_matched") > 0L,
            call_function("div", col("sum_cents") * 1000L, col("n_matched")))
            .otherwise(lit(0L)).as("avg_cents_e3"))
    }.reduce(_ unionByName _).orderBy(col("policy"))
  }

  /** Exact Shapley-value channel attribution (Shapley 1953 applied to
    * the marketing coalition game): each user contributes their exposed
    * channel SET; the coalition value v(S) counts converted users whose
    * set fits inside S, and each channel's credit is the exact Shapley
    * sum  φ_i = Σ_{S ∌ i} |S|!·(k−|S|−1)!/k! · (v(S∪i) − v(S)) —
    * reported scaled by k! so every value is an integer
    * (`phi_xkfact`; Σφ_xkfact = k!·(v(full) − v(∅)), the efficiency
    * identity the spec pins). The principled alternative to
    * position-rule attribution (q161/q192's first/linear-touch).
    *
    * Scale shape: the distributed work is ONE user-keyed aggregation to
    * (mask, converted); the 2^k coalition table is driver-bounded
    * metadata (k ≤ 12 enforced — channels are single digits by nature)
    * in the RangePrefix offsets tradition, and the combinatorial sum
    * runs exactly there in BigInt-free long arithmetic.
    */
  def shapleyAttribution(df: DataFrame, userCol: String, channelCol: String,
                         channels: Seq[String], conversion: Column): DataFrame = {
    require(channels.nonEmpty && channels.size <= 12,
      s"need 1..12 channels, got ${channels.size}")
    require(channels.distinct.size == channels.size, "channels must be distinct")
    val k = channels.size
    val spark = df.sparkSession
    import spark.implicits._
    val bitAggs = channels.zipWithIndex.map { case (ch, i) =>
      max(when(col(channelCol) === ch, 1L << i).otherwise(0L)).as(s"__b$i")
    } :+ max(when(conversion, 1L).otherwise(0L)).as("__cv")
    val perUser = df.groupBy(col(userCol))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select((0 until k).map(i => col(s"__b$i")).reduce(_ + _).as("__m"),
        col("__cv"))
    // masks-with-conversions: <= 2^k rows — driver-bounded metadata
    val mv = perUser.filter(col("__cv") === 1L)
      .groupBy(col("__m")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    val v = Array.tabulate(1 << k) { s =>
      mv.collect { case (m, n) if (m & s) == m => n }.sum
    }
    val fact = (0 to k).map(i => (1 to i).foldLeft(1L)(_ * _)).toArray
    val rows = channels.zipWithIndex.map { case (ch, i) =>
      val phi = (0 until (1 << k)).filter(s => (s >> i & 1) == 0).map { s =>
        val sz = java.lang.Integer.bitCount(s)
        fact(sz) * fact(k - sz - 1) * (v(s | (1 << i)) - v(s))
      }.sum
      (ch, phi)
    }
    rows.toDF("channel", "phi_xkfact").orderBy(col("channel"))
  }

  /** First-order Markov removal-effect attribution (Anderl et al. 2016
    * "Mapping the customer journey"): per-user journeys ordered by
    * `ordCols` and truncated at the first `conversion` event become a
    * transition matrix over {START, channels, CONV, NULL}; the chain's
    * conversion probability is read off by `rounds` bounded absorption
    * iterations p'(s) = ⌊Σ_t c(s,t)·p(t) / n(s)⌋ in exact ppm integers
    * (p(CONV)=1e6, p(NULL)=0), and each channel's removal effect pins
    * that channel's p to 0 (= redirecting its inbound edges to NULL)
    * over the SAME matrix. Output per channel: (channel, conv_ppm,
    * removal_ppm, effect_ppm = max(conv−removal, 0), attr_ppm =
    * ⌊1e6·effect / Σeffects⌋), ordered by channel.
    *
    * Scale shape: the distributed work is the journey windowing + ONE
    * (s, t)-keyed count aggregation; the matrix is ≤ (k+1)·(k+2) rows
    * (k ≤ 16 enforced — channels are an enum by nature), collected as
    * driver-bounded metadata in the [[shapleyAttribution]] tradition,
    * where all 1 + k absorption chains run in exact long arithmetic
    * (c·p ≤ rows·1e6 ≪ 2^63). The oracle unrolls identical rounds.
    */
  def markovAttribution(df: DataFrame, userCol: String, channelCol: String,
                        channels: Seq[String], conversion: String,
                        ordCols: Seq[Column], rounds: Int): DataFrame = {
    require(channels.nonEmpty && channels.size <= 16,
      s"need 1..16 channels, got ${channels.size}")
    require(channels.distinct.size == channels.size, "channels must be distinct")
    require(!channels.contains(conversion), "conversion cannot be a channel")
    require(rounds >= 1 && rounds <= 64, s"need 1..64 rounds, got $rounds")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(ordCols: _*)
    val wU = Window.partitionBy(col(userCol))
    val evs = df.filter(col(channelCol).isin(channels :+ conversion: _*))
      .withColumn("__rn", row_number().over(w))
    val trunc = evs
      .withColumn("__prn",
        min(when(col(channelCol) === conversion, col("__rn"))).over(wU))
      .filter(col("__prn").isNull || col("__rn") <= col("__prn"))
      .withColumn("__st", when(col(channelCol) === conversion, lit("CONV"))
        .otherwise(col(channelCol)))
    val wRn = Window.partitionBy(col(userCol)).orderBy(col("__rn"))
    val steps = trunc
      .withColumn("__s", coalesce(lag(col("__st"), 1).over(wRn), lit("START")))
      .select(col("__s").as("s"), col("__st").as("t"))
    val tails = trunc
      .withColumn("__mx", max(col("__rn")).over(wU))
      .filter(col("__rn") === col("__mx") && col("__st") =!= "CONV")
      .select(col("__st").as("s"), lit("NULL").as("t"))
    // transition matrix: <= (k+1)(k+2) rows — driver-bounded metadata
    val cnt = steps.unionByName(tails).groupBy(col("s"), col("t"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val nOut = cnt.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val sources = "START" +: channels
    def absorb(removed: Option[String]): Long = {
      var p: Map[String, Long] =
        (sources.map(_ -> 0L) :+ ("CONV" -> 1000000L) :+ ("NULL" -> 0L)).toMap
      for (_ <- 1 to rounds) {
        val np = sources.filterNot(removed.contains).map { s =>
          val n = nOut.getOrElse(s, 0L)
          val num = cnt.iterator.collect {
            case ((`s`, t), c) => c * p.getOrElse(t, 0L)
          }.sum
          s -> (if (n == 0L) 0L else Math.floorDiv(num, n))
        }
        p = p ++ np
      }
      p("START")
    }
    val full = absorb(None)
    val eff = channels.sorted.map { ch =>
      val r = absorb(Some(ch))
      (ch, r, math.max(full - r, 0L))
    }
    val tot = eff.map(_._3).sum
    import spark.implicits._
    eff.map { case (ch, r, e) =>
      (ch, full, r, e, if (tot > 0L) Math.floorDiv(1000000L * e, tot) else 0L)
    }.toDF("channel", "conv_ppm", "removal_ppm", "effect_ppm", "attr_ppm")
      .orderBy(col("channel"))
  }

  /** Off-policy value estimation battery (Dudík, Langford & Li 2011,
    * "Doubly Robust Policy Evaluation"): from a log of
    * (context, arm, reward), evaluate the self-derived GREEDY target
    * policy (per context, the arm with the highest exact-scaled mean
    * logged reward, arm-name tie-break) three ways —
    * v_logged (the behavior policy's own mean), v_ipw (inverse
    * propensity: matched rewards re-weighted by 1/p̂(arm|ctx)), and
    * v_dr (doubly robust: model mean m̂(ctx, best) plus the
    * propensity-weighted residual). All milli-cent integers with
    * per-row TRUNCATING divisions (Spark `div` and DuckDB `//` both
    * truncate toward zero — the house Theil-Sen note), so any engine
    * replays the estimate bit-for-bit. Complements
    * [[replayEvaluate]], which needs a uniform logger — IPW/DR correct
    * for the logger's actual arm distribution.
    *
    * Output per context: (context, n, best_arm, p_best_ppm,
    * v_logged_e3, v_ipw_e3, v_dr_e3), ordered by context.
    *
    * Scale shape: two (ctx[, arm])-keyed aggregations over the log, a
    * per-ctx argmax window PARTITIONED on the context (arms per ctx are
    * enum-sized), one equi-join of the log against the ctx-sized best
    * table, one final aggregation. Nothing global, nothing collected.
    */
  def offPolicyValue(df: DataFrame, ctxCol: String, armCol: String,
                     rewardCents: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val le = df.select(col(ctxCol).as("__ctx"), col(armCol).as("__arm"),
      rewardCents.cast("long").as("__r"))
    val cn = le.groupBy(col("__ctx")).agg(count(lit(1)).as("__n"))
    val ca = le.groupBy(col("__ctx"), col("__arm"))
      .agg(count(lit(1)).as("__na"), sum(col("__r")).as("__sr"))
      .join(cn, Seq("__ctx"))
      // clamped to >= 1 ppm (round-13 review): a best arm logged fewer
      // than once per million rows floored to 0 and every matched row's
      // IPW/DR term went NULL through the division — the clamp is the
      // standard IPW weight cap (here 1e6x), bounding variance instead
      // of emitting NULL estimates
      .withColumn("__p_ppm",
        greatest(lit(1L), call_function("div", lit(1000000L) * col("__na"), col("__n"))))
      .withColumn("__m_e3", call_function("div", lit(1000L) * col("__sr"), col("__na")))
    val wB = Window.partitionBy(col("__ctx"))
      .orderBy(col("__m_e3").desc, col("__arm"))
    val best = ca.withColumn("__rk", row_number().over(wB))
      .filter(col("__rk") === 1)
      .select(col("__ctx").as("__bctx"), col("__arm").as("__ba"),
        col("__p_ppm").as("__pb"), col("__m_e3").as("__mb"), col("__n"))
    val lg = ca.groupBy(col("__ctx"))
      .agg(call_function("div", lit(1000L) * sum(col("__sr")), max(col("__n"))).as("v_logged_e3"))
    val ag = le.join(best,
        col("__ctx") === col("__bctx") && col("__arm") === col("__ba"))
      .select(col("__ctx"),
        call_function("div", col("__r") * 1000000L, col("__pb")).as("__ipw_c"),
        call_function("div",
          (col("__r") * 1000L - col("__mb")) * 1000000L, col("__pb")).as("__dr_c"))
      .groupBy(col("__ctx"))
      .agg(sum(col("__ipw_c")).as("__sipw"), sum(col("__dr_c")).as("__sdr"))
    best.join(ag, col("__bctx") === ag("__ctx"))
      .join(lg, col("__bctx") === lg("__ctx"))
      .select(col("__bctx").as("context"), col("__n").as("n"),
        col("__ba").as("best_arm"), col("__pb").as("p_best_ppm"),
        col("v_logged_e3"),
        call_function("div", lit(1000L) * col("__sipw"), col("__n")).as("v_ipw_e3"),
        (col("__mb") + call_function("div", col("__sdr"), col("__n"))).as("v_dr_e3"))
      .orderBy(col("context"))
  }
}
