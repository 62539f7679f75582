package graft

import graft.operators.AsofOps
import graft.plans.AsofJoinNative
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of physical operator (graft.plans.AsofJoinExec) against
  * the union+window composition it must agree with verbatim.
  */
class AsofNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native as-of: hand-computed inclusive bounds, tie dedup, null handling") {
    val left = Seq(
      (1L, Some(10L), 100L), // matches right t=100 exactly (inclusive)
      (2L, Some(10L), 150L), // latest of t=100/140
      (3L, Some(10L), 99L),  // before all right rows -> null payload
      (4L, Some(20L), 500L), // key with no right rows -> null payload
      (5L, None: Option[Long], 100L) // null key: survives, unmatched
    ).toDF("id", "k", "lt")
    val right = Seq(
      (10L, 100L, 1L, "a"),
      (10L, 100L, 2L, "b"),  // same (key, time): highest tie (2, "b") wins
      (10L, 140L, 1L, "c"),
      (30L, 50L, 1L, "z")
    ).toDF("k", "rt", "tie", "v")
    val out = AsofJoinNative.asofJoin(left, right, "k", "lt", "rt", "tie", Seq("tie", "v"))
      .orderBy(col("id"))
      .select(col("id"), col("v")).as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(1L -> Some("b"), 2L -> Some("c"), 3L -> None,
      4L -> None, 5L -> None))
  }

  test("native as-of: right rows with NULL key or time are dropped; null-key left rows survive unmatched") {
    val left = Seq((1L, Some(10L), 100L), (2L, None, 100L)).toDF("id", "k", "lt")
    val right = Seq(
      (Some(10L), Some(90L), 1L, "ok"),
      (Some(10L), None, 2L, "null-time"),
      (None, Some(1L), 3L, "null-key")
    ).toDF("k", "rt", "tie", "v")
    val out = AsofJoinNative.asofJoin(left, right, "k", "lt", "rt", "tie", Seq("v"))
      .orderBy(col("id")).select(col("id"), col("v"))
      .as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(1L -> Some("ok"), 2L -> None))
  }

  test("native as-of ≡ union+window composition on randomized keys/times/ties") {
    // deterministic congruential stream; heavy key/time collisions on purpose
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val ls = lcg(7).drop(1).grouped(2).take(400).map { g =>
      (math.abs(g(0)) % 1000, math.abs(g(0)) % 13, math.abs(g(1)) % 40)
    }.toSeq
    val rs = lcg(99).drop(1).grouped(3).take(300).map { g =>
      (math.abs(g(0)) % 13, math.abs(g(1)) % 40, math.abs(g(2)) % 7,
        s"p${math.abs(g(2)) % 50}")
    }.toSeq
    val left = ls.toDF("id", "k", "lt").repartition(5)
    val right = rs.toDF("k", "rt", "tie", "v").repartition(3)
    val native = AsofJoinNative.asofJoin(left, right, "k", "lt", "rt", "tie", Seq("tie", "v"))
      .select(col("id"), col("k"), col("lt"), col("tie"), col("v"))
    val composed = AsofOps.asofJoin(left, right, "k", col("lt"), col("rt"), "tie", Seq("tie", "v"))
      .select(col("id"), col("k"), col("lt"), col("tie"), col("v"))
    val n = native.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val c = composed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(n.size === 400 && n === c)
  }

  test("native as-of plan: exactly two exchanges, co-partitioned merge, ordered output") {
    val left = (1 to 100).map(i => (i.toLong, (i % 7).toLong, (i % 11).toLong))
      .toDF("id", "k", "lt")
    val right = (1 to 50).map(i => ((i % 7).toLong, (i % 9).toLong, i.toLong, s"v$i"))
      .toDF("k", "rt", "tie", "v")
    val df = AsofJoinNative.asofJoin(left, right, "k", "lt", "rt", "tie", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native operator missing from plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    // the required (key, time) sorts ride below the operator
    assert("Sort \\[".r.findAllIn(plan).size === 2, s"expected 2 sorts:\n$plan")
  }

  test("native forward as-of ≡ composed forward on randomized data") {
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val ls = lcg(11).drop(1).grouped(2).take(300).map { g =>
      (math.abs(g(0)) % 1000, math.abs(g(0)) % 11, math.abs(g(1)) % 40)
    }.toSeq
    val rs = lcg(23).drop(1).grouped(3).take(200).map { g =>
      (math.abs(g(0)) % 11, math.abs(g(1)) % 40, math.abs(g(2)) % 7,
        s"p${math.abs(g(2)) % 50}")
    }.toSeq
    val left = ls.toDF("id", "k", "lt")
    val right = rs.toDF("k", "rt", "tie", "v")
    val native = AsofJoinNative.asofJoinForward(left, right, "k", "lt", "rt", "tie", Seq("tie", "v"))
      .select(col("id"), col("k"), col("lt"), col("tie"), col("v"))
    val composed = AsofOps.asofJoinForward(left, right, "k", col("lt"), col("rt"), "tie", Seq("tie", "v"))
      .select(col("id"), col("k"), col("lt"), col("tie"), col("v"))
    val n = native.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val c = composed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(n.size === 300 && n === c)
  }

  test("AsofFilterPushdown: left-only predicates reach the parquet scan; payload predicates stay above") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_pd").toString
    (1 to 200).map(i => (i.toLong, (i % 9).toLong, (i % 13).toLong, (i % 17).toLong))
      .toDF("id", "k", "lt", "extra").write.mode("overwrite").parquet(s"$dir/left")
    (1 to 80).map(i => ((i % 9).toLong, (i % 11).toLong, i.toLong, s"v$i"))
      .toDF("k", "rt", "tie", "v").write.mode("overwrite").parquet(s"$dir/right")
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    val joined = AsofJoinNative.asofJoin(l, r, "k", "lt", "rt", "tie", Seq("v"))
    val filtered = joined.filter(col("extra") > 5L && col("v").isNotNull)
    // the left-only conjunct pushed through the custom node all the way
    // into the parquet scan's PushedFilters; the payload conjunct stays
    // above the join (it must see NULLs for unmatched rows)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(extra,5)"),
      s"left-side predicate did not reach PushedFilters:\n$plan")
    val opt = filtered.queryExecution.optimizedPlan
    val asof = opt.collect { case a: graft.plans.AsofJoinPlan => a }.head
    assert(asof.left.toString.contains("extra"),
      s"pushed filter missing from the left subtree:\n$opt")
    // correctness: identical to filtering the composed join
    val want = AsofOps.asofJoin(l, r, "k", col("lt"), col("rt"), "tie", Seq("v"))
      .filter(col("extra") > 5L && col("v").isNotNull)
      .select(col("id"), col("v")).collect().map(_.toSeq).sortBy(_.mkString).toSeq
    val got = filtered.select(col("id"), col("v"))
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(got === want && got.nonEmpty)
  }

  test("AsofFilterPushdown pushes only the deterministic PREFIX (round-13 review)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_span").toString
    (1 to 50).map(i => (i.toLong, (i % 5).toLong, (i % 7).toLong))
      .toDF("id", "k", "lt").write.mode("overwrite").parquet(s"$dir/left")
    (1 to 20).map(i => ((i % 5).toLong, (i % 6).toLong, i.toLong, s"v$i"))
      .toDF("k", "rt", "tie", "v").write.mode("overwrite").parquet(s"$dir/right")
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    val joined = AsofJoinNative.asofJoin(l, r, "k", "lt", "rt", "tie", Seq("v"))
    // deterministic conjunct AFTER a nondeterministic one: pushing it
    // would change how many rows rand() evaluates over and shift the
    // seeded draw sequence (Catalyst's own span(_.deterministic) rule).
    // The comparison bound must not be foldable off rand's [0,1) range —
    // Spark simplifies `rand >= 0.0` to true, which WOULD make the other
    // conjunct legitimately pushable.
    val f = joined.filter(rand(42L) < 0.9999 && col("id") > 5L)
    val asof = f.queryExecution.optimizedPlan
      .collect { case a: graft.plans.AsofJoinPlan => a }.head
    // (Catalyst itself may push the INFERRED isnotnull(id) constraint —
    // that's standard constraint propagation, not our rule; the guarded
    // conjunct is the `> 5` comparison)
    assert(!asof.left.toString.contains("> 5"),
      s"conjunct after a nondeterministic one must NOT push:\n${f.queryExecution.optimizedPlan}")
    // prefix BEFORE the nondeterministic conjunct still pushes
    val f2 = joined.filter(col("id") > 5L && rand(42L) < 0.9999)
    val asof2 = f2.queryExecution.optimizedPlan
      .collect { case a: graft.plans.AsofJoinPlan => a }.head
    assert(asof2.left.toString.contains("> 5"),
      s"deterministic prefix should push:\n${f2.queryExecution.optimizedPlan}")
    // both shapes execute (the draw makes exact counts seed-dependent;
    // the plan assertions above are the contract)
    assert(f.count() <= joined.filter(col("id") > 5L).count())
    assert(f2.count() <= joined.filter(col("id") > 5L).count())
  }

  test("native as-of API guards: missing/mistyped columns, payload collisions") {
    val left = Seq((1L, 2L, 3L)).toDF("id", "k", "lt")
    val right = Seq((2L, 3, 4L, "x")).toDF("k", "rt", "tie", "v") // rt is INT
    val e1 = intercept[IllegalArgumentException] {
      AsofJoinNative.asofJoin(left, right, "k", "lt", "rt", "tie", Seq("v"))
    }
    assert(e1.getMessage.contains("time types differ"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinNative.asofJoin(left, right.withColumn("rt", col("rt").cast("long")),
        "k", "lt", "rt", "tie", Seq("id"))
    }
    assert(e2.getMessage.contains("no column") || e2.getMessage.contains("collide"))
  }
}
