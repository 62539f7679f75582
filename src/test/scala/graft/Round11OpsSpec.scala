package graft

import java.nio.file.Files

import graft.sink.Sinks
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pipeline hardening: the sub-batch marker scheme guard, the
  * strict NULL-partition-time mode, and T2 reachable from a running
  * stream.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
  private def batch(rows: (Long, String, Long, Boolean)*) =
    rows.toDF("id", "name", "off", Constants.DeleteCol)

  test("a target driven by the byte-capped path refuses a plain applyBatch resume (id schemes don't compare)") {
    val root = Files.createTempDirectory("graft_scheme").toString
    val b = batch((1L, "a", 1L, false), (2L, "b", 2L, false))
    CdcPipeline.applyBatchByteCapped(b, 0L, cfg, s"$root/t", maxBytes = 1L)
    // replay state is in __subbatch, NOT __batch
    assert(Files.exists(java.nio.file.Paths.get(s"$root/t__subbatch")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/t__batch")))
    val e = intercept[IllegalArgumentException] {
      CdcPipeline.applyBatch(batch((3L, "c", 3L, false)), 1L, cfg, s"$root/t")
    }
    assert(e.getMessage.contains("__subbatch") &&
      e.getMessage.contains("applyBatchByteCapped"))
    // explicit migration (the error's prescription) re-enables plain mode
    Files.delete(java.nio.file.Paths.get(s"$root/t__subbatch"))
    CdcPipeline.applyBatch(batch((3L, "c", 3L, false)), 1L, cfg, s"$root/t")
    assert(spark.read.parquet(s"$root/t").count() == 3)
  }

  test("plain-then-byte-capped transition is safe: fresh sub-batch ids re-merge idempotently") {
    val root = Files.createTempDirectory("graft_scheme2").toString
    CdcPipeline.applyBatch(batch((1L, "a", 1L, false)), 0L, cfg, s"$root/t")
    CdcPipeline.applyBatchByteCapped(batch((2L, "b", 2L, false)), 1L, cfg,
      s"$root/t", maxBytes = 1L)
    val rows = spark.read.parquet(s"$root/t").select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b")))
  }

  test("rejectNullTs: strict mode fails a batch with NULL partition times; default routes them to _default") {
    val root = Files.createTempDirectory("graft_nullts").toString
    val df = Seq((1L, Some("2024-03-05 00:00:00")), (2L, None))
      .toDF("id", "ts_raw").selectExpr("id", "CAST(ts_raw AS TIMESTAMP) AS ts")
    val e = intercept[IllegalArgumentException] {
      Sinks.softPartitionedAppend(df, s"$root/t", "ts",
        executionTime = Some(java.time.Instant.parse("2024-03-10T00:00:00Z")),
        rejectNullTs = true)
    }
    assert(e.getMessage.contains("NULL") && e.getMessage.contains("soft_partition.go"))
    // default: the documented deviation — NULL lands in the compacted table
    val targets = Sinks.softPartitionedAppend(df, s"$root/t", "ts",
      executionTime = Some(java.time.Instant.parse("2024-03-10T00:00:00Z")))
    assert(targets.contains(s"$root/t_default"))
    assert(spark.read.parquet(s"$root/t_default").count() == 1)
  }

  test("HashedShingles codegen expression is bit-equal to the declarative HOF form") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    // real corpus + crafted edges: trailing/double spaces (split(-1) keeps
    // empty trailing tokens), short docs (< n tokens), empty string
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .unionAll(Seq(("e1", "a b "), ("e2", "a  b"), ("e3", "ab"), ("e4", ""),
        ("e5", "one two three four five six")).toDF("id", "text"))
    for (n <- Seq(1, 3, 5)) {
      val both = docs.select(
        DedupOps.hashedShingleArrayFromText(col("text"), n).as("fast"),
        DedupOps.hashedShingleArrayFromTokens(split(col("text"), " "), n).as("slow"))
      assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0, s"n=$n")
    }
  }

  test("StringShingles codegen expression is bit-equal to the declarative HOF form") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .unionAll(Seq(("e1", "a b "), ("e2", "a  b"), ("e3", "ab"), ("e4", ""),
        ("e5", "one two three four five six")).toDF("id", "text"))
    for (n <- Seq(1, 2, 3, 5)) {
      val both = docs.select(
        DedupOps.stringShingleArrayFromText(col("text"), n).as("fast"),
        DedupOps.shingleArrayFromTokens(split(col("text"), " "), n).as("slow"))
      assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0, s"n=$n")
    }
    // the DOCUMENTED null-text divergence (expressions.scala StringShingles
    // scaladoc, ADVICE r12): the expression is null-in → null-out, the
    // declarative twin yields an empty array — equal again under the
    // prescribed coalesce, and both contribute zero rows through explode()
    // (every current call site)
    val nullDoc = Seq(("n1", Option.empty[String])).toDF("id", "text")
    val r = nullDoc.select(
      DedupOps.stringShingleArrayFromText(col("text"), 2).as("fast"),
      DedupOps.shingleArrayFromTokens(split(col("text"), " "), 2).as("slow")).head()
    assert(r.isNullAt(0) && r.getSeq[String](1).isEmpty)
    assert(nullDoc.select(explode(
      DedupOps.stringShingleArrayFromText(col("text"), 2))).count() == 0)
    assert(nullDoc.select(coalesce(
      DedupOps.stringShingleArrayFromText(col("text"), 2), array())
      .as("c")).head().getSeq[String](0).isEmpty)
  }

  test("distinct-fused shingle kernels are bit-equal to array_distinct over the plain form (r16)") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    // real corpus + crafted edges: heavy duplication ("a a a ..."), the
    // plain-form edge strings, and a doc whose duplicates are interleaved
    // (first-occurrence ORDER is part of the pin — ArrayDistinct keeps it)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .unionAll(Seq(("e1", "a b "), ("e2", "a  b"), ("e3", "ab"), ("e4", ""),
        ("e5", "a a a a a a"), ("e6", "x y x z y x w"),
        ("e7", "one two one two three one")).toDF("id", "text"))
    for (n <- Seq(1, 3, 5)) {
      val h = docs.select(
        DedupOps.distinctHashedShingleArrayFromText(col("text"), n).as("fused"),
        array_distinct(DedupOps.hashedShingleArrayFromText(col("text"), n)).as("two_pass"))
      assert(h.filter(not(col("fused") <=> col("two_pass"))).count() == 0, s"hashed n=$n")
      val s = docs.select(
        org.apache.spark.sql.GraftBridge.column(graft.functions.StringShingles(
          org.apache.spark.sql.GraftBridge.expression(col("text")), n, distinct = true)).as("fused"),
        array_distinct(DedupOps.stringShingleArrayFromText(col("text"), n)).as("two_pass"))
      assert(s.filter(not(col("fused") <=> col("two_pass"))).count() == 0, s"string n=$n")
    }
  }

  test("row-local SimhashFp30Sig is bit-equal to the exploded-aggregation signing") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      // < 2 tokens must DROP from both forms; multi-byte code points roll
      .unionAll(Seq(("e1", ""), ("e2", "one"), ("e3", "a b"), ("e4", "héllo wörld héllo"))
        .toDF("id", "text"))
    val fast = DedupOps.simhashFp30(docs, "id", "text")
    val slow = DedupOps.simhashFp30Agg(docs, "id", "text")
    assert(fast.count() == slow.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("row-local band signatures are bit-equal to the exploded-aggregation band path") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    val (k, bands) = (96, 48)
    val docArr = DedupOps.hashedDocArray(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", 3)
      .persist()
    try {
      val fast = DedupOps.rowLocalBandSignatures(docArr, k, bands, k / bands)
      val slow = DedupOps.bandSignatures(
        DedupOps.minhashSignaturesFromHashes(
          docArr.select(col("id"), explode(col("hs")).as("h")), k),
        bands, k / bands)
      assert(fast.count() == slow.count())
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    } finally { docArr.unpersist(); () }
  }

  test("startByteCapped: a running stream chunk-merges each micro-batch and survives more data") {
    val target = Files.createTempDirectory("graft_sbc").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_sbc_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, Boolean)]
    val decoded = ms.toDF().toDF("id", "name", "off", Constants.DeleteCol)
    val q = CdcPipeline.startByteCapped(decoded,
      cfg.copy(flushInterval = "1 seconds"), target, ckpt, maxBytes = 1L)
    // maxBytes=1 forces one chunk per row — the batch splits into many
    // sub-batch merges behind one trigger
    ms.addData((1L, "a", 1L, false), (2L, "b", 2L, false), (1L, "a2", 3L, false))
    q.processAllAvailable()
    ms.addData((3L, "c", 4L, false), (2L, "gone", 5L, true))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(target).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a2"), (3L, "c")))
    // the stream's replay state is sub-batch-schemed
    assert(Files.exists(java.nio.file.Paths.get(target + "__subbatch")))
  }
}
