package graft

import java.nio.file.Files

import graft.cdc.Envelope
import graft.operators.CdcOps
import graft.streaming.{CdcPipeline, StatefulOps}
import graft.streaming.StatefulOps.KeyedChange
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the round-1 review findings. */
class ReviewRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q21/q22 release their persisted shingle index (round-2 bench leak)") {
    val sf = "/root/testdata/sf0.001"
    // other suites share this session and may legitimately leave cache
    // entries (e.g. DedupTextSpec's non-releasable wrappers) — start from
    // a clean slate so the assertion is about THESE query paths only
    spark.catalog.clearCache()
    SparkEntry.queries("q21_dedup_jaccard")(spark, sf).count()
    SparkEntry.queries("q22_dedup_minhash_lsh")(spark, sf).count()
    // the materialize-then-release lifecycle must leave the CacheManager
    // empty: a leaked MEMORY_AND_DISK index squats on executor storage for
    // every later query in the session (localCheckpoint blocks are NOT
    // CacheManager entries and are GC-reclaimed, so this stays precise)
    assert(spark.sharedState.cacheManager.isEmpty,
      "persisted intermediate leaked out of the q21/q22 query path")
  }

  test("soft-deleted base rows untouched by a batch keep their tombstone") {
    val base = Seq((1L, "gone", true), (2L, "live", false))
      .toDF("pk", "name", Constants.DeleteCol)
    val changes = Seq((2L, "live2", 1L, false))
      .toDF("pk", "name", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")), softDelete = true)
      .orderBy("pk").collect()
      .map(r => (r.getAs[Long]("pk"), r.getAs[String]("name"), r.getAs[Boolean](Constants.DeleteCol)))
    // pk=1 was not in the batch: its soft-delete flag must NOT reset
    assert(got.toSeq == Seq((1L, "gone", true), (2L, "live2", false)))
  }

  test("delete events inherit the previous row's values even over their own payload") {
    // reference table_data.go:180-189: Debezium may send zero/default (not
    // null) values on deletes -> previous buffered values win
    val df = Seq(
      (1L, 1L, "real", false), (1L, 2L, "zero-default", true),
    ).toDF("pk", "off", "v", "del")
    val got = CdcOps.deleteInherit(df, Seq("pk"), Seq(col("off")), "del", Seq("v"))
      .orderBy("off").collect().map(_.getString(2))
    assert(got.toSeq == Seq("real", "real"))
  }

  test("malformed envelope JSON is dropped, not decoded into phantom rows") {
    val rowSchema = StructType(Seq(StructField("id", LongType)))
    val df = Seq(
      ("""{"payload":{"before":null,"after":{"id":1},"source":{},"op":"c","ts_ms":0}}""", 0L),
      ("""{"payload":""", 1L),   // truncated
      ("""not json at all""", 2L),
      ("""{"something":"else"}""", 3L), // parses but no op
    ).toDF("value", "offset")
    val out = Envelope.decodeRelational(df, rowSchema).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id") == 1L)
  }

  test("snapshot swap recovers when a crash left only the demoted copy") {
    val target = Files.createTempDirectory("graft_swap").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    def batch(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "name", "off", Constants.DeleteCol)
        .withColumn(Constants.OperationCol, lit("u"))
    CdcPipeline.applyBatch(batch((1L, "a", 1L, false)), 0L, cfg, target)
    // simulate a crash between demote and promote: live dir renamed away
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(target), new Path(target + "__prev"))
    assert(!fs.exists(new Path(target)))
    // next batch must recover the demoted snapshot, not restart from scratch
    CdcPipeline.applyBatch(batch((2L, "b", 2L, false)), 1L, cfg, target)
    val got = spark.read.parquet(target).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("stateful dedup evicts deleted keys from the state store") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedChange]
    val q = StatefulOps.lastWinsStream(ms.toDS())
      .writeStream.format("memory").queryName("evict_out")
      .outputMode(OutputMode.Update()).start()
    ms.addData(KeyedChange("A", 1L, """{"v":1}""", deleted = false))
    q.processAllAvailable()
    ms.addData(KeyedChange("A", 2L, """{"v":2}""", deleted = true))
    q.processAllAvailable()
    // after eviction, a re-insert must NOT merge with the deleted payload
    ms.addData(KeyedChange("A", 3L, s"""{"v":"${Constants.ToastPlaceholder}"}""", deleted = false))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("evict_out").as[KeyedChange].collect().maxBy(_.off)
    // state was removed at off=2, so the toast value has nothing to inherit
    assert(last.off == 3L && last.payload.contains(Constants.ToastPlaceholder))
  }

  test("batch markers: stale replays skip, history mode does not duplicate") {
    val target = Files.createTempDirectory("graft_marker").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    def batch(rows: (Long, String, Long)*) =
      rows.toDF("id", "name", "off")
        .withColumn(Constants.DeleteCol, lit(false))
        .withColumn(Constants.OperationCol, lit("u"))
    CdcPipeline.applyBatch(batch((1L, "a", 1L)), 0L, cfg, target)
    // a DIFFERENT payload replayed under the same batch id must be ignored
    CdcPipeline.applyBatch(batch((1L, "CORRUPTING-REPLAY", 2L)), 0L, cfg, target)
    assert(spark.read.parquet(target).head.getAs[String]("name") == "a")

    val hist = Files.createTempDirectory("graft_hist2").toString + "/h"
    val hcfg = CdcPipeline.Config(Seq("id"), historyMode = true)
    CdcPipeline.applyBatch(batch((1L, "x", 1L)), 0L, hcfg, hist)
    CdcPipeline.applyBatch(batch((1L, "x", 1L)), 0L, hcfg, hist) // replay
    assert(spark.read.parquet(hist).count() == 1) // no duplicate append
  }

  test("pipeline evolves the snapshot when a column appears mid-stream") {
    val target = Files.createTempDirectory("graft_evolve").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    val v1 = Seq((1L, "a", 1L, false)).toDF("id", "name", "off", Constants.DeleteCol)
      .withColumn(Constants.OperationCol, lit("u"))
    CdcPipeline.applyBatch(v1, 0L, cfg, target)
    // connector restarts with a wider schema: `email` appears
    val v2 = Seq((2L, "b", "b@x.com", 2L, false))
      .toDF("id", "name", "email", "off", Constants.DeleteCol)
      .withColumn(Constants.OperationCol, lit("u"))
    CdcPipeline.applyBatch(v2, 1L, cfg, target)
    val out = spark.read.parquet(target).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), Option(r.getAs[String]("email"))))
    assert(out.toSeq == Seq((1L, "a", None), (2L, "b", Some("b@x.com"))))
  }

  test("pipeline-wired drop confidence: absent column becomes droppable after grace") {
    val target = Files.createTempDirectory("graft_drop").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val wide = Seq((1L, "a", 9.5, 1L, false)).toDF("id", "name", "score", "off", Constants.DeleteCol)
      .withColumn(Constants.OperationCol, lit("u"))
    CdcPipeline.applyBatch(wide, 0L, cfg, target) // snapshot has `score`
    val narrow = Seq((1L, "b", 2L, false)).toDF("id", "name", "off", Constants.DeleteCol)
    // first narrow observation starts the clock
    assert(CdcPipeline.observeColumnDrops(narrow, 1L, cfg, target, t0).isEmpty)
    // still inside grace
    assert(CdcPipeline.observeColumnDrops(narrow, 2L, cfg, target, t0.plusSeconds(3600)).isEmpty)
    // past grace -> droppable (state survived across the separate calls)
    assert(CdcPipeline.observeColumnDrops(narrow, 3L, cfg, target,
      t0.plusSeconds(5 * 3600)) == Seq("score"))
    // delete-only batch provides no drop evidence
    val delOnly = Seq((1L, "x", 3L, true)).toDF("id", "name", "off", Constants.DeleteCol)
    assert(CdcPipeline.observeColumnDrops(delOnly, 4L, cfg, target,
      t0.plusSeconds(6 * 3600)).isEmpty)
  }

  test("drop-confidence state survives a restart via sidecar persistence") {
    import graft.schema.SchemaEvolution
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val dc = new SchemaEvolution.DropConfidence(graceHours = 4)
    assert(dc.observe(Set("col_a"), t0, containsOtherOperations = true).isEmpty)
    val sidecar = Files.createTempDirectory("graft_dc").resolve("state.tsv")
    dc.save(sidecar)
    // restart: reload; the original absent-since timestamp must be kept,
    // so the grace window doesn't reset
    val dc2 = SchemaEvolution.DropConfidence.load(sidecar, graceHours = 4)
    assert(dc2.pending.keySet == Set("col_a"))
    assert(dc2.observe(Set("col_a"), t0.plusSeconds(5 * 3600),
      containsOtherOperations = true) == Seq("col_a"))
  }

  test("mergeApply evolves schema: new column adds, missing column keeps target") {
    val base = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("pk", "name", "score")
    // batch carries a NEW column `email` and LACKS `score`
    val changes = Seq((1L, "a2", "a@x.com", 1L, false), (3L, "c", "c@x.com", 2L, false))
      .toDF("pk", "name", "email", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")))
      .orderBy("pk").collect()
      .map(r => (r.getAs[Long]("pk"), r.getAs[String]("name"),
        Option(r.getAs[java.lang.Double]("score")), Option(r.getAs[String]("email"))))
    assert(got.toSeq == Seq(
      (1L, "a2", Some(1.5), Some("a@x.com")), // updated; score kept from target
      (2L, "b", Some(2.5), None),             // untouched; new col backfills null
      (3L, "c", None, Some("c@x.com"))))      // inserted; score null
  }

  test("mergeApply handles null PK values via presence markers") {
    val base = Seq((Some(1L), "a"), (None, "null-pk-row")).toDF("pk", "name")
    val changes = Seq((Option.empty[Long], "updated", 1L, false))
      .toDF("pk", "name", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")))
      .orderBy(asc_nulls_first("pk")).collect().map(_.getAs[String]("name"))
    // the null-PK base row is MATCHED (null-safe join) and updated,
    // not duplicated as a spurious insert
    assert(got.toSeq == Seq("updated", "a"))
  }

  test("novel-doc replay: a within-batch near-dup pair already appended by a crashed attempt is re-admitted, not lost") {
    val idx = java.nio.file.Files.createTempDirectory("graft_novel_replay").toString + "/idx"
    val text = "the quick brown fox jumps over the lazy dog again and again " * 4
    val batch = Seq((1L, text), (2L, text + " tail")) // near-dups of each other
      .toDF("doc_id", "text")
    graft.operators.DedupOps.buildMinhashIndex(
      Seq((100L, "completely unrelated corpus seed document about shipping routes"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    // attempt 1: both docs are novel vs the index -> admitted + appended
    val a1 = graft.streaming.StatefulOps.novelAgainstIndex(
      batch, "doc_id", "text", idx, 0.7)
    assert(a1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    graft.operators.DedupOps.appendToMinhashIndex(a1, "doc_id", "text", idx)
    // crash before sink/checkpoint; REPLAY of the same batch: each doc now
    // collides with the OTHER's index entry — the batch-membership screen
    // must re-admit both (attempt 1's exact result), not empty the batch
    val a2 = graft.streaming.StatefulOps.novelAgainstIndex(
      batch, "doc_id", "text", idx, 0.7)
    assert(a2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "replay must recompute attempt 1's admitted set")
    // and a LATER batch's near-dup of an admitted doc is still rejected
    val later = Seq((3L, text + " later arrival")).toDF("doc_id", "text")
    val a3 = graft.streaming.StatefulOps.novelAgainstIndex(
      later, "doc_id", "text", idx, 0.7)
    assert(a3.isEmpty, "cross-batch near-dup rejection must survive the fix")
  }

  test("streaming dedup operators fail loudly on non-integral id columns") {
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, java.sql.Timestamp)]
    val stream = ms.toDF().toDF("doc_id", "text", "ts")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StatefulOps.streamingExactNovelDocuments(
        stream, "doc_id", "text", "/tmp/never")((_, _) => ())
    }
    assert(e.getMessage.contains("integral") && e.getMessage.contains("xxhash64"))
  }

  test("byte-capped chunk assignment is a pure function of the data under orderCol ties") {
    // all offsets EQUAL: without tiebreakers the running-sum window order
    // is shuffle-fetch-dependent and chunk membership could differ
    // between a run and its crash replay
    val rows = (1L to 40L).map(i => (i, s"doc$i", 7L, false))
    val a = rows.toDF("id", "name", "off", Constants.DeleteCol)
    val b = scala.util.Random.shuffle(rows).toDF("id", "name", "off", Constants.DeleteCol)
      .repartition(7) // different physical layout, same data
    def chunksOf(df: org.apache.spark.sql.DataFrame) =
      graft.operators.CdcOps.byteCappedChunks(df,
          Seq(col("off"), col("id")), lit(1L), 5L)
        .select(col("id"), col("__chunk")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunksOf(a) == chunksOf(b))
  }

  test("rate limiter survives a corrupt far-future timestamp: no Long overflow, self-heals with the jump guard") {
    import graft.streaming.StatefulOps.{RateEvent, RateDecision}
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RateEvent]
    val out = scala.collection.mutable.ArrayBuffer.empty[RateDecision]
    val q = graft.streaming.StatefulOps
      .rateLimitStream(ms.toDS(), rate = 1L, periodMs = 100L, burst = 2L,
        maxClockJumpMs = 60_000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[RateDecision], _: Long) =>
        out ++= b.collect(); ()
      }.start()
    // two sane events, then a corrupt year-3000 timestamp, then sane again
    ms.addData(RateEvent("k", 1000L, 1L), RateEvent("k", 1100L, 2L))
    q.processAllAvailable()
    ms.addData(RateEvent("k", 32503680000000L, 3L)) // year 3000 — overflow bait
    q.processAllAvailable()
    ms.addData(RateEvent("k", 1200L, 4L), RateEvent("k", 1300L, 5L))
    q.processAllAvailable()
    q.stop()
    val byId = out.map(d => d.id -> d.admitted).toMap
    // the corrupt event refilled (no negative-token overflow) and was
    // admitted; the jump guard kept the refill clock anchored, so the
    // subsequent SANE events still refill and admit
    assert(byId(3L), "far-future event must not overflow tokens negative")
    assert(byId(4L) || byId(5L),
      s"sane events after the jump must not starve: $byId")
  }

  test("keepBestPerGroup keeps group rows whose score row is missing (left join, scored-first election)") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "canonical_id")
    // id 1's score row was lost upstream; id 3's whole component is unscored
    val scored = Seq((2L, 5L)).toDF("doc_id", "quality")
    val out = graft.operators.DedupOps.keepBestPerGroup(groups, scored, "doc_id",
      Seq(col("quality").desc))
      .select("id", "canonical_id", "kept_id", "kept")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    // ALL THREE group rows present (the old inner join dropped ids 1 and 3
    // silently); the scored member wins its component, and the unscored
    // singleton still elects itself
    assert(out.toSeq == Seq((1L, 2L, false), (2L, 2L, true), (3L, 3L, true)))
  }

  test("corrupt __nbuckets marker diagnoses itself instead of claiming the snapshot is un-bucketed") {
    val root = java.nio.file.Files.createTempDirectory("graft_nbuckets").toString
    val target = s"$root/t"
    val cfg = graft.streaming.CdcPipeline.Config(Seq("id"), orderCol = "off",
      numBuckets = 4)
    val b = Seq((1L, "a", 1L, false)).toDF("id", "name", "off", Constants.DeleteCol)
    graft.streaming.CdcPipeline.applyBatch(b, 0L, cfg, target) // healthy bucketed snapshot
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$target/__nbuckets"),
      "not-a-number".getBytes("UTF-8")) // marker corrupts (bit rot / partial restore)
    val e = intercept[IllegalStateException] {
      graft.streaming.CdcPipeline.applyBatch(
        Seq((2L, "b", 2L, false)).toDF("id", "name", "off", Constants.DeleteCol),
        1L, cfg, target)
    }
    assert(e.getMessage.contains("__nbuckets") && e.getMessage.contains("corrupt"),
      s"wrong diagnosis: ${e.getMessage}")
    // the UN-bucketed direction refuses too (round-13 review: it used to
    // read corruption as "no marker" and run a DESTRUCTIVE flat merge
    // over the bucketed root)
    val e0 = intercept[IllegalStateException] {
      graft.streaming.CdcPipeline.applyBatch(
        Seq((3L, "c", 3L, false)).toDF("id", "name", "off", Constants.DeleteCol),
        2L, cfg.copy(numBuckets = 0), target)
    }
    assert(e0.getMessage.contains("corrupt"), s"wrong diagnosis: ${e0.getMessage}")
  }

  test("byte-capped splitter over a plain merge sink fails loudly instead of poisoning the __batch marker (round-13 review)") {
    // composing applyBatchByteCappedWith with a marker-based sink would
    // record SYNTHETIC sub-batch ids into the plain __batch marker; the
    // scheme pin makes the inner applyBatch refuse through its own guard
    val target = java.nio.file.Files.createTempDirectory("graft_bcw").toString + "/t"
    val cfg = graft.streaming.CdcPipeline.Config(Seq("id"), orderCol = "off")
    val b = Seq((1L, "a", 1L, false)).toDF("id", "name", "off", Constants.DeleteCol)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.CdcPipeline.applyBatchByteCappedWith(b, 7L, cfg, target,
        maxBytes = 1L << 20,
        sink = (df, id, t) => graft.streaming.CdcPipeline.applyBatch(df, id, cfg, t))
    }
    assert(e.getMessage.contains("applyBatchByteCapped"), e.getMessage)
    // the intended composition still works: emit-style sinks ignore markers
    var seen = List.empty[Long]
    graft.streaming.CdcPipeline.applyBatchByteCappedWith(b, 7L, cfg, target,
      maxBytes = 1L << 20, sink = (_, id, _) => seen ::= id)
    assert(seen == List(7L * 1000000L))
  }

  test("reserved-namespace and ambiguity guards: __artie_only_set_delete data column, shadowed Kafka offset, keyless Config (round-13 review)") {
    import org.apache.spark.sql.types._
    // a data column named like the only-set-delete CONTROL flag must
    // refuse decode (mergeApply would silently reinterpret it)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField(Constants.OnlySetDeleteCol, BooleanType)))
    val df = Seq(("{}", 0L)).toDF("value", "offset")
    val e = intercept[IllegalArgumentException] {
      graft.cdc.Envelope.decodeRelational(df, schema)
    }
    assert(e.getMessage.contains(Constants.OnlySetDeleteCol))
    // a frame whose Kafka offset was shadow-renamed (__kafka_offset
    // present) with the default orderCol="offset" is ambiguous ordering
    val shadowed = Seq((1L, 5L, 9L)).toDF("id", "offset", "__kafka_offset")
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.CdcPipeline.applyRowTransforms(shadowed,
        graft.streaming.CdcPipeline.Config(Seq("id")))
    }
    assert(e2.getMessage.contains("__kafka_offset"))
    // keyless configs die at definition time, not at the first merge
    val e3 = intercept[IllegalArgumentException] {
      graft.streaming.CdcPipeline.Config(Nil)
    }
    assert(e3.getMessage.contains("primary key"))
  }

  test("partitionedParquet with tsCol=date partitions by the existing column as-is (round-13 review)") {
    val root = java.nio.file.Files.createTempDirectory("graft_pp").toString
    // a non-date-parseable key would have been nulled into
    // __HIVE_DEFAULT_PARTITION__ by the date_format re-derivation
    val df = Seq((1L, "k_2024/01"), (2L, "other")).toDF("id", "date")
    graft.sink.Sinks.partitionedParquet(df, root, "db.t", "date")
    val back = spark.read.parquet(s"$root/db.t")
    assert(back.count() == 2)
    assert(back.filter(org.apache.spark.sql.functions.col("date") === "k_2024/01").count() == 1)
    assert(back.filter(org.apache.spark.sql.functions.col("date").isNull).count() == 0)
  }

  test("decimal widening keeps integer-digit capacity (round-13 review)") {
    import org.apache.spark.sql.types._
    // max(p),max(s) would read DECIMAL(10,5): only 5 integer digits — a
    // legal 9-digit DECIMAL(10,0) value overflowed the merged type
    assert(graft.schema.SchemaEvolution.resolveType(
      DecimalType(10, 0), DecimalType(5, 5)) == DecimalType(15, 5))
    // past the 38 ceiling SCALE yields, never integer capacity (ADVICE
    // r13: the old precision cap kept scale 10 and left 28 integer
    // digits — a 29-digit value that fit DECIMAL(38,0) overflowed)
    assert(graft.schema.SchemaEvolution.resolveType(
      DecimalType(38, 0), DecimalType(10, 10)) == DecimalType(38, 0))
    assert(graft.schema.SchemaEvolution.resolveType(
      DecimalType(35, 0), DecimalType(10, 10)) == DecimalType(38, 3))
    val a = Seq(Tuple1(BigDecimal(123456789L))).toDF("v")
      .select(org.apache.spark.sql.functions.col("v").cast(DecimalType(10, 0)).as("v"))
    val b = Seq(Tuple1(BigDecimal("0.12345"))).toDF("v")
      .select(org.apache.spark.sql.functions.col("v").cast(DecimalType(5, 5)).as("v"))
    val u = graft.schema.SchemaEvolution.unionEvolve(a, b)
    assert(u.schema("v").dataType == DecimalType(15, 5))
    // the 9-integer-digit value survives the align cast
    assert(u.filter(org.apache.spark.sql.functions.col("v") >
      BigDecimal(123456788L)).count() == 1)
  }

  test("tCloseness counts NULL QI classes and NULL sensitive bands (round-13 review)") {
    import org.apache.spark.sql.functions._
    // two classes with IDENTICAL distributions — one keyed by NULL — must
    // read the same EMD; the name-list equi-join zeroed the NULL class's
    // cell counts and saturated its EMD
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L),
      (Option.empty[String], 1L), (Option.empty[String], 2L)
    ).toDF("zip", "v")
    val out = graft.operators.PrivacyOps.tCloseness(df, Seq("zip"), "v", 500000L)
      .select(col("emd_ppm")).collect().map(_.getLong(0)).toSeq
    assert(out.distinct.size == 1,
      s"NULL class must score like its identical twin: $out")
  }

  test("sampling guards: NULL interleave group fails loudly; negative weights drop from pps (round-13 review)") {
    import org.apache.spark.sql.functions._
    val withNull = Seq((1L, Some("a")), (2L, Option.empty[String])).toDF("id", "g")
    val e = intercept[IllegalArgumentException] {
      graft.operators.SamplingOps.interleaveSchedule(withNull, "g", "id", Seq(col("id")))
    }
    assert(e.getMessage.contains("NULL"))
    // one corrupt negative weight must not shift later items' intervals
    val w = Seq(("a", 5L), ("b", -3L), ("c", 4L)).toDF("id", "w")
    val out = graft.operators.SamplingOps.systematicPps(w, "id", "w", 3)
    assert(out.agg(sum(col("copies"))).head.getLong(0) == 3L,
      "sum(copies) == k must hold with corrupt weights filtered")
    assert(out.filter(col("id") === "b").count() == 0)
  }

  test("trackevents: extraFields' explicit null overwrites properties; the Kafka key rides through (round-13 review)") {
    import org.apache.spark.sql.functions._
    val payload = """{"event":"e","timestamp":"2024-01-01T00:00:00Z","messageID":"m1",""" +
      """"properties":{"plan":"pro"},"extraFields":{"plan":null}}"""
    val df = Seq((payload, "k1", 0L)).toDF("value", "key", "offset")
    val dec = graft.cdc.EventTracking.decodeTrackEvents(df)
    assert(dec.columns.contains("key"), "raw Kafka key must survive decode (GetPrimaryKey)")
    assert(dec.select(col("key")).head.getString(0) == "k1")
    val flat = graft.cdc.EventTracking.flattenTrackEvents(dec, Seq("plan"))
    // maps.Copy semantics: key-present-with-null OVERWRITES, not falls back
    assert(flat.select(col("plan")).head.isNullAt(0),
      "explicit extraFields null must overwrite the properties value")
  }
}
