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
}
