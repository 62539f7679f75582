package graft

import java.nio.file.Files
import java.time.Instant

import graft.sink.{EmitSink, SinkRegistry}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The statement-emitting sink mode end-to-end: stage → DDL-reconcile →
  * ordered dialect plan (the reference's real operating shape,
  * clients/shared/merge.go:28-212), driven through micro-batches the way
  * the registry wires it.
  */
class EmitSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val now = Instant.parse("2026-08-15T00:00:00Z")
  private val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")

  private def batch0 = Seq(
    (1L, "alice", 1L, false),
    (1L, "alice2", 2L, false), // dup PK: staging must carry the LAST only
    (2L, "bob", 3L, false),
    (3L, "gone", 4L, true),
  ).toDF("id", "name", "off", Constants.DeleteCol)

  test("first flush: CREATE TABLE ddl, transient staging, merge, drop — and the staged TSV reads back deduped") {
    val dir = Files.createTempDirectory("graft_emit").toString
    val Some(eb) = EmitSink.emitBatch(batch0, 0L, cfg, "snowflake", dir, "db.s.users", now)

    // DDL reconcile: no recorded destination -> create, with PK-aware defs
    assert(eb.ddl.length == 1 &&
      eb.ddl.head.startsWith("CREATE TABLE IF NOT EXISTS db.s.users ("))
    assert(eb.ddl.head.contains("\"ID\" int") && eb.ddl.head.contains("\"NAME\" string"))

    // ordered plan: staging create -> MERGE -> staging drop
    assert(eb.plan.head.startsWith(
      s"CREATE TRANSIENT TABLE IF NOT EXISTS ${eb.stagingTable} ("))
    assert(eb.stagingTable.startsWith("db.s.users___artie_b0_"))
    assert(eb.plan(1).contains("MERGE INTO db.s.users tgt USING ( " + eb.stagingTable))
    assert(eb.plan.last == s"DROP TABLE IF EXISTS ${eb.stagingTable}")

    // staged artifact: canonical gzip TSV, read back via the S6 staging
    // view with the batch's schema — last-wins deduped (3 rows, not 4)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("off", LongType),
      StructField(Constants.DeleteCol, BooleanType)))
    val back = graft.sources.Sources.csvStagingView(spark, "emit_stage_rt",
      eb.stagedPath, schema)
    val rows = back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3)))
    assert(rows.toSeq == Seq((1L, "alice2", false), (2L, "bob", false), (3L, "gone", true)))

    // the plan is durable JSON
    val planJson = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_plans/batch=0.json")), "UTF-8")
    assert(planJson.contains("\"dialect\":\"snowflake\"") &&
      planJson.contains("MERGE INTO db.s.users"))
  }

  test("schema evolution: a new column emits ADD COLUMN; a same-batch replay re-emits it; a later batch emits none") {
    val dir = Files.createTempDirectory("graft_emit_evo").toString
    EmitSink.emitBatch(batch0, 0L, cfg, "snowflake", dir, "db.s.users", now)
    val b1 = Seq((4L, "dan", 5L, false, 30L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    val Some(eb1) = EmitSink.emitBatch(b1, 1L, cfg, "snowflake", dir, "db.s.users", now)
    assert(eb1.ddl == Seq("""ALTER TABLE db.s.users ADD COLUMN IF NOT EXISTS "AGE" int"""))
    // crash-replay of the SAME batch: the sidecar's #plan header re-emits
    // the consumed DDL so the plan-file overwrite cannot lose it
    // (ADVICE r12)
    val Some(eb1r) = EmitSink.emitBatch(b1, 1L, cfg, "snowflake", dir, "db.s.users", now)
    assert(eb1r.ddl == eb1.ddl && eb1r.plan == eb1.plan)
    // a LATER batch: the destination is known to have the column — like
    // the reference re-reading the live table config, the reconcile is a
    // no-op
    val Some(eb2) = EmitSink.emitBatch(b1, 2L, cfg, "snowflake", dir, "db.s.users", now)
    assert(eb2.ddl.isEmpty && eb2.plan.nonEmpty)
  }

  test("multi-step merge: a 3-flush cycle plans drop+create, accumulate, final merge (reference MSM protocol)") {
    val msmCfg = cfg.copy(msmSteps = 3)
    for (label <- Seq("snowflake", "duckdb")) {
      val dir = Files.createTempDirectory(s"graft_emit_msm_$label").toString
      val msm = "db.s.__artie_users_msm"
      // flush 0 (IsFirstFlush): DROP stale msm, CREATE msm, direct load —
      // no temp table, no merge statement
      val Some(f0) = EmitSink.emitBatchMsm(batch0, 0L, msmCfg, label, dir,
        "db.s.users", now)
      assert(f0.ddl.head.startsWith("CREATE TABLE"), f0.ddl)
      assert(f0.plan.head == s"DROP TABLE IF EXISTS $msm")
      assert(f0.plan(1).contains(s"TABLE") && f0.plan(1).contains(msm))
      assert(f0.stagingTable == msm, "first flush loads DIRECTLY into the msm table")
      assert(!f0.plan.exists(_.contains("MERGE INTO")), "no merge on the first flush")
      // flush 1: temp staging create -> two-arm accumulation merge
      // (keeps the __artie markers, no delete arm) -> temp drop
      val Some(f1) = EmitSink.emitBatchMsm(batch0, 1L, msmCfg, label, dir,
        "db.s.users", now)
      assert(f1.ddl.isEmpty)
      assert(f1.stagingTable.contains("___artie_b1_"))
      val accum = f1.plan.find(_.contains(s"MERGE INTO $msm")).get
      assert(accum.contains("WHEN MATCHED THEN UPDATE SET") &&
        !accum.contains("THEN DELETE"), accum)
      assert(accum.toLowerCase.contains("artie_delete"),
        "markers must accumulate in the msm table")
      assert(f1.plan.last == s"DROP TABLE IF EXISTS ${f1.stagingTable}")
      // crash-replay of the mid-cycle flush (before the next batch
      // commits) regenerates the identical plan at its ORIGINAL cycle
      // position — the flush counter does not advance
      val Some(f1r) = EmitSink.emitBatchMsm(batch0, 1L, msmCfg, label, dir,
        "db.s.users", now)
      assert(f1r.plan == f1.plan && f1r.ddl == f1.ddl)
      // flush 2 (IsLastFlush): accumulate, then the FULL merge (delete
      // arm) from the msm table into the target, then drop the msm table
      val Some(f2) = EmitSink.emitBatchMsm(batch0, 2L, msmCfg, label, dir,
        "db.s.users", now)
      val iAccum = f2.plan.indexWhere(_.contains(s"MERGE INTO $msm"))
      val iFinal = f2.plan.indexWhere(_.contains("MERGE INTO db.s.users"))
      val iDropMsm = f2.plan.indexOf(s"DROP TABLE IF EXISTS $msm")
      assert(iAccum >= 0 && iFinal > iAccum && iDropMsm == f2.plan.length - 1,
        f2.plan.mkString("\n"))
      assert(f2.plan(iFinal).contains("THEN DELETE"), "final merge applies deletes")
    }
    // non-MSM dialects fail with the reference's own contract
    val e = intercept[IllegalArgumentException] {
      EmitSink.emitBatchMsm(batch0, 0L, cfg.copy(msmSteps = 3), "redshift",
        Files.createTempDirectory("graft_emit_msm_rs").toString, "db.s.users", now)
    }
    assert(e.getMessage.contains("not implemented"))
  }

  test("multi-step merge: empty batches never consume a cycle slot; the flush counter drives positions (round-13 review)") {
    val msmCfg = cfg.copy(msmSteps = 3)
    val dir = Files.createTempDirectory("graft_emit_msm_empty").toString
    val msm = "db.s.__artie_users_msm"
    // complete one full cycle (batches 0-2): ends with DROP msm
    EmitSink.emitBatchMsm(batch0, 0L, msmCfg, "snowflake", dir, "db.s.users", now)
    EmitSink.emitBatchMsm(batch0, 1L, msmCfg, "snowflake", dir, "db.s.users", now)
    val Some(f2) = EmitSink.emitBatchMsm(batch0, 2L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    assert(f2.plan.last == s"DROP TABLE IF EXISTS $msm")
    // batch 3 is EMPTY: under the old batchId%msmSteps mapping it would
    // silently consume the cycle's FIRST slot and batch 4 would merge
    // into the dropped msm table
    val empty = batch0.filter(org.apache.spark.sql.functions.lit(false))
    assert(EmitSink.emitBatchMsm(empty, 3L, msmCfg, "snowflake", dir,
      "db.s.users", now).isEmpty)
    // batch 4 must open the NEW cycle: DROP stale msm + CREATE, no merge
    val Some(f4) = EmitSink.emitBatchMsm(batch0, 4L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    assert(f4.plan.head == s"DROP TABLE IF EXISTS $msm" &&
      !f4.plan.exists(_.contains("MERGE INTO")),
      s"empty batch must not consume the first-flush slot:\n${f4.plan.mkString("\n")}")
    // out-of-order batch ids fail loudly (cycle state can't regress)
    val e = intercept[IllegalArgumentException] {
      EmitSink.emitBatchMsm(batch0, 1L, msmCfg, "snowflake", dir, "db.s.users", now)
    }
    assert(e.getMessage.contains("cannot move backwards"))
  }

  test("multi-step merge: a lost __msmschema sidecar degrades to the batch's columns without duplicates (round-13 review)") {
    val msmCfg = cfg.copy(msmSteps = 2)
    val dir = Files.createTempDirectory("graft_emit_msm_lost").toString
    EmitSink.emitBatchMsm(batch0, 0L, msmCfg, "snowflake", dir, "db.s.users", now)
    // simulate the sidecar loss between flushes
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/__msmschema"))
    val Some(f1) = EmitSink.emitBatchMsm(batch0, 1L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    val finalMerge = f1.plan.find(_.contains("MERGE INTO db.s.users")).get
    // every column exactly once in the final merge's INSERT list (the old
    // getOrElse concat emitted each twice -> duplicate-assignment error)
    val insertCols = finalMerge.split("INSERT \\(")(1).split("\\)")(0).split(",")
    assert(insertCols.length == insertCols.distinct.length,
      s"duplicate columns in final merge: $finalMerge")
  }

  test("multi-step merge: a mid-cycle ADD COLUMN evolves target AND msm table; the final merge uses the accumulated set") {
    val msmCfg = cfg.copy(msmSteps = 3)
    val dir = Files.createTempDirectory("graft_emit_msm_evo").toString
    val msm = "db.s.__artie_users_msm"
    EmitSink.emitBatchMsm(batch0, 0L, msmCfg, "snowflake", dir, "db.s.users", now)
    val widened = Seq((4L, "dan", 5L, false, 30L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    val Some(f1) = EmitSink.emitBatchMsm(widened, 1L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    assert(f1.ddl == Seq("""ALTER TABLE db.s.users ADD COLUMN IF NOT EXISTS "AGE" int"""))
    assert(f1.plan.head == s"""ALTER TABLE $msm ADD COLUMN IF NOT EXISTS "AGE" int""")
    // last flush arrives WITHOUT the column: the final merge still
    // carries the msm table's accumulated AGE column
    val Some(f2) = EmitSink.emitBatchMsm(batch0, 2L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    val finalMerge = f2.plan.find(_.contains("MERGE INTO db.s.users")).get
    assert(finalMerge.contains("\"AGE\""), finalMerge)
  }

  test("multi-step merge: the cycle's hard-delete flag is STICKY across flushes and resets on flush 0 (ADVICE r13)") {
    // the reference's containsHardDeletes is set once (table_data.go:220)
    // and WipeData never clears it, so a mid-cycle hard delete still arms
    // the FINAL merge's flag even when the last flush is delete-free. The
    // two MSM dialects (snowflake/duckdb) always emit the conditional
    // DELETE arm, so the statement text can't witness the flag today
    // (dialect.go:55: "only used for Redshift") — this test pins the
    // PERSISTED per-cycle flag in the __msmflush sidecar, which is what
    // the final merge consumes should a flag-sensitive dialect ever join
    // msmLabels.
    val msmCfg = cfg.copy(msmSteps = 3)
    val dir = Files.createTempDirectory("graft_emit_msm_stickydel").toString
    val noDel = Seq((5L, "eve", 6L, false), (6L, "frank", 7L, false))
      .toDF("id", "name", "off", Constants.DeleteCol)
    def flushState = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/__msmflush")), "UTF-8")
    EmitSink.emitBatchMsm(noDel, 0L, msmCfg, "snowflake", dir, "db.s.users", now)
    assert(flushState == "0\t1\tfalse")
    // flush 1 carries the hard delete (batch0's id=3)
    EmitSink.emitBatchMsm(batch0, 1L, msmCfg, "snowflake", dir, "db.s.users", now)
    assert(flushState == "1\t2\ttrue")
    // flush 2 is delete-free — the OLD code read the flag from this
    // flush alone and built the final merge unarmed
    EmitSink.emitBatchMsm(noDel, 2L, msmCfg, "snowflake", dir, "db.s.users", now)
    assert(flushState == "2\t3\ttrue",
      "a mid-cycle hard delete must stay armed through the final flush")
    // the flag is PER-CYCLE: the next cycle's flush 0 resets it
    EmitSink.emitBatchMsm(noDel, 3L, msmCfg, "snowflake", dir, "db.s.users", now)
    assert(flushState == "3\t4\tfalse",
      "a delete-free cycle must not inherit the last cycle's flag")
  }

  test("multi-step merge: a shrunken mid-cycle row image updates ONLY its own columns (documented deviation from the reference's accumulated-set UPDATE)") {
    val msmCfg = cfg.copy(msmSteps = 3)
    val dir = Files.createTempDirectory("graft_emit_msm_shrunk").toString
    val widened = Seq((4L, "dan", 5L, false, 30L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    // flush 0 carries AGE (msm table created with it); flush 1's row
    // image has SHRUNK (no AGE). The reference's mid-cycle merge updates
    // the ACCUMULATED set, nulling AGE on matched rows; ours updates only
    // the batch's columns so accumulated state is never destroyed. This
    // test pins the deviation at its documented scope — it FAILS if the
    // accumulation merge silently widens to the accumulated set.
    EmitSink.emitBatchMsm(widened, 0L, msmCfg, "snowflake", dir, "db.s.users", now)
    val Some(f1) = EmitSink.emitBatchMsm(batch0, 1L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    val msm = "db.s.__artie_users_msm"
    val accum = f1.plan.find(_.contains(s"MERGE INTO $msm")).get
    assert(!accum.contains("\"AGE\""),
      s"mid-cycle accumulation must not touch columns absent from the batch:\n$accum")
    // the accumulated column still drives the FINAL merge (it lives in
    // the msm table and the __msmschema sidecar)
    val Some(f2) = EmitSink.emitBatchMsm(batch0, 2L, msmCfg, "snowflake", dir,
      "db.s.users", now)
    val finalMerge = f2.plan.find(_.contains("MERGE INTO db.s.users")).get
    assert(finalMerge.contains("\"AGE\""), finalMerge)
  }

  test("redshift via the registry label: the ordered UPDATE -> INSERT -> DELETE plan lands in the plan file") {
    val dir = Files.createTempDirectory("graft_emit_rs").toString + "/users"
    val sink = SinkRegistry.sink("emit:redshift", cfg)
    sink(batch0, 0L, dir)
    val planJson = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_plans/batch=0.json")), "UTF-8")
    val (u, i, d) = (planJson.indexOf("UPDATE users AS tgt"),
      planJson.indexOf("INSERT INTO users ("), planJson.indexOf("DELETE FROM users"))
    assert(u >= 0 && i > u && d > i, s"plan order wrong: $planJson")
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/_staging/batch=0")))
  }

  test("clickhouse: engine-merge dialect stages then plain-INSERTs into the ReplacingMergeTree") {
    val dir = Files.createTempDirectory("graft_emit_ch").toString
    val Some(eb) = EmitSink.emitBatch(batch0, 0L, cfg, "clickhouse", dir, "db.users", now)
    assert(eb.ddl.head.contains("ENGINE = ReplacingMergeTree(") &&
      eb.ddl.head.contains(s"`${Constants.DeleteCol}` UInt8"))
    assert(eb.plan.exists(s => s.startsWith("INSERT INTO db.users (") &&
      s.contains(s"FROM ${eb.stagingTable}")))
  }

  test("mysql staging drops the table prefix (identifier-cap special case); unknown emit labels fail loudly") {
    assert(EmitSink.stagingTableName("mysql", "db.t", 7L, now).startsWith("__artie_b7_"))
    assert(EmitSink.stagingTableName("postgres", "db.t", 7L, now).startsWith("db.t___artie_b7_"))
    val e = intercept[IllegalArgumentException](SinkRegistry.sink("emit:sqlite", cfg))
    assert(e.getMessage.contains("unknown emit dialect"))
  }

  test("a RUNNING stream through the emit label stages + plans every micro-batch") {
    val dir = Files.createTempDirectory("graft_emit_stream").toString + "/users"
    val ckpt = Files.createTempDirectory("graft_emit_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, Boolean)]
    val decoded = ms.toDF().toDF("id", "name", "off", Constants.DeleteCol)
    val sink = SinkRegistry.sink("emit:postgres", cfg)
    val q = decoded.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 seconds"))
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) => sink(b, id, dir) }
      .start()
    ms.addData((1L, "a", 1L, false), (2L, "b", 2L, false))
    q.processAllAvailable()
    ms.addData((1L, "a2", 3L, false))
    q.processAllAvailable()
    q.stop()
    // batch 0 created the destination; batch 1 reconciled to a no-op DDL
    val p0 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_plans/batch=0.json")), "UTF-8")
    val p1 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_plans/batch=1.json")), "UTF-8")
    assert(p0.contains("CREATE TABLE users (") && p0.contains("MERGE INTO users AS tgt"))
    assert(p1.contains("\"ddl\":[]") && p1.contains("MERGE INTO users AS tgt"))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/_staging/batch=1")))
  }

  test("empty batches are skipped (ShouldSkipUpdate analog)") {
    val dir = Files.createTempDirectory("graft_emit_empty").toString
    assert(EmitSink.emitBatch(batch0.limit(0), 0L, cfg, "snowflake", dir, "db.t", now).isEmpty)
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/_plans")))
  }
}
