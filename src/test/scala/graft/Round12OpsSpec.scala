package graft

import java.nio.file.Files
import java.time.Instant

import graft.sink.{DdlDialects, EmitSink, Sinks, SinkRegistry}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 emit-mode reference semantics: per-batch hard-delete gating
  * (table_data.go:215-221, redshift dialect.go:358-372), drop-column
  * through the 4 h confidence window + default-value backfill
  * (clients/shared/table.go:130-162, merge.go:109-144,
  * default_value.go:89-151), emit × multi-table demux
  * (processes/consumer/flush.go:67-147), and the soft-partition routing
  * clock pinned per batch for replay-exact classification.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val now = Instant.parse("2026-08-15T00:00:00Z")
  private val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")

  private def batch(rows: (Long, String, Long, Boolean)*) =
    rows.toDF("id", "name", "off", Constants.DeleteCol)

  // ---- containsHardDeletes gating -----------------------------------

  test("insert-only batch: redshift plan carries UPDATE + INSERT but NO DELETE (dialect.go:358-372)") {
    val dir = Files.createTempDirectory("graft_emit_nodel").toString
    val b = batch((1L, "a", 1L, false), (2L, "b", 2L, false))
    val Some(eb) = EmitSink.emitBatch(b, 0L, cfg, "redshift", dir, "db.s.t", now)
    assert(eb.plan.exists(_.startsWith("UPDATE db.s.t AS tgt")))
    assert(eb.plan.exists(_.startsWith("INSERT INTO db.s.t (")))
    assert(!eb.plan.exists(_.startsWith("DELETE FROM db.s.t")),
      s"insert-only batch must not arm the DELETE: ${eb.plan.mkString("\n")}")
  }

  test("a batch WITH a hard delete arms the redshift DELETE; soft-delete topics never do") {
    val dir = Files.createTempDirectory("graft_emit_del").toString
    val b = batch((1L, "a", 1L, false), (3L, "gone", 2L, true))
    val Some(eb) = EmitSink.emitBatch(b, 0L, cfg, "redshift", dir, "db.s.t", now)
    assert(eb.plan.exists(_.startsWith("DELETE FROM db.s.t")))
    // soft delete: the delete marker is DATA (merged as a column), not an op
    val dir2 = Files.createTempDirectory("graft_emit_soft").toString
    val Some(eb2) = EmitSink.emitBatch(b, 0L, cfg.copy(softDelete = true),
      "redshift", dir2, "db.s.t", now)
    assert(!eb2.plan.exists(_.startsWith("DELETE FROM db.s.t")))
  }

  // ---- drop-column confidence + backfill ----------------------------

  test("drop-column lifecycle: absent column waits out the 4 h window, never drops off delete-only batches") {
    val dir = Files.createTempDirectory("graft_emit_drop").toString
    // batch 0: schema carries `age` -> destination created with it
    val b0 = Seq((1L, "a", 1L, false, 30L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    EmitSink.emitBatch(b0, 0L, cfg, "snowflake", dir, "db.s.t", now)
    // batch 1: age absent -> candidate recorded, nothing dropped yet
    val Some(eb1) = EmitSink.emitBatch(batch((2L, "b", 2L, false)), 1L, cfg,
      "snowflake", dir, "db.s.t", now)
    assert(eb1.ddl.isEmpty, s"first absence must only start the clock: ${eb1.ddl}")
    // batch 2 (delete-only, inside the window at +2h): no evidence — the
    // clock must neither advance to a drop nor reset
    val Some(eb2) = EmitSink.emitBatch(batch((2L, "x", 3L, true)), 2L, cfg,
      "snowflake", dir, "db.s.t", now.plusSeconds(2 * 3600))
    assert(eb2.ddl.isEmpty)
    // batch 3 (delete-only, PAST the window at +5h): still no drop —
    // delete events may only carry PKs (table.go:130-141)
    val Some(eb3) = EmitSink.emitBatch(batch((2L, "y", 4L, true)), 3L, cfg,
      "snowflake", dir, "db.s.t", now.plusSeconds(5 * 3600))
    assert(eb3.ddl.isEmpty, s"delete-only batches must never drop: ${eb3.ddl}")
    // batch 4 (real rows, past the window): DROP COLUMN emitted, sidecar
    // advanced — batch 5 sees a clean schema and emits nothing
    val Some(eb4) = EmitSink.emitBatch(batch((5L, "e", 5L, false)), 4L, cfg,
      "snowflake", dir, "db.s.t", now.plusSeconds(5 * 3600))
    assert(eb4.ddl == Seq("""ALTER TABLE db.s.t DROP COLUMN IF EXISTS "AGE""""))
    val Some(eb5) = EmitSink.emitBatch(batch((6L, "f", 6L, false)), 5L, cfg,
      "snowflake", dir, "db.s.t", now.plusSeconds(6 * 3600))
    assert(eb5.ddl.isEmpty)
  }

  test("a reappearing column resets the drop clock") {
    val dir = Files.createTempDirectory("graft_emit_reappear").toString
    val withAge = Seq((1L, "a", 1L, false, 30L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    EmitSink.emitBatch(withAge, 0L, cfg, "postgres", dir, "db.s.t", now)
    EmitSink.emitBatch(batch((2L, "b", 2L, false)), 1L, cfg,
      "postgres", dir, "db.s.t", now) // clock starts
    // age comes back inside the window -> candidate cleared (the ADD is a
    // no-op: the sidecar still lists the column)
    val withAge2 = Seq((3L, "c", 3L, false, 31L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    val Some(ebBack) = EmitSink.emitBatch(withAge2, 2L, cfg,
      "postgres", dir, "db.s.t", now.plusSeconds(3600))
    assert(ebBack.ddl.isEmpty)
    // absent again: the clock must start OVER — +5h from the original
    // sighting is NOT enough
    EmitSink.emitBatch(batch((4L, "d", 4L, false)), 3L, cfg,
      "postgres", dir, "db.s.t", now.plusSeconds(2 * 3600))
    val Some(eb4) = EmitSink.emitBatch(batch((5L, "e", 5L, false)), 4L, cfg,
      "postgres", dir, "db.s.t", now.plusSeconds(5 * 3600))
    assert(eb4.ddl.isEmpty, s"reset clock must not have elapsed: ${eb4.ddl}")
  }

  test("add-with-default plans the dialect backfill after the staging create, before the merge") {
    val dir = Files.createTempDirectory("graft_emit_backfill").toString
    EmitSink.emitBatch(batch((1L, "a", 1L, false)), 0L, cfg, "snowflake",
      dir, "db.s.t", now)
    val b1 = Seq((2L, "b", 2L, false, 7L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    val Some(eb) = EmitSink.emitBatch(b1, 1L, cfg, "snowflake", dir, "db.s.t",
      now, defaults = Map("age" -> 0L))
    assert(eb.ddl == Seq("""ALTER TABLE db.s.t ADD COLUMN IF NOT EXISTS "AGE" int"""))
    val iStage = eb.plan.indexWhere(_.startsWith("CREATE TRANSIENT TABLE"))
    val iBackfill = eb.plan.indexOf(
      """UPDATE db.s.t as t SET t."AGE" = 0 WHERE t."AGE" IS NULL;""")
    val iMarker = eb.plan.indexOf(
      """COMMENT ON COLUMN db.s.t."AGE" IS '{"backfilled": true}';""")
    val iMerge = eb.plan.indexWhere(_.contains("MERGE INTO db.s.t")) // leading \n on the dialect text
    assert(iStage >= 0 && iBackfill > iStage && iMarker == iBackfill + 1 && iMerge > iMarker,
      s"backfill must sit between staging create and merge: ${eb.plan.mkString("\n")}")
    // crash-replay of the SAME batchId after the sidecar advanced must
    // re-emit the IDENTICAL plan — the sidecar's #plan header records the
    // consumed DDL/backfills so the plan-file overwrite cannot lose them
    // (ADVICE r12: an external executor may not have run the original yet)
    val Some(ebr) = EmitSink.emitBatch(b1, 1L, cfg, "snowflake", dir, "db.s.t",
      now, defaults = Map("age" -> 0L))
    assert(ebr.ddl == eb.ddl && ebr.plan == eb.plan,
      s"replayed batch 1 must regenerate the original plan:\n${ebr.plan.mkString("\n")}")
    // a LATER batch with the column known plans no DDL and no re-backfill
    val b2 = Seq((3L, "c", 3L, false, 8L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    val Some(eb2) = EmitSink.emitBatch(b2, 2L, cfg, "snowflake", dir, "db.s.t",
      now, defaults = Map("age" -> 0L))
    assert(eb2.ddl.isEmpty && !eb2.plan.exists(_.startsWith("UPDATE db.s.t as t SET")))
  }

  test("backfill statement forms: redshift alias-less, bigquery OPTIONS marker, postgres/duckdb none, string defaults quote-escaped") {
    import org.apache.spark.sql.types.{LongType, StringType}
    val rs = DdlDialects("redshift")
    assert(rs.backfillStatements("db.s.t", "age", rs.defaultValueSql(0L, LongType)) == Seq(
      """UPDATE db.s.t SET "age" = 0 WHERE "age" IS NULL;""",
      """COMMENT ON COLUMN db.s.t."age" IS '{"backfilled": true}';"""))
    val bq = DdlDialects("bigquery")
    // reference QuoteLiteral form (lib/sql/util.go:13): `\'`, not `''` —
    // BigQuery standard SQL rejects doubled-quote escaping
    assert(bq.backfillStatements("db.s.t", "note",
      bq.defaultValueSql("n/a's", StringType)) == Seq(
      "UPDATE db.s.t as t SET t.`note` = 'n/a\\'s' WHERE t.`note` IS NULL;",
      "ALTER TABLE db.s.t ALTER COLUMN `note` SET OPTIONS (description=`{\"backfilled\": true}`);"))
    // ADVICE r12: backslashes double (QuoteLiteral), control chars fail loudly
    assert(bq.defaultValueSql("a\\b", org.apache.spark.sql.types.StringType) == "'a\\\\b'")
    intercept[IllegalArgumentException](
      bq.defaultValueSql("a\nb", org.apache.spark.sql.types.StringType))
    assert(DdlDialects("postgres").backfillStatements("t", "c", "0").isEmpty)
    assert(DdlDialects("duckdb").backfillStatements("t", "c", "0").isEmpty)
    // Native-strategy dialects also emit nothing (default rides the DDL)
    assert(DdlDialects("mysql").backfillStatements("t", "c", "0").isEmpty)
    assert(DdlDialects("snowflake").defaultValueStrategy == DdlDialects.Backfill)
  }

  test("creates carry the reference's PRIMARY KEY part: plain, BigQuery NOT ENFORCED, DuckDB filtered, Spark omitted") {
    // destination AND staging creates (ddl.go:37 hardcodes createTable=true)
    val dir = Files.createTempDirectory("graft_emit_pk").toString
    val b = batch((1L, "a", 1L, false))
    val Some(eb) = EmitSink.emitBatch(b, 0L, cfg, "mysql", dir, "db.t", now)
    assert(eb.ddl.head.contains("PRIMARY KEY (`id`)"),
      s"mysql create must declare the PK its ON DUPLICATE KEY merge relies on: ${eb.ddl.head}")
    assert(eb.plan.head.contains("PRIMARY KEY (`id`)"), "staging create too")
    assert(DdlDialects("bigquery").primaryKeyClause(Seq("id")) ==
      Some("PRIMARY KEY (`id`) NOT ENFORCED"))
    assert(DdlDialects("spark").primaryKeyClause(Seq("id")).isEmpty)
    // DuckDB: the clause is HANDED to the builder and the builder drops it
    // (motherduck dialect.go:149 — appender flushes collide with PKs)
    val dd = DdlDialects("duckdb")
    val created = dd.createTable("t",
      Seq(dd.colDef("id", org.apache.spark.sql.types.LongType, isPk = true)) ++
        dd.primaryKeyClause(Seq("id")))
    assert(!created.contains("PRIMARY KEY"), created)
  }

  test("staging create keeps the DESTINATION's type when a batch column's type drifted (MergeColumnsFromDestination)") {
    val dir = Files.createTempDirectory("graft_emit_drift").toString
    EmitSink.emitBatch(batch((1L, "a", 1L, false)), 0L, cfg, "snowflake", dir, "db.t", now)
    // same column arrives as a STRING now — destination records int
    val drifted = Seq((2L, "b", "not-a-number", false))
      .toDF("id", "name", "off", Constants.DeleteCol)
    val Some(eb) = EmitSink.emitBatch(drifted, 1L, cfg.copy(orderCol = "off"),
      "snowflake", dir, "db.t", now)
    assert(eb.ddl.isEmpty, "type drift must not replan DDL (destination wins)")
    assert(eb.plan.head.contains("\"OFF\" int"),
      s"staging must carry the destination's recorded type: ${eb.plan.head}")
  }

  // ---- emit × multi-table demux -------------------------------------

  test("a running multi-table stream through emit sinks: 2 tables -> 2 staged dirs + 2 plans (flush.go:67-147)") {
    val root = Files.createTempDirectory("graft_emit_demux").toString
    val ckpt = Files.createTempDirectory("graft_emit_demux_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, Long, Boolean)]
    val decoded = ms.toDF()
      .toDF("id", "v", Constants.SourceMetadataCol, "off", Constants.DeleteCol)
    val q = CdcPipeline.startMultiTableWith(decoded, root, ckpt,
      t => SinkRegistry.sink("emit:postgres", cfg, emitTable = Some(t)),
      flushInterval = "1 seconds")
    ms.addData(
      (1L, "a", """{"table":"users"}""", 1L, false),
      (2L, "b", """{"table":"orders"}""", 2L, false),
      (3L, "c", """{"table":"orders"}""", 3L, true))
    q.processAllAvailable()
    q.stop()
    for (t <- Seq("users", "orders")) {
      assert(Files.exists(java.nio.file.Paths.get(s"$root/$t/_staging/batch=0")),
        s"missing staged dir for $t")
      val plan = new String(Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/$t/_plans/batch=0.json")), "UTF-8")
      assert(plan.contains(s"""CREATE TABLE $t (""") &&
        plan.contains(s"MERGE INTO $t AS tgt"))
    }
    // per-table schema state: each table got its own sidecar
    assert(Files.exists(java.nio.file.Paths.get(s"$root/users/__destschema")))
    assert(Files.exists(java.nio.file.Paths.get(s"$root/orders/__destschema")))
  }

  // ---- byte-capped x emit: the reference's complete flush loop ------

  test("byte-capped emit: a running stream stages + plans one statement series per cap crossing") {
    val dir = Files.createTempDirectory("graft_emit_cap").toString + "/users"
    val ckpt = Files.createTempDirectory("graft_emit_cap_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, Boolean)]
    val decoded = ms.toDF().toDF("id", "name", "off", Constants.DeleteCol)
    val sink = SinkRegistry.sink("emit:snowflake", cfg)
    // cost each row as 1 byte with a 2-byte cap -> 5 rows split at
    // exclusive-prefix-sum / 2 = chunks {0,0}, {1,1}, {2} — three chunks
    val q = CdcPipeline.startByteCappedWith(decoded, cfg.copy(flushInterval = "1 seconds"),
      dir, ckpt, maxBytes = 2L, sink, byteEstimate = Some(
        org.apache.spark.sql.functions.lit(1L)))
    ms.addData((1L, "a", 1L, false), (2L, "b", 2L, false), (3L, "c", 3L, false),
      (4L, "d", 4L, false), (5L, "e", 5L, false))
    q.processAllAvailable()
    q.stop()
    val plans = new java.io.File(s"$dir/_plans").listFiles().map(_.getName)
      .filter(_.matches("batch=\\d+\\.json")).sorted
    assert(plans.length == 3, s"expected 3 chunk plans, got ${plans.mkString(", ")}")
    val p0 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_plans/${plans.head}")), "UTF-8")
    val p2 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_plans/${plans.last}")), "UTF-8")
    // chunk 0 created the destination; later chunks reconciled to a no-op
    // DDL — the chunks flushed IN ORDER within the batch
    assert(p0.contains("CREATE TABLE IF NOT EXISTS users ("))
    assert(p2.contains("\"ddl\":[]") && p2.contains("MERGE INTO users tgt"))
    // every chunk staged
    plans.foreach { p =>
      val id = p.stripPrefix("batch=").stripSuffix(".json")
      assert(Files.exists(java.nio.file.Paths.get(s"$dir/_staging/batch=$id")))
    }
  }

  // ---- pinned soft-partition routing clock --------------------------

  test("pinned routing clock: a boundary-straddling replay re-routes exactly like attempt 1 — zero duplicates") {
    val root = Files.createTempDirectory("graft_pinclock").toString
    val base = s"$root/t"
    val df = Seq((1L, "2024-01-15 10:00:00"), (2L, "2024-02-01 00:30:00"))
      .toDF("id", "ts_raw").selectExpr("id", "CAST(ts_raw AS TIMESTAMP) AS ts")
    // seed attempt 1's clock: late January — the Feb row is FUTURE and
    // folds into _default under stream-survival routing
    Files.createDirectories(java.nio.file.Paths.get(root))
    Files.write(java.nio.file.Paths.get(s"${base}__execclock"),
      s"7\t${Instant.parse("2024-01-31T23:59:00Z").toEpochMilli}".getBytes("UTF-8"))
    val t1 = Sinks.softPartitionedAppend(df, base, "ts", batchId = Some(7L),
      rejectFuture = false, pinExecutionTime = true)
    assert(t1.toSet == Set(s"${base}_2024_01", s"${base}_default"))
    // replay (wall clock is 2026 now — unpinned it would reclassify the
    // Feb row current and append it to a fresh target): pinned, the
    // routing repeats and the per-target markers make it a no-op
    val t2 = Sinks.softPartitionedAppend(df, base, "ts", batchId = Some(7L),
      rejectFuture = false, pinExecutionTime = true)
    assert(t2.toSet == t1.toSet)
    assert(spark.read.parquet(s"${base}_2024_01").count() == 1)
    assert(spark.read.parquet(s"${base}_default").count() == 1)
    assert(!Files.exists(java.nio.file.Paths.get(s"${base}_2024_02")),
      "replay must not resurrect the future partition under a pinned clock")
  }

  test("first pinned attempt records (id, clock) in the single overwritten marker; a missing batchId fails loudly") {
    val root = Files.createTempDirectory("graft_pinclock2").toString
    val base = s"$root/t"
    val df = Seq((1L, "2024-01-15 10:00:00"))
      .toDF("id", "ts_raw").selectExpr("id", "CAST(ts_raw AS TIMESTAMP) AS ts")
    val t0 = System.currentTimeMillis()
    Sinks.softPartitionedAppend(df, base, "ts", batchId = Some(3L),
      rejectFuture = false, pinExecutionTime = true)
    val Array(id, ms) = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${base}__execclock")), "UTF-8").trim.split("\t", 2)
    // round-trip, not wall-clock comparison against a constant: the
    // marker holds this attempt's id and an instant from this run
    assert(id.toLong == 3L)
    assert(ms.toLong >= t0 && ms.toLong <= System.currentTimeMillis())
    // a NEW batch id overwrites the marker (bounded state: ONE file)
    Sinks.softPartitionedAppend(df, base, "ts", batchId = Some(4L),
      rejectFuture = false, pinExecutionTime = true)
    val after = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${base}__execclock")), "UTF-8")
    assert(after.startsWith("4\t"))
    val e = intercept[IllegalArgumentException] {
      Sinks.softPartitionedAppend(df, base, "ts", batchId = None,
        rejectFuture = false, pinExecutionTime = true)
    }
    assert(e.getMessage.contains("batchId"))
  }

  test("a torn __execclock marker re-pins instead of wedging the stream") {
    val root = Files.createTempDirectory("graft_pinclock3").toString
    val base = s"$root/t"
    Files.createDirectories(java.nio.file.Paths.get(root))
    Files.write(java.nio.file.Paths.get(s"${base}__execclock"),
      Array.empty[Byte]) // crash left a zero-byte marker before any append
    val df = Seq((1L, "2024-01-15 10:00:00"))
      .toDF("id", "ts_raw").selectExpr("id", "CAST(ts_raw AS TIMESTAMP) AS ts")
    // must not throw: torn marker means attempt 1 routed nothing — a
    // fresh pin is safe, a strict parse would fail->replay->fail forever
    Sinks.softPartitionedAppend(df, base, "ts", batchId = Some(5L),
      rejectFuture = false, pinExecutionTime = true)
    val after = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${base}__execclock")), "UTF-8")
    assert(after.startsWith("5\t"))
  }

  test("NULL delete flags count as NOT deleted for the batch flags (COALESCE semantics)") {
    val dir = Files.createTempDirectory("graft_emit_nullflag").toString
    // an upsert batch whose delete flag is NULL everywhere: must read as
    // containing OTHER operations (clock evidence) and NO hard deletes
    val b = Seq((1L, "a", 1L), (2L, "b", 2L))
      .toDF("id", "name", "off")
      .withColumn(Constants.DeleteCol,
        org.apache.spark.sql.functions.lit(null).cast("boolean"))
    val Some(eb) = EmitSink.emitBatch(b, 0L, cfg, "redshift", dir, "db.s.t", now)
    assert(!eb.plan.exists(_.startsWith("DELETE FROM db.s.t")),
      "NULL flags must not arm the DELETE")
    // and the same batch advances the drop clock (containsOtherOperations):
    // seed: create with `age`, then two NULL-flag batches without it 5h apart
    val dir2 = Files.createTempDirectory("graft_emit_nullflag2").toString
    val withAge = Seq((1L, "a", 1L, 30L)).toDF("id", "name", "off", "age")
      .withColumn(Constants.DeleteCol, org.apache.spark.sql.functions.lit(null).cast("boolean"))
    EmitSink.emitBatch(withAge, 0L, cfg, "postgres", dir2, "db.s.t", now)
    val noAge = Seq((2L, "b", 2L)).toDF("id", "name", "off")
      .withColumn(Constants.DeleteCol, org.apache.spark.sql.functions.lit(null).cast("boolean"))
    EmitSink.emitBatch(noAge, 1L, cfg, "postgres", dir2, "db.s.t", now)
    val Some(eb2) = EmitSink.emitBatch(noAge, 2L, cfg, "postgres", dir2, "db.s.t",
      now.plusSeconds(5 * 3600))
    assert(eb2.ddl == Seq("""ALTER TABLE db.s.t DROP COLUMN IF EXISTS "age""""))
  }

  test("delete-only batches never mutate drop candidates; evidence-batch reappearance purges (ADVICE r12, reference-faithful)") {
    // The reference's ShouldDeleteColumn leaves columnsToDelete untouched
    // when !containsOtherOperations — a delete-only batch whose full row
    // image carries the column must NOT purge the standing candidate
    // (alternating hard-delete/absence traffic would defer the drop
    // forever), and the clock runs on uninterrupted.
    val dir = Files.createTempDirectory("graft_emit_stale").toString
    val withAge = Seq((1L, "a", 1L, false, 30L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    EmitSink.emitBatch(withAge, 0L, cfg, "postgres", dir, "db.s.t", now)
    // absent on an evidence batch -> candidate (clock t0)
    EmitSink.emitBatch(batch((2L, "b", 2L, false)), 1L, cfg,
      "postgres", dir, "db.s.t", now)
    // a DELETE-ONLY batch whose schema carries `age`: NO evidence either
    // way — the candidate and its t0 clock survive
    val delWithAge = Seq((1L, "x", 3L, true, 31L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    EmitSink.emitBatch(delWithAge, 2L, cfg, "postgres", dir, "db.s.t",
      now.plusSeconds(3600))
    EmitSink.emitBatch(batch((4L, "d", 4L, false)), 3L, cfg,
      "postgres", dir, "db.s.t", now.plusSeconds(2 * 3600))
    val Some(eb4) = EmitSink.emitBatch(batch((5L, "e", 5L, false)), 4L, cfg,
      "postgres", dir, "db.s.t", now.plusSeconds(5 * 3600))
    // 5h after the ORIGINAL clock (> 4h window): the drop FIRES
    assert(eb4.ddl == Seq("""ALTER TABLE db.s.t DROP COLUMN IF EXISTS "age""""),
      s"delete-only presence must not reset the drop clock: ${eb4.ddl}")

    // reappearance on an EVIDENCE batch is positive schema evidence: the
    // stale candidate purges and a later absence starts a FRESH window
    val dir2 = Files.createTempDirectory("graft_emit_stale2").toString
    EmitSink.emitBatch(withAge, 0L, cfg, "postgres", dir2, "db.s.t", now)
    EmitSink.emitBatch(batch((2L, "b", 2L, false)), 1L, cfg,
      "postgres", dir2, "db.s.t", now)
    val liveWithAge = Seq((1L, "y", 5L, false, 32L))
      .toDF("id", "name", "off", Constants.DeleteCol, "age")
    EmitSink.emitBatch(liveWithAge, 2L, cfg, "postgres", dir2, "db.s.t",
      now.plusSeconds(3600))
    EmitSink.emitBatch(batch((4L, "d", 4L, false)), 3L, cfg,
      "postgres", dir2, "db.s.t", now.plusSeconds(2 * 3600))
    val Some(eb5) = EmitSink.emitBatch(batch((5L, "e", 5L, false)), 4L, cfg,
      "postgres", dir2, "db.s.t", now.plusSeconds(5 * 3600))
    // 5h after the ORIGINAL clock, but only 3h after the fresh one: no drop
    assert(eb5.ddl.isEmpty,
      s"stale candidate must not survive an evidence-batch reappearance: ${eb5.ddl}")
  }
}
