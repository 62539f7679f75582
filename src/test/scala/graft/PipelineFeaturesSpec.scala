package graft

import java.nio.file.{Files, Paths}

import graft.cdc.{Envelope, SchemaDispatch}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 pipeline features: bucketed snapshot sink, multi-table topic
  * demux, and the TopicConfig parity knobs (include-list, PK override,
  * updated-at markers, routing-key strip, schema defaults -> backfill).
  */
class PipelineFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fileHashes(rootStr: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(rootStr)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_)).map { p =>
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
      root.relativize(p).toString -> java.util.Base64.getEncoder.encodeToString(md5)
    }.toMap
  }

  test("bucketed sink rewrites only touched buckets; untouched files stay byte-identical") {
    val root = Files.createTempDirectory("graft_bucket").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off", numBuckets = 4)
    def batch(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "name", "off", Constants.DeleteCol)
    CdcPipeline.applyBatch(batch(
      (1L, "a", 1L, false), (2L, "b", 1L, false), (3L, "c", 1L, false), (4L, "d", 1L, false),
      (5L, "e", 1L, false), (6L, "f", 1L, false), (7L, "g", 1L, false), (8L, "h", 1L, false)),
      0L, cfg, root)
    val touched = Seq(1L).toDF("id")
      .select(pmod(hash(col("id")), lit(4)).as("b")).head.getInt(0)
    val before = fileHashes(root)
    assert(before.keys.exists(_.startsWith(s"bucket$touched/")))
    assert(before.keys.exists(k => !k.startsWith(s"bucket$touched/"))) // >1 bucket seeded

    CdcPipeline.applyBatch(batch((1L, "a2", 2L, false)), 1L, cfg, root)
    val after = fileHashes(root)
    val untouchedBefore = before.filterNot(_._1.startsWith(s"bucket$touched/"))
    untouchedBefore.foreach { case (k, v) =>
      assert(after.get(k).contains(v), s"untouched file $k changed")
    }
    assert(after.view.filterKeys(_.startsWith(s"bucket$touched/")).toMap !=
      before.view.filterKeys(_.startsWith(s"bucket$touched/")).toMap)

    val all = CdcPipeline.readBucketedSnapshot(spark, root).get
    assert(all.count() == 8)
    assert(all.filter(col("id") === 1).head.getAs[String]("name") == "a2")
    // replay of batch 1 is a no-op (marker)
    val snap = fileHashes(root)
    CdcPipeline.applyBatch(batch((1L, "CORRUPT", 3L, false)), 1L, cfg, root)
    assert(fileHashes(root) == snap)
  }

  test("one MemoryStream carrying two tables lands in two correct snapshots") {
    val rowSchema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    def env(table: String, op: String, id: Long, v: String) =
      s"""{"payload":{"before":null,"after":{"id":$id,"v":"$v"},"source":{"table":"$table"},"op":"$op","ts_ms":0}}"""
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val decoded = Envelope.decodeRelational(ms.toDF().toDF("value", "offset"), rowSchema)
    val root = Files.createTempDirectory("graft_demux").toString
    val ckpt = Files.createTempDirectory("graft_demux_ckpt").toString
    val q = CdcPipeline.startMultiTable(decoded,
      _ => CdcPipeline.Config(Seq("id"), flushInterval = "1 seconds"), root, ckpt)
    try {
      ms.addData((env("users", "c", 1, "u1"), 0L), (env("orders", "c", 1, "o1"), 1L),
        (env("users", "u", 1, "u2"), 2L), (env("orders", "c", 2, "o2"), 3L))
      q.processAllAvailable()
    } finally q.stop()
    val users = spark.read.parquet(s"$root/users")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val orders = spark.read.parquet(s"$root/orders")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(users == Set((1L, "u2"))) // last-wins across the batch
    assert(orders == Set((1L, "o1"), (2L, "o2")))
  }

  test("columnsToInclude keeps allow-list + artie/static/pk/order columns only") {
    val df = Seq((1L, "x", "y", 5L, "c", false))
      .toDF("id", "keep", "dropme", "offset", Constants.OperationCol, Constants.DeleteCol)
    val cfg = CdcPipeline.Config(Seq("id"),
      columnsToInclude = Seq("keep"), staticColumns = Map("src" -> "s1"))
    val out = CdcPipeline.applyRowTransforms(df, cfg)
    assert(out.columns.toSet ==
      Set("id", "keep", "offset", Constants.OperationCol, Constants.DeleteCol, "src"))
    assert(out.select("src").head.getString(0) == "s1")
  }

  test("primaryKeysOverride wins over key-derived keys; encryption ban follows it") {
    val cfg = CdcPipeline.Config(Seq("key_id"), primaryKeysOverride = Seq("real_id"))
    assert(cfg.effectivePrimaryKeys == Seq("real_id"))
    assertThrows[IllegalArgumentException] {
      CdcPipeline.Config(Seq("key_id"), primaryKeysOverride = Seq("real_id"),
        columnsToEncrypt = Seq("real_id"), encryptionKey = Some("0123456789abcdef"))
    }
    // the non-overridden key may be encrypted once the override is active
    CdcPipeline.Config(Seq("key_id"), primaryKeysOverride = Seq("real_id"),
      columnsToEncrypt = Seq("key_id"), encryptionKey = Some("0123456789abcdef"))
  }

  test("__artie_updated_at / __artie_db_updated_at injected when configured") {
    val df = Seq((1L, "a", 123456789L, "c"))
      .toDF("id", "v", "__source_ts_ms", Constants.OperationCol)
    val out = CdcPipeline.applyRowTransforms(df,
      CdcPipeline.Config(Seq("id"), includeArtieUpdatedAt = true, includeDatabaseUpdatedAt = true))
    assert(out.columns.contains(Constants.UpdatedAtCol))
    val dbTs = out.select(Constants.DbUpdatedAtCol).head.getTimestamp(0)
    assert(dbTs.toInstant.toEpochMilli == 123456789L)
    // off by default
    val plain = CdcPipeline.applyRowTransforms(df, CdcPipeline.Config(Seq("id")))
    assert(!plain.columns.contains(Constants.UpdatedAtCol))
    assert(!plain.columns.contains(Constants.DbUpdatedAtCol))
  }

  test("__dbz__physicalTableIdentifier is stripped from JSON key parsing") {
    val keySchema = StructType(Seq(StructField("id", LongType),
      StructField(Constants.DebeziumTopicRoutingKey, StringType)))
    val keys = Seq(
      s"""{"id": 7, "${Constants.DebeziumTopicRoutingKey}": "server1.db.t"}""",
      s"""{"payload": {"id": 8, "${Constants.DebeziumTopicRoutingKey}": "server1.db.t"}}""",
    ).toDF("key").select(Envelope.parseJsonKey(col("key"), keySchema).as("k"))
    assert(keys.select("k.*").columns.toSeq == Seq("id"))
    assert(keys.select(col("k.id")).collect().map(_.getLong(0)).toSeq == Seq(7L, 8L))
  }

  test("bucketed sink refuses a numBuckets change that would strand rows") {
    val root = Files.createTempDirectory("graft_bucket_n").toString + "/t"
    def batch(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "name", "off", Constants.DeleteCol)
    CdcPipeline.applyBatch(batch((1L, "a", 1L, false)), 0L,
      CdcPipeline.Config(Seq("id"), orderCol = "off", numBuckets = 4), root)
    val e = intercept[IllegalArgumentException] {
      CdcPipeline.applyBatch(batch((2L, "b", 2L, false)), 1L,
        CdcPipeline.Config(Seq("id"), orderCol = "off", numBuckets = 8), root)
    }
    assert(e.getMessage.contains("numBuckets=4"))
  }

  test("bucketed sink refuses layout mode transitions in both directions") {
    def batch(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "name", "off", Constants.DeleteCol)
    // un-bucketed -> bucketed: existing plain rows would become invisible
    val plain = Files.createTempDirectory("graft_mode1").toString + "/t"
    CdcPipeline.applyBatch(batch((1L, "a", 1L, false)), 0L,
      CdcPipeline.Config(Seq("id"), orderCol = "off"), plain)
    assert(intercept[IllegalArgumentException] {
      CdcPipeline.applyBatch(batch((2L, "b", 2L, false)), 1L,
        CdcPipeline.Config(Seq("id"), orderCol = "off", numBuckets = 4), plain)
    }.getMessage.contains("un-bucketed"))
    // bucketed -> un-bucketed: the bucket dirs would be misread
    val bucketed = Files.createTempDirectory("graft_mode2").toString + "/t"
    CdcPipeline.applyBatch(batch((1L, "a", 1L, false)), 0L,
      CdcPipeline.Config(Seq("id"), orderCol = "off", numBuckets = 4), bucketed)
    assert(intercept[IllegalArgumentException] {
      CdcPipeline.applyBatch(batch((2L, "b", 2L, false)), 1L,
        CdcPipeline.Config(Seq("id"), orderCol = "off"), bucketed)
    }.getMessage.contains("bucketed"))
  }

  test("routed table ids sanitize to safe dirs; sidecar-suffix collisions avoided") {
    assert(CdcPipeline.tableDirName("users") == "users")
    assert(CdcPipeline.tableDirName("a/b") == "a_b") // cannot escape the root
    assert(CdcPipeline.tableDirName("users__batch") == "users__batch_t")
    assert(CdcPipeline.tableDirName("t__msm") == "t__msm_t")
  }

  test("rows with a null table id dead-letter instead of vanishing") {
    val root = Files.createTempDirectory("graft_deadletter").toString
    val batch = Seq(
      (1L, "a", """{"table":"users"}""", 0L, false),
      (2L, "b", null.asInstanceOf[String], 1L, false),
    ).toDF("id", "v", Constants.SourceMetadataCol, "offset", Constants.DeleteCol)
      .withColumn(Constants.OperationCol, lit("c"))
    CdcPipeline.applyMultiTableBatch(batch, 0L,
      _ => CdcPipeline.Config(Seq("id")), root)
    assert(spark.read.parquet(s"$root/users").select("id").head.getLong(0) == 1L)
    assert(spark.read.parquet(s"$root/__unrouted/batch=0").select("id").head.getLong(0) == 2L)
  }

  test("defaultColumns pass through the logical converter (typed like the data column)") {
    val fields = SchemaDispatch.parseAfterFields(
      """{"schema":{"fields":[{"field":"after","fields":[
         {"type":"int32","field":"d","name":"io.debezium.time.Date","default":19000}]}]}}""")
    val defaults = SchemaDispatch.defaultColumns(fields)
    val got = spark.range(1).select(defaults("d").as("d")).head
    // converter applied: DateType out, not a raw wire int
    assert(got.getAs[java.sql.Date]("d").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19000))
  }

  test("a compressed field's default skips the gzip unwrap; array elements convert element-wise (round-13 review)") {
    // defaults are DDL literals — pushing one through gunzip(unbase64)
    // nulled it
    val fields = SchemaDispatch.parseAfterFields(
      """{"schema":{"fields":[{"field":"after","fields":[
         {"type":"string","field":"note","compressed":true,"default":"hello"},
         {"type":"array","field":"ds","items":{"type":"int32","name":"io.debezium.time.Date"}}]}]}}""")
    val defaults = SchemaDispatch.defaultColumns(fields)
    assert(spark.range(1).select(defaults("note").as("n")).head.getString(0) == "hello")
    // date[] decodes to an array of DATES, not raw epoch-day ints — the
    // element converter recurses through the item metadata
    val conv = SchemaDispatch.converter(fields.find(_.name == "ds").get)
    val out = Seq(Tuple1(Seq(19000, 19001))).toDF("ds")
      .select(conv(col("ds")).as("ds")).head.getSeq[java.sql.Date](0)
    assert(out.map(_.toLocalDate) ==
      Seq(java.time.LocalDate.ofEpochDay(19000), java.time.LocalDate.ofEpochDay(19001)))
    // a plain scalar array stays IDENTITY (no per-element transform)
    val plain = SchemaDispatch.parseAfterFields(
      """{"schema":{"fields":[{"field":"after","fields":[
         {"type":"array","field":"xs","items":{"type":"int64"}}]}]}}""")
    val convPlain = SchemaDispatch.converter(plain.head)
    val px = Seq(Tuple1(Seq(1L, 2L))).toDF("xs").select(convPlain(col("xs")).as("xs"))
    assert(px.head.getSeq[Long](0) == Seq(1L, 2L))
    assert(!px.queryExecution.analyzed.toString.contains("transform"),
      "scalar arrays must not pay a per-element transform")
  }

  test("cached snapshot schema still observes columns added by an evolving merge") {
    // drop-observation reads the snapshot schema through the TTL cache;
    // a merge that evolves the schema must invalidate it, or a later
    // batch would diff against the stale column set and miss the drop
    val target = Files.createTempDirectory("graft_cache_evo").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    CdcPipeline.applyBatch(
      Seq((1L, "a", 1L, false)).toDF("id", "name", "off", Constants.DeleteCol),
      0L, cfg, target)
    CdcPipeline.applyBatch(
      Seq((2L, "b", 9.5, 2L, false)).toDF("id", "name", "score", "off", Constants.DeleteCol),
      1L, cfg, target) // evolves snapshot with `score`
    val narrow = Seq((3L, "c", 3L, false)).toDF("id", "name", "off", Constants.DeleteCol)
    val t0 = java.time.Instant.now()
    assert(CdcPipeline.observeColumnDrops(narrow, 2L, cfg, target, now = t0).isEmpty)
    val droppable = CdcPipeline.observeColumnDrops(narrow, 3L, cfg, target,
      now = t0.plusSeconds(5 * 3600))
    assert(droppable == Seq("score")) // cache served the EVOLVED schema
  }

  test("trackevents: decode + validation + flatten follow the reference's event semantics") {
    import graft.cdc.EventTracking
    val good = """{"event":"signup","timestamp":"2024-03-05T12:30:45Z","messageID":"m1",
      "properties":{"user_id":"u1","amount":"9.5","dup":"from_props","event":"shadow"},
      "extraFields":{"src":"web","logged_at":"2024-03-05T12:31:00Z","dup":"from_extra"}}"""
    val missingEvent = """{"timestamp":"2024-03-05T12:30:45Z","messageID":"m2","properties":{}}"""
    val noProps = """{"event":"e","timestamp":"2024-03-05T12:30:45Z","messageID":"m3"}"""
    val frames = Seq(good, missingEvent, noProps, "NOT JSON", "").toDF("value")
    val dec = graft.cdc.FormatRegistry.decoder(EventTracking.Label)(frames, StructType(Nil))
    assert(dec.count() == 1) // only the valid, non-tombstone frame survives
    val r = dec.head
    assert(r.getAs[String]("id") == "m1")
    assert(r.getAs[String]("event") == "signup")
    assert(r.getAs[String](Constants.OperationCol) == "c") // always an upsert
    assert(!r.getAs[Boolean](Constants.DeleteCol))
    assert(r.getAs[String](Constants.SourceMetadataCol) == "{}")
    // the three invalid non-tombstone frames are the dead-letter complement
    assert(graft.cdc.EventTracking.malformedTrackEvents(frames).count() == 3)
    val keys = EventTracking.inferPropertyKeys(dec)
    assert(keys == Seq("amount", "dup", "event", "logged_at", "src", "user_id"))
    val f = EventTracking.flattenTrackEvents(dec, keys).head()
    assert(f.getAs[String]("user_id") == "u1")
    assert(f.getAs[String]("src") == "web")
    // maps.Copy order in GetData: extraFields overwrite properties
    assert(f.getAs[String]("dup") == "from_extra")
    // reserved collision surfaces as <name>__property, metadata untouched
    assert(f.getAs[String]("event__property") == "shadow")
    assert(f.getAs[String]("event") == "signup")
    // _at suffix inferred as timestamp (event.go:100-113)
    assert(f.getAs[java.sql.Timestamp]("logged_at") != null)
  }

  test("trackevents: unbounded dynamic property keys fail key discovery loudly") {
    import graft.cdc.EventTracking
    // 12 distinct dynamic keys (key_0..key_11) across the sample — a topic
    // shape that would grow the driver-side collect and the flattened
    // schema without limit; the cap must reject it with a clear message
    val frames = (0 until 12).map { i =>
      s"""{"event":"e","timestamp":"2024-03-05T12:30:45Z","messageID":"m$i",
        "properties":{"key_$i":"v"}}"""
    }.toDF("value")
    val dec = graft.cdc.FormatRegistry.decoder(EventTracking.Label)(frames, StructType(Nil))
    val err = intercept[IllegalArgumentException] {
      EventTracking.inferPropertyKeys(dec, maxKeys = 10)
    }
    assert(err.getMessage.contains("more than 10 distinct"))
    // under the cap the same topic discovers normally
    assert(EventTracking.inferPropertyKeys(dec, maxKeys = 12).size == 12)
  }

  test("poison envelope dead-letters; the batch's decodable rows still merge") {
    val root = Files.createTempDirectory("graft_dlq").toString
    val rowSchema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    def env(op: String, id: Long, v: String) =
      s"""{"payload":{"before":null,"after":{"id":$id,"v":"$v"},"op":"$op","ts_ms":1}}"""
    val frames = Seq((env("c", 1L, "a"), 1L), ("""{"not":"an envelope"}""", 2L),
      ("NOT JSON", 3L), ("", 4L)).toDF("value", "offset")
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "offset")
    CdcPipeline.applyBatchWithDeadLetter(frames, 0L, rowSchema, cfg,
      s"$root/t", s"$root/dlq")
    val snap = spark.read.parquet(s"$root/t")
    assert(snap.count() == 1 && snap.head.getAs[Long]("id") == 1L)
    // poison frames preserved verbatim; the tombstone is NOT dead-lettered
    val dead = spark.read.parquet(s"$root/dlq/batch=0")
    assert(dead.select("value").as[String].collect().toSet ==
      Set("""{"not":"an envelope"}""", "NOT JSON"))

    // bare (schemas.enable=false) topics use the matching shape: good bare
    // envelopes merge, only true poison dead-letters
    val bareFrames = Seq(
      ("""{"before":null,"after":{"id":9,"v":"z"},"op":"c","ts_ms":1}""", 1L),
      ("NOT JSON", 2L)).toDF("value", "offset")
    CdcPipeline.applyBatchWithDeadLetter(bareFrames, 0L, rowSchema, cfg,
      s"$root/t_bare", s"$root/dlq_bare", bare = true)
    assert(spark.read.parquet(s"$root/t_bare").head.getAs[Long]("id") == 9L)
    assert(spark.read.parquet(s"$root/dlq_bare/batch=0")
      .select("value").as[String].collect().toSeq == Seq("NOT JSON"))
  }

  test("parseJsonKey fails fast when the key schema holds only the routing marker") {
    val sch = StructType(Seq(StructField(Constants.DebeziumTopicRoutingKey, StringType)))
    val e = intercept[IllegalArgumentException](Envelope.parseJsonKey(col("k"), sch))
    assert(e.getMessage.contains("primaryKeysOverride"))
  }

  test("soft-partitioned append: per-target markers make replays skip written targets") {
    val root = Files.createTempDirectory("graft_soft").toString + "/t"
    val df = Seq((1L, "2024-01-05 00:00:00"), (2L, "2024-02-05 00:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast(TimestampType))
    // pre-create both partition tables (they "existed" while current) so
    // the compacted-table fallback stays out of this replay-focused test
    Seq("_2024_01", "_2024_02").foreach(sfx =>
      graft.sink.Sinks.appendParquet(df.limit(0), root + sfx))
    val now = Some(java.time.Instant.parse("2024-03-01T00:00:00Z"))
    val targets = graft.sink.Sinks.softPartitionedAppend(df, root, "ts", Some(0L), now)
    assert(targets.size == 2)
    def counts = targets.map(t => spark.read.parquet(t).count())
    assert(counts == Seq(1L, 1L))
    // full replay of batch 0: every target skips
    graft.sink.Sinks.softPartitionedAppend(df, root, "ts", Some(0L), now)
    assert(counts == Seq(1L, 1L))
    // crash window: first target's marker lost mid-loop -> only IT re-appends
    Files.delete(Paths.get(targets.head + "__batch"))
    graft.sink.Sinks.softPartitionedAppend(df, root, "ts", Some(0L), now)
    assert(counts == Seq(2L, 1L))
  }

  test("envelope schema defaults feed backfillDefaults with wire-typed columns") {
    val fields = SchemaDispatch.parseAfterFields(
      """{"schema":{"fields":[{"field":"after","fields":[
         {"type":"int32","field":"id","default":0},
         {"type":"string","field":"status","default":"active"},
         {"type":"string","field":"name"}]}]}}""")
    assert(SchemaDispatch.schemaDefaults(fields) == Map("id" -> "0", "status" -> "active"))
    val filled = graft.operators.MaintenanceOps.backfillDefaults(
      Seq((1, null.asInstanceOf[String], "n")).toDF("id", "status", "name"),
      SchemaDispatch.defaultColumns(fields))
    assert(filled.select("status").head.getString(0) == "active")
    assert(filled.select("id").head.getInt(0) == 1) // non-null untouched
  }

  test("byteCappedChunks: contiguous chunks respect the budget with the crossing rule") {
    import graft.operators.CdcOps
    // rows of 40 estimated bytes each, ordered by off; cap 100 -> the
    // reference's crossing rule admits the row that crosses, so chunks
    // of exclusive-prefix div: rows at prefix 0,40,80 -> chunk 0;
    // 120,160 -> chunk 1; ...
    val df = (0L until 10L).map(i => (i, 40L)).toDF("off", "b")
    val got = CdcOps.byteCappedChunks(df, Seq(col("off")), col("b"), 100L)
      .orderBy("off").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 2L), (6L, 2L), (7L, 2L), (8L, 3L), (9L, 3L)))
    // per-chunk totals: <= cap + one row (the crossing row stays)
    val totals = got.groupBy(_._2).view.mapValues(_.size * 40L).toMap
    assert(totals.values.forall(_ <= 140L))
    // an oversized single row owns its chunk; nulls cost zero
    val big = Seq((1L, Some(500L)), (2L, Some(60L)), (3L, Option.empty[Long]),
        (4L, Some(60L)))
      .toDF("off", "b")
    val bg = CdcOps.byteCappedChunks(big, Seq(col("off")), col("b"), 100L)
      .orderBy("off").collect().map(r => (r.getLong(0), r.getLong(2)))
    // prefixes 0, 500, 560, 560 -> chunks 0, 5, 5, 5
    assert(bg.map(_._2).toSeq == Seq(0L, 5L, 5L, 5L))
  }

  test("applyBatchByteCapped: chunked merge equals the one-shot merge; crashed chunk resumes") {
    import graft.operators.CdcOps
    val root = Files.createTempDirectory("graft_bytecap").toString
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    def batch(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "name", "off", Constants.DeleteCol)
    val b0 = batch((1L, "a", 1L, false), (2L, "b", 2L, false), (3L, "c", 3L, false),
      (1L, "a2", 4L, false), (4L, "d", 5L, false), (2L, "gone", 6L, true))
    // tiny cap -> many chunks; the net result must equal the one-shot merge
    CdcPipeline.applyBatchByteCapped(b0, 0L, cfg, s"$root/chunked", maxBytes = 1L)
    CdcPipeline.applyBatch(b0, 0L, cfg, s"$root/oneshot")
    def rows(p: String) = spark.read.parquet(p)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(s"$root/chunked") == rows(s"$root/oneshot"))
    assert(rows(s"$root/chunked") == Set((1L, "a2"), (3L, "c"), (4L, "d")))
    // replay of the whole batch: every sub-batch marker skips
    val before = rows(s"$root/chunked")
    CdcPipeline.applyBatchByteCapped(batch((1L, "CORRUPT", 1L, false), (2L, "b", 2L, false),
      (3L, "c", 3L, false), (1L, "a2", 4L, false), (4L, "d", 5L, false),
      (2L, "gone", 6L, true)), 0L, cfg, s"$root/chunked", maxBytes = 1L)
    // same synthetic ids -> no chunk re-applies -> CORRUPT never lands
    assert(rows(s"$root/chunked") == before)
    // next batch's ids sit above every sub-batch of batch 0
    CdcPipeline.applyBatchByteCapped(batch((5L, "e", 7L, false)), 1L, cfg,
      s"$root/chunked", maxBytes = 1L)
    assert(rows(s"$root/chunked") == before + ((5L, "e")))
  }
}
