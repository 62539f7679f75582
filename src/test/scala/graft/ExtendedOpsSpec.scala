package graft

import java.nio.file.Files

import graft.cdc.{Envelope, FormatRegistry}
import graft.functions.{Converters, GeoMongoCodec}
import graft.operators.{MaintenanceOps, MultimodalOps}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("intervalJoin: exact inclusive bounds, multi-bucket spans, invalid intervals dropped") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 99L)).toDF("p_id", "t")
    val intervals = Seq(
      (10L, 5L, 10L),   // matches t=5 (start edge) and t=10 (end edge)
      (20L, 11L, 14L),  // matches nothing (gap)
      (30L, 0L, 95L),   // spans many 4-wide buckets; matches t=5,10,15
      (40L, 50L, 40L),  // inverted -> dropped
      (50L, 99L, 99L)). // single-point interval at t=99
      toDF("i_id", "s", "e")
    val got = graft.operators.IntervalOps
      .intervalJoin(points, intervals, "t", "s", "e", 4L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (p, t) <- Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 99L))
      (i, s, e) <- Seq((10L, 5L, 10L), (20L, 11L, 14L), (30L, 0L, 95L), (40L, 50L, 40L), (50L, 99L, 99L))
      if s <= e && t >= s && t <= e
    } yield (p, i)).toSet
    assert(got == brute)
    assert(got.contains((1L, 10L)) && got.contains((2L, 10L)) && got.contains((4L, 50L)))
    assert(!got.exists(_._2 == 40L))
  }

  // ---- geometry (F10) ------------------------------------------------------

  test("EWKB point (little-endian, with SRID) decodes to GeoJSON Feature") {
    // POINT(1 2) EWKB with SRID=4326: 01 01000020 E6100000 x y
    val bb = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(0x20000001).putInt(4326).putDouble(1.0).putDouble(2.0)
    val out = GeoMongoCodec.ewkbToGeoJson(bb.array())
    assert(out == """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]}}""")
  }

  test("EWKB linestring decodes; unknown geometry type yields null") {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(2).putInt(2).putDouble(0).putDouble(0).putDouble(3).putDouble(4)
    assert(GeoMongoCodec.ewkbToGeoJson(bb.array())
      == """{"type":"Feature","geometry":{"type":"LineString","coordinates":[[0,0],[3,4]]}}""")
    val bad = java.nio.ByteBuffer.allocate(5).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put(1.toByte).putInt(99)
    assert(GeoMongoCodec.ewkbToGeoJson(bad.array()) == null)
  }

  test("point x/y column converter emits the reference GeoJSON shape") {
    val out = Seq((1.5, -2.25)).toDF("x", "y")
      .select(Converters.pointGeoJson(col("x"), col("y")).as("g")).head.getString(0)
    assert(out == """{"type":"Feature","geometry":{"type":"Point","coordinates":[1.5,-2.25]}}""")
  }

  // ---- mongo extended JSON (S4) -------------------------------------------

  test("mongo extended JSON normalizes $oid/$date/$numberLong wrappers") {
    val ext = """{"_id":{"$oid":"65d3a9f0c8b4f01234567890"},"n":{"$numberLong":"42"},
      "at":{"$date":{"$numberLong":"1700000000000"}},"nested":{"d":{"$numberDouble":"1.5"}},"s":"plain"}"""
    val plain = GeoMongoCodec.mongoExtJsonToPlain(ext)
    assert(plain.contains(""""_id":"65d3a9f0c8b4f01234567890""""))
    assert(plain.contains(""""n":42"""))
    assert(plain.contains(""""at":"2023-11-14T22:13:20Z""""))
    assert(plain.contains(""""d":1.5"""))
  }

  test("decodeMongo surfaces _id, normalized document, delete markers") {
    val after = """{\"_id\":{\"$oid\":\"abc123\"},\"name\":\"sally\"}"""
    val value = s"""{"payload":{"before":null,"after":"$after","source":{"db":"x"},"op":"c","ts_ms":5}}"""
    val df = Seq((value, 0L)).toDF("value", "offset")
    val out = Envelope.decodeMongo(df).head
    assert(out.getAs[String]("_id") == "abc123")
    assert(out.getAs[String]("document") == """{"_id":"abc123","name":"sally"}""")
    assert(!out.getAs[Boolean](Constants.DeleteCol))
  }

  test("decodeMongo: delete events take _id from the Kafka key (no before-image)") {
    val value = """{"payload":{"before":null,"after":null,"source":{"db":"x"},"op":"d","ts_ms":9}}"""
    val key = """{"id":{"$oid":"deadbeef01"}}"""
    val df = Seq((key, value, 7L)).toDF("key", "value", "offset")
    val out = Envelope.decodeMongo(df).head
    assert(out.getAs[String]("_id") == "deadbeef01")
    assert(out.getAs[Boolean](Constants.DeleteCol))
  }

  test("format registry dispatches by label and rejects unknown") {
    assert(FormatRegistry.decoder("debezium.relational") != null)
    assert(FormatRegistry.decoder("debezium.mongodb") != null)
    intercept[IllegalArgumentException](FormatRegistry.decoder("artie.unknown"))
  }

  // ---- converters (F4, P4) -------------------------------------------------

  test("time-with-timezone preserves the input's offset") {
    val out = Seq("10:01:02.123456+05:00", "10:01:02.123456Z").toDF("s")
      .select(Converters.timeWithTimezone(col("s")).as("t")).collect().map(_.getString(0))
    assert(out(0) == "10:01:02.123456+05:00") // NOT rewritten into session TZ
    assert(out(1) == "10:01:02.123456Z")
    // hour-only and seconds-bearing offsets preserve too (round-13
    // review: `+05` fell through the old regex and was silently
    // rewritten to UTC wall time)
    val out2 = Seq("12:34:56.000000+05", "12:34:56.000000-0330", "01:02:03.000000+05:30")
      .toDF("s")
      .select(Converters.timeWithTimezone(col("s")).as("t")).collect().map(_.getString(0))
    assert(out2(0) == "12:34:56.000000+05", out2(0))
    assert(out2(1) == "12:34:56.000000-0330", out2(1))
    assert(out2(2) == "01:02:03.000000+05:30", out2(2))
  }

  test("aes-gcm encrypt/decrypt round-trips and is non-deterministic") {
    val key = "0123456789abcdef"
    def encryptOnce(): String = Seq("secret-value").toDF("v")
      .select(Converters.encryptColumn(col("v"), lit(key)).as("e")).head.getString(0)
    // separate queries: within one projection Spark CSEs identical exprs
    val e1 = encryptOnce()
    val e2 = encryptOnce()
    assert(e1 != e2) // GCM random IV
    val dec = Seq(e1).toDF("e")
      .select(Converters.decryptColumn(col("e"), lit(key)).as("d")).head.getString(0)
    assert(dec == "secret-value")
  }

  test("config bans encrypting primary keys") {
    intercept[IllegalArgumentException](
      CdcPipeline.Config(Seq("id"), columnsToEncrypt = Seq("id"), encryptionKey = Some("k")))
  }

  // ---- maintenance (D5-D7) -------------------------------------------------

  test("dedupeTable keeps latest row per PK by order cols (reference DESC ordering)") {
    val df = Seq((1L, "2024-01-02", "late"), (1L, "2024-01-01", "early"), (2L, "2024-01-01", "only"))
      .toDF("id", "at", "v")
    val got = MaintenanceOps.dedupeTable(df, Seq("id"), Seq("at"))
      .orderBy("id").collect().map(_.getString(2))
    assert(got.toSeq == Seq("late", "only"))
  }

  test("temp names encode TTL; sweep detects expiry (incl. underscore salts)") {
    val name = MaintenanceOps.tempName("db.orders", nowEpochS = 1700000000L)
    assert(name == s"db.orders__artie_stg_${1700000000L + 6 * 3600}")
    assert(!MaintenanceOps.shouldSweep(name, 1700000000L))
    assert(MaintenanceOps.shouldSweep(name, 1700000000L + 7 * 3600))
    assert(!MaintenanceOps.shouldSweep("db.orders", 1700000000L))
    val salted = MaintenanceOps.tempName("db.orders", 1700000000L, salt = "my_stg")
    assert(MaintenanceOps.shouldSweep(salted, 1700000000L + 7 * 3600))
  }

  test("backfillDefaults fills nulls and adds missing columns") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "set")).toDF("id", "v")
    val got = MaintenanceOps.backfillDefaults(df,
      Map("v" -> lit("dflt"), "extra" -> lit(9)))
      .orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("dflt", "set"))
    assert(got.map(_.getInt(2)).toSeq == Seq(9, 9))
  }

  // ---- multimodal ----------------------------------------------------------

  test("multimodal frame sampling preserves batch shape; features are codegen exprs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val frames = MultimodalOps.sampleFrames(docs, "doc_id", "content", framesPerItem = 3)
    assert(frames.count() == 60) // 20 items x 3 frames
    val feats = MultimodalOps.frameFeatures(frames)
    assert(feats.columns.toSeq == Seq("media_id", "frame_idx", "mean_px", "min_px", "max_px"))
    val r = feats.filter(col("media_id") === 0 && col("frame_idx") === 0).head
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 255)
    // determinism: same input -> same stub frames
    val again = MultimodalOps.frameFeatures(
      MultimodalOps.sampleFrames(docs, "doc_id", "content", 3))
      .filter(col("media_id") === 0 && col("frame_idx") === 0).head
    assert(again.getDouble(2) == r.getDouble(2))
  }

  test("audioWindowEnergy: window fold equals a direct decode replay; zero-shuffle plan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(10)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val texts = Tables.documents(spark, "/root/testdata/sf0.001").limit(10)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MultimodalOps.audioWindowEnergy(docs, "doc_id", "content", 64, 16)
      .collect().map(w => (w.media_id, w.window_idx) -> (w.energy, w.peak)).toMap
    assert(got.size == 40) // 10 items x 4 windows
    // direct replay through the stub codec
    for ((id, text) <- texts) {
      val s = MultimodalOps.decodeAudioStub(id, text.getBytes("UTF-8"), 64)
      for (w <- 0 until 4) {
        val slice = s.slice(w * 16, (w + 1) * 16).map(math.abs)
        assert(got((id, w)) == ((slice.map(_.toLong).sum, slice.max)),
          s"window ($id,$w) diverges")
      }
    }
    // empty payload: decode still yields deterministic samples (byte = 0)
    val empty = MultimodalOps.decodeAudioStub(7L, Array.emptyByteArray, 16)
    assert(empty.length == 16 && empty.forall(v => v >= -128 && v <= 127))
    // the operator itself never shuffles (repartition excepted, which is
    // the id fan-out for codec parallelism): no Exchange hashpartitioning
    // beyond the explicit repartition, no aggregate
    val plan = MultimodalOps.audioWindowEnergy(docs, "doc_id", "content", 64, 16)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("HashAggregate"))
  }

  test("resizeFrames: nearest-neighbor downscale keeps source pixels, shape, extremes bound") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(4)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val frames = MultimodalOps.sampleFrames(docs, "doc_id", "content", framesPerItem = 2)
    val original = frames.collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    val resized = MultimodalOps.resizeFrames(frames, 4, 4).collect()
    assert(resized.length == 8)
    resized.foreach { f =>
      assert(f.width == 4 && f.height == 4 && f.pixels.length == 16)
      val src = original((f.media_id, f.frame_idx))
      // nearest-neighbor: every output pixel is the exact source pixel at
      // the scaled index (8x8 -> 4x4 samples even rows/cols)
      (0 until 4).foreach { y => (0 until 4).foreach { x =>
        assert(f.pixels(y * 4 + x) == src.pixels(y * 2 * 8 + x * 2))
      }}
    }
    // upscale: each 2x2 output block replicates its 4x4-source pixel
    val small = MultimodalOps.resizeFrames(frames, 4, 4)
    val smallByKey = small.collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    val up = MultimodalOps.resizeFrames(small, 8, 8).collect()
    up.foreach { f =>
      assert(f.width == 8 && f.pixels.length == 64)
      val src = smallByKey((f.media_id, f.frame_idx))
      (0 until 8).foreach { y => (0 until 8).foreach { x =>
        assert(f.pixels(y * 8 + x) == src.pixels((y / 2) * 4 + (x / 2)))
      }}
    }
    // overflow guard
    assertThrows[IllegalArgumentException] {
      MultimodalOps.resizeFrames(frames, 65536, 65536)
    }
  }

  test("frameActivityBounds: integer luma flags, trim bounds, all-low media reads NULL bounds") {
    import spark.implicits._
    def fr(id: Long, idx: Int, fill: Int) =
      MultimodalOps.Frame(id, idx, 2, 2, Array.fill(4)(fill.toByte))
    val frames = Seq(
      fr(1L, 0, 0), fr(1L, 1, -1 /* 0xFF = 255 */), fr(1L, 2, 0),
      fr(2L, 0, 10), fr(2L, 1, 20)).toDS()
    val got = MultimodalOps.frameActivityBounds(frames, 126)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    // media 1: dark, bright(255), dark -> bounds [1,1], 2 low frames;
    // media 2: all below threshold -> NULL bounds (drop-asset signal)
    assert(got.toSeq == Seq((1L, 3L, 2L, 1L, 1L), (2L, 2L, 2L, -1L, -1L)),
      got.toSeq.toString)
  }

  test("frameAHash: bit semantics exact; near-identical frames pair within d<=3, far ones don't") {
    import spark.implicits._
    // hand-built frames with a known hash: 32 high pixels (first half)
    // over 32 low -> mean between them -> bits 0..31 set
    def frame(id: Long, px: Array[Byte]) = MultimodalOps.Frame(id, 0, 8, 8, px)
    val base = Array.tabulate(64)(i => if (i < 32) 200.toByte else 10.toByte)
    // twin: 3 low pixels raised ABOVE the shifted mean -> exactly 3 extra
    // bits; far: 8 raised -> distance 8
    def raised(k: Int) = Array.tabulate(64)(i =>
      if (i < 32) 200.toByte else if (i < 32 + k) 250.toByte else 10.toByte)
    val frames = Seq(frame(1L, base), frame(2L, raised(3)), frame(3L, raised(8))).toDS()
    val hashed = MultimodalOps.frameAHash(frames)
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hs(1L) == 0xFFFFFFFFL, f"base hash ${hs(1L)}%x")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) == 3)
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) == 8)
    val pairs = graft.operators.DedupOps.hammingPairs64(
      hashed.select(col("media_id").as("id"), col("ahash")), "id", "ahash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // recall guarantee: the d=3 pair MUST be found even though its
    // differing bits could span 3 of the 4 chunks; d=8 pairs must not
    assert(pairs == Set((1L, 2L, 3)), s"got $pairs")
    // end-to-end twin path: identical content -> perturbed twin pairs at
    // small distance with guaranteed recall when d <= 3
    val docs = Seq((7L, "same content here")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val fr = MultimodalOps.sampleFrames(docs, "doc_id", "content", 1)
    val tw = MultimodalOps.perturbPixel(fr, 0, 255.toByte, 100L)
    val h2 = MultimodalOps.frameAHash(fr.union(tw))
      .select(col("media_id").as("id"), col("ahash"))
    val d = java.lang.Long.bitCount(
      h2.collect().map(_.getLong(1)).reduce(_ ^ _))
    val got = graft.operators.DedupOps.hammingPairs64(h2, "id", "ahash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (d <= 3) assert(got.toSeq == Seq((7L, 107L)), s"d=$d got ${got.toSeq}")
    else assert(got.isEmpty, s"d=$d got ${got.toSeq}")
  }

  test("packMedia produces the canonical metadata struct") {
    val df = Seq(("img", 640, 480, 0L)).toDF("m", "w", "h", "d")
      .select(MultimodalOps.packMedia(lit(Array[Byte](1, 2)), col("m"), col("w"), col("h"), col("d")).as("meta"))
    assert(df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("mime", "width", "height", "duration_ms"))
  }

  // ---- MSM (D8) ------------------------------------------------------------

  test("multi-step merge accumulates batches in staging, flushes every Nth") {
    val target = Files.createTempDirectory("graft_msm").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off", msmSteps = 2)
    def batch(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "name", "off", Constants.DeleteCol)
        .withColumn(Constants.OperationCol, lit("u"))
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    CdcPipeline.applyBatch(batch((1L, "a", 1L, false)), 0L, cfg, target)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target))) // staged only
    assert(fs.exists(new org.apache.hadoop.fs.Path(target + "__msm")))

    CdcPipeline.applyBatch(batch((1L, "a2", 2L, false), (2L, "b", 3L, false)), 1L, cfg, target)
    assert(fs.exists(new org.apache.hadoop.fs.Path(target))) // flushed
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target + "__msm"))) // staging reset
    val got = spark.read.parquet(target).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b")))
  }
}
