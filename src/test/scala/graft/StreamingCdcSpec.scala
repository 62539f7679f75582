package graft

import java.nio.file.Files

import graft.cdc.Envelope
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end replay in the spirit of the reference's e2e test
  * (e2e_tests/postgres/test.go:23-80): Debezium-envelope JSON -> stream ->
  * decode -> micro-batch merge -> final table contents asserted.
  */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("first_name", StringType),
    StructField("email", StringType)))

  private def env(op: String, id: Long, name: String, email: String): String = {
    val row = s"""{"id":$id,"first_name":"$name","email":"$email"}"""
    val (before, after) = if (op == "d") (row, "null") else ("null", row)
    s"""{"payload":{"before":$before,"after":$after,"source":{"table":"customers"},"op":"$op","ts_ms":0}}"""
  }

  test("envelope decode: create/update/delete, tombstone skip, struct-string key") {
    val df = Seq(
      (env("c", 1, "sally", "s@x.com"), 0L),
      (env("u", 1, "sally2", "s@x.com"), 1L),
      (env("d", 2, "gone", "g@x.com"), 2L),
      ("", 3L), // tombstone
    ).toDF("value", "offset")
    val out = Envelope.decodeRelational(df, rowSchema).orderBy("offset").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("first_name") == "sally" && !out(0).getAs[Boolean](Constants.DeleteCol))
    assert(out(1).getAs[String]("first_name") == "sally2")
    // delete rows take `before` values
    assert(out(2).getAs[Long]("id") == 2 && out(2).getAs[Boolean](Constants.DeleteCol))

    val keys = Seq("Struct{id=1001}").toDF("key")
      .select(Envelope.parseStructStringKey(col("key"), "id").as("id")).head
    assert(keys.getString(0) == "1001")
  }

  test("schemaless decode infers row types by value (ParseValue analog)") {
    // no schema block anywhere: types must come from the data itself
    val envs = Seq(
      ("""{"payload":{"before":null,"after":{"id":1,"name":"a","score":9.5},"source":{},"op":"c","ts_ms":0}}""", 0L),
      ("""{"payload":{"before":null,"after":{"id":2,"name":"b","score":0.25},"source":{},"op":"c","ts_ms":1}}""", 1L),
      ("""{"payload":{"before":{"id":3,"name":"gone","score":1.0},"after":null,"source":{},"op":"d","ts_ms":2}}""", 2L),
    ).toDF("value", "offset")
    val out = Envelope.decodeInferred(envs).orderBy("offset")
    val schema = out.schema
    assert(schema("id").dataType == LongType)
    assert(schema("name").dataType == StringType)
    assert(schema("score").dataType == DoubleType)
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("id") == 1L && rows(0).getAs[Double]("score") == 9.5)
    // delete takes the before-image, inferred schema included it
    assert(rows(2).getAs[Long]("id") == 3L && rows(2).getAs[Boolean](Constants.DeleteCol))
  }

  test("schemaless decode handles the BARE envelope schemas.enable=false actually emits") {
    // real schema-disabled JsonConverter output has no payload wrapper at all
    val envs = Seq(
      ("""{"before":null,"after":{"id":10,"name":"x"},"source":{},"op":"c","ts_ms":0}""", 0L),
      ("""{"before":{"id":11,"name":"y"},"after":null,"source":{},"op":"d","ts_ms":1}""", 1L),
    ).toDF("value", "offset")
    val out = Envelope.decodeInferred(envs).orderBy("offset").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("id") == 10L && out(0).getAs[String]("name") == "x")
    assert(out(1).getAs[Long]("id") == 11L && out(1).getAs[Boolean](Constants.DeleteCol))
  }

  test("schema auto-dispatch replays the reference's own postgres e2e fixture") {
    // The real Debezium envelopes the reference asserts against
    // (e2e_tests/postgres/testdata/dbserver1.inventory.customers.json,
    // asserted like e2e_tests/postgres/test.go:23-56): schema block drives
    // the StructType + converter choice, no hand-authored schema.
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val raw = new String(Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/e2e_tests/postgres/testdata/dbserver1.inventory.customers.json")))
    val envs = new ObjectMapper().readTree(raw).elements().asScala.map(_.toString).toSeq
    assert(envs.length == 4)

    val fields = cdc.SchemaDispatch.parseAfterFields(envs.head)
    assert(fields.map(_.name) == Seq("id", "first_name", "last_name", "email"))
    assert(cdc.SchemaDispatch.schemaDefaults(fields) == Map("id" -> "0"))

    val df = envs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("value", "offset")
    val out = cdc.SchemaDispatch.decodeAuto(df, envs.head).orderBy("id").collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Int]("id")).toSeq == Seq(1001, 1002, 1003, 1004))
    assert(out.map(_.getAs[String]("first_name")).toSeq ==
      Seq("Sally", "George", "Edward", "Anne"))
    assert(out.forall(_.getAs[String](Constants.OperationCol) == "r"))
    assert(out.forall(!_.getAs[Boolean](Constants.DeleteCol)))
  }

  test("schema auto-dispatch picks logical converters: micro-ts, kafka decimal, date, json") {
    val sample = """{"schema":{"type":"struct","fields":[
      {"type":"struct","field":"after","fields":[
        {"type":"int64","optional":false,"field":"id"},
        {"type":"bytes","optional":true,"field":"price",
         "name":"org.apache.kafka.connect.data.Decimal",
         "parameters":{"scale":"2","connect.decimal.precision":"10"}},
        {"type":"int64","optional":true,"field":"created_at",
         "name":"io.debezium.time.MicroTimestamp"},
        {"type":"int32","optional":true,"field":"d","name":"io.debezium.time.Date"},
        {"type":"string","optional":true,"field":"meta","name":"io.debezium.data.Json"}]}]},
      "payload":null}"""
    // price 12345 cents = b64(two's complement 0x3039) = "MDk="
    val value =
      """{"payload":{"after":{"id":7,"price":"MDk=","created_at":1700000000000000,
        |"d":19000,"meta":"{\"b\":1,\"a\":2}"},"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val out = cdc.SchemaDispatch.decodeAuto(Seq((value, 0L)).toDF("value", "offset"), sample).head
    assert(out.getAs[java.math.BigDecimal]("price").toPlainString == "123.45")
    assert(out.getAs[java.sql.Timestamp]("created_at").toInstant.toString == "2023-11-14T22:13:20Z")
    assert(out.getAs[java.sql.Date]("d").toLocalDate.toString ==
      java.time.LocalDate.ofEpochDay(19000).toString)
    assert(out.getAs[String]("meta") == """{"a":2,"b":1}""") // canonical: sorted keys
  }

  test("streamed micro-batch merge reaches the reference e2e final state") {
    val target = Files.createTempDirectory("graft_tgt").toString + "/customers"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val decoded = Envelope.decodeRelational(ms.toDF().toDF("value", "offset"), rowSchema)
    val cfg = CdcPipeline.Config(primaryKeys = Seq("id"), flushInterval = "1 seconds")
    val q = CdcPipeline.start(decoded, cfg, target, ckpt)

    // batch 1: three inserts
    ms.addData(("", 0L), (env("c", 1, "sally", "s@x.com"), 1L),
      (env("c", 2, "bob", "b@x.com"), 2L), (env("c", 3, "eve", "e@x.com"), 3L))
    q.processAllAvailable()
    // batch 2: update sally (twice - last wins), delete bob, insert dan
    ms.addData((env("u", 1, "sally_mid", "s@x.com"), 4L),
      (env("u", 1, "sally_new", "s2@x.com"), 5L),
      (env("d", 2, "bob", "b@x.com"), 6L), (env("c", 4, "dan", "d@x.com"), 7L))
    q.processAllAvailable()
    q.stop()

    val finalState = spark.read.parquet(target)
      .select("id", "first_name").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(finalState.toSeq == Seq((1L, "sally_new"), (3L, "eve"), (4L, "dan")))
  }

  test("history mode appends every operation instead of merging") {
    val target = Files.createTempDirectory("graft_hist").toString + "/t"
    val batch = Seq(
      (env("c", 1, "a", "a@x"), 0L), (env("u", 1, "b", "a@x"), 1L), (env("d", 1, "b", "a@x"), 2L),
    ).toDF("value", "offset")
    val decoded = Envelope.decodeRelational(batch, rowSchema)
    CdcPipeline.applyBatch(decoded, 0L, CdcPipeline.Config(Seq("id"), historyMode = true), target)
    val out = spark.read.parquet(target)
    assert(out.count() == 3)
    assert(out.columns.contains(Constants.OperationCol))
    assert(!out.columns.contains(Constants.DeleteCol))
  }

  test("trackevents stream end-to-end: decode, validation drop, last-wins merge") {
    val target = Files.createTempDirectory("graft_te").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_te_ck").toString
    def te(mid: String, event: String, ts: String, uid: String) =
      s"""{"event":"$event","timestamp":"$ts","messageID":"$mid","properties":{"user_id":"$uid"}}"""
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val decoded = graft.cdc.EventTracking.decodeTrackEvents(
      ms.toDF().toDF("value", "offset"))
    val q = CdcPipeline.start(decoded,
      CdcPipeline.Config(Seq("id"), flushInterval = "1 seconds"), target, ckpt)
    ms.addData(
      (te("m1", "click", "2024-01-01T00:00:00Z", "u1"), 1L),
      (te("m1", "click", "2024-01-01T00:05:00Z", "u2"), 2L), // same id: last wins
      ("""{"event":"x","properties":{}}""", 3L), // missing required fields: dropped
      ("", 4L), // tombstone: skipped
      (te("m2", "view", "2024-01-02T00:00:00Z", "u3"), 5L))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(target).orderBy("id").collect()
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("m1", "m2"))
    assert(out(0).getAs[Map[String, String]]("properties")("user_id") == "u2")
    assert(out(0).getAs[java.sql.Timestamp]("timestamp") != null)
  }

  test("row transforms: skip ops, exclude and hash columns") {
    val batch = Seq(
      (env("c", 1, "a", "secret@x"), 0L), (env("d", 1, "a", "secret@x"), 1L),
    ).toDF("value", "offset")
    val decoded = Envelope.decodeRelational(batch, rowSchema)
    val cfg = CdcPipeline.Config(Seq("id"), skippedOperations = Set("d"),
      columnsToExclude = Seq("first_name"), columnsToHash = Seq("email"))
    val out = CdcPipeline.applyRowTransforms(decoded, cfg).collect()
    assert(out.length == 1)
    assert(!out.head.schema.fieldNames.contains("first_name"))
    assert(out.head.getAs[String]("email").matches("[0-9a-f]{64}"))
  }
}
