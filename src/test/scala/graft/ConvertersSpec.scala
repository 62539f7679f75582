package graft

import graft.functions.{Converters, DebeziumCodec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Converter vectors mirroring the reference's unit fixtures
  * (lib/debezium/converters tests, lib/cdc/util/decimal.json shapes).
  */
class ConvertersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("debezium decimal decode: base64 AN3h at scale 2 is 568.01") {
    val bytes = java.util.Base64.getDecoder.decode("AN3h")
    val df = Seq(Tuple1(bytes)).toDF("b")
      .select(Converters.debeziumDecimal(col("b"), 10, 2).as("d"))
    assert(df.head.getDecimal(0) == new java.math.BigDecimal("568.01"))
  }

  test("debezium decimal decode: negative two's-complement") {
    // -12.34 at scale 2 -> unscaled -1234
    val bytes = java.math.BigInteger.valueOf(-1234).toByteArray
    val df = Seq(Tuple1(bytes)).toDF("b")
      .select(Converters.debeziumDecimal(col("b"), 10, 2).as("d"))
    assert(df.head.getDecimal(0) == new java.math.BigDecimal("-12.34"))
  }

  test("decimal encode/decode round-trip through columns") {
    val df = Seq(568L, -1234L, 0L, Long.MaxValue / 100).toDF("cents")
      .select(col("cents"),
        Converters.debeziumDecimal(Converters.twosComplementBytes(col("cents")), 25, 2).as("d"))
    df.collect().foreach { r =>
      assert(r.getDecimal(1).unscaledValue().longValueExact() == r.getLong(0))
    }
  }

  test("epoch days to date (19401 -> 2023-02-13, date_test.go vector)") {
    val df = Seq(19401).toDF("d").select(Converters.epochDaysToDate(col("d")).as("dt"))
    assert(df.head.getDate(0).toString == "2023-02-13")
  }

  test("time converters: millis/micros past midnight") {
    val df = Seq((3723004L, 3723000004L)).toDF("ms", "us").select(
      Converters.timeMillis(col("ms")).as("t1"),
      Converters.timeMicros(col("us")).as("t2"))
    val r = df.head
    assert(r.getString(0) == "01:02:03.004")
    assert(r.getString(1) == "01:02:03.000004")
  }

  test("zoned timestamp guards invalid years") {
    val df = Seq("2023-02-13T10:01:02Z", "+275760-09-13T00:00:00Z").toDF("s")
      .select(Converters.zonedTimestamp(col("s")).as("ts"))
    val rows = df.collect()
    assert(rows(0).getTimestamp(0) != null)
    assert(rows(1).isNullAt(0))
  }

  test("canonical json: sorted keys, dup keys last-wins, invalid -> null") {
    assert(DebeziumCodec.canonicalJson("""{"b":2,"a":1}""") == """{"a":1,"b":2}""")
    assert(DebeziumCodec.canonicalJson("""{"a":1,"a":2}""") == """{"a":2}""")
    assert(DebeziumCodec.canonicalJson("""{"z":{"y":2,"x":[{"b":1,"a":0}]}}""")
      == """{"z":{"x":[{"a":0,"b":1}],"y":2}}""")
    assert(DebeziumCodec.canonicalJson("not json") == null)
  }

  test("gunzip round-trips gzip (F15)") {
    val payload = "toast value payload".getBytes("UTF-8")
    val df = Seq(Tuple1(DebeziumCodec.gzip(payload))).toDF("b")
      .select(Converters.gunzip(col("b")).as("u"))
    assert(new String(df.head.getAs[Array[Byte]](0), "UTF-8") == "toast value payload")
  }

  test("hmac-sha256 matches RFC 4231 test case 2") {
    val out = DebeziumCodec.hmacSha256("Jefe".getBytes, "what do ya want for nothing?".getBytes)
    assert(out.map("%02x".format(_)).mkString ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("float64 NaN string becomes null") {
    val df = Seq("NaN", "1.5").toDF("s").select(Converters.float64NanNull(col("s")).as("v"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(1).getDouble(0) == 1.5)
  }

  test("multi-layout timestamp parse picks first matching format") {
    val df = Seq("2023-02-13 10:01:02", "02/13/2023").toDF("s")
      .select(Converters.parseTimestampMulti(col("s"),
        Seq("yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy")).as("ts"))
    val rows = df.collect()
    assert(rows(0).getTimestamp(0).toString.startsWith("2023-02-13 10:01:02"))
    assert(rows(1).getTimestamp(0).toString.startsWith("2023-02-13 00:00"))
  }

  test("column name sanitization (P7)") {
    assert(Converters.sanitizeName("Hello World") == "hello_world")
    assert(Converters.sanitizeName("9col") == "col_9col")
    assert(Converters.sanitizeName("a#b") == "a__b")
  }

  test("capped string emits exceeded marker (P10)") {
    val df = Seq("short", "very long string over cap").toDF("s")
      .select(Converters.cappedString(col("s"), 10).as("c"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "short")
    assert(rows(1).getString(0) == Constants.ExceededValuePlaceholder)
  }

  test("variable-scale decimal decodes struct fields to text") {
    val bytes = java.math.BigInteger.valueOf(56801).toByteArray
    val df = Seq((bytes, 2)).toDF("v", "s")
      .select(Converters.variableScaleDecimal(col("v"), col("s")).as("d"))
    assert(new java.math.BigDecimal(df.head.getString(0)).compareTo(
      new java.math.BigDecimal("568.01")) == 0)
  }

  test("fingerprint64 matches a hand-rolled reference") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val df = Seq("hello world", "", "Ünïcøde ✓").toDF("s")
      .select(col("s"), Converters.fingerprint64(col("s")).as("fp"))
    df.collect().foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
  }

  test("zorderKey: magic-mask spread equals the bit-by-bit loop; SQL twin agrees") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    // morton(5, 3, 4): x=0101 even bits, y=0011 odd bits -> 27
    assert(graft.functions.ZOrder.morton(5L, 3L, 4) == 27L)
    val cases = Seq((5L, 3L), (0L, 0L), ((1L << 31) - 1, 12345L), (999999L, 1L))
    cases.foreach { case (x, y) =>
      assert(graft.functions.ZOrder.morton(x, y, 31) == ref(x, y, 31), s"($x,$y)")
    }
    // codegen path (DataFrame) and interpreted path agree
    val got = cases.toDF("x", "y")
      .select(Converters.zorderKey(col("x"), col("y"), 31).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (x, y) => ref(x, y, 31) })
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_zorder_key(CAST(5 AS BIGINT), CAST(3 AS BIGINT), 4) AS z").head.getLong(0) == 27L)
  }
}
