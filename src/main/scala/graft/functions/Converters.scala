package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium logical-type converters (SURVEY §2.6, F1-F16) and output-side
  * canonical-string converters, re-expressed as codegen'd Spark Column
  * functions. Each cites the reference converter it models.
  */
object Converters {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def e(col: Column) = GraftBridge.expression(col)

  // ---- custom expressions exposed as Columns -------------------------------

  /** F6: Kafka-Connect decimal decode (converters/decimal.go:150-219). */
  def debeziumDecimal(bytes: Column, precision: Int, scale: Int): Column =
    c(DebeziumDecimalDecode(e(bytes), precision, scale))

  /** Inverse of [[debeziumDecimal]] for integral unscaled values. */
  def twosComplementBytes(v: Column): Column = c(TwosComplementEncode(e(v)))

  /** F7: variable-scale decimal struct {scale, value: bytes} -> plain
    * string at the payload's own scale (reference stores variable NUMERIC
    * as TEXT, decimal.go:156-198).
    */
  def variableScaleDecimal(valueBytes: Column, scale: Column): Column =
    c(VariableScaleDecimalText(e(valueBytes), e(scale)))

  /** F15: gunzip(binary) (types.go:156-184). */
  def gunzip(bin: Column): Column = c(Gunzip(e(bin)))

  /** P3: HMAC-SHA256 column hashing with salt, hex output. */
  def hmacSha256Hex(key: Column, data: Column): Column =
    lower(hex(c(HmacSha256(e(key.cast(BinaryType)), e(data.cast(BinaryType))))))

  /** F8: canonical JSON (lib/jsonutil): dup keys last-wins, sorted keys. */
  def canonicalJson(s: Column): Column = c(CanonicalJson(e(s)))

  /** Rolling 64-bit document fingerprint. */
  def fingerprint64(s: Column): Column = c(Fingerprint64(e(s)))

  /** Second fingerprint lane (different multiplier + modulus) — paired
    * with [[fingerprint64]] where a 30-bit identity is not enough.
    */
  def fingerprintB(s: Column): Column = c(FingerprintB(e(s)))

  /** Greedy wordpiece/BPE subword token count (see [[Wordpiece]]). */
  def wordpieceTokens(s: Column): Column = c(WordpieceTokenCount(e(s)))

  /** Z-order (Morton) clustering key over two long dimensions. */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    c(ZOrderKey(e(x), e(y), bits))

  // ---- temporal converters (F1-F5) ----------------------------------------

  /** F1: epoch days -> date (converters/date.go:17-31). */
  def epochDaysToDate(days: Column): Column =
    date_add(to_date(lit("1970-01-01")), days.cast(IntegerType))

  /** F2: millis past midnight -> "HH:mm:ss.SSS" (converters/time.go:12-58). */
  def timeMillis(ms: Column): Column =
    date_format(timestamp_millis(ms.cast(LongType)), "HH:mm:ss.SSS")

  def timeMicros(us: Column): Column =
    date_format(timestamp_micros(us.cast(LongType)), "HH:mm:ss.SSSSSS")

  /** Exact integer ns -> us: decimal division keeps all 63 bits (a double
    * round-trip would lose precision above 2^53).
    */
  private def nsToMicros(ns: Column): Column =
    floor(ns.cast(LongType).cast(DecimalType(38, 0)) / lit(1000)).cast(LongType)

  /** Nanos truncated to micro precision, as the reference does. */
  def timeNanos(ns: Column): Column =
    date_format(timestamp_micros(nsToMicros(ns)), "HH:mm:ss.SSSSSS")

  /** F5: epoch millis/micros/nanos -> timestamp (converters/timestamp.go). */
  def epochMillisToTs(ms: Column): Column = timestamp_millis(ms.cast(LongType))
  def epochMicrosToTs(us: Column): Column = timestamp_micros(us.cast(LongType))
  def epochNanosToTs(ns: Column): Column = timestamp_micros(nsToMicros(ns))

  /** F3: RFC3339 string -> timestamp with year guard (time.go:60-94). */
  def zonedTimestamp(s: Column): Column = {
    val ts = to_timestamp(s)
    when(year(ts).between(1, 9999), ts)
  }

  /** F4: "HH:mm:ss.SSSSSS+TZ" time-with-timezone parse -> canonical string
    * that PRESERVES the input's offset (converters/time.go:96-118) —
    * rendering through the session zone would silently rewrite it.
    */
  def timeWithTimezone(s: Column): Column = {
    val instant = to_timestamp(concat(lit("1970-01-01T"), s))
    // offset forms: +-HH, +-HH:MM, +-HHMM, +-HH:MM:SS, Z (round-13
    // review: the hour-only Postgres timetz form `+05` fell through to
    // the empty match and the value was silently rewritten to UTC wall
    // time with a Z suffix — same instant, but the contract below is
    // that the INPUT's offset is preserved verbatim)
    val off = regexp_extract(s, "([+-]\\d{2}(?::?\\d{2})?(?::\\d{2})?|Z)$", 1)
    val zone = when(off === "Z" || off === "", "UTC").otherwise(off)
    concat(
      date_format(from_utc_timestamp(to_utc_timestamp(instant, current_timezone()), zone),
        "HH:mm:ss.SSSSSS"),
      when(off === "", "Z").otherwise(off))
  }

  /** F10: EWKB geometry (b64 in Debezium payloads) -> GeoJSON Feature. */
  def ewkbGeoJson(wkbB64: Column): Column =
    c(EwkbToGeoJson(e(unbase64(wkbB64))))

  /** F10 Point variant: x/y fields -> GeoJSON Feature (geometry.go:40-70). */
  def pointGeoJson(x: Column, y: Column): Column =
    concat(lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""),
      x.cast(StringType), lit(","), y.cast(StringType), lit("]}}"))

  /** S4: Mongo extended JSON -> plain JSON string. */
  def mongoExtJson(s: Column): Column = c(MongoExtJson(e(s)))

  /** F9: bits/bytes passthrough as base64 (basic.go:50-64). */
  def bitsToBase64(b: Column): Column = base64(b)

  /** P4: AES-GCM column encryption (non-deterministic; never applied to
    * PKs — enforced in CdcPipeline.Config, ref topic.go:297-314).
    */
  def encryptColumn(data: Column, key: Column): Column =
    base64(call_function("aes_encrypt", data.cast(BinaryType), key.cast(BinaryType), lit("GCM")))

  def decryptColumn(dataB64: Column, key: Column): Column =
    call_function("aes_decrypt", unbase64(dataB64), key.cast(BinaryType), lit("GCM")).cast(StringType)

  /** F13: float with "NaN" -> null (basic.go:67-96). */
  def float64NanNull(s: Column): Column =
    when(s === lit("NaN"), lit(null)).otherwise(s.cast(DoubleType))

  /** Multi-layout timestamp parse (parse_timestamp.go:100-140): first
    * format that parses wins.
    */
  def parseTimestampMulti(s: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(s, lit(f))): _*)

  // ---- output-side canonical strings (string_converter.go:33-407) ---------

  def canonicalString(col: Column, dt: DataType): Column = {
    val base = dt match {
      case TimestampType => date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      case TimestampNTZType => date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      case DateType => date_format(col, "yyyy-MM-dd")
      case BooleanType => when(col, "true").when(!col, "false") // null stays null
      case BinaryType => base64(col)
      case _: ArrayType | _: StructType | _: MapType => to_json(col)
      case _ => col.cast(StringType)
    }
    coalesce(base, lit(graft.Constants.NullValuePlaceholder))
  }

  /** P10: length cap -> exceeded marker (staging.go:25-41). */
  def cappedString(col: Column, maxLen: Int): Column =
    when(length(col) > maxLen, lit(graft.Constants.ExceededValuePlaceholder)).otherwise(col)

  /** P7: column-name sanitization (lib/typing/columns/columns.go:18-42):
    * lowercase, spaces/#/invalid chars escaped, digit prefix escaped.
    */
  def sanitizeName(name: String): String = {
    val lower = name.toLowerCase
    val replaced = lower.replace("#", "__").replaceAll("[^a-z0-9_]", "_")
    if (replaced.headOption.exists(_.isDigit)) "col_" + replaced else replaced
  }
}
