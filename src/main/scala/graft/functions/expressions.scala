package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Concat, Expression, Length, Literal, RegExpReplace, RuntimeReplaceable, StringReplace, StringTranslate, Subtract, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers shared between interpreted eval and generated code. */
object DebeziumCodec {
  /** Big-endian two's-complement bytes + scale -> Decimal.
    * Semantics of the reference's Kafka Connect decimal decode
    * (lib/debezium/converters/decimal.go:150-219): unscaled =
    * BigInteger(bytes), value = BigDecimal(unscaled, scale).
    */
  def decode(bytes: Array[Byte], precision: Int, scale: Int): Decimal = {
    val bi =
      if (bytes == null || bytes.isEmpty) java.math.BigInteger.ZERO
      else new java.math.BigInteger(bytes)
    Decimal(new java.math.BigDecimal(bi, scale), precision, scale)
  }

  /** Long -> minimal big-endian two's-complement bytes (encode side,
    * decimal.go:16-118). */
  def encodeLong(v: Long): Array[Byte] =
    java.math.BigInteger.valueOf(v).toByteArray

  def gunzip(in: Array[Byte]): Array[Byte] = {
    val gz = new GZIPInputStream(new ByteArrayInputStream(in))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = gz.read(buf)
    while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = gz.read(buf) }
    gz.close()
    out.toByteArray
  }

  def gzip(in: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(in); gz.close()
    bos.toByteArray
  }

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private val mapper = new ObjectMapper()

  private def sortNode(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val sorted = mapper.createObjectNode()
      val names = new java.util.ArrayList[String]()
      o.fieldNames().forEachRemaining(f => names.add(f))
      java.util.Collections.sort(names)
      names.forEach { f => sorted.set[JsonNode](f, sortNode(o.get(f))); () }
      sorted
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach { e => out.add(sortNode(e)); () }
      out
    case other => other
  }

  /** Canonical JSON: parse (duplicate keys -> last wins, as Jackson does),
    * recursively sort object keys, re-serialize compactly. Mirrors the
    * reference's json re-marshal canonicalization (lib/jsonutil). Returns
    * null for unparseable input.
    */
  def canonicalJson(s: String): String =
    try mapper.writeValueAsString(sortNode(mapper.readTree(s)))
    catch { case e: Exception =>
      if (sys.props.contains("graft.debug")) e.printStackTrace()
      null
    }

  /** Codegen entry point for [[graft.functions.CanonicalJson]] (null =
    * unparseable input).
    */
  def canonicalJsonUtf8(s: UTF8String): UTF8String = {
    val out = canonicalJson(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** Deterministic 64-bit rolling fingerprint over unicode code points:
    * acc = (acc * 31 + cp) mod 1_000_000_007. Kept within int64 and simple
    * enough to reproduce in any engine (the DuckDB oracle replays it with
    * list_reduce).
    */
  def fingerprint64(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Independent second fingerprint lane — different multiplier AND
    * modulus: acc = (acc * 1000003 + cp) mod 998_244_353. Paired with
    * [[fingerprint64]] it widens a ~2^30 identity to ~2^60 (both lanes
    * must collide), which the exact span-dedup family needs: at corpus
    * scale a single 30-bit span fingerprint yields real cross-document
    * collisions (birthday at ~45k distinct spans) and span REMOVAL is
    * destructive. Same engine-portable shape (the oracle replays it with
    * a second list_reduce).
    */
  def fingerprintB(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 1000003 + cp) % 998244353L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Decode a Debezium/Kafka-Connect `Decimal`: big-endian two's-complement
  * bytes at a fixed scale. Codegen-friendly (stays inside whole-stage
  * codegen); ref: lib/debezium/converters/decimal.go:150-219.
  */
case class DebeziumDecimalDecode(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"debezium_decimal needs BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = DecimalType(precision, scale)
  override def nullSafeEval(input: Any): Any =
    DebeziumCodec.decode(input.asInstanceOf[Array[Byte]], precision, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.DebeziumCodec.decode($b, $precision, $scale)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode a long as minimal big-endian two's-complement bytes (the inverse
  * of [[DebeziumDecimalDecode]] for integral cents-style values).
  */
case class TwosComplementEncode(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"twos_complement_bytes needs BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    DebeziumCodec.encodeLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.DebeziumCodec.encodeLong($v)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gunzip a binary column (custom `compressed` Debezium flag,
  * lib/debezium/types.go:156-184). Not on the hot path -> CodegenFallback.
  */
case class Gunzip(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gunzip needs BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // invalid gzip payloads yield null
  override def nullSafeEval(input: Any): Any =
    try DebeziumCodec.gunzip(input.asInstanceOf[Array[Byte]])
    catch { case _: Exception => null }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** HMAC-SHA256(key, data) -> binary. Column-hashing transform with salt
  * (ref: models/event/event_util.go:146-150 + lib/cryptography).
  */
case class HmacSha256(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hmac_sha256 needs (BINARY, BINARY) input, got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(key: Any, data: Any): Any =
    DebeziumCodec.hmacSha256(key.asInstanceOf[Array[Byte]], data.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Canonicalize a JSON string: duplicate keys last-wins, keys sorted,
  * compact serialization (ref: lib/jsonutil + converters/basic.go:14-31).
  */
case class CanonicalJson(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"canonical_json needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  // unparseable (non-null) input yields null — without this override
  // NullPropagation would fold `IS NULL` to false over a non-nullable
  // child, and nullSafeCodeGen would not declare the isNull slot the
  // generated code assigns
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    DebeziumCodec.canonicalJsonUtf8(input.asInstanceOf[UTF8String])
  // real codegen (not CodegenFallback): a fallback here would break the
  // whole-stage span of every projection that canonicalizes JSON (the q43
  // decode path runs this per row). Unparseable input yields null, so the
  // generated code re-checks nullness after the call.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.DebeziumCodec.canonicalJsonUtf8($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit rolling document fingerprint (SURVEY §2 text-analysis ops). */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    DebeziumCodec.fingerprint64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DebeziumCodec.fingerprint64($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Second fingerprint lane ([[DebeziumCodec.fingerprintB]]) — pairs with
  * [[Fingerprint64]] to widen span identities to ~2^60.
  */
case class FingerprintB(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint_b needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    DebeziumCodec.fingerprintB(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DebeziumCodec.fingerprintB($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[NfcStripAccents]], shared between interpreted
  * eval and generated code.
  */
object TextCodec {
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** NFD → drop combining marks → NFC: "café" (precomposed or combining)
    * → "cafe". The composition is the documented behavior of DuckDB's
    * `strip_accents` for Latin-script accents, which is what the oracle
    * replays.
    */
  def nfcStripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val stripped = CombiningMarks.matcher(nfd).replaceAll("")
    UTF8String.fromString(
      java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC))
  }

  /** Luhn checksum over an ASCII-digit string (mod-10, double every
    * second digit from the right, subtract 9 above 9): true iff the
    * string is 13-19 digits (the ISO/IEC 7812 PAN length range) and the
    * checksum holds. Any non-digit byte -> false (the caller extracts
    * candidate digit runs first). Single left-to-right pass over the
    * raw bytes, no allocation.
    */
  def luhnValid(s: UTF8String): Boolean = {
    val n = s.numBytes()
    if (n < 13 || n > 19) return false
    var sum = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < '0' || b > '9') return false
      var d = b - '0'
      // double digits at even distance-from-right-end offsets 1,3,5,...
      if (((n - 1 - i) & 1) == 1) {
        d *= 2
        if (d > 9) d -= 9
      }
      sum += d
      i += 1
    }
    sum % 10 == 0
  }

  /** Packed per-document syllable statistics over space-delimited
    * lowercase text: words = non-empty tokens, syllables = maximal
    * `[aeiouy]` runs summed over words, monosyllables = words with
    * exactly one run — the three counts readability formulas (FORCAST,
    * Flesch) consume. Single left-to-right pass over the raw UTF-8
    * bytes, no allocation; each count saturates at 2^21−1 and the
    * triple packs as (words<<42)|(syllables<<21)|monosyllables so one
    * codegen'd call feeds all three columns. Non-ASCII bytes are
    * consonant-like (the contract the list-based oracle replays on a
    * lowercase-ASCII corpus).
    */
  def syllablePack(s: UTF8String): Long = {
    val n = s.numBytes()
    var words = 0L
    var syll = 0L
    var mono = 0L
    var inWord = false
    var inRun = false
    var runs = 0L
    var i = 0
    while (i <= n) {
      val b: Int = if (i < n) s.getByte(i) & 0xff else ' '
      if (b == ' ') {
        if (inWord) {
          words += 1
          syll += runs
          if (runs == 1L) mono += 1
        }
        inWord = false
        inRun = false
        runs = 0L
      } else {
        inWord = true
        val v = b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u' || b == 'y'
        if (v && !inRun) runs += 1
        inRun = v
      }
      i += 1
    }
    val cap = (1L << 21) - 1
    (math.min(words, cap) << 42) | (math.min(syll, cap) << 21) | math.min(mono, cap)
  }

  /** Unrestricted Damerau–Levenshtein distance (Lowrance & Wagner 1975,
    * "An extension of the string-to-string correction problem") over RAW
    * UTF-8 BYTES — the exact contract of DuckDB's `damerau_levenshtein`
    * (byte-level, FULL variant: 'CA'→'ABC' is 2, not OSA's 3; a
    * non-ASCII codepoint counts one edit per byte), which the oracle
    * replays. O(n·m) time/space; operands are capped at 256 bytes so
    * the per-row matrix stays a bounded transient (≈270 KB) — the
    * intended domain is words/names/codes, not documents.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val n = a.numBytes()
    val m = b.numBytes()
    require(n <= 256 && m <= 256,
      s"graft_damerau_levenshtein operands are capped at 256 bytes, got $n/$m")
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val da = new Array[Int](256)
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.getByte(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val bj = b.getByte(j - 1) & 0xff
        val k = da(bj)
        val l = db
        var cost = 1
        if (ai == bj) { db = j; cost = 0 }
        var mn = d(i * w + j) + cost             // substitute / match
        val del = d(i * w + j + 1) + 1           // delete from a
        if (del < mn) mn = del
        val ins = d((i + 1) * w + j) + 1         // insert into a
        if (ins < mn) mn = ins
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tra < mn) mn = tra
        d((i + 1) * w + j + 1) = mn
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }
}

/** Greedy wordpiece subword token count over the [[Wordpiece]] fixture
  * vocabulary — codegen'd call into the static counter (sorted packed-key
  * binary search per position, zero allocation), so BPE-token budgeting
  * stays inside whole-stage codegen like every other text metric.
  */
case class WordpieceTokenCount(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wordpiece_tokens needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Wordpiece.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Wordpiece.countTokens($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge-rule BPE token count over the ordered [[BpeMerges]] fixture —
  * the Sennrich-style counterpart to [[WordpieceTokenCount]]'s greedy
  * longest-match. RuntimeReplaceable: the tokenizer IS a fold of builtin
  * string expressions, so instead of bespoke eval/codegen this unfolds
  * into that builtin chain and whole-stage codegen compiles it like a
  * hand-written column. Symbols are framed with DOUBLED bars
  * (`"ab"` -> `"||a||b||"`) and one merge rule is one non-regex
  * `replace("|a||b|", "|ab|")` pass: the double separator donates one
  * guard bar to each side, so a consecutive run of the same pair merges
  * at every non-overlapping instance in a single pass — exactly the
  * semantics of Sennrich's `apply_bpe` regex substitution, with the
  * zero-width lookaround guards replaced by consumable bars (RE2-safe,
  * so the DuckDB oracle of q140 replays the identical chain). Counting:
  * a string of n symbols carries exactly n+1 double-bar separators, an
  * invariant every replacement preserves.
  */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression {
  // r15: direct evaluator instead of the unfolded ~52-pass builtin
  // replace() chain — each pass copied the whole framed string, making
  // the tokenizer the dominant cost of q140/q229. [[graft.functions.Bpe]]
  // computes the identical count (the '|'/line-terminator inputs the
  // symbol bijection cannot cover take a literal chain replay inside the
  // helper); the q140 oracle still replays the chain in SQL, which now
  // CROSS-checks this evaluator instead of mirroring its implementation.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Bpe.countTokens($s)")
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Unicode canonicalization: NFC with combining marks stripped — the
  * text-normalization step before exact/near dedup, so visually identical
  * strings with different codepoint sequences collapse. Codegen'd call
  * into the static helper (no UDF, stays inside whole-stage codegen).
  */
/** Luhn PAN checksum validator ([[TextCodec.luhnValid]]) — the
  * false-positive filter behind card-number scrubbing: a 16-digit run is
  * only redacted if the checksum holds, so order ids and timestamps
  * survive. Codegen'd; SQL-registered as `graft_luhn_valid`.
  */
case class LuhnValid(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"luhn_valid needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    TextCodec.luhnValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextCodec.luhnValid($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed syllable statistics ([[TextCodec.syllablePack]]) — one
  * codegen'd pass yields (words, syllables, monosyllables) as bit
  * fields of a single long; SQL-registered as `graft_syllable_pack`.
  */
case class SyllablePack(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"syllable_pack needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextCodec.syllablePack(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextCodec.syllablePack($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-level full Damerau–Levenshtein distance between two strings —
  * codegen'd call into [[TextCodec.damerauLevenshtein]] (Lowrance–Wagner,
  * matching DuckDB's `damerau_levenshtein` bit-for-bit), the
  * transposition-aware typo metric the linkage/blocking operators layer
  * on top of plain `levenshtein`.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein needs STRING inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextCodec.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextCodec.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class NfcStripAccents(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_strip_accents needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextCodec.nfcStripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextCodec.nfcStripAccents($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Allocation-free dot product over two array<double> columns. The
  * higher-order `aggregate(zip_with(...))` formulation materializes a
  * zipped array per row; this expression is a tight codegen'd loop —
  * the hot kernel of the similarity-search operators. Accumulation is
  * strictly left-to-right (IEEE-deterministic, matching a sequential
  * oracle implementation).
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true // containsNull-agnostic
      case _ => false
    })
    // getDouble over non-double slots would return silent garbage
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot needs two ARRAY<DOUBLE> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static Morton-interleave helper shared by interpreted eval and
  * generated code: the classic parallel-prefix bit spread (public
  * bit-twiddling identity), so the per-row cost is 12 shift/mask ops —
  * no loop over bits.
  */
object ZOrder {
  /** Spread the low 32 bits of v into the even bit positions. */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low `bits` (<= 31) bits of x (even positions) and y
    * (odd positions) — the Z-order / Morton clustering key.
    */
  def morton(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    spread(x & mask) | (spread(y & mask) << 1)
  }
}

/** Z-order (Morton) clustering key: interleaves two dimension columns
  * into one sort key so range predicates on EITHER dimension stay
  * data-local after a sort — the lakehouse multi-dimensional clustering
  * primitive (Delta/Iceberg Z-ORDER). Codegen-resident: 12 shift/mask
  * ops inline in whole-stage codegen.
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"zorder bits must be in [1,31], got $bits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder_key needs (BIGINT, BIGINT) input, got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.morton(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.morton($x, $y, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** F7: variable-scale decimal {scale, value: bytes} -> exact-scale plain
  * text (the reference stores variable NUMERIC as TEXT at the payload's
  * own scale, decimal.go:156-198 — a fixed render scale would pad or
  * truncate).
  */
case class VariableScaleDecimalText(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val scaleOk = right.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (left.dataType == BinaryType && scaleOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"variable_scale_decimal needs (BINARY, INT) input, got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = StringType
  override protected def nullSafeEval(bytes: Any, scale: Any): Any = {
    val bi =
      if (bytes.asInstanceOf[Array[Byte]].isEmpty) java.math.BigInteger.ZERO
      else new java.math.BigInteger(bytes.asInstanceOf[Array[Byte]])
    val s = scale.asInstanceOf[Number].intValue()
    UTF8String.fromString(new java.math.BigDecimal(bi, s).toPlainString)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static helper for [[HashedShingles]], shared by interpreted eval and
  * generated code: tokenize once, then one xxhash64 seed-chain per word
  * n-gram window — bit-identical to the declarative form
  * `transform(sequence(1, cnt), i -> xxhash64(element_at(toks, i)...
  * element_at(toks, i+n-1)))` over `split(text, ' ')` (same UTF8String
  * split, same 42 seed, same per-token chain), which is what
  * DedupTextSpec pins.
  */
object ShingleCodec {
  private val Space = UTF8String.fromString(" ")
  private val Empty =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
  private val EmptyStr =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[AnyRef])

  /** STRING word n-gram shingles in one pass — bit-identical to the
    * declarative `transform(sequence(1, cnt), i -> concat_ws(" ",
    * element_at(toks, i) ... element_at(toks, i+n-1)))` over
    * `split(text, ' ')` (same UTF8String split keeping trailing empties,
    * same space joiner), which DedupTextSpec pins. The shape every
    * oracle-hashed shingle consumer needs (the oracle hashes shingle
    * TEXT, so [[hashedShingles]] cannot replace these call sites).
    */
  def stringShingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(Space, -1)
    val cnt = toks.length - (n - 1)
    if (cnt < 1) return EmptyStr
    val out = new Array[AnyRef](cnt)
    var i = 0
    while (i < cnt) {
      out(i) =
        if (n == 1) toks(i)
        else UTF8String.concatWs(Space,
          java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def hashedShingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(Space, -1)
    val cnt = toks.length - (n - 1)
    if (cnt < 1) return Empty
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 42L // XxHash64's default seed
      var j = 0
      while (j < n) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(toks(i + j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** [[hashedShingles]] with the per-document dedup FUSED into the same
    * pass (r16): bit-equal to `array_distinct(hashedShingles(...))` —
    * first occurrence kept, encounter order preserved — without
    * materializing the duplicate-bearing array and re-walking it through
    * ArrayDistinct's per-row hash set. Open addressing over a
    * power-of-two table; value equality is exact long equality, so no
    * sentinel is needed for any hash value.
    */
  def hashedShinglesDistinct(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(Space, -1)
    val cnt = toks.length - (n - 1)
    if (cnt < 1) return Empty
    var cap = 4
    while (cap < cnt * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    val out = new Array[Long](cnt)
    var m = 0
    var i = 0
    while (i < cnt) {
      var h = 42L
      var j = 0
      while (j < n) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(toks(i + j), h)
        j += 1
      }
      // finalizer-style mix so clustered xxhash outputs probe evenly
      val mixed = h * -7046029254386353131L
      var p = ((mixed ^ (mixed >>> 32)).toInt) & mask
      var dup = false
      var probing = true
      while (probing) {
        val slot = table(p)
        if (slot < 0) probing = false
        else if (out(slot) == h) { dup = true; probing = false }
        else p = (p + 1) & mask
      }
      if (!dup) {
        table(p) = m
        out(m) = h
        m += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (m == cnt) out else java.util.Arrays.copyOf(out, m))
  }

  /** [[stringShingles]] with the dedup fused — bit-equal to
    * `array_distinct(stringShingles(...))` (first occurrence, encounter
    * order). UTF8String equality is byte equality, matching
    * ArrayDistinct's semantics on strings.
    */
  def stringShinglesDistinct(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(Space, -1)
    val cnt = toks.length - (n - 1)
    if (cnt < 1) return EmptyStr
    val seen = new java.util.HashSet[UTF8String](cnt * 2)
    val out = new Array[AnyRef](cnt)
    var m = 0
    var i = 0
    while (i < cnt) {
      val s =
        if (n == 1) toks(i)
        else UTF8String.concatWs(Space,
          java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      if (seen.add(s)) { out(m) = s; m += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (m == cnt) out else java.util.Arrays.copyOf(out, m))
  }
}

/** Hashed word n-gram shingles of a TEXT column in one codegen'd pass.
  *
  * The declarative composition (`transform` over `sequence` with
  * `element_at` into a `split`) is a higher-order function — Spark
  * evaluates HOF lambdas interpreted (CodegenFallback), and because the
  * un-aliased `split` subtree sits INSIDE the lambda body it re-executes
  * once per `element_at`, i.e. n times per shingle — measured at ~2.6 s
  * for a 2,500-doc batch, the dominant term of every index-probe query
  * (q54/q75). This expression tokenizes once and hash-chains in a tight
  * loop inside whole-stage codegen; DedupTextSpec pins bit-equality with
  * the declarative form.
  */
case class HashedShingles(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  private val codecFn = if (distinct) "hashedShinglesDistinct" else "hashedShingles"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    if (distinct) ShingleCodec.hashedShinglesDistinct(input.asInstanceOf[UTF8String], n)
    else ShingleCodec.hashedShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ShingleCodec.$codecFn($s, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** String word n-gram shingles of a TEXT column in one codegen'd pass —
  * the [[HashedShingles]] treatment for the call sites whose DOWNSTREAM
  * needs the shingle text (KMV resemblance, jaccard verify, oracle-hashed
  * contamination screens). Same HOF-interpretation pathology, same fix:
  * tokenize once, window-join in a tight loop inside whole-stage codegen.
  *
  * NULL-input divergence from the declarative twin
  * (`shingleArrayFromTokens`): this expression is null-in → null-out
  * (UnaryExpression nullSafeEval), while the when/otherwise form yields
  * an EMPTY ARRAY for null text. Every current call site wraps the
  * result in `explode()`, where null and empty both contribute zero
  * rows, so the forms agree on all reachable outputs — a future
  * non-explode consumer on nullable text must `coalesce(…, array())`
  * to match the declarative semantics. (Same caveat applies to
  * [[HashedShingles]].)
  */
case class StringShingles(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  private val codecFn = if (distinct) "stringShinglesDistinct" else "stringShingles"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"string_shingles needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    if (distinct) ShingleCodec.stringShinglesDistinct(input.asInstanceOf[UTF8String], n)
    else ShingleCodec.stringShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ShingleCodec.$codecFn($s, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[SimhashFp30Sig]]: the 30-bit SimHash of a document
  * over word-bigram features hashed with the engine-portable rolling
  * fingerprint, in one row-local pass — bit-equal to the exploded
  * `sum(±1 per bit)` aggregation in `DedupOps.simhashFp30` (same space
  * split, same `(acc*31+cp) % 1e9+7` roll over the "w1 w2" bigram string,
  * same `2*ones > n` sign test), which DedupTextSpec pins.
  */
object SimhashCodec {
  private val P = 1000000007L
  private val Space = UTF8String.fromString(" ")

  /** Roll `acc` over the code points of `s` (the fingerprint64 step
    * function applied to one token; chunk-associative because the roll
    * is strictly left-to-right).
    */
  private def roll(acc0: Long, s: UTF8String): Long = {
    val str = s.toString
    var acc = acc0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** The 30-bit signature, or null for a document with < 2 tokens — the
    * exploded-aggregation form emits NO row for such a doc (no bigram to
    * group on), so callers filter nulls to reproduce the same relation.
    */
  def simhashFp30(text: UTF8String): java.lang.Long = {
    val toks = text.split(Space, -1)
    val nBg = toks.length - 1
    if (nBg < 1) return null
    val ones = new Array[Int](30)
    var i = 0
    while (i < nBg) {
      // fingerprint64("w1 w2") without building the bigram string
      val fp = roll((roll(0L, toks(i)) * 31 + ' ') % P, toks(i + 1))
      var j = 0
      while (j < 30) {
        if (((fp >>> j) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 30) {
      if (2L * ones(j) > nBg) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** Row-local 30-bit SimHash over word bigrams (see [[SimhashCodec]]):
  * signing becomes a narrow projection with ZERO exchanges, replacing the
  * bigram explode → 15-packed-lane aggregation — the same 100 TB shape
  * win as [[MinhashSig]]. Null (filtered by the caller) for < 2 tokens.
  */
case class SimhashFp30Sig(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_fp30 needs STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // < 2 tokens -> null
  override def nullSafeEval(input: Any): Any = {
    val v = SimhashCodec.simhashFp30(input.asInstanceOf[UTF8String])
    if (v == null) null else v.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_boxed = graft.functions.SimhashCodec.simhashFp30($c);
      ${ev.isNull} = ${ev.value}_boxed == null;
      ${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_boxed.longValue();
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[MinhashSig]]: all k lane minima of a hashed
  * shingle array in one row-local pass — bit-equal to the exploded
  * `minhashSignaturesFromHashes` aggregation (same `pmod(h, P)`, same
  * LCG (a, b) coefficient stream, same 15-bit `>>> 16` lanes, same min),
  * which DedupTextSpec pins. Coefficients are cached per k.
  */
object MinhashCodec {
  private val P = 2147483647L // DedupOps.MinhashPrime (2^31 - 1)
  private val coeffCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, { kk =>
      // the DedupOps.coeffs LCG, duplicated verbatim: both must emit the
      // SAME permutation stream or signatures stop matching the index
      var state = 42L
      def next(): Long = {
        state = state * 6364136223846793005L + 1442695040888963407L
        (state >>> 33) % (P - 1)
      }
      val as = Array.fill(kk)(next() + 1)
      val bs = Array.fill(kk)(next())
      (as, bs)
    })

  /** Lane minima (k longs in [0, 2^15)); empty input yields null — the
    * exploded aggregation form produces NO row for a shingle-less doc,
    * so callers filter empties either way and null keeps that visible.
    */
  def signature(hs: org.apache.spark.sql.catalyst.util.ArrayData,
                k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = hs.numElements()
    if (m == 0) return null
    val (as, bs) = coeffs(k)
    val out = Array.fill(k)(Long.MaxValue)
    var e = 0
    while (e < m) {
      val h0 = hs.getLong(e)
      val h = ((h0 % P) + P) % P // pmod
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P >>> 16
        if (v < out(i)) out(i) = v
        i += 1
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Row-local MinHash signature over a hashed shingle array: the k lane
  * minima in one codegen'd loop, replacing the explode → groupBy(id)
  * aggregation on the index-probe path. Row-local signatures are the
  * 100 TB shape — signing becomes embarrassingly parallel with ZERO
  * exchanges; the only shuffle left in an index probe is the band join.
  */
case class MinhashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs ARRAY<BIGINT> input, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle array -> null
  override def nullSafeEval(input: Any): Any =
    MinhashCodec.signature(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashCodec.signature($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
