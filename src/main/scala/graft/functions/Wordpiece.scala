package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Greedy wordpiece/BPE-style subword tokenizer over a FIXTURE vocabulary
  * — the real token-budget currency of a training-data pipeline (the
  * whitespace/heuristic counts of q28/q66 under-count by the subword
  * expansion factor). Public algorithm: greedy longest-prefix match (the
  * WordPiece inference rule of Wu et al. 2016 / the tokenizers "greedy"
  * backend), restricted to piece lengths <= 4 so the DuckDB oracle can
  * replay it NON-recursively with per-position membership probes + one
  * list_reduce (see q80).
  *
  * Semantics, per whitespace-separated word: at each position try the
  * 4-char piece, then 3, then 2; first hit consumes that many chars as
  * one token, otherwise the single CODEPOINT is its own token (implicit
  * 1-char vocab — no <unk>; an astral surrogate pair consumes as one
  * token, so the count agrees with the oracle's codepoint semantics on
  * the full Unicode range, emoji and CJK-extension text included).
  *
  * The vocabulary is a deterministic fixture (common English + corpus
  * subwords), one sorted packed-key array per piece length: a probe is
  * a 7-step binary search over a long, zero allocation per char. The
  * oracle SQL interpolates the SAME lists ([[v2]]/[[v3]]/[[v4]]), so the
  * two sides can never drift.
  */
object Wordpiece {
  val v2: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "or", "te", "ow", "ed", "is", "it", "al", "ar", "st", "to",
    "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me",
    "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li",
    "ch", "ll", "be", "ma", "si", "om", "ur", "ta", "sc", "up",
    "ba", "am", "sl", "sm", "pa", "qu", "ue", "ck", "ey", "ry",
    "rt", "ge", "bl", "fi", "lt", "wi", "do", "sp", "rk", "ab",
    "gr", "va", "lu", "cu", "da", "py").distinct
  val v3: Seq[String] = Seq(
    "the", "ing", "and", "ion", "ent", "for", "tab", "sor", "joi",
    "par", "win", "mer", "que", "fil", "str", "spa", "bat", "dat",
    "has", "sca", "slo", "fas", "sma", "gro", "col", "val", "cus",
    "ord", "lin", "agg", "row", "key", "big", "dow", "ble", "rge",
    "ery", "ter", "eam", "ark", "tch", "ata", "ash", "can", "low",
    "ast", "all", "oup", "umn", "lue", "der", "ine").distinct
  val v4: Seq[String] = Seq(
    "sort", "join", "part", "wind", "tabl", "merg", "quer", "filt",
    "stre", "spar", "batc", "data", "hash", "scan", "slow", "fast",
    "smal", "grou", "colu", "valu", "cust", "orde", "line", "tion",
    "atio", "ment", "ndow").distinct

  /** Chars packed 16 bits each, most-significant first — unique per
    * string within one fixed length, so each per-length array is
    * binary-searchable.
    */
  private def pack(s: String): Long = {
    var k = 0L
    var i = 0
    while (i < s.length) { k = (k << 16) | s.charAt(i); i += 1 }
    k
  }
  private def packedSorted(v: Seq[String], len: Int): Array[Long] = {
    require(v.forall(_.length == len), s"vocab pieces must all be length $len")
    require(v.distinct.size == v.size, "duplicate vocab piece")
    v.map(pack).sorted.toArray
  }
  private val p2 = packedSorted(v2, 2)
  private val p3 = packedSorted(v3, 3)
  private val p4 = packedSorted(v4, 4)

  /** Greedy longest-match step length at position i of s (1 when no
    * piece matches). `end` bounds the current word.
    *
    * r16 A/B note: a prefix-trie rewrite (one walk, <= 4 child-array
    * derefs) measured SLOWER than these three packed-key binary searches
    * on fresh JVMs — q298 0.41 -> 0.71 s, q229 1.00 -> 1.11 s (min-of-6,
    * 32 cores). The sorted long arrays are contiguous and branch-predict
    * well at this vocab size (27/51/76 entries); the trie's dependent
    * 2-D loads do not. Reverted; revisit only with a vocab 100x bigger.
    */
  private def step(s: String, i: Int, end: Int): Int = {
    if (i + 4 <= end) {
      val k = pack4(s, i)
      if (java.util.Arrays.binarySearch(p4, k) >= 0) return 4
    }
    if (i + 3 <= end) {
      val k = (s.charAt(i).toLong << 32) | (s.charAt(i + 1).toLong << 16) | s.charAt(i + 2)
      if (java.util.Arrays.binarySearch(p3, k) >= 0) return 3
    }
    if (i + 2 <= end) {
      val k = (s.charAt(i).toLong << 16) | s.charAt(i + 1)
      if (java.util.Arrays.binarySearch(p2, k) >= 0) return 2
    }
    // an astral codepoint is ONE token: consume the whole surrogate pair,
    // matching the oracle's codepoint counting (the vocab is ASCII, so a
    // surrogate can never have matched a piece probe above)
    if (i + 2 <= end && Character.isHighSurrogate(s.charAt(i)) &&
      Character.isLowSurrogate(s.charAt(i + 1))) return 2
    1
  }
  private def pack4(s: String, i: Int): Long =
    (s.charAt(i).toLong << 48) | (s.charAt(i + 1).toLong << 32) |
      (s.charAt(i + 2).toLong << 16) | s.charAt(i + 3)

  /** Token count of the word s[from, end). */
  def countWord(s: String, from: Int, end: Int): Long = {
    var i = from
    var n = 0L
    while (i < end) { i += step(s, i, end); n += 1 }
    n
  }

  /** Reference implementation on a single word (property tests). */
  def countWord(w: String): Long = countWord(w, 0, w.length)

  /** Document token count: sum of per-word counts over single-space
    * separation (consecutive spaces yield empty words, which count 0 —
    * the same as the oracle's string_split).
    */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var i = 0
    var n = 0L
    while (i < s.length) {
      var end = s.indexOf(' ', i)
      if (end < 0) end = s.length
      n += countWord(s, i, end)
      i = end + 1
    }
    n
  }
}
