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
  * subwords) compiled once into a prefix trie: a position's longest
  * match is one walk of at most 4 array derefs, zero allocation per
  * char (r16 — the r15 form ran up to three sorted-array binary
  * searches per position). The oracle SQL interpolates the SAME lists
  * ([[v2]]/[[v3]]/[[v4]]), so the two sides can never drift.
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

  // the per-length vocab invariants the packed-key probe used to assert
  require(v2.forall(_.length == 2) && v3.forall(_.length == 3) &&
    v4.forall(_.length == 4), "vocab piece with the wrong length")

  /** Prefix trie over the (all-lowercase-ASCII) vocab — r16: the r15
    * step probed up to THREE sorted arrays per position (4-, 3-, then
    * 2-char keys, ~18 branchy compares); one trie walk reads at most 4
    * chars with one array deref each and returns the DEEPEST terminal,
    * which is by construction the same longest match. `trieNext(n)(c)`
    * is the child of node n on letter c (-1 = none); `trieTerm(n)` is
    * the piece length ending at n (0 = none). ~154 pieces → a few
    * hundred nodes, built once.
    */
  private val (trieNext, trieTerm): (Array[Array[Int]], Array[Int]) = {
    val next = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.fill(26)(-1))
    val term = scala.collection.mutable.ArrayBuffer[Int](0)
    def add(p: String): Unit = {
      var n = 0
      p.foreach { ch =>
        require(ch >= 'a' && ch <= 'z', s"vocab piece '$p' is not lowercase ASCII")
        val c = ch - 'a'
        if (next(n)(c) < 0) {
          next(n)(c) = next.length
          next += Array.fill(26)(-1)
          term += 0
        }
        n = next(n)(c)
      }
      term(n) = p.length
    }
    (v2 ++ v3 ++ v4).foreach(add)
    (next.toArray, term.toArray)
  }

  /** Greedy longest-match step length at position i of s (1 when no
    * piece matches). `end` bounds the current word. The trie's deepest
    * terminal within [i, min(end, i+4)) IS the r15 probe order's result:
    * a depth-d terminal exists iff the d-char prefix is a vocab piece.
    */
  private def step(s: String, i: Int, end: Int): Int = {
    var n = 0
    var j = i
    var best = 1
    val lim = math.min(end, i + 4)
    var walking = true
    while (walking && j < lim) {
      val c = s.charAt(j) - 'a'
      if (c < 0 || c >= 26) walking = false
      else {
        val nx = trieNext(n)(c)
        if (nx < 0) walking = false
        else {
          n = nx
          j += 1
          if (trieTerm(n) > 0) best = j - i
        }
      }
    }
    if (best > 1) return best
    // an astral codepoint is ONE token: consume the whole surrogate pair,
    // matching the oracle's codepoint counting (the vocab is ASCII, so a
    // surrogate can never have matched a trie walk above)
    if (i + 2 <= end && Character.isHighSurrogate(s.charAt(i)) &&
      Character.isLowSurrogate(s.charAt(i + 1))) return 2
    1
  }

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
