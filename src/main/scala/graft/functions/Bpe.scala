package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Direct evaluator for [[BpeTokenCount]] (r15).
  *
  * The original form unfolded into ~52 whole-string `replace()` passes
  * over the double-bar-framed document (see [[BpeMerges]]) — correct and
  * oracle-replayable, but every pass copied the full framed string, so
  * the tokenizer dominated q140/q229. This evaluator computes the SAME
  * count in one pass per rule over a symbol array, with a literal
  * framed-string replay as the fallback whenever the fast path's
  * symbol/framing bijection could diverge from the expression chain:
  *
  *  - the framing step is `regexp_replace(text, "(.)", "$1||")`; Java's
  *    `.` matches one CODE POINT and does NOT match line terminators
  *    (LF, CR, U+0085, U+2028, U+2029 -- DOTALL off), so a terminator
  *    glues onto the FOLLOWING symbol instead of being its own; and
  *  - a literal '|' in the text breaks the one-symbol-per-code-point
  *    framing bijection.
  *
  * Inputs containing '|' or any line terminator therefore take the
  * fallback, which replays the exact builtin chain semantics
  * (java.util.regex replaceAll + literal non-overlapping left-to-right
  * String.replace — the same matches UTF8String.replace finds, literal
  * substring occurrences being position-identical across UTF-8/UTF-16).
  * The count formula (separators − 1 − spaces) counts OCCURRENCES, so
  * it is encoding-unit-independent; on the fast path it reduces to
  * (symbols after merges) − (space chars).
  *
  * Equivalence of the fast path's merge pass with
  * `replace("|a||b|", "|ab|")`: symbols are '|'-free (single non-bar
  * code points initially, concatenations thereafter), so the pattern's
  * bars can only align with separator bars and every match corresponds
  * to an adjacent (a, b) symbol pair; replacement consumes the matched
  * segment and scanning resumes after it — i.e. left-to-right
  * non-overlapping adjacent-pair merging with the merged symbol not
  * reconsidered within the pass. DedupTextSpec pins both the by-hand
  * replay and the run-merging ("ananan") semantics, and a property test
  * pins fast == fallback on random inputs including '|' and newlines.
  */
object Bpe {
  private val rules: Array[(String, String)] = BpeMerges.rules.toArray

  // compiled once: every '|'/terminator-bearing document replays the
  // framing regex, and a per-row Pattern.compile would dominate that path
  private val FramePattern = java.util.regex.Pattern.compile("(.)")

  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  def countTokens(s: UTF8String): Long = {
    val str = s.toString
    var spaces = 0L
    var needSlow = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == ' ') spaces += 1
      if (c == '|' || isLineTerminator(c)) needSlow = true
      i += 1
    }
    if (needSlow) return slowCount(str, spaces)
    // fast path: one symbol per code point, merge passes in rule order
    var n = 0
    val syms = new Array[String](math.max(str.codePointCount(0, str.length), 1))
    i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val l = Character.charCount(cp)
      syms(n) = str.substring(i, i + l)
      n += 1
      i += l
    }
    var ruleIdx = 0
    while (ruleIdx < rules.length) {
      val (a, b) = rules(ruleIdx)
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == a && syms(read + 1) == b) {
          syms(write) = a + b
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      n = write
      ruleIdx += 1
    }
    // count = separators − 1 − spaces = (n_symbols + 1) − 1 − spaces
    n.toLong - spaces
  }

  /** Literal replay of the builtin chain for inputs the fast path's
    * bijection does not cover: frame with the same regex, fold the same
    * literal replaces, count non-overlapping "||" separators.
    */
  private[graft] def slowCount(str: String, spaces: Long): Long = {
    var framed = "||" + FramePattern.matcher(str).replaceAll("$1||")
    var ruleIdx = 0
    while (ruleIdx < rules.length) {
      val (a, b) = rules(ruleIdx)
      framed = framed.replace(s"|$a||$b|", s"|$a$b|")
      ruleIdx += 1
    }
    var seps = 0L
    var i = 0
    while (i >= 0) {
      i = framed.indexOf("||", i)
      if (i >= 0) { seps += 1; i += 2 }
    }
    seps - 1L - spaces
  }
}
