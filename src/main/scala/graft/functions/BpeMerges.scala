package graft.functions

/** Ordered BPE merge table — the OTHER standard subword tokenizer family
  * next to [[Wordpiece]]'s greedy longest-match: byte-pair encoding
  * applies an ordered list of pair-merge rules (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"), each
  * rule rewriting every adjacent symbol pair (a, b) into the fused
  * symbol ab, in rule order.
  *
  * The executable trick (used by both the Spark side and the DuckDB
  * oracle, so they can never drift): a document is encoded with
  * DOUBLE-bar-separated symbols (`"ab cd"` -> `"||a||b|| ||c||d||"`
  * sans the space symbol's own framing being special) and one merge
  * rule is ONE non-regex `replace("|a||b|", "|ab|")` pass. The pattern
  * takes one guard bar from each side's double, so (a) a symbol can
  * never false-match as the suffix/prefix of a longer symbol, and (b) a
  * consecutive run of the same pair keeps a guard bar available for the
  * next instance — one left-to-right non-overlapping pass merges
  * `a a a a` to `aa aa`, exactly Sennrich's `apply_bpe` re.sub
  * semantics with the zero-width lookarounds turned into consumable
  * bars (no lookaround needed, so RE2-only engines replay it). Merges
  * never cross a word boundary because the space stays its own symbol
  * and no rule contains a space.
  *
  * The table is a deterministic fixture learned-by-hand from the corpus
  * vocabulary (the same common-word population [[Wordpiece]] targets);
  * order matters and is part of the fixture. Rules are letter-only, so
  * any text whose alphabet avoids `|` is encoded losslessly.
  */
object BpeMerges {
  /** (left, right) -> left+right, applied in this exact order. */
  val rules: Seq[(String, String)] = Seq(
    // char-pair layer: frequent English digraphs in the corpus vocab
    ("c", "h"), ("t", "h"), ("th", "e"), // the
    ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "r"), ("o", "r"), ("a", "r"),
    ("a", "t"), ("a", "s"), ("o", "w"),
    ("l", "e"), ("u", "e"), ("e", "y"),
    // word layer: fuse the highest-frequency corpus words end-to-end
    ("l", "ow"), ("s", "low"),                    // slow
    ("j", "o"), ("jo", "in"),                     // join
    ("s", "c"), ("sc", "an"),                     // scan
    ("q", "u"), ("qu", "er"), ("quer", "y"),      // query
    ("b", "at"), ("bat", "ch"),                   // batch
    ("h", "as"), ("has", "h"),                    // hash
    ("k", "ey"),                                  // key
    ("v", "a"), ("va", "l"), ("val", "ue"),       // value
    ("m", "er"), ("mer", "g"), ("merg", "e"),     // merge
    ("f", "as"), ("fas", "t"),                    // fast
    ("t", "ab"), ("tab", "le"),                   // table
    ("s", "or"), ("sor", "t"),                    // sort
    ("w", "in"), ("win", "d"), ("wind", "ow"),    // window
    ("s", "p"), ("sp", "ar"), ("spar", "k"),      // spark
    ("st", "r"), ("str", "e"), ("stre", "a"), ("strea", "m")) // stream
}
