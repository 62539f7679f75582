package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. Every formula is
  * deliberately engine-portable (length/replace/regex arithmetic) so a SQL
  * oracle can replay it bit-for-bit.
  */
object TextOps {
  /** Occurrences of `needle` in `hay` (non-overlapping), via
    * length-difference — identical semantics in any SQL engine.
    */
  def countOccurrences(hay: Column, needle: String): Column =
    (length(hay) - length(call_function("replace", hay, lit(needle), lit("")))) / needle.length

  /** Space-padded word occurrence count (whole-word match). Spaces are
    * DOUBLED before padding so adjacent repeats do not share a boundary
    * delimiter — a plain non-overlapping replace of " w " consumed the
    * space the next occurrence needed and counted "the the the" as 2,
    * systematically under-scoring repetitive text in langScore/langId
    * and qualityScore's stopword component. The oracle twins replicate
    * the same doubling.
    */
  def countWord(text: Column, word: String): Column =
    countOccurrences(concat(lit(" "),
      call_function("replace", text, lit(" "), lit("  ")), lit(" ")), s" $word ")

  /** Common HTML entities a web corpus actually contains, decoded in the
    * standard order (`&amp;` LAST so freshly produced ampersands are not
    * double-decoded).
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Strip markup tags (replaced by a space so `a</p><p>b` never fuses
    * into one word).
    */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]*>", " ")

  /** The whitespace class spelled out explicitly: Java-regex `\s` matches
    * vertical tab (\x0B) but RE2's does not, so `\s+` silently breaks the
    * replays-exactly contract on crawl text containing one — the explicit
    * class means the same thing in both engines.
    */
  val WhitespaceClass = "[ \\t\\n\\x0B\\f\\r]"

  /** Collapse whitespace runs and trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, WhitespaceClass + "+", " "))

  /** Web-corpus text cleanup — the step-1 preprocessing of an HTML crawl:
    * strip tags, decode the common entities, normalize whitespace. Every
    * step is a plain regex/replace, so an external SQL engine replays it
    * exactly (and the whole chain stays in one codegen'd projection).
    */
  def cleanWebText(text: Column): Column = {
    val decoded = HtmlEntities.foldLeft(stripHtml(text)) { case (c, (ent, ch)) =>
      call_function("replace", c, lit(ent), lit(ch))
    }
    normalizeWhitespace(decoded)
  }

  /** Repetition metrics for quality filtering (the Gopher-style
    * "fraction of duplicate n-grams" family): duplicated-token count and
    * the permille ratio as INTEGER arithmetic (a float division would
    * break oracle parity — rule 2 of the parity notes). A document whose
    * tokens are mostly repeats of a few phrases scores high and gets
    * filtered before training.
    */
  def duplicateTokenCount(text: Column): Column = {
    val toks = split(text, " ")
    size(toks) - size(array_distinct(toks))
  }

  /** Duplicate-token ratio in permille (0-1000), integer-exact (`div`,
    * never float division).
    */
  def repetitionPermille(text: Column): Column = {
    val toks = split(text, " ")
    call_function("div", duplicateTokenCount(text).cast("long") * 1000, size(toks).cast("long"))
  }

  /** Gopher-style within-document repetition metrics over word bigrams
    * (Rae et al. 2021 §A1.1: "fraction of characters in the most common
    * n-gram" / "fraction in duplicated n-grams" — the filter family that
    * catches boilerplate-looping and keyboard-mash documents that
    * length/stopword quality scores miss). Token-count variant, integer-
    * exact: per document, `top_bigram_ppm` = occurrences of the most
    * frequent bigram over total bigrams (parts-per-million, floor), and
    * `dup_bigram_ppm` = fraction of bigram slots whose bigram occurs
    * more than once. Ties need no break — only the max COUNT is used.
    * One explode + two aggregations, all shuffles keyed on the doc id;
    * at 100 TB the bigram relation is map-side partial-aggregated before
    * it ever shuffles, and no state beyond one doc's distinct bigrams
    * exists anywhere. Docs with < 2 tokens surface with zero metrics
    * (left join back to the id spine).
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // repartition BEFORE the bigram explode (the [[DedupOps.shingles]]
    // discipline): the row-multiplying generate otherwise inherits the
    // scan's partitioning and tokenizes the whole corpus on however few
    // partitions the file layout happened to give
    val bg = df.repartition(col(idCol)).select(col(idCol).as("id"),
        explode(DedupOps.stringShingleArrayFromText(col(textCol), 2)).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
    val agg = bg.groupBy(col("id")).agg(
      sum(col("cnt")).as("n_bigrams"),
      max(col("cnt")).as("mx"),
      coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("dup"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(call_function("div", col("mx") * 1000000L, col("n_bigrams")), lit(0L))
          .as("top_bigram_ppm"),
        coalesce(call_function("div", col("dup") * 1000000L, col("n_bigrams")), lit(0L))
          .as("dup_bigram_ppm"))
  }

  /** Conservative PII patterns shared by the Spark side and the SQL
    * oracle. Kept to the regex subset with identical semantics in Java
    * regex and RE2 (character classes, +, {m,}, alternation — no
    * lookaround, no backreferences) so redaction replays exactly in an
    * external engine.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhonePattern = "[+]?[0-9][0-9()\\- ]{7,}[0-9]"

  /** PII redaction — scrub emails and phone-shaped numbers before a
    * corpus ships to training. Two regexp_replace steps in one codegen'd
    * projection; emails first so a redacted address cannot leave a
    * phone-shaped local part behind.
    */
  def redactPii(text: Column, emailTag: String = "[EMAIL]",
                phoneTag: String = "[PHONE]"): Column =
    regexp_replace(regexp_replace(text, EmailPattern, emailTag),
      PhonePattern, phoneTag)

  /** Marker words per language for the n-gram-heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "bu", "le"),
  )

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(w => countWord(text, w)).reduce(_ + _)

  /** Predicted language = argmax of marker scores, ties resolved in
    * LangMarkers declaration order.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    // arm i fires when score_i >= every later score -> first maximum wins
    val arms = scores.zipWithIndex.dropRight(1).map { case ((lang, s), i) =>
      (scores.drop(i + 1).map(_._2).map(s >= _).reduce(_ && _), lang)
    }
    arms.foldRight(lit(scores.last._1): Column) {
      case ((cond, lang), acc) => when(cond, lang).otherwise(acc)
    }
  }

  def wordCount(text: Column): Column = size(split(text, " "))

  /** Composite quality score in [0,1000] from length / avg-word-length /
    * stopword-ratio components, integer arithmetic end-to-end: float sums
    * of products can differ across engines (fused multiply-add), so each
    * component quantizes with a single small-int division, where floor()
    * of an IEEE quotient is engine-independent.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val words = wordCount(text).cast("long")
    val cntThe = countWord(text, "the").cast("long")
    val awlX1000 = floor(((nChars.cast("long") - words + 1) * 1000).cast("double") / words)
    val compLen = least(words, lit(50L)) * 10
    val compAwl = floor(least(awlX1000, lit(8000.0)) * 3 / 80)
    val compStop = least(floor((cntThe * 2000).cast("double") / words), lit(200.0)).cast("long")
    compLen + compAwl + compStop
  }

  /** Whitespace token count and a BPE-ish subword count (greedy <=4-char
    * lowercase chunks) — both plain regex counts. [[subwordTokens]] is a
    * fast ESTIMATOR (one regexp pass, no vocabulary); for accurate
    * vocabulary-driven counts use the codegen'd wordpiece tokenizer
    * (`graft_wordpiece_tokens`, [[graft.functions.WordpieceTokenCount]],
    * q80) or the merge-rule BPE (`graft_bpe_tokens`, q140).
    */
  def whitespaceTokens(text: Column): Column = size(split(text, " "))
  def subwordTokens(text: Column): Column = size(regexp_extract_all(text, lit("[a-z0-9]{1,4}"), lit(0)))

  /** Merge-rule BPE token count over the ordered
    * [[graft.functions.BpeMerges]] fixture — applies each pair-merge
    * rule as one framed non-regex replace pass, then counts surviving
    * symbols. Backed by the RuntimeReplaceable
    * [[graft.functions.BpeTokenCount]] (SQL: `graft_bpe_tokens`), which
    * unfolds into builtin string expressions, so the whole tokenizer
    * stays inside whole-stage codegen. Assumes the text alphabet avoids
    * the `|` frame char (guaranteed for the corpus tables).
    */
  def bpeMergeTokens(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.BpeTokenCount(
      org.apache.spark.sql.GraftBridge.expression(text)))

  /** Unicode canonicalization for dedup/matching: NFC-normalize, then
    * strip combining marks (NFD → drop Mn → NFC) — "café" and "café"
    * (precomposed vs combining) both become "cafe". Backed by the
    * codegen'd [[graft.functions.NfcStripAccents]] expression; also
    * registered as SQL function `nfc_strip_accents`.
    */
  def nfcStripAccents(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.NfcStripAccents(
      org.apache.spark.sql.GraftBridge.expression(text)))

  /** URL canonicalization for crawl-corpus URL dedup: lowercase the
    * scheme and host, strip a default port (:443 https / :80 http), drop
    * a leading `www.`, strip trailing path slashes, remove `utm_*`
    * tracking params, and drop the fragment — so trivially distinct
    * spellings of one resource collapse before a URL-level dedup or join.
    * Path case is preserved (paths are case-sensitive). One codegen'd
    * chain of regex/string ops, every step in the Java/RE2-identical
    * regex subset, so a SQL engine replays it exactly.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostNoPort = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(hostNoPort, "^www[.]", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    // query is extracted AFTER stripping the fragment: an unanchored
    // [?] scan over the whole URL treated a '?' INSIDE the fragment as a
    // query ("x.com/page#section?b=1" canonicalized to "x.com/page?b=1",
    // splitting a URL-dedup key the fragment drop should have merged)
    val query0 = regexp_extract(regexp_replace(url, "#.*", ""), "[?](.*)", 1)
    // (^|&)-anchored so a parameter NAMED xutm_* or a VALUE containing
    // "utm_...=" is never mangled; the boundary '&' is removed with the
    // param, so only a leading/trailing separator needs cleanup
    val query = regexp_replace(
      regexp_replace(query0, "(^|&)utm_[A-Za-z0-9_]*=[^&]*", ""), "^&+|&+$", "")
    val canonical = concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    // schemeless / protocol-relative input has no parseable structure here
    // — pass it through untouched rather than collapsing every such URL
    // to the identical "://" (which a URL-level dedup would then merge)
    when(scheme === "", url).otherwise(canonical)
  }

  /** C4/CCNet-style boilerplate removal over a segmented corpus: drop
    * every segment whose content appears in more than `maxDocFreq`
    * DISTINCT documents (navigation bars, cookie banners, license
    * headers), then reassemble each document from its surviving segments
    * in order. Input relation: (id, pos, segment) — produce it with
    * [[SamplingOps.chunkDocuments]] (stride = chunkSize) or a real
    * line/paragraph splitter.
    *
    * Scale shape: the set of ACTUAL boilerplate segments (doc frequency
    * above the cap) is tiny relative to the corpus, so it broadcasts and
    * the removal is a map-side anti-join — the full segment relation is
    * never shuffled a second time, and no skewed hot-segment join exists.
    * Reassembly is one groupBy(id) whose per-group state is bounded by
    * document length. Documents whose every segment is boilerplate drop
    * out entirely (the C4 behavior).
    */
  def removeBoilerplateSegments(segs: DataFrame, maxDocFreq: Int): DataFrame = {
    // lazy checkpoint: the frequency build side and the anti-join probe
    // side both consume segs, and Spark does not reuse the identical
    // subtree across join children — without a barrier an upstream
    // segmentation (a full-corpus Generate) would run twice
    val s = segs.localCheckpoint(false)
    val boiler = broadcast(
      s.groupBy(col("segment"))
        .agg(countDistinct(col("id")).as("__docfreq"))
        .filter(col("__docfreq") > maxDocFreq)
        .select(col("segment")))
    s.join(boiler, Seq("segment"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("segment")))),
          x => x.getField("segment")), " ").as("text"),
        count(lit(1)).as("n_segments"))
  }

  /** Exact corpus-wide top-K n-gram frequencies — the vocabulary/merge
    * table prep of tokenizer training and the "most common phrases"
    * corpus diagnostic. Output: (ngram, freq, rank) with rank 1..topK,
    * ties broken by the ngram text so the result is deterministic.
    *
    * Scale shape: the count is one map-side-combinable aggregation keyed
    * on the n-gram, and the global top-K is Spark's TakeOrdered (per-
    * partition heaps of K entries merged on the driver, K-bounded) — no
    * global sort, no single-partition window, at any corpus size.
    * Occurrence counting (not per-doc dedup): a phrase used twice in one
    * document counts twice, as vocabulary building requires.
    */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
                n: Int, topK: Int): DataFrame = {
    val grams = df.repartition(col(idCol))
      .select(explode(DedupOps.stringShingleArrayFromText(col(textCol), n)).as("ngram"))
    val counted = grams.groupBy(col("ngram")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram")).limit(topK)
    // rank AFTER the limit: this (necessarily global) window runs over
    // topK driver-bounded rows, never the full vocabulary
    counted.select(col("ngram"), col("freq"),
      row_number().over(Window.orderBy(col("freq").desc, col("ngram")))
        .cast("long").as("rank"))
  }

  /** WITHIN-document repeated-segment removal (the C4/CCNet line-dedup
    * cleanup): split on `sep`, keep only the FIRST occurrence of each
    * segment (order preserved), re-join — crawl pages repeat nav lines,
    * cookie banners, and share buttons many times inside one page, and
    * those repeats both waste tokens and skew repetition metrics.
    * Cross-document boilerplate is the separate
    * [[removeBoilerplateSegments]] pass.
    *
    * Pure per-row array work (one codegen'd projection, no shuffle, no
    * state): first-occurrence membership via array_position(arr, x) ==
    * own index — the same first-match semantics as SQL list_position, so
    * the oracle replays it exactly. Per-row cost is O(segments^2) with
    * tiny constants; pages have tens of lines, not thousands.
    */
  def dedupSegmentsWithin(text: Column, sep: String): Column = {
    val arr = split(text, java.util.regex.Pattern.quote(sep))
    array_join(
      filter(arr, (x, i) => array_position(arr, x) === i + 1), sep)
  }

  /** Most DISTINCTIVE terms per document: rank terms by a rarity-weighted
    * frequency score — `tf * N_docs * 1000 / df` in integer arithmetic
    * (the TF-IDF shape with a rational rarity weight instead of a float
    * logarithm, so an external SQL engine replays the ranking exactly).
    *
    * Scale shape: one shuffle keyed on (doc, term) for term frequencies,
    * one keyed on term for document frequencies, an equi-join on term
    * (both sides already term-partitioned), and a rank window partitioned
    * per document — no global window, no broadcast of corpus-sized state;
    * the lone scalar (corpus size) broadcasts one row.
    */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    val words = df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
    // lazy checkpoint: tf feeds both the document-frequency aggregation
    // and the scoring join — without a barrier the corpus-wide token
    // explode + aggregation would execute once per consumer
    val tf = words.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // tf rows are distinct (id, term), so counting them per term IS the
    // document frequency — no second pass over the corpus
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(docFreq, "term").crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        call_function("div", col("tf") * col("__n") * 1000, col("df")).as("score"))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-k collocations by integer-scaled PMI ratio: adjacent word pairs
    * whose joint frequency most exceeds what their marginal frequencies
    * predict — div(scale * c12 * N, cStart(w1) * cEnd(w2)), the
    * exponential of pointwise mutual information, floor-scaled so the
    * ranking needs no float log. Marginals count bigram STARTS and ENDS
    * (both total N), so the probability model is self-consistent.
    * `minCount` drops rare-pair noise (classic PMI failure mode) before
    * scoring. Output: (w1, w2, n, pmi_scaled), top k by score.
    *
    * int64 bound: scale * n * N must stay below 2^63 — holds to ~3e6
    * total bigrams at the default scale; for larger corpora lower
    * `scale` (the ranking is scale-invariant) or shard by language.
    * Both engines run ANSI integer arithmetic, so an overflow is a loud
    * error, never a silent wrap.
    *
    * Scale shape: one corpus tokenization into pre-aggregated bigram
    * counts (map-side combinable); marginals and the total derive from
    * the MODEL relation (bigram-vocabulary-sized, not corpus-sized);
    * the final ordering is a TakeOrdered top-k, never a global sort.
    */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L, k: Int = 50,
                   scale: Long = 1000000L): DataFrame = {
    val eb = df
      // pre-generate repartition (repetitionMetrics discipline): don't
      // tokenize the corpus on the scan's accidental split count
      .repartition(col(idCol))
      .select(explode(DedupOps.stringShingleArrayFromText(col(textCol), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
      // four consumers: starts, ends, total, scoring
      .localCheckpoint(false)
    val total = eb.agg(sum(col("n")).as("__N"))
    val cA = eb.select(substring_index(col("bg"), " ", 1).as("w1"), col("n"))
      .groupBy(col("w1")).agg(sum(col("n")).as("__ca"))
    val cB = eb.select(substring_index(col("bg"), " ", -1).as("w2"), col("n"))
      .groupBy(col("w2")).agg(sum(col("n")).as("__cb"))
    eb.filter(col("n") >= minCount)
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"), col("n"))
      .join(cA, Seq("w1")).join(cB, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n"),
        call_function("div", lit(scale) * col("n") * col("__N"),
          col("__ca") * col("__cb")).as("pmi_scaled"))
      .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-source calibrated quality admission (the "fineweb-style"
    * percentile filter): within every source, rank documents by quality
    * (desc, id tie-break) and admit the top `admitPermille`/1000
    * fraction — rank * 1000 <= admitPermille * source-size, integer
    * floor semantics, so a source's quality-score distribution never
    * leaks into another source's cut line. Output: every document with
    * (id, source, quality, rk, admitted).
    *
    * Scale shape: one window partitioned on the source (rank) — the
    * source count rides the same partition as a partition-only window
    * aggregate, so no second shuffle or join. Never a global sort.
    */
  def calibratedQualityAdmit(df: DataFrame, idCol: String, sourceCol: String,
                             qualityCol: String,
                             admitPermille: Long): DataFrame = {
    require(admitPermille >= 0 && admitPermille <= 1000,
      s"admitPermille must be in [0, 1000], got $admitPermille")
    val byQ = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("id"))
    val all = Window.partitionBy(col("source"))
    df.select(col(idCol).as("id"), col(sourceCol).as("source"),
        col(qualityCol).as("quality"))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(all))
      .select(col("id"), col("source"), col("quality"), col("rk"),
        (col("rk") * 1000 <= lit(admitPermille) * col("__cnt")).as("admitted"))
  }

  /** Reciprocal-rank fusion of N rankings, integer-exact: the standard
    * hybrid-retrieval combiner (BM25 + dense + priors) — each ranking
    * contributes div(scale, k0 + rank) per (query, doc), summed, then
    * re-ranked. Integer floor terms make the fused score bit-replayable;
    * k0 = 60 is the literature default. Inputs share the schema
    * (query_id, id, rk); rankings that miss a doc simply contribute 0.
    * Output: (query_id, id, rrf_score, rk), top `topK` per query.
    *
    * Scale shape: a union of ranking relations (each already top-k
    * sized, tiny relative to the corpus), one aggregation on the
    * (query, doc) pair, and a per-query rank window over fused
    * candidates only.
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Long = 60L, topK: Int = 10,
              scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 0, s"need k0 >= 0, got $k0")
    val contrib = call_function("div", lit(scale), lit(k0) + col("rk"))
    val unioned = rankings
      .map(_.select(col("query_id"), col("id"), contrib.as("__c")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("id"))
    unioned.groupBy(col("query_id"), col("id"))
      .agg(sum(col("__c")).as("rrf_score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
  }

  /** Temporal n-gram novelty: for each document (in id order), the
    * fraction of its DISTINCT n-gram shingles never seen in any
    * lower-id document — the "how much genuinely new text does this
    * contribution add" curation metric. First-occurrence ownership is
    * one aggregation (min id per shingle); novelty is a row-count
    * comparison, integer permille. Output:
    * (id, n_shingles, n_novel, novelty_permille); docs shorter than n
    * tokens report 0 shingles.
    *
    * Scale shape: the shingle index is the only corpus-sized relation
    * (checkpointed once for its two consumers); ownership is a
    * map-side-combinable min; the probe is an equi-join on the shingle
    * hash; final counts aggregate on the id. No windows, no all-pairs.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    val sh = DedupOps.shingles(df, idCol, textCol, n)
      .localCheckpoint(false) // two consumers: ownership + probe
    val owner = sh.groupBy(col("shingle")).agg(min(col("id")).as("__owner"))
    val counted = sh.join(owner, Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__owner") === col("id"), 1L).otherwise(0L)).as("n_novel"))
    df.select(col(idCol).as("id")).join(counted, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          call_function("div", coalesce(col("n_novel"), lit(0L)) * 1000,
            col("n_shingles")))
          .otherwise(lit(0L)).as("novelty_permille"))
  }

  /** DSIR-style importance weights, integer-exact: score each document by
    * how much its hashed-feature distribution resembles a TARGET corpus
    * relative to the raw corpus. Features are unigram buckets under the
    * portable rolling fingerprint (mod `nBuckets`), both distributions
    * add-one smoothed, and each token contributes the floor-scaled ratio
    *   div(scale * (ct(b)+1) * (Traw + nBuckets),
    *       (craw(b)+1) * (Tt + nBuckets))
    * — the per-doc score is the average contribution (documented
    * deviation from DSIR, which sums LOG ratios: the ratio sum is
    * log-free and bit-replayable; ordering differs only when a doc mixes
    * extreme buckets). Output: (id, n_toks, dsir_score).
    *
    * Scale shape: both distributions are nBuckets-row aggregates
    * (map-side combinable); their merged table broadcasts, so the
    * corpus-side probe is map-only and the only shuffle is the per-doc
    * aggregation on the id.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  target: DataFrame, nBuckets: Int = 256,
                  scale: Long = 1000000L): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2, got $nBuckets")
    def buckets(d: DataFrame): DataFrame =
      d.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("__t"))
        .select(col("id"),
          pmod(graft.functions.Converters.fingerprint64(col("__t")), lit(nBuckets.toLong)).as("b"))
    val ex = buckets(df).localCheckpoint(false) // raw counts + scoring probe
    val raw = ex.groupBy(col("b")).agg(count(lit(1)).as("craw"))
    val tgt = buckets(target).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val model = broadcast(raw.join(tgt, Seq("b"), "full")
      .select(col("b"), coalesce(col("craw"), lit(0L)).as("craw"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .crossJoin(broadcast(raw.agg(sum(col("craw")).as("__traw"))))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).as("__tt")))))
    val contrib = call_function("div",
      lit(scale) * (col("ct") + 1L) * (col("__traw") + nBuckets),
      (col("craw") + 1L) * (col("__tt") + nBuckets))
    val scored = ex.join(model, Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"), sum(contrib).as("__s"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        when(coalesce(col("n_toks"), lit(0L)) > 0,
          call_function("div", col("__s"), col("n_toks")))
          .otherwise(lit(0L)).as("dsir_score"))
  }

  /** BM25-family ranked retrieval, integer-exact: per (query, document)
    * score summed over query terms, every step floor arithmetic so the
    * ranking is bit-identical across engines. The BM25 rational
    * (k1 = 6/5, b = 3/4) is multiplied through by 20 * sumdl so the
    * per-term tf saturation needs no floats:
    *   tf_part = div(scale * tf * 44 * sumdl,
    *                 20 * sumdl * tf + 6 * sumdl + 18 * dl * N)
    * and the idf uses the probabilistic RATIO (N - df + 0.5)/(df + 0.5)
    * floor-scaled as div(scale * (2(N - df) + 1), 2 df + 1) instead of
    * its log — the log is monotone, so per-TERM ordering is preserved
    * and the summed score stays deterministic and replayable (documented
    * deviation from textbook BM25, which sums log-idf).
    * Output: (query_id, id, score, rk), top k per query.
    *
    * int64 bound: scale * tf * 44 * sumdl below 2^63 — lower `scale` or
    * shard for corpora past ~1e9 tokens at the defaults (ANSI arithmetic
    * makes an overflow loud, never silent).
    *
    * Scale shape: (id, term, tf) pre-aggregates map-side; the query-term
    * probe is a BROADCAST join that filters the corpus before anything
    * else; document frequencies are model-relation aggregates, the ones
    * needed re-broadcast after a semi-filter on the query terms. Corpus
    * stats ride one broadcast row. The final rank window partitions per
    * query over candidate docs only.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])], k: Int = 10,
               scale: Long = 1000000L): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "need non-empty queries")
    val spark = df.sparkSession
    import spark.implicits._
    val qt = broadcast(
      queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
        .toDF("query_id", "term"))
    val docs = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      // three consumers: corpus stats, document frequencies, scoring probe
      .localCheckpoint(false)
    val stats = broadcast(docs.groupBy()
      .agg(countDistinct(col("id")).as("__N"), sum(col("tf")).as("__sumdl")))
    val dfq = broadcast(
      docs.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
        .join(qt.select(col("term")).distinct(), Seq("term")))
    val num = lit(scale) * col("tf") * 44L * col("__sumdl")
    val den = col("tf") * 20L * col("__sumdl") + lit(6L) * col("__sumdl") +
      lit(18L) * col("dl") * col("__N")
    val idf = call_function("div",
      lit(scale) * ((col("__N") - col("dfreq")) * 2L + 1L), col("dfreq") * 2L + 1L)
    val contrib = call_function("div", idf * call_function("div", num, den), lit(scale))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id"))
    docs.join(qt, Seq("term")) // broadcast probe: corpus filtered first
      .join(dfq, Seq("term"))
      .crossJoin(stats)
      .select(col("query_id"), col("id"), contrib.as("__c"))
      .groupBy(col("query_id"), col("id")).agg(sum(col("__c")).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Pseudo-relevance-feedback retrieval (RM3-lite, Lavrenko & Croft
    * 2001 shape): run [[bm25TopK]]'s integer scoring, take each query's
    * top `fbDocs` documents as assumed-relevant, harvest the `fbTerms`
    * highest-total-tf terms from them that are NOT already in the query
    * (ties to the lexicographically smallest term), then re-score with
    * the expanded term set — original terms at weight 1000 milli,
    * expansion terms at `expWeightMilli`. Every step is the same int64
    * arithmetic as [[bm25TopK]] (per-term contribution scaled by
    * `w // 1000` before the order-free integer sum), so rankings are
    * engine- and partition-order-exact.
    *
    * Scale shape: the corpus is tokenized ONCE into the checkpointed
    * (id, term, tf, dl) relation both rounds share; each round is a
    * broadcast probe of the tiny term set against that relation + one
    * id-keyed aggregation, and the feedback harvest joins only the
    * fbDocs·queries selected documents back. r16: each round's dfreq
    * SEMI-FILTERS the relation by the probed terms BEFORE aggregating —
    * the r15 form aggregated the FULL vocabulary per round, a
    * corpus-sized exchange for a handful of term counts. (A deeper r16
    * fusion — driver-collected corpus stats, checkpointed round-1 sums
    * reused in the final score — measured SLOWER on fresh JVMs, 1.56 →
    * 1.89 s: the extra driver action and checkpoint barrier serialized
    * a pipeline whose exchanges were already tiny. Reverted to the
    * single-DAG shape; only the semi-filter survives.) A production
    * deployment swaps the relation for the persisted postings index
    * ([[buildPostingsIndex]]) — the round structure is unchanged.
    */
  def prfBm25(df: DataFrame, idCol: String, textCol: String,
              queries: Seq[(Int, Seq[String])], fbDocs: Int = 3,
              fbTerms: Int = 2, k: Int = 10, expWeightMilli: Long = 500L,
              scale: Long = 1000000L): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "need non-empty queries")
    require(fbDocs >= 1 && fbTerms >= 0, s"need fbDocs >= 1, fbTerms >= 0, got $fbDocs/$fbTerms")
    val spark = df.sparkSession
    import spark.implicits._
    val qt0 = broadcast(
      queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t, 1000L)) }
        .toDF("query_id", "term", "w"))
    val docs = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .localCheckpoint(false) // shared by both scoring rounds + harvest
    val stats = broadcast(docs.groupBy()
      .agg(countDistinct(col("id")).as("__N"), sum(col("tf")).as("__sumdl")))
    def scores(qt: DataFrame): DataFrame = {
      // dfreq over only the probed terms (r16): the semi-join prunes
      // map-side, so the aggregation exchanges matching rows, never the
      // full vocabulary
      val dfq = broadcast(
        docs.join(qt.select(col("term")).distinct(), Seq("term"), "left_semi")
          .groupBy(col("term")).agg(count(lit(1)).as("dfreq")))
      val num = lit(scale) * col("tf") * 44L * col("__sumdl")
      val den = col("tf") * 20L * col("__sumdl") + lit(6L) * col("__sumdl") +
        lit(18L) * col("dl") * col("__N")
      val idf = call_function("div",
        lit(scale) * ((col("__N") - col("dfreq")) * 2L + 1L), col("dfreq") * 2L + 1L)
      val contrib = call_function("div",
        idf * call_function("div", num, den), lit(scale))
      docs.join(qt, Seq("term"))
        .join(dfq, Seq("term"))
        .crossJoin(stats)
        .select(col("query_id"), col("id"),
          call_function("div", contrib * col("w"), lit(1000L)).as("__c"))
        .groupBy(col("query_id"), col("id")).agg(sum(col("__c")).as("score"))
    }
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id"))
    val fb = scores(qt0)
      .withColumn("rk", row_number().over(w1))
      .filter(col("rk") <= fbDocs)
      .select(col("query_id"), col("id"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("tfs").desc, col("term"))
    val expansion = fb.join(docs.select(col("id"), col("term"), col("tf")), Seq("id"))
      .join(qt0.select(col("query_id"), col("term")), Seq("query_id", "term"), "left_anti")
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf")).as("tfs"))
      .withColumn("rk", row_number().over(we))
      .filter(col("rk") <= fbTerms)
      .select(col("query_id"), col("term"), lit(expWeightMilli).as("w"))
    val qt2 = broadcast(qt0.unionByName(expansion))
    scores(qt2)
      .withColumn("rk", row_number().over(w1).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Percolator-style reverse search (stored-query alerting): a registry
    * of term-CONJUNCTION queries is matched against every document —
    * doc matches query iff every query term occurs in the doc. The
    * direction search engines call percolation: queries are the index,
    * documents are the probes (alert feeds, saved searches, compliance
    * watchlists). Output one row per query: (query_id, n_matched,
    * first_doc) with zero-match queries kept (n_matched = 0, null doc).
    *
    * Scale shape: the query-term table broadcasts (term registries are
    * small by nature); documents collapse to DISTINCT (doc, term) pairs
    * FILTERED map-side by the broadcast terms before the only shuffle,
    * which keys on (query, doc) and is bounded by matching terms — never
    * the corpus vocabulary. Conjunction test = count == n_terms, exact.
    */
  def reverseSearch(df: DataFrame, idCol: String, textCol: String,
                    queries: Seq[(Int, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "need non-empty queries")
    val spark = df.sparkSession
    import spark.implicits._
    val qt = broadcast(
      queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
        .toDF("query_id", "term"))
    val nq = broadcast(queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("query_id", "nt"))
    val dt = df
      .select(col(idCol).as("__doc"), explode(split(col(textCol), " ")).as("term"))
      .join(qt.select(col("term")).distinct(), Seq("term")) // map-side prune
      .distinct()
    val matched = dt.join(qt, Seq("term"))
      .groupBy(col("query_id"), col("__doc"))
      .agg(count(lit(1)).as("__c"))
      .join(nq, Seq("query_id"))
      .filter(col("__c") === col("nt"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_matched"), min(col("__doc")).as("first_doc"))
    nq.select(col("query_id")).join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"), col("first_doc"))
      .orderBy(col("query_id"))
  }

  /** Multi-pattern blocklist scan via a broadcast Aho–Corasick automaton
    * ([[graft.functions.AhoCorasick]]): ONE pass over each document
    * counts every (overlapping, nested) occurrence of every registry
    * pattern — the watchlist/compliance kernel where per-pattern regex
    * passes would cost registry × corpus. Output per pattern:
    * (pattern, n_docs, n_hits), zero-hit patterns kept.
    *
    * Scale shape: the automaton serializes into the partition-local scan
    * closure (registry-sized, like a broadcast); the scan is map-only
    * and emits only (pattern, counts) rows for HITS, so the single
    * shuffle is bounded by patterns × docs-with-hits and pre-combines
    * map-side. This is the honest imperative-kernel slot (mapPartitions)
    * — the automaton walk has no Column-algebra form.
    */
  def blocklistScan(df: DataFrame, idCol: String, textCol: String,
                    patterns: Seq[String]): DataFrame = {
    val ac = graft.functions.AhoCorasick.build(patterns)
    val spark = df.sparkSession
    import spark.implicits._
    // text only: the id never reaches the kernel, and casting it to long
    // just to satisfy an encoder crashed on non-numeric ids (ANSI cast
    // failure / null through a non-nullable Long encoder)
    val hits = df.select(col(textCol).as("t"))
      .as[String]
      .mapPartitions { it =>
        it.flatMap { t =>
          val c = ac.countAll(if (t == null) "" else t)
          c.iterator.zipWithIndex.collect {
            case (n, pi) if n > 0L => (pi, 1L, n)
          }
        }
      }
      .toDF("pidx", "docs", "hits")
      .groupBy(col("pidx"))
      .agg(sum(col("docs")).as("n_docs"), sum(col("hits")).as("n_hits"))
    val pdf = broadcast(patterns.zipWithIndex
      .map { case (p, i) => (i, p) }.toDF("pidx", "pattern"))
    pdf.join(hits, Seq("pidx"), "left")
      .select(col("pattern"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("pattern"))
  }

  /** Corpus-trained bigram language-model quality score, integer-exact.
    * Train: MLE bigram probabilities over the corpus itself —
    * P(w2|w1) = c(w1 w2) / c(w1-as-bigram-start), floor-scaled to
    * `scale` so every per-occurrence contribution is an int64 (no float
    * sums, no libm log — bit-identical on any engine and partition
    * order). Score: per document, the average scaled probability of its
    * bigrams (0..scale; fluent in-domain text scores high, off-model
    * token soup scores low — the KenLM-style quality-filter signal).
    * Output: (id, n_bigrams, lm_score); documents with < 2 tokens score 0.
    *
    * Scale shape: per-doc (id, bigram, m) counts pre-aggregate map-side
    * before any join; the bigram model is one groupBy over those rows
    * (never over raw occurrences), and the start-token totals derive
    * from the MODEL (sum of cb by first token) — the corpus is tokenized
    * exactly once. The scoring joins are equi-joins on bigram/start
    * keyed over the pre-aggregated relation; zipfian hot keys (common
    * bigrams) are exactly what AQE skew-join splitting handles, and the
    * per-doc final agg is keyed on the id. No windows, no driver state.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    scale: Long = 1000000L): DataFrame = {
    // repartition BEFORE the row-multiplying generate (the
    // repetitionMetrics discipline): the explode otherwise inherits the
    // scan's partitioning and tokenizes the whole corpus on however few
    // splits the file layout happened to give
    val eb = df.repartition(col(idCol)).select(col(idCol).as("id"),
        explode(DedupOps.stringShingleArrayFromText(col(textCol), 2)).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("m"))
      // two consumers: the model aggregation and the scoring join
      .localCheckpoint(false)
    val cb = eb.groupBy(col("bg")).agg(sum(col("m")).as("cb"))
    val cu = cb.select(substring_index(col("bg"), " ", 1).as("u"), col("cb"))
      .groupBy(col("u")).agg(sum(col("cb")).as("cu"))
    val scored = eb
      .join(cb, Seq("bg"))
      .join(cu, substring_index(col("bg"), " ", 1) === col("u"))
      .groupBy(col("id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * call_function("div", lit(scale) * col("cb"), col("cu"))).as("__tot"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          call_function("div", col("__tot"), col("n_bigrams")))
          .otherwise(lit(0L)).as("lm_score"))
  }

  /** PII patterns shared by [[scrubPii]] and its oracle replay: plain
    * character-class regexes (no lookaround, no shorthand classes) so
    * Java's regex engine and RE2-family engines agree byte for byte.
    */
  val PiiEmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val PiiPhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val PiiIpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrubbing for corpus curation: redact emails, North-American
    * phone numbers, and IPv4 addresses to typed placeholders and count
    * each class. Pure map-side codegen'd regexp work — no shuffle, no
    * UDF; replacement order (email, then ip, then phone) is fixed and
    * the patterns cannot overlap, so the output is deterministic.
    * Output: (id, n_emails, n_phones, n_ips, clean_text).
    */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol).as("id"),
      size(regexp_extract_all(t, lit(PiiEmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PiiPhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(PiiIpRe), lit(0))).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, PiiEmailRe, "<EMAIL>"),
          PiiIpRe, "<IP>"),
        PiiPhoneRe, "<PHONE>").as("clean_text"))
  }

  /** Checksum-validated card-number scrubbing — the [[scrubPii]]
    * extension that a naive regex pass gets wrong: 16-digit runs are
    * everywhere (order ids, trace ids, timestamps), so redacting every
    * match destroys data. A candidate run is redacted ONLY when the
    * Luhn mod-10 checksum holds ([[graft.functions.LuhnValid]], codegen,
    * SQL-registered) — the ISO/IEC 7812 property real PANs satisfy,
    * which cuts false positives 10x (a random digit run passes 1-in-10).
    * Map-only: extraction, per-candidate validation, and the redaction
    * fold (literal `replace` per valid candidate — candidates per doc
    * are few) are all row-local; the oracle replays the checksum as
    * list arithmetic. Output: (id, n_digit_runs, n_valid_cards,
    * clean_text).
    */
  def scrubCards(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val luhn = (c: Column) => org.apache.spark.sql.GraftBridge.column(
      graft.functions.LuhnValid(org.apache.spark.sql.GraftBridge.expression(c)))
    // maximal-digit-run candidates, lookaround-free (the oracle's RE2
    // has none): extract every [0-9]+ run and keep those of length
    // EXACTLY 16. A bare [0-9]{16} matched the FIRST 16 digits of a
    // longer run (partial-redacting trace ids whose prefix passed Luhn);
    // the earlier boundary-group fix `(^|[^0-9])([0-9]{16})([^0-9]|$)`
    // CONSUMED the trailing delimiter per match, so of two PANs
    // separated by one non-digit the second was never matched and
    // shipped unredacted. Maximal runs have neither failure: run
    // boundaries are inherent, nothing is consumed between candidates,
    // and a PAN embedded in a longer digit run is still excluded
    // (not a card by ISO/IEC 7812 framing).
    val cands = filter(
      regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0)),
      r => length(r) === 16)
    df.select(col(idCol).as("id"), col(textCol).as("__t"), cands.as("__cands"))
      .withColumn("__valid", filter(col("__cands"), c => luhn(c)))
      .select(col("id"),
        size(col("__cands")).cast("long").as("n_digit_runs"),
        size(col("__valid")).cast("long").as("n_valid_cards"),
        // boundary-guarded REDACTION too: a literal replace of the PAN
        // text would also rewrite an occurrence embedded inside a longer
        // digit run (e.g. an 18-digit trace id sharing the PAN's digits)
        // — exactly what the maximal-run extraction excludes. Each valid
        // candidate appears in __valid once per maximal-run occurrence,
        // so the adjacent-occurrence case a boundary-consuming regex can
        // skip in one pass is covered by that occurrence's own fold step.
        aggregate(col("__valid"), col("__t"),
          (acc, c) => regexp_replace(acc,
            concat(lit("(^|[^0-9])"), c, lit("([^0-9]|$)")),
            lit("$1<CARD>$2"))).as("clean_text"))
  }

  /** Sliding-window passage chunking — the RAG/embedding prep step:
    * split each document into token windows of `window` tokens advancing
    * by `stride` (overlap = window - stride). Chunk count is
    * 1 if n <= window else ceil((n - window) / stride) + 1, so the final
    * chunk always reaches the last token and no chunk starts beyond it.
    * Output: (id, chunk_idx, start_pos, n_tokens, chunk_text) with
    * 1-based token start positions. Pure row-local array work (one
    * transform + explode), no shuffle — chunking 100 TB is a map-only
    * pass that AQE-splits on output size.
    */
  def chunkPassages(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val n = size(col("__toks")).cast("long")
    val nc = when(n <= window, lit(1L))
      .otherwise(call_function("div", n - window + (stride - 1), lit(stride.toLong)) + 1L)
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), col("__toks"), explode(sequence(lit(0L), nc - 1L)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        (col("chunk_idx") * stride + 1L).as("start_pos"),
        slice(col("__toks"), (col("chunk_idx") * stride + 1L).cast("int"), lit(window)).as("__c"))
      .select(col("id"), col("chunk_idx"), col("start_pos"),
        size(col("__c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** BPE merge-rule LEARNING (Sennrich et al. 2016) — the induction side
    * of [[graft.functions.BpeMergeTokenCount]]'s fixed merge table: start
    * from character tokens, and for each round count adjacent
    * within-word pairs corpus-wide (weighted by word frequency), adopt
    * the most frequent pair as a merge rule (ties broken (pair) ASC so
    * the rule sequence is bit-replayable), and re-segment by applying
    * the rule left-to-right non-overlapping inside every vocabulary
    * entry. Output: one (round, lhs, rhs, merged, cnt) row per learned
    * rule, `rounds` rows total.
    *
    * Scale shape: everything after the one corpus tokenization pass is
    * VOCABULARY-sized — the word relation is groupBy(word)+count once,
    * each round is one vocab-sized pair aggregation plus a row-local
    * fold re-segmentation, and the adopted rule rides along as a
    * broadcast one-row join (no driver collect in the loop). Rounds are
    * bounded and lineage is checkpoint-truncated per round, the same
    * contract as the PageRank/k-means unrolled iterations. Real
    * tokenizers run ~30k rounds; each round costs the same vocab-sized
    * pass, so wall-clock scales in rounds x vocab, independent of corpus
    * size beyond the first pass.
    */
  def learnBpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    var words = df.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("wc"))
      .select(col("wc"), split(col("w"), "").as("toks"))
      .localCheckpoint(false)
    var rules = List.empty[DataFrame]
    for (r <- 1 to rounds) {
      val prs = when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("a"),
            element_at(col("toks"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val pairs = words.select(col("wc"), explode(prs).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
      // eager one-row checkpoint: the adopted rule feeds both the output
      // and the fold below, and must not re-derive (a re-derivation after
      // words mutates would be a different rule)
      val rule = pairs.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(lit(r.toLong).as("round"), col("a").as("lhs"),
          col("b").as("rhs"), concat(col("a"), col("b")).as("merged"),
          col("cnt"))
        .localCheckpoint(true)
      require(!rule.isEmpty,
        s"learnBpeMerges: no adjacent pairs left at round $r — corpus too small for $rounds rounds")
      rules = rule :: rules
      val rr = rule.select(col("lhs").as("__ra"), col("rhs").as("__rb"))
      // left-to-right non-overlapping merge INSIDE each word: fold the
      // token array; a freshly merged token never re-merges with the next
      // element in the same pass (its string value is the concatenation,
      // which no rule lhs of this round equals) — the standard BPE
      // application order. The && short-circuits, so element_at(acc, -1)
      // never evaluates on an empty accumulator under ANSI.
      words = words.crossJoin(broadcast(rr))
        .select(col("wc"),
          aggregate(col("toks"), array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === col("__ra") && x === col("__rb"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(col("__ra"), col("__rb")))))
              .otherwise(concat(acc, array(x)))).as("toks"))
        .localCheckpoint(false)
    }
    rules.reverse.reduce(_ unionByName _)
  }

  /** RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"), integer-exact: candidate
    * phrases are the maximal stopword-free token runs (stopwords become
    * `|` delimiters via a replace chain — each replace applied TWICE so
    * adjacent stopwords sharing a boundary space both fall), each word
    * scores deg/freq (deg = Σ containing-phrase lengths) as floor ppm,
    * and a phrase scores the sum of its words' scores. Output: the top
    * `k` phrases by (score, then phrase): (phrase, n_occurrences,
    * score_ppm).
    *
    * Scale shape: the replace chain is row-local codegen in the scan
    * projection; word stats are one vocabulary-sized aggregation; the
    * phrase score is an equi-join on the word followed by a phrase
    * aggregation; top-k is a TakeOrdered. No windows, no driver state.
    *
    * DELIBERATE SIBLING: [[rakeKeywords]] implements the same Rose et
    * al. 2010 algorithm with different mechanics (gaps-and-islands
    * segmentation vs this replace-chain, e3 vs ppm scale) — each is
    * pinned by its own oracle and they are NOT interchangeable; a fix
    * to one's segmentation rules must be evaluated against the other's
    * oracle separately.
    */
  def rakeKeyphrases(df: DataFrame, idCol: String, textCol: String,
                     stopwords: Seq[String], k: Int,
                     maxWords: Int = 4): DataFrame = {
    require(stopwords.nonEmpty && k > 0 && maxWords > 0,
      "need stopwords, k > 0, maxWords > 0")
    val padded = concat(lit(" "), col(textCol), lit(" "))
    val cleaned = stopwords.foldLeft(padded) { (acc, w) =>
      val once = call_function("replace", acc, lit(s" $w "), lit(" | "))
      call_function("replace", once, lit(s" $w "), lit(" | "))
    }
    val phrases = df.select(col(idCol).as("id"), cleaned.as("__t"))
      .select(col("id"), explode(split(col("__t"), "\\|")).as("__p"))
      .select(col("id"), trim(col("__p")).as("phrase"))
      .filter(col("phrase") =!= "")
      // the canonical RAKE candidate cap: runs longer than maxWords are
      // document bodies, not keyphrases
      .filter(size(split(col("phrase"), " ")) <= maxWords)
      .localCheckpoint(false) // word stats + phrase scoring
    val words = phrases
      .select(col("phrase"), size(split(col("phrase"), " ")).cast("long").as("__len"),
        explode(split(col("phrase"), " ")).as("word"))
      .filter(col("word") =!= "")
      .localCheckpoint(false) // stats aggregation + score join
    val stats = words.groupBy(col("word"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("word"),
        call_function("div", col("__deg") * 1000000L, col("__freq")).as("__ws"))
    val phraseScores = words.join(stats, Seq("word"))
      .groupBy(col("phrase")).agg(sum(col("__ws")).as("__psum"))
    phrases.groupBy(col("phrase")).agg(count(lit(1)).as("n_occurrences"))
      .join(phraseScores, Seq("phrase"))
      // __psum counts every occurrence of the phrase once per word slot;
      // normalize to the per-instance score
      .select(col("phrase"), col("n_occurrences"),
        call_function("div", col("__psum"), col("n_occurrences")).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase")).limit(k)
  }

  /** Number of term-hash buckets the postings artifact partitions by —
    * the partition-pruning grain of [[bm25TopKFromIndex]].
    */
  val PostingsBuckets = 64L

  /** Build the materialized inverted-index artifact for BM25 serving:
    *  - `path/postings`: (id, term, tf, dl), written `partitionBy` a
    *    64-way term-hash bucket so a query-term probe PRUNES to the
    *    buckets its terms hash into (the lakehouse stand-in for
    *    per-term postings lists);
    *  - `path/dfreq`: vocabulary-sized (term, dfreq);
    *  - `path/meta`: one row (n, sumdl).
    * Built once per corpus generation; every retrieval after that reads
    * the artifact, not the corpus (the same build/serve split as the
    * MinHash and dedup-graph artifacts). Crash ordering: meta is DELETED
    * FIRST on a rebuild and written LAST, so a torn build — first OR
    * repeat — has no meta and serving fails loudly rather than scoring
    * new postings against a previous generation's stats (overwrite alone
    * left the old meta/dfreq in place through the postings rewrite).
    */
  def buildPostingsIndex(df: DataFrame, idCol: String, textCol: String,
                         path: String): Unit = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) fs.delete(metaPath, true)
    val docs = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .localCheckpoint(false) // consumed by postings, dfreq, and meta
    docs.withColumn("bucket",
        pmod(graft.functions.Converters.fingerprint64(col("term")), lit(PostingsBuckets)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    docs.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
      .write.mode("overwrite").parquet(s"$path/dfreq")
    docs.groupBy()
      .agg(countDistinct(col("id")).as("n"), sum(col("tf")).as("sumdl"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** [[bm25TopK]] served from a [[buildPostingsIndex]] artifact instead
    * of the corpus: identical integer arithmetic (same contract, same
    * oracle), but the scan is the PRUNED postings relation — only the
    * partitions the query terms hash into are read, so serve cost is
    * bounded by the probed buckets' postings, never the corpus. dfreq
    * broadcast after a semi-filter on the query terms; corpus stats ride
    * one broadcast row from `meta`.
    */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: Seq[(Int, Seq[String])], k: Int = 10,
                        scale: Long = 1000000L): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "need non-empty queries")
    import spark.implicits._
    val qt = broadcast(
      queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
        .toDF("query_id", "term"))
    val qBuckets = queries.flatMap(_._2).distinct
      .map(t => graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) % PostingsBuckets)
      .distinct
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qBuckets: _*)) // partition-pruned probe
    val dfq = broadcast(spark.read.parquet(s"$path/dfreq")
      .join(qt.select(col("term")).distinct(), Seq("term")))
    val stats = broadcast(spark.read.parquet(s"$path/meta")
      .select(col("n").as("__N"), col("sumdl").as("__sumdl")))
    val num = lit(scale) * col("tf") * 44L * col("__sumdl")
    val den = col("tf") * 20L * col("__sumdl") + lit(6L) * col("__sumdl") +
      lit(18L) * col("dl") * col("__N")
    val idf = call_function("div",
      lit(scale) * ((col("__N") - col("dfreq")) * 2L + 1L), col("dfreq") * 2L + 1L)
    val contrib = call_function("div", idf * call_function("div", num, den), lit(scale))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id"))
    postings.join(qt, Seq("term"))
      .join(dfq, Seq("term"))
      .crossJoin(stats)
      .select(col("query_id"), col("id"), contrib.as("__c"))
      .groupBy(col("query_id"), col("id")).agg(sum(col("__c")).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Heaps-law vocabulary growth curve (Heaps 1978): distinct-vocabulary
    * size at `nCheckpoints` id-ordered corpus prefixes — the curve that
    * says whether a corpus is still CONTRIBUTING new types (vocab keeps
    * growing ∝ tokens^β) or has gone stale/duplicated (the curve goes
    * flat). Exact: a word's first occurrence is min(doc id), so
    * V(prefix) = |{words : first_doc < threshold}| with thresholds at
    * ⌊(max_id+1)·k/n⌋. Output per checkpoint: (k, id_threshold, n_docs,
    * n_tokens, vocab, vocab_per_token_ppm).
    *
    * Scale shape: one (word)-keyed min aggregation + one (doc)-keyed
    * token count; the checkpoint relation is n rows broadcast into two
    * band joins (≤ n× the vocab/doc relation — n is ~10 by nature).
    * First-occurrence beats recomputing distinct-per-prefix n times.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  nCheckpoints: Int = 10): DataFrame = {
    require(nCheckpoints >= 1 && nCheckpoints <= 100,
      s"need 1..100 checkpoints, got $nCheckpoints")
    val toks = df.select(col(idCol).cast("long").as("__id"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
    val thr = toks.agg((max(col("__id")) + 1L).as("__m"))
      .select(explode(sequence(lit(1), lit(nCheckpoints))).as("k"), col("__m"))
      .select(col("k").cast("long").as("k"),
        call_function("div", col("__m") * col("k"),
          lit(nCheckpoints.toLong)).as("id_threshold"))
    val fo = toks.groupBy(col("__w")).agg(min(col("__id")).as("__fo"))
    val dt = toks.groupBy(col("__id")).agg(count(lit(1)).as("__nt"))
    // LEFT band joins + counts of the JOINED side: a checkpoint whose
    // threshold precedes every document (ids clustered high) must emit
    // its zero row — an inner join dropped it, and a consumer read the
    // missing prefix as absent data instead of an empty one
    val v = broadcast(thr).join(fo, col("__fo") < col("id_threshold"), "left")
      .groupBy(col("k"), col("id_threshold"))
      .agg(count(col("__fo")).as("vocab"))
    val t = broadcast(thr)
      .join(dt, col("__id") < col("id_threshold"), "left")
      .groupBy(col("k")).agg(count(col("__id")).as("n_docs"),
        coalesce(sum(col("__nt")), lit(0L)).as("n_tokens"))
    v.join(t, Seq("k"))
      .select(col("k"), col("id_threshold"), col("n_docs"), col("n_tokens"),
        col("vocab"),
        when(col("n_tokens") === 0L, lit(0L)).otherwise(
          call_function("div", lit(1000000L) * col("vocab"),
            col("n_tokens"))).as("vocab_per_token_ppm"))
      .orderBy(col("k"))
  }

  /** χ²-based term-feature selection (Yang & Pedersen 1997, "A
    * comparative study on feature selection in text categorization"):
    * for every (class, term) pair over DOCUMENT-level presence, the
    * 2×2 contingency statistic χ² = n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
    * as ONE exact scaled integer chi2_e3 = ⌊1000·n·(ad−bc)²/denom⌋.
    * Worst-case 1000·n·(n²/4)² bounds the doc count at n ≤ 2700
    * (enforced) for guaranteed-int64 exactness — χ² selection runs on a
    * per-class sample at corpus scale (the standard practice; subsample
    * upstream with [[graft.operators.SamplingOps.sampleByPct]]).
    * Output: the top-`topK` terms per class,
    * (class, term, a = docs-in-class-with-term, chi2_e3), score-desc /
    * term-asc ties.
    *
    * Scale shape: one distinct (doc, class, term) explode, one
    * (class, term)-keyed count + broadcast class/term marginals, the
    * rank window PARTITIONED on the class. No self-joins.
    */
  def chi2Terms(df: DataFrame, idCol: String, classCol: String,
                textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val dt = df.select(col(idCol).as("__id"), col(classCol).as("__cls"),
        explode(split(col(textCol), " ")).as("__t"))
      .filter(length(col("__t")) > 0).distinct()
    val n = dt.select(col("__id")).distinct().count()
    require(n <= 2700,
      s"chi2Terms is int64-exact up to 2700 docs (got $n) — sample upstream")
    val clsDocs = dt.select(col("__id"), col("__cls")).distinct()
      .groupBy(col("__cls")).agg(count(lit(1)).as("__nc"))
    val termDocs = dt.select(col("__id"), col("__t")).distinct()
      .groupBy(col("__t")).agg(count(lit(1)).as("__nt"))
    val cells = dt.groupBy(col("__cls"), col("__t")).agg(count(lit(1)).as("__a"))
      .join(broadcast(clsDocs), Seq("__cls"))
      .join(broadcast(termDocs), Seq("__t"))
    // b = term outside class, c = class without term, d = the rest
    val a = col("__a")
    val b = col("__nt") - col("__a")
    val c = col("__nc") - col("__a")
    val dd = lit(n) - col("__nt") - col("__nc") + col("__a")
    val det = a * dd - b * c
    val denom = (a + b) * (c + dd) * (a + c) * (b + dd)
    // a term present in EVERY doc (or absent class splits) zeroes a
    // marginal — χ² is 0 there by convention (no discriminative power)
    val chi = when(denom > 0L,
      call_function("div", lit(1000L) * lit(n) * det * det, denom))
      .otherwise(lit(0L))
    val w = Window.partitionBy(col("__cls"))
      .orderBy(col("chi2_e3").desc, col("__t"))
    cells.select(col("__cls"), col("__t"), col("__a"), chi.as("chi2_e3"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select(col("__cls").as("class"), col("__t").as("term"),
        col("__a").as("a"), col("chi2_e3"))
      .orderBy(col("class"), col("chi2_e3").desc, col("term"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents"): candidate phrases are
    * maximal stopword-delimited runs (capped at `maxLen` words — the
    * standard practical cap), each word scores deg/freq over the
    * candidate corpus (deg = Σ length of the phrases it occurs in,
    * with multiplicity; freq = its occurrence count), and a phrase
    * scores the sum of its words' scores. Integer contract: word score
    * = ⌊1000·deg/freq⌋, phrase score the exact sum of those floors —
    * engine-replayable. Output: the global top-`topK` distinct phrases
    * as (phrase, n_words, n_occurrences, score_e3), ties broken on the
    * phrase text.
    *
    * Scale shape: tokenize → per-doc gaps-and-islands run ids (window
    * PARTITIONED on the doc) → one (word)-keyed stat aggregation and
    * one (phrase)-keyed count, joined back word-wise; the only global
    * step is the final TakeOrdered top-k. No self-joins.
    *
    * DELIBERATE SIBLING of [[rakeKeyphrases]] — see its scaladoc for the
    * variant split; do not fold the two without re-deriving both oracles.
    */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], maxLen: Int, topK: Int): DataFrame = {
    require(stopwords.nonEmpty, "rakeKeywords needs a stopword list")
    require(maxLen >= 1 && topK >= 1, s"need maxLen/topK >= 1, got $maxLen/$topK")
    val toks = df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
    val wDoc = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val runs = toks.filter(!col("__w").isin(stopwords: _*))
      .withColumn("__run", col("__pos") - row_number().over(wDoc))
    val phrases = runs.groupBy(col("__id"), col("__run"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__w")))).as("__ps"))
      .select(concat_ws(" ",
          transform(col("__ps"), p => p.getField("__w"))).as("phrase"),
        size(col("__ps")).cast("long").as("n_words"))
      .filter(col("n_words") <= maxLen)
    val words = phrases.select(col("phrase"), col("n_words"),
      explode(split(col("phrase"), " ")).as("__w"))
    val stats = words.groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("n_words")).as("__deg"))
      .withColumn("__score",
        call_function("div", lit(1000L) * col("__deg"), col("__freq")))
    // one (phrase)-keyed aggregate over ALL occurrences: __sum is
    // occurrences × per-occurrence score and __ow is occurrences ×
    // n_words, so both divisions below are exact
    words.join(stats.select(col("__w"), col("__score")), Seq("__w"))
      .groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("__ow"), sum(col("__score")).as("__sum"))
      .select(col("phrase"), col("n_words"),
        call_function("div", col("__ow"), col("n_words")).as("n_occurrences"),
        call_function("div", col("__sum") * col("n_words"), col("__ow")).as("score_e3"))
      .orderBy(col("score_e3").desc, col("phrase"))
      .limit(topK)
  }
}
