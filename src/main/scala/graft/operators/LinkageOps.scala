package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage in the Fellegi–Sunter shape (Fellegi &
  * Sunter 1969): candidate pairs from equi-blocking, a per-field
  * agreement vector, and an additive match score from precomputed
  * integer agreement/disagreement weights (the log-likelihood-ratio
  * weights of the F-S model, supplied as fixed scaled integers so the
  * decision is engine-portable — estimating m/u probabilities is the
  * caller's offline EM step, not this operator).
  */
object LinkageOps {
  /** One comparison field: `agree` evaluates over the JOINED pair row
    * (reference left/right columns by their — necessarily distinct —
    * names); a null/unevaluable comparison counts as disagreement.
    */
  final case class Agreement(name: String, agree: Column,
                             wAgree: Long, wDisagree: Long)

  /** Score all candidate pairs sharing `blockCol` (same name both
    * sides). Output: left cols + right cols + one boolean `<name>_agree`
    * per field + (score, cls) for pairs scoring >= possibleMin, with
    * cls = 'link' at >= linkMin else 'possible' — the F-S three-way
    * decision's upper two cells (non-links are dropped; they are the
    * overwhelming bulk of the candidate space).
    *
    * Scale shape: the only shuffle is the equi-join on the block key —
    * candidate volume is sum over blocks of |L_b|·|R_b|, the quantity
    * blocking exists to bound (pick keys with bounded occupancy; a
    * pathological block is AQE skew-join territory). Agreement flags
    * and the score are row-local codegen; no windows, no driver state.
    */
  def linkPairs(left: DataFrame, right: DataFrame, blockCol: String,
                fields: Seq[Agreement], possibleMin: Long,
                linkMin: Long): DataFrame = {
    require(fields.nonEmpty, "linkPairs needs at least one agreement field")
    require(linkMin >= possibleMin, s"need linkMin >= possibleMin, got $linkMin < $possibleMin")
    // reserved output names fail loudly instead of silently REPLACING a
    // caller's column (round-13 review: a right-side `score` column — a
    // model confidence, say — was clobbered, and Agreements referencing
    // it then compared against the linkage score)
    val reserved = Seq("score", "cls") ++ fields.map(f => s"${f.name}_agree")
    val carried = (left.columns ++ right.columns).toSet
    val clash = reserved.filter(carried.contains)
    require(clash.isEmpty,
      s"linkPairs reserves output column(s) ${clash.mkString(", ")} — rename " +
        "the input columns or the agreement fields")
    val joined = left.join(right, Seq(blockCol))
    val flagged = fields.foldLeft(joined) { case (acc, f) =>
      acc.withColumn(s"${f.name}_agree", coalesce(f.agree, lit(false)))
    }
    val score = fields.map(f =>
      when(col(s"${f.name}_agree"), lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    flagged.withColumn("score", score)
      .filter(col("score") >= possibleMin)
      .withColumn("cls",
        when(col("score") >= linkMin, lit("link")).otherwise(lit("possible")))
  }

  /** Simplified Soundex blocking key (Russell/Odell family): first
    * letter + the first three consonant-class digits of the REST of the
    * string, runs collapsed, vowels dropped, zero-padded — the phonetic
    * blocking key that lets [[linkPairs]] catch name typos an exact or
    * prefix block would scatter (a vowel substitution anywhere past the
    * first letter leaves the key unchanged). Non-alpha characters are
    * stripped FIRST (D'ARCY codes as DARCY → D620; punctuation never
    * leaks into a key), and the first letter's digit is skipped only
    * when the letter actually carries one — a vowel/H/W/Y initial
    * contributes no digit, so the first consonant after it is the
    * FIRST emitted digit, not a casualty of a blind position-2 slice
    * (ADAM → A350, WILLIAMS → W452, matching archival Soundex).
    * Remaining deviation, applied identically on both engines: H/W act
    * like vowels (run separators are not special-cased). The chain is
    * upper → strip-non-alpha → translate → collapse-runs → strip-zeros
    * → conditional-skip → letter+rpad, each step with an exact DuckDB
    * twin (the q255 oracle replays it; two portability traps pinned
    * there: DuckDB's RE2 SILENTLY ignores backreferences, so run
    * collapse must be the per-digit `d{2,}` chain — never `([0-9])\1+`
    * — and DuckDB regexp_replace needs the 'g' flag where Spark
    * replaces all).
    */
  def soundexKey(c: Column): Column = {
    val u = regexp_replace(upper(c), "[^A-Z]", "")
    val digits = translate(u,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (1 to 6).foldLeft(digits) { (acc, dig) =>
      regexp_replace(acc, s"$dig{2,}", s"$dig")
    }
    val stripped = regexp_replace(collapsed, "0", "")
    // consonant initial: stripped[1] is the first letter's own digit
    // (possibly merged with an adjacent equal run — PFISTER → P236), so
    // the tail starts at 2; zero-class initial: nothing was emitted for
    // the first letter, the tail IS the whole stripped string
    val tail = when(substring(digits, 1, 1) === "0",
      substring(stripped, 1, 3)).otherwise(substring(stripped, 2, 3))
    concat(substring(u, 1, 1), rpad(tail, 3, "0"))
  }

  /** One survivorship rule of [[goldenRecord]]; `out` is the golden
    * column name. Tie-breaks are total and engine-portable:
    *  - [[Longest]]: longest non-null string, ties to the
    *    lexicographically smallest
    *  - [[Majority]]: most frequent non-null value, ties to the smallest
    *    value
    *  - [[LatestBy]]: value of the non-null row with the greatest
    *    `ordCol`, ties to the smallest `tieCol`
    */
  sealed trait Survivor { def out: String }
  final case class Longest(src: String, out: String) extends Survivor
  final case class Majority(src: String, out: String) extends Survivor
  final case class LatestBy(src: String, ordCol: String, tieCol: String,
                            out: String) extends Survivor

  /** MDM survivorship: collapse each linked cluster to ONE golden record
    * by per-attribute rules — the step after [[linkPairs]] + component
    * assignment in a master-data pipeline (longest-string repairs
    * truncation, majority vote repairs sentinel pollution, latest-wins
    * takes the freshest source). Output: `clusterCol`, `n_members`, one
    * column per rule. A rule whose source is null on every member yields
    * null.
    *
    * Scale shape: [[Longest]]/[[LatestBy]] ride ONE aggregation keyed on
    * the cluster (struct-argmin, no windows); each [[Majority]] adds a
    * (cluster, value) count + a cluster-keyed argmin + a cluster equi-join
    * — all shuffles are on the cluster key, sized by members-per-cluster,
    * never the corpus. No driver state.
    */
  def goldenRecord(df: DataFrame, clusterCol: String,
                   rules: Seq[Survivor]): DataFrame = {
    require(rules.nonEmpty, "goldenRecord needs at least one rule")
    require(rules.map(_.out).distinct.size == rules.size,
      "survivorship output names must be distinct")
    // null-safe struct-argmin: null sources contribute no candidate (min
    // ignores the null), so a value survives only from rows that have one
    def argmin(ord: Column, v: Column): Column =
      min(when(v.isNotNull, struct(ord.as("a"), v.as("v")))).getField("v")
    val baseAggs = rules.flatMap {
      case Longest(srcC, out) =>
        Some(argmin(-length(col(srcC)), col(srcC)).as(out))
      case LatestBy(srcC, ordCol, tieCol, out) =>
        // the ORD guard matters too (round-13 review): a NULL ordCol row
        // sorts BEFORE every dated one under struct-min, so an undated
        // stale source silently beat the freshest value — undated rows
        // contribute no candidate, like null-valued ones
        Some(argmin(struct((-col(ordCol)).as("o"), col(tieCol).as("t")),
          when(col(ordCol).isNotNull, col(srcC))).as(out))
      case _: Majority => None
    }
    val base = df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"), baseAggs: _*)
    val withVotes = rules.foldLeft(base) {
      case (acc, Majority(srcC, out)) =>
        val votes = df.filter(col(srcC).isNotNull)
          .groupBy(col(clusterCol), col(srcC))
          .agg(count(lit(1)).as("__vn"))
          .groupBy(col(clusterCol))
          .agg(argmin(struct((-col("__vn")).as("n"), col(srcC).as("s")),
            col(srcC)).as(out))
        acc.join(votes, Seq(clusterCol), "left")
      case (acc, _) => acc
    }
    withVotes.select(col(clusterCol) +: col("n_members") +:
      rules.map(r => col(r.out)): _*)
  }
}
