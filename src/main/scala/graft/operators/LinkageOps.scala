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
}
