package graft.operators

import graft.functions.Converters
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling / data-mixing operators for training-corpus
  * assembly. `sample()`-style RNG sampling is irreproducible across runs,
  * partitionings, and engines; these derive the keep decision from a
  * content-independent hash of the row id, so a sample is stable under
  * re-partitioning, retries, and re-runs — and exactly replayable by an
  * external SQL engine (the same rolling fingerprint as q29's oracle).
  */
object SamplingOps {
  /** Stable per-id bucket in [0, 100): rolling fingerprint of the id's
    * decimal string, mod 100. Pure column arithmetic — codegen'd, no RNG,
    * no shuffle.
    */
  def deterministicBucket(id: Column): Column =
    pmod(Converters.fingerprint64(id.cast(StringType)), lit(100L))

  /** Keep ~pct% of rows, deterministically by id. */
  def sampleByPct(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(deterministicBucket(col(idCol)) < pct)

  /** Stratified mixing: per-stratum keep percentages (domain mixing for
    * training data — e.g. downsample boilerplate-heavy domains). Strata
    * absent from the map keep `defaultPct`. One codegen'd CASE chain; no
    * shuffle, no per-stratum pass.
    */
  def sampleByStrata(df: DataFrame, idCol: String, strataCol: String,
                     pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val threshold = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(deterministicBucket(col(idCol)) < threshold)
  }

  /** Deterministic train/validation split tag: same id -> same split,
    * forever, on any cluster.
    */
  def splitTag(id: Column, trainPct: Int): Column =
    when(deterministicBucket(id) < trainPct, "train").otherwise("holdout")

  /** Concat-then-chunk sequence packing: documents are laid out
    * back-to-back in `orderCol` order and cut into fixed `seqLen`-token
    * training sequences (documents straddle boundaries, as LLM pre-training
    * packing does). Each document maps to its span: global start offset,
    * first/last sequence index, and offset within the first sequence — all
    * from ONE prefix-sum window, so the layout is deterministic and
    * identical on any cluster. PRECONDITION: `orderCol` is a UNIQUE key
    * (a doc id) — duplicate order values make the running sum's tie order
    * partition-dependent, voiding the determinism contract. For 100 TB,
    * replace the single global window with per-partition sums + a
    * broadcast of partition-prefix totals (same arithmetic, two passes).
    */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val reserved = Seq("n_tokens", "global_start", "__pack_end")
    require(!reserved.contains(orderCol) && !reserved.contains(tokenCol),
      s"orderCol/tokenCol may not use the reserved output names ${reserved.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val end = sum(col(tokenCol)).over(w) // cumulative tokens through this doc
    df.select(col(orderCol), col(tokenCol).cast(LongType).as("n_tokens"),
        (end - col(tokenCol)).cast(LongType).as("global_start"),
        end.cast(LongType).as("__pack_end"))
      .filter(col("n_tokens") > 0)
      // integer `div`, never double `/`: float division loses exactness
      // past 2^53 total tokens — well inside 100 TB territory
      .select(col(orderCol), col("n_tokens"), col("global_start"),
        expr(s"global_start div ${seqLen}L").as("start_seq"),
        pmod(col("global_start"), lit(seqLen.toLong)).as("start_off"),
        expr(s"(__pack_end - 1) div ${seqLen}L").as("end_seq"))
  }
}
