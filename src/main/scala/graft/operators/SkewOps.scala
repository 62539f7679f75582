package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for hot-key workloads at cluster scale
  * (SCALE.md): salted two-phase aggregation and salted broadcast-replicate
  * joins. AQE's skew-join handles sort-merge cases at runtime; these are
  * for the planned-ahead paths (hot PK spaces known in advance, e.g. a
  * celebrity-user events table).
  */
object SkewOps {
  /** Two-phase aggregation: partial aggregate on (key, salt) spreads a hot
    * key over `saltBuckets` reducers, then the final aggregate combines the
    * partials. `partialAggs` must be decomposable (sum/count/min/max —
    * their partial and final forms are given separately).
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Convenience: skew-safe sum/count per key. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame =
    twoPhaseAgg(df, keys, saltBuckets)(
      Seq(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt")),
      Seq(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows")))

  /** Salted join for a skewed fact side against a small-ish dimension:
    * fact rows get a random salt in [0, buckets); the dimension is
    * replicated once per salt value so every (key, salt) pair finds its
    * match. Spreads one hot join key over `buckets` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
