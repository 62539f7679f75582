package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline policy evaluation over logged interaction data — the replay
  * method (Li et al. 2011, "Unbiased Offline Evaluation of
  * Contextual-bandit-based News Article Recommendation"): a candidate
  * policy is scored on exactly the logged rounds where its choice
  * coincides with the logged action, whose observed reward is then an
  * unbiased sample of the policy's reward (under uniform logging).
  */
object PolicyOps {
  /** Replay-evaluate `policies` — (name, the arm that policy picks for
    * each logged row, as a Column over the input) — against the logged
    * `armCol`/`rewardCents`. Output one row per policy:
    * (policy, n_matched, sum_cents, avg_cents_e3) with the average as
    * an exact milli-cent integer (floor), 0 for a policy that never
    * matches. Ordered by policy name.
    *
    * Scale shape: one filtered single-row aggregate per policy over the
    * same scan (Spark shares the cached/source scan across the union;
    * policy count is small by nature). The match predicate and reward
    * are row-local codegen; the result is policies-sized. Policy-choice
    * columns needing their own windows/joins (a per-user sticky arm, a
    * broadcast best-arm) are built by the CALLER on the input frame —
    * this operator is the estimator, not the feature plumbing.
    */
  def replayEvaluate(logged: DataFrame, armCol: String, rewardCents: Column,
                     policies: Seq[(String, Column)]): DataFrame = {
    require(policies.nonEmpty, "replayEvaluate needs at least one policy")
    require(policies.map(_._1).distinct.length == policies.length,
      "policy names must be unique")
    policies.map { case (name, choice) =>
      logged.filter(col(armCol) === choice)
        .agg(count(lit(1)).as("n_matched"),
          coalesce(sum(rewardCents), lit(0L)).as("sum_cents"))
        .select(lit(name).as("policy"), col("n_matched"), col("sum_cents"),
          when(col("n_matched") > 0L,
            call_function("div", col("sum_cents") * 1000L, col("n_matched")))
            .otherwise(lit(0L)).as("avg_cents_e3"))
    }.reduce(_ unionByName _).orderBy(col("policy"))
  }
}
