package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal shaping operators: gaps-and-islands value runs (SCD Type-2
  * validity intervals from an event stream).
  *
  * The reference materializes history as an append-only audit stream
  * (models/event/event.go:82-94, history mode); warehouses consume that
  * stream as slowly-changing dimensions. This operator produces the
  * SCD2 form directly: one validity interval per contiguous run of an
  * attribute value.
  */
object TemporalOps {

  /** Collapse each key's ordered event stream into contiguous runs of
    * identical `valueCol` (gaps-and-islands), emitting SCD2-style
    * half-open validity intervals:
    *
    *   key, value, valid_from (= first ord of the run),
    *   valid_to (= next run's valid_from, NULL for the current run),
    *   n_events, is_current.
    *
    * Run ids come from a running sum of null-safe change flags — two
    * window functions over the SAME key partitioning (one exchange, one
    * sort), then one aggregation on (key, run) and a final lead over the
    * runs relation (already tiny: one row per run). All windows are
    * key-partitioned — no global window, scales with key cardinality.
    */
  def valueRuns(df: DataFrame, keyCol: String, ordCol: Column, tieCol: Column,
                valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCol, tieCol)
    val chg = (!(col(valueCol) <=> lag(col(valueCol), 1).over(w))).cast("long")
    val runs = df
      .withColumn("__run", sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col(valueCol), col("__run"))
      .agg(min(ordCol).as("valid_from"), count(lit(1)).as("n_events"))
    // the run id tie-breaks the runs-level lead: two runs share a
    // valid_from when the value changes within one ord tick, and the run
    // id (monotone in event order) is the only deterministic order there
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"), col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}
