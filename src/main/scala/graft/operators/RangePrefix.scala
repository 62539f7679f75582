package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared scaffold for distributed exclusive-prefix aggregation: the
  * scale-safe replacement for a global unpartitioned window (which funnels
  * every row to one partition). Rows are range-partitioned on the sort
  * key so partitions are ordered slices of the global order, the frame is
  * lazily local-checkpointed so every consumer sees the SAME partition
  * assignment (the pid->offset map below is keyed by it), and the
  * per-partition weight totals — one row per partition, driver-bounded —
  * become exclusive prefix offsets. Callers combine the offsets with a
  * PARTITIONED window over `__pid` to recover exact global prefix sums /
  * ranks. Used by [[SamplingOps.packSequences]] and
  * [[SketchOps.exactPercentiles]].
  */
private[operators] object RangePrefix {
  /** Internal column added to the returned frame. */
  val PidCol = "__pid"

  /** @return (range-partitioned frame tagged with [[PidCol]],
    *         pid -> exclusive prefix total of `weight`, global total).
    *         The checkpoint is materialized once by the totals job; its
    *         blocks are freed by the context cleaner when the result is
    *         released.
    */
  def withOffsets(df: DataFrame, sortCols: Seq[Column],
                  weight: Column): (DataFrame, Map[Int, Long], Long) = {
    require(!df.columns.contains(PidCol),
      s"input may not already carry the internal column $PidCol")
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn(PidCol, spark_partition_id())
      .localCheckpoint(false)
    // null weights count as zero (explicitly, so an all-null partition
    // yields offset arithmetic instead of a driver-side NPE on getLong);
    // callers wanting strictness filter/validate before calling
    val totals = parted.groupBy(col(PidCol)).agg(sum(coalesce(weight, lit(0L))).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val entry = (pid, acc)
      acc += t
      entry
    }.toMap
    (parted, offsets, acc)
  }
}
