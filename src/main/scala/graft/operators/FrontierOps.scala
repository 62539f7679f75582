package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) operator: the classic "best trade-off"
  * OLAP query — rows not dominated by any other row, where `a` dominates
  * `b` iff a.x >= b.x AND a.y >= b.y with at least one strict (both
  * dimensions maximized; negate a column to minimize it).
  *
  * Scale design (the textbook BNL/SFS skyline is a driver loop; this is
  * the distributed decomposition):
  *   1. collapse to the per-x frontier candidate `max(y) per distinct x`
  *      — ONE map-side-combinable aggregation; everything below max-y at
  *      its own x is dominated there already, so the candidate relation
  *      is bounded by |distinct x|, not |rows|;
  *   2. exclusive prefix-max of y over strictly-greater x, computed the
  *      [[RangePrefix]] way: range-partition on x desc, per-partition
  *      window prefix-max + a driver-bounded (one row per PARTITION)
  *      per-partition max collect folded to exclusive offsets — never a
  *      global single-partition window;
  *   3. a distinct-x candidate survives iff its y strictly exceeds every
  *      y at larger x (prefix-max < y); ties inside a surviving (x, max-y)
  *      cell are all skyline members (neither strictly dominates the
  *      other), recovered by an equi-join back to the input.
  *
  * 2D only by design: the per-x collapse + prefix-max trick is exact for
  * two criteria; higher dimensions need the dominance-join formulation.
  */
object FrontierOps {
  /** @param df input rows; @param xCol,yCol the two maximized criteria
    * (integral or otherwise exactly-comparable types — float dimensions
    * should be quantized first, per the repo's cross-engine float rules).
    * @return the skyline rows of `df` (all original columns), including
    *         every tied copy of a surviving (x, y) cell.
    */
  def paretoFrontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    require(!df.columns.contains(RangePrefix.PidCol),
      s"input may not already carry the internal column ${RangePrefix.PidCol}")
    require(df.schema(yCol).dataType == org.apache.spark.sql.types.LongType,
      s"paretoFrontier2D needs a BIGINT y dimension (driver offsets are int64), " +
        s"got ${df.schema(yCol).dataType.sql} — cast or quantize first")
    // dominance is undefined on a NULL coordinate: such rows are
    // EXCLUDED up front, explicitly (round-14 review — the old code
    // only excluded them implicitly through desc-nulls-last partition
    // ordering plus the null-dropping output equi-join; had the range
    // partitioner ever placed the NULL-x cell first, its max-y would
    // have shaded real candidates out of the skyline)
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = clean.groupBy(col(xCol)).agg(max(col(yCol)).as("__my"))
      .repartitionByRange(col(xCol).desc)
      .withColumn(RangePrefix.PidCol, spark_partition_id())
      .localCheckpoint(false) // two consumers must agree on partition ids
    // driver-bounded: one (pid, max y) row per partition -> exclusive
    // prefix max over preceding (larger-x) partitions
    val partMax = perX.groupBy(col(RangePrefix.PidCol))
      .agg(max(col("__my")).as("t"))
      .collect().map { r =>
        // a partition whose candidate y values are ALL NULL has no max —
        // it advances nothing but still takes the running prefix offset
        // (round-13 review: getLong NPE'd on the driver mid-job)
        (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }.sortBy(_._1)
    var acc = Long.MinValue
    val offsets = partMax.map { case (pid, t) =>
      val entry = (pid, acc); acc = t.fold(acc)(v => math.max(acc, v)); entry
    }.toMap
    val offCol = offsets.foldLeft(lit(Long.MinValue)) { case (c, (pid, off)) =>
      when(col(RangePrefix.PidCol) === pid, lit(off)).otherwise(c)
    }
    // x is distinct per row after the collapse, so a rows-frame window
    // partitioned by pid gives the within-partition strictly-greater-x max
    val w = Window.partitionBy(col(RangePrefix.PidCol))
      .orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__pre", greatest(coalesce(max(col("__my")).over(w), lit(Long.MinValue)), offCol))
      .filter(col("__my") > col("__pre"))
      .select(col(xCol), col("__my").as(yCol))
    clean.join(frontier, Seq(xCol, yCol))
  }
}
