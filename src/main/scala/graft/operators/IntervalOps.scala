package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INTERVAL (range) join — every (point, interval) pair with
  * start <= point <= end. Spark has no native range join: the naive
  * theta-join plans as BroadcastNestedLoopJoin (or a cartesian product),
  * comparing every point against every interval — the classic scale trap
  * for events-vs-windows, IP-vs-CIDR-range, and reading-vs-session
  * lookups.
  *
  * This is the bucketized composition: time is cut into fixed-width
  * buckets, each interval is replicated to every bucket it overlaps (a
  * row-local `sequence` explode), each point maps to its single bucket,
  * and the pairing becomes a hash EQUI-join on the bucket id followed by
  * the exact residual filter. A pair appears exactly once (the point
  * lives in one bucket), so no distinct pass is needed.
  *
  * Scale shape: shuffle keyed on the bucket id on both sides — linear,
  * AQE-skew-splittable. Replication factor per interval is
  * length/bucketWidth + 1, so set `bucketWidth` near the TYPICAL interval
  * length: hour-long sessions with a 1h bucket cost ~2 rows per interval.
  * Degenerate/invalid intervals (NULL bounds, end < start — `sequence`
  * would step backwards) are dropped up front, matching the theta-join
  * semantics where NULL/empty ranges match nothing.
  */
object IntervalOps {
  /** @param pointCol  integer-valued column of `points` (epoch days/secs/…)
    * @param startCol/endCol integer-valued inclusive bounds on `intervals`,
    *        same unit as `pointCol`
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"points/intervals column names collide: ${dup.mkString(", ")} — rename one side")
    require(!(points.columns ++ intervals.columns).contains("__b"),
      "inputs may not carry the reserved column __b")
    // Exact floor-division bucketing. `floor(c / bucketWidth)` would divide
    // as DOUBLE, which is no longer exactly rounded for |c| >= 2^53 (epoch
    // micros/nanos — units this scaladoc explicitly invites), silently
    // dropping pairs whose point and interval land in different buckets.
    // Instead subtract the non-negative remainder (long arithmetic, exact)
    // so the numerator is an exact multiple of bucketWidth, then integral-
    // divide: floorDiv(c, w) = (c - pmod(c, w)) div w — exact at any
    // magnitude and correct for negatives. (Only c within bucketWidth of
    // Long.MinValue could underflow — not a representable epoch.)
    def bucketOf(c: org.apache.spark.sql.Column) = {
      val q = c.cast("long")
      val exactMultiple = q - pmod(q, lit(bucketWidth))
      org.apache.spark.sql.GraftBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(exactMultiple),
          org.apache.spark.sql.GraftBridge.expression(lit(bucketWidth))))
    }
    val p = points.filter(col(pointCol).isNotNull)
      .withColumn("__b", bucketOf(col(pointCol)))
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__b",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
