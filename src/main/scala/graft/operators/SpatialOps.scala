package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance self-joins over planar integer coordinates via uniform grid
  * bucketing — the classic spatial-join decomposition (cell-partitioned
  * candidates, exact verify) that replaces the O(n²) cross product with
  * a cell-local equi-join. Coordinates are integers (microdegrees /
  * fixed-point meters), so the distance filter is exact int64 math and
  * bit-replayable on any engine.
  */
object SpatialOps {
  /** All unordered point pairs within `radius` (Euclidean, inclusive):
    * (id_a, id_b, dist2) with id_a < id_b and dist2 the exact squared
    * distance. `cell` is the grid pitch and must be >= radius so a 3×3
    * cell neighborhood covers the radius — each probe row explodes to
    * its 9 neighbor cells and equi-joins build rows on THEIR home cell,
    * so every qualifying pair is found exactly once per orientation and
    * the id_a < id_b filter keeps one.
    *
    * Scale shape: the only shuffle is the equi-join on (cx, cy) — cost
    * ∝ sum over cells of |probe cell| × |build cell|, which for any
    * non-adversarial density is linear in points (pick `cell` ≈ radius
    * so occupancy stays O(1); a skewed megacity cell is AQE skew-join
    * territory, or salt the cell key upstream). The distance verify is
    * row-local int64 arithmetic inside codegen. Never a cross join, no
    * driver-side structures — this is how a 100 TB point corpus
    * neighbor-joins.
    */
  def gridNeighborPairs(points: DataFrame, idCol: String, xCol: String,
                        yCol: String, cell: Long, radius: Long): DataFrame = {
    require(cell >= radius && radius >= 0,
      s"need cell >= radius >= 0 so 3x3 neighborhoods cover the radius, got cell=$cell radius=$radius")
    // exact FLOOR bucketing (remainder-subtract then integral divide, the
    // IntervalOps trick): `div` alone truncates toward zero, which would
    // merge cells (-cell, 0) and [0, cell) for planes with negative
    // coordinates and silently lose cross-origin neighbor pairs
    def cellOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(cell)), lit(cell))
    val pts = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", cellOf(col("x")))
      .withColumn("cy", cellOf(col("y")))
      .localCheckpoint(false) // probe and build sides of the self-join
    val off = array(lit(-1L), lit(0L), lit(1L))
    val probe = pts
      .withColumn("__ox", explode(off))
      .withColumn("__oy", explode(off))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("__ox")).as("cx"), (col("cy") + col("__oy")).as("cy"))
    val build = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
