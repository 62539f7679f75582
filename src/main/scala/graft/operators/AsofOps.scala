package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for every left row, the single right row with the largest
  * right-time <= left-time within the same key (the point-in-time lookup
  * of feature stores, market data, and CDC reconciliation). Spark has no
  * native operator; the naive range join explodes to one row per
  * (left, earlier-right) pair and then filters. This implementation is
  * the scalable composition: UNION both sides tagged, ONE window
  * partitioned by key and ordered by (time, tag) carrying the right
  * payload forward with `last(ignoreNulls)`, then keep the left rows.
  * Cost: one shuffle on the key, state per partition = one payload row —
  * linear at any scale, no join explosion, AQE-skew-safe.
  *
  * Determinism: right rows that share (key, time) are collapsed to the
  * one with the highest tie-break BEFORE the window (`rightTieCol`), so
  * the carried payload is unique; right rows sort before left rows at
  * equal time (tag 0 < 1), giving inclusive <= semantics.
  */
object AsofOps {
  /** @param leftTime/rightTime integer-comparable time columns (same unit)
    * @param payload right-side columns carried onto each left row (null
    *        when no right row precedes it)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: Column, rightTime: Column,
               rightTieCol: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val reserved = Seq("__t", "__tag")
    require(!(payload :+ keyCol :+ rightTieCol).exists(reserved.contains),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    // collapse equal-time right rows to the max tie-break row (one window
    // partitioned by (key, time) — no global ordering anywhere)
    val dedupW = Window.partitionBy(col(keyCol), rightTime)
      .orderBy(col(rightTieCol).desc)
    val r = right
      .withColumn("__rn", row_number().over(dedupW)).filter(col("__rn") === 1)
      .select(col(keyCol) +: rightTime.as("__t") +: lit(0).as("__tag") +:
        payload.map(col): _*)
    val l = left.select(
      left.columns.map(col) :+ leftTime.as("__t") :+ lit(1).as("__tag"): _*)
    val lWithNullPayload = payload.foldLeft(l)((acc, p) =>
      acc.withColumn(p, lit(null).cast(r.schema(p).dataType)))
    val rWithNullLeft = left.columns.filterNot(_ == keyCol)
      .foldLeft(r)((acc, c) => acc.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lWithNullPayload.unionByName(rWithNullLeft)
    val carryW = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // the payload rides as ONE struct (non-null exactly on right rows):
    // carrying columns independently with last(ignoreNulls) would tear the
    // tuple when a payload member is legitimately NULL — that member would
    // reach back to an OLDER right row
    val payloadStruct = when(col("__tag") === 0, struct(payload.map(col): _*))
    unioned
      .withColumn("__pl", last(payloadStruct, ignoreNulls = true).over(carryW))
      .filter(col("__tag") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col("__pl").getField(p).as(p)): _*)
  }
}
