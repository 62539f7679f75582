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
  * partitioned by key and ordered by (time, tag, tie) carrying the right
  * payload forward with `last(ignoreNulls)`, then keep the left rows.
  * Cost: ONE shuffle on the key, state per partition = one payload row —
  * linear at any scale, no join explosion, AQE-skew-safe.
  *
  * Semantics match a true join:
  *  - right rows sort before left rows at equal time (tag 0 < 1), giving
  *    inclusive <= matching;
  *  - right rows sharing (key, time) resolve to the HIGHEST `rightTieCol`
  *    (they sort by the tie-break under the same window — no separate
  *    dedup shuffle);
  *  - right rows with a NULL key or NULL time are dropped up front: an
  *    equality/<= predicate never matches NULL, but a window would
  *    happily group and carry them.
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
    val reserved = Seq("__t", "__tag", "__tie", "__pl")
    val allNames = left.columns.toSeq ++ payload ++ Seq(keyCol, rightTieCol)
    require(!allNames.exists(reserved.contains),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} — " +
        "rename one side before joining")
    val r = right
      .filter(col(keyCol).isNotNull && rightTime.isNotNull)
      .select(col(keyCol) +: rightTime.as("__t") +: lit(0).as("__tag") +:
        col(rightTieCol).as("__tie") +: payload.map(col): _*)
    val l = left.select(
      left.columns.map(col) :+ leftTime.as("__t") :+ lit(1).as("__tag") :+
        lit(null).cast(right.schema(rightTieCol).dataType).as("__tie"): _*)
    // pad each side's missing columns in ONE projection (a per-column
    // withColumn chain costs an analysis pass per column — quadratic on
    // the wide frames this operator targets)
    val lWithNullPayload = l.select(l.columns.map(col) ++
      payload.map(p => lit(null).cast(r.schema(p).dataType).as(p)): _*)
    val rWithNullLeft = r.select(r.columns.map(col) ++
      left.columns.filterNot(_ == keyCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = lWithNullPayload.unionByName(rWithNullLeft)
    // equal-(key, time) right rows sort by the tie-break, so `last` picks
    // the highest one — the dedup rides the SAME (and only) shuffle
    val carryW = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
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

  /** FORWARD as-of join — for every left row, the single right row with
    * the SMALLEST right-time >= left-time within the same key (the
    * "next event after" lookup: next price tick, next retry, label at
    * the end of an observation window). Implemented by running
    * [[asofJoin]] over negated times, so it inherits the one-shuffle
    * union+window plan and every edge-case contract verbatim: inclusive
    * matching, equal-(key, time) right rows resolving to the highest
    * `rightTieCol`, null keys/times dropped. Time columns must be
    * integer-valued (negation of a float time would be exact too, but
    * every caller here uses epoch integers).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTime: Column, rightTime: Column,
                      rightTieCol: String, payload: Seq[String]): DataFrame =
    asofJoin(left, right, keyCol, -leftTime, -rightTime, rightTieCol, payload)
}
