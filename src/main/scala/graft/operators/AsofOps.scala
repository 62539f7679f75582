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

  /** NEAREST as-of join — for every left row, the right row with the
    * smallest |right-time - left-time| within the key; equal distance
    * resolves BACKWARD (the at-or-before row), matching the common
    * feature-store convention. Adds `asof_dt` (signed matched-minus-left
    * time, null when the key has no right rows) to the [[asofJoin]]
    * output contract.
    *
    * Same one-shuffle shape as [[asofJoin]]: right rows first dedup to
    * one per (key, time) (highest tie — making both directions agree on
    * duplicates), then ONE tagged union + ONE key-partitioned sort
    * carries the latest preceding payload (`last` over the backward
    * frame) and the earliest following payload (`first` over the
    * forward frame); the pick is a row-local comparison. No range-join
    * explosion at any scale.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTime: Column, rightTime: Column,
                      rightTieCol: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoinNearest needs at least one payload column")
    val reserved = Seq("__t", "__tag", "__tiebrk", "__pb", "__pf", "__pick",
      "__rn", "__rt", "asof_dt")
    val allNames = left.columns.toSeq ++ payload ++ Seq(keyCol, rightTieCol)
    require(!allNames.exists(reserved.contains),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    require(payload.toSet.intersect(left.columns.toSet).isEmpty,
      "payload columns collide with left columns — rename one side first")
    val dedupW = Window.partitionBy(col(keyCol), col("__t"))
      .orderBy(col("__tiebrk").desc)
    val r = right
      .filter(col(keyCol).isNotNull && rightTime.isNotNull)
      // the tie-break rides under a reserved name: it need not be (but
      // may be) one of the payload columns
      .select(col(keyCol) +: rightTime.as("__t") +:
        col(rightTieCol).as("__tiebrk") +: payload.map(col): _*)
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn", "__tiebrk")
      .withColumn("__tag", lit(0))
    val l = left.select(left.columns.map(col) :+ leftTime.as("__t") :+
      lit(1).as("__tag"): _*)
    val lPad = l.select(l.columns.map(col) ++
      payload.map(p => lit(null).cast(r.schema(p).dataType).as(p)): _*)
    val rPad = r.select(r.columns.map(col) ++
      left.columns.filterNot(_ == keyCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = lPad.unionByName(rPad)
    val order = Seq(col("__t"), col("__tag"))
    val back = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    // the struct leads with the right TIME so the row-local pick can
    // compare distances; null exactly on left rows
    val pl = when(col("__tag") === 0,
      struct(col("__t").as("__rt") +: payload.map(col): _*))
    val prevC = last(pl, ignoreNulls = true).over(back)
    val nextC = first(pl, ignoreNulls = true).over(fwd)
    // an equal-time right row sorts BEFORE the left row, so it is seen
    // by the backward frame only — distance 0 wins there regardless
    val pick = when(col("__pf").isNull, col("__pb"))
      .when(col("__pb").isNull, col("__pf"))
      .when(col("__t") - col("__pb").getField("__rt") <=
        col("__pf").getField("__rt") - col("__t"), col("__pb"))
      .otherwise(col("__pf"))
    unioned
      .withColumn("__pb", prevC).withColumn("__pf", nextC)
      .filter(col("__tag") === 1)
      .withColumn("__pick", pick)
      .select(left.columns.map(col) ++
        payload.map(p => col("__pick").getField(p).as(p)) :+
        (col("__pick").getField("__rt") - col("__t")).as("asof_dt"): _*)
  }
}
