package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE as-of join: a whole-operator Catalyst extension (logical node +
  * planner strategy + physical operator), the SURVEY §7.3 preference-order
  * step (c) — used here because the operator's semantics ("latest right
  * row at or before each left row, per key") are a genuine physical
  * algorithm: one streaming merge over two key-sorted children, O(1)
  * state, zero intermediate rows.
  *
  * Contract matches [[graft.operators.AsofOps.asofJoin]] verbatim
  * (inclusive <=, equal-(key, time) right rows resolve to the highest
  * tie-break, right rows with NULL key/time dropped, left rows always
  * survive with NULL payload when nothing precedes them) — the
  * equivalence is property-tested, and q157 replays q60's DuckDB native
  * ASOF oracle through this operator.
  *
  * Why a custom operator when the union+window composition already runs
  * at one shuffle: the window materializes every carried payload struct
  * through the sort buffer and emits right rows just to filter them back
  * out; the merge touches each input row exactly once and buffers ONE
  * candidate row per partition. Same exchange count, strictly less
  * memory and compute — and it demonstrates the full planner-extension
  * surface (`injectPlannerStrategy`).
  *
  * Scale shape: `ClusteredDistribution` on each side's key makes
  * EnsureRequirements co-partition the children exactly like a
  * sort-merge join (AQE-compatible, skew rules apply); required
  * orderings push the (key, time, tie) sorts below the operator where
  * they ride the exchange. The merge itself is per-partition sequential
  * with no allocation per row beyond the joined-row view.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightTie: Attribute, payload: Seq[Attribute])
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one-to-one translation of the logical node. Injected via
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`) and, for sessions
  * built without the extension, appended to `spark.experimental
  * .extraStrategies` by [[AsofJoinNative.asofJoin]].
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie, pl) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, pl) :: Nil
    case _ => Nil
  }
}

/** Filter pushdown THROUGH the custom node — the companion rule every
  * custom logical operator needs: Catalyst's PushDownPredicates only
  * understands built-in nodes, so without this rule a
  * `asofJoin(...).filter(left-side pred)` evaluates the predicate AFTER
  * the join and the parquet scan reads every row (pushdown silently
  * lost — the classic custom-operator performance trap).
  *
  * Left-only conjuncts push below unconditionally: the operator emits
  * each left row exactly once (left-outer semantics), so filtering left
  * input rows first is identity-preserving. Conjuncts touching payload
  * columns stay above (they see NULLs for unmatched rows, which a
  * right-side pre-filter could not reproduce); right-side pushdown is
  * NOT attempted at all — dropping right rows changes which candidate
  * precedes a left row, so only predicates provably limited to
  * (key, time, tie) monotone ranges would be sound, and none of our
  * callers shape that. Deterministic-only (the standard pushdown
  * hygiene: a rand() conjunct must not change its draw count).
  */
object AsofFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, asof: AsofJoinPlan) =>
      val leftOut = asof.left.outputSet
      // only the DETERMINISTIC PREFIX of the conjunct list may be
      // considered (Catalyst's own span(_.deterministic) idiom,
      // PushPredicateThroughJoin): partition()ing the whole list could
      // push a deterministic conjunct that sits AFTER a nondeterministic
      // one, changing how many rows the nondeterministic expression
      // evaluates over — with a seeded rand() the per-partition draw
      // sequence shifts and the surviving row set silently differs from
      // the unpushed plan (round-13 review).
      val (candidates, nonDeterministic) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (pushable, keepDet) =
        candidates.partition(_.references.subsetOf(leftOut))
      val keep = keepDet ++ nonDeterministic
      if (pushable.isEmpty) f
      else {
        val pushed = asof.copy(left =
          Filter(pushable.reduce(And), asof.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightTie: Attribute, payload: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // the tie-break rides the same sort: among equal (key, time) right rows
  // the LAST one consumed (highest tie) is the surviving candidate
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // separate projection instances per probe site: each reuses its own
      // buffer, so two keys/times under comparison never alias
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind the right side as NULLABLE: unmatched left rows substitute an
      // all-null right row, and a projection bound to the child's
      // non-nullable attributes would skip the null check and read 0s
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      new Iterator[InternalRow] {
        // lookahead right row: valid until the next rIter.next() overwrites
        // the child's reused buffer — consumed-or-copied before that
        private var rHead: InternalRow = _
        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            // NULL key/time right rows can never match: drop at the probe
            if (!rKeyProj(r).isNullAt(0) && !rTimeProj(r).isNullAt(0)) rHead = r
          }
        }
        advanceRight()
        // latest at-or-before candidate, COPIED (it outlives rIter buffers)
        private var cand: InternalRow = _
        private var candKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkRow = lKeyProj(l)
          val ltRow = lTimeProj(l)
          // a candidate held over from a previous (smaller) key is stale
          if (cand != null && keyOrd.compare(candKey, lkRow) != 0) {
            cand = null; candKey = null
          }
          var scanning = rHead != null
          while (scanning) {
            val cmpK = keyOrd.compare(rKeyProj(rHead), lkRow)
            if (cmpK < 0) {
              // right key exhausted below the current left key: skip
              advanceRight(); scanning = rHead != null
            } else if (cmpK == 0 && timeOrd.compare(rTimeProj(rHead), ltRow) <= 0) {
              cand = rHead.copy()
              candKey = rKeyProj(cand).copy()
              advanceRight(); scanning = rHead != null
            } else scanning = false // right is ahead of this left row
          }
          joined(l, if (cand != null) cand else nullRight)
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native operator. */
object AsofJoinNative {
  /** Same signature and contract as [[graft.operators.AsofOps.asofJoin]],
    * planned through [[AsofJoinExec]]. Column arguments are NAMES (the
    * operator binds attributes, not expressions — pre-project derived
    * times, as q157 does).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               rightTieCol: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} — " +
        "rename one side before joining")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = org.apache.spark.sql.GraftBridge.analyzed(left)
    val rPlan = org.apache.spark.sql.GraftBridge.analyzed(right)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column $name"))
    val (lKeyA, rKeyA) = (attr(lPlan, keyCol, "left"), attr(rPlan, keyCol, "right"))
    val (lTimeA, rTimeA) = (attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"))
    // the merge compares keys/times across sides with ONE ordering each:
    // both sides must already agree on the type (cast before joining)
    require(lKeyA.dataType == rKeyA.dataType,
      s"key types differ: ${lKeyA.dataType.sql} vs ${rKeyA.dataType.sql}")
    require(lTimeA.dataType == rTimeA.dataType,
      s"time types differ: ${lTimeA.dataType.sql} vs ${rTimeA.dataType.sql}")
    val node = AsofJoinPlan(lPlan, rPlan, lKeyA, rKeyA, lTimeA, rTimeA,
      attr(rPlan, rightTieCol, "right"), payload.map(attr(rPlan, _, "right")))
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
  }

  /** FORWARD native as-of ("next event at or after"): negate both time
    * columns in pre-projections, run the backward merge, drop the
    * negated columns. Equal-(key, time) right rows still resolve to the
    * HIGHEST `rightTieCol` (negation touches times only) — the same
    * contract as [[graft.operators.AsofOps.asofJoinForward]]. Integer
    * time columns only (same caveat as the composed operator).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTime: String, rightTime: String,
                      rightTieCol: String, payload: Seq[String]): DataFrame = {
    val reserved = Seq("__nlt", "__nrt")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"columns may not use the reserved names ${reserved.mkString(", ")}")
    asofJoin(
      left.withColumn("__nlt", -org.apache.spark.sql.functions.col(leftTime)),
      right.withColumn("__nrt", -org.apache.spark.sql.functions.col(rightTime)),
      keyCol, "__nlt", "__nrt", rightTieCol, payload)
      .drop("__nlt")
  }

  /** Idempotently append the strategy AND the pushdown rule for sessions
    * built without `spark.sql.extensions=graft.GraftExtensions`.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsofFilterPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofFilterPushdown
    }
  }
}
