package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Lane-wise unsigned MIN over four 16-bit lanes packed in one LONG —
  * the aggregation kernel of the lane-packed MinHash signature: 4
  * permutation minima ride in one aggregation buffer slot, so a k=96
  * signature needs 24 agg expressions instead of 96 (4x fewer buffer
  * slots and per-row buffer updates).
  *
  * PRECONDITION: every lane value is < 2^15 (15-bit payloads in 16-bit
  * lanes). The free top bit per lane is the borrow guard of the SWAR
  * (SIMD-within-a-register) min: with H = 0x8000 repeated,
  *   d    = (x | H) - y          per-lane (x + 0x8000) - y in [1, 0xFFFF],
  *                               so lane borrows can never cross
  *   m    = d & H                0x8000 exactly where x >= y
  *   full = (m - (m >>> 15)) | m 0xFFFF exactly where x >= y
  *   min  = (y & full) | (x & ~full)
  * All plain bitwise/arithmetic expressions, so this is a
  * DeclarativeAggregate: Catalyst codegens the update/merge straight into
  * the hash-aggregate loop (no virtual calls, map-side combinable).
  * Subtractions run in LEGACY eval mode — they are bit-twiddling on
  * deliberately wrapped two's-complement words, where ANSI overflow
  * checking would misfire on lane 3's sign-bit traffic.
  */
case class PackedLaneMin(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "packed_lane_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_lane_min needs a LONG of four 16-bit lanes, got ${child.dataType.sql}")

  private lazy val buf = AttributeReference("packedLaneMin", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  // every lane starts at 0x7FFF, the maximum 15-bit payload — the MIN
  // identity under the precondition
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0x7FFF7FFF7FFF7FFFL))

  private def H: Expression = Literal(0x8000800080008000L)

  private def sub(l: Expression, r: Expression): Expression =
    Subtract(l, r, EvalMode.LEGACY)

  private def swarMin(x: Expression, y: Expression): Expression = {
    val d = sub(BitwiseOr(x, H), y)
    val m = BitwiseAnd(d, H)
    val full = BitwiseOr(sub(m, ShiftRightUnsigned(m, Literal(15))), m)
    BitwiseOr(BitwiseAnd(y, full), BitwiseAnd(x, BitwiseNot(full)))
  }

  override lazy val updateExpressions: Seq[Expression] =
    Seq(If(IsNull(child), buf, swarMin(buf, child)))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(swarMin(buf.left, buf.right))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(newChild: Expression): PackedLaneMin =
    copy(child = newChild)
}
