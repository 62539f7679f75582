package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static argmin kernels for [[KmeansArgminLong]]/[[KmeansArgminDouble]],
  * shared by interpreted eval and generated code. Semantics are pinned to
  * the declarative form they replace (r15's
  * `array_min(transform(cents, c -> struct(aggregate(zip_with(xs, cxs,
  * (a,b) -> (a-b)*(a-b)), 0, (acc,x) -> acc+x), c_id)))`):
  *  - d² accumulates STRICTLY left-to-right (long wrap / IEEE order
  *    identical to the fold),
  *  - the winner is the lexicographic minimum of (d², c_id) — d² compared
  *    as long / via java.lang.Double.compare (Spark's struct ordering for
  *    DoubleType), ties to the smaller centroid id.
  * Centroid dims always equal the vector dim at every call site (both
  * sides derive from the same corpus); enforced loudly rather than
  * replaying zip_with's null-padding, which would poison d² to null.
  */
object KmeansCodec {
  def argminLong(xs: ArrayData, cids: Array[Long],
                 cents: Array[Array[Long]]): InternalRow = {
    val n = xs.numElements()
    var bestD2 = 0L
    var bestId = 0L
    var k = 0
    while (k < cids.length) {
      val c = cents(k)
      require(c.length == n,
        s"centroid dim ${c.length} != vector dim $n (kmeans argmin)")
      var d2 = 0L
      var i = 0
      while (i < n) {
        val diff = xs.getLong(i) - c(i)
        d2 += diff * diff
        i += 1
      }
      if (k == 0 || d2 < bestD2 || (d2 == bestD2 && cids(k) < bestId)) {
        bestD2 = d2
        bestId = cids(k)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestD2, bestId))
  }

  def argminDouble(xs: ArrayData, cids: Array[Long],
                   cents: Array[Array[Double]]): InternalRow = {
    val n = xs.numElements()
    var bestD2 = 0.0
    var bestId = 0L
    var k = 0
    while (k < cids.length) {
      val c = cents(k)
      require(c.length == n,
        s"centroid dim ${c.length} != vector dim $n (kmeans argmin)")
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val diff = xs.getDouble(i) - c(i)
        d2 += diff * diff
        i += 1
      }
      val cmp = java.lang.Double.compare(d2, bestD2)
      if (k == 0 || cmp < 0 || (cmp == 0 && cids(k) < bestId)) {
        bestD2 = d2
        bestId = cids(k)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestD2, bestId))
  }
}

/** Nearest-centroid argmin over a fixed-point long vector against literal
  * centroids, as one codegen'd loop returning struct(d2, c_id) — the
  * k-means assignment hot path (q84/q250/q313/q320 and the IVF build).
  * The r15 HOF form (transform/aggregate/zip_with) is CodegenFallback:
  * at k=16 that is 16 interpreted lambda folds per row per Lloyd round.
  * Centroids are parameter-bounded (k×dim) and ride the expression as
  * plan literals, exactly like the HOF form's literal array.
  */
case class KmeansArgminLong(child: Expression,
                            cids: Seq[Long], cents: Seq[Seq[Long]])
    extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length,
    s"need matching non-empty centroid ids/vectors, got ${cids.length}/${cents.length}")
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmeans_argmin needs ARRAY<BIGINT> input, got ${other.sql}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("c_id", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    KmeansCodec.argminLong(input.asInstanceOf[ArrayData], cidArr, centArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    val centsRef = ctx.addReferenceObj("cents", centArr, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KmeansCodec.argminLong($c, $cidsRef, $centsRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[KmeansArgminLong]]'s double variant (the IVF build's raw-vector
  * distance): same left-to-right accumulation, same (d2, c_id) tie-break
  * via java.lang.Double.compare — Spark's struct ordering for doubles.
  */
case class KmeansArgminDouble(child: Expression,
                              cids: Seq[Long], cents: Seq[Seq[Double]])
    extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length,
    s"need matching non-empty centroid ids/vectors, got ${cids.length}/${cents.length}")
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmeans_argmin needs ARRAY<DOUBLE> input, got ${other.sql}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("c_id", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    KmeansCodec.argminDouble(input.asInstanceOf[ArrayData], cidArr, centArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KmeansCodec.argminDouble($c, $cidsRef, $centsRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
