package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values sketch state: the k smallest DISTINCT doubles seen.
  * Bounded (k entries), mergeable, deterministic — the aggregation state
  * of a distributed distinct-count estimator. Unlike HyperLogLog the
  * estimate is an exact function of the k order statistics, so an external
  * engine replaying the same hash reproduces it bit-for-bit.
  */
case class KmvMinK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]] {
  require(k >= 2, s"kmv_min_k needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_min_k needs DOUBLE input (a normalized hash), got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def add(buf: java.util.TreeSet[java.lang.Double], v: Double): Unit = {
    buf.add(v) // TreeSet dedupes — KMV is over distinct hashes
    if (buf.size() > k) { buf.remove(buf.last()); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Double],
                      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Double],
                     other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
    new GenericArrayData(out) // ascending (TreeSet order)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next().doubleValue())
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
