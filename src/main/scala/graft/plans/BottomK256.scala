package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATE building a bottom-k (KMV / "theta") sketch
  * (t6): the k = 256 SMALLEST DISTINCT int64 hash values of the group —
  * the deterministic mergeable summary behind KMV distinct-count
  * estimation and, unlike HLL (t1/t3), one that supports SET ALGEBRA:
  * two groups' sketches merge by union-and-trim, and the intersection
  * survives inside the merged bottom-k, so union/intersection/Jaccard
  * estimates all read off sketch rows without touching raw data again.
  *
  * Determinism: "k smallest distinct values" is a pure set function of
  * the input — partial aggregation, shuffle merge order, and group
  * splits cannot change it (merge(a, b) = bottomK(a ∪ b) and bottomK
  * is idempotent/commutative/associative on sets), so the result is
  * hash-checkable against an ORDER BY/LIMIT oracle replay, not just
  * tolerance-checked.
  *
  * Buffer: a java.util.TreeSet capped at k — O(k) state per group
  * regardless of group size (the 100 TB shape: a source with 10¹⁰ docs
  * still ships 2 KB of partial state per map task), O(log k) per row
  * with an early-out once the buffer is full and the value exceeds its
  * max. Output: the sorted ascending LongArray (size ≤ k). */
case class BottomK256(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  private val K = 256

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k256 expects BIGINT, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < K) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      row: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(row)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k256"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK256 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK256 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK256 =
    copy(child = newChild)
}

object BottomK256 {
  private[plans] val ident =
    org.apache.spark.sql.catalyst.FunctionIdentifier("bottom_k256")
  private[plans] val info =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BottomK256].getName, "bottom_k256")
  private[plans] def builder: Seq[Expression] => Expression = build

  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"bottom_k256 expects 1 argument, got ${args.length}")
    BottomK256(args.head)
  }

  /** Register `bottom_k256` in a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("bottom_k256", build, "built-in")
}
