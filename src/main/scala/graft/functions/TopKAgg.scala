package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom `TypedImperativeAggregate`: bounded top-k per group. Keeps the
  * k largest (ord, payload) pairs (lexicographic, so ties on ord break
  * deterministically toward the larger payload) in a k-element buffer.
  *
  * This is the aggregation shape that beats the window-function top-k at
  * 100 TB: topk_per_group's `row_number() ≤ k` must shuffle EVERY row to
  * its group's partition before ranking, while this aggregate's
  * partial/merge split means each map task pre-reduces to k pairs per
  * group and the shuffle carries k×16 bytes per (task, group) — the same
  * reason TakeOrderedAndProject replaces global sorts. Output is exactly
  * reproducible (no sketch error), so unlike HLL/count-min it is oracled
  * row-for-row against the window formulation.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)],
                     e: (Double, Long)): ArrayBuffer[(Double, Long)] = {
    if (buf.length < k) buf += e
    else {
      var mi = 0
      var i = 1
      while (i < buf.length) { if (lt(buf(i), buf(mi))) mi = i; i += 1 }
      if (lt(buf(mi), e)) buf(mi) = e
    }
    buf
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val o = left.eval(input)
    val p = right.eval(input)
    if (o != null && p != null)
      insert(buf, (o.asInstanceOf[Double], p.asInstanceOf[Long]))
    else buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)],
                     b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.sortWith((a, b) => lt(b, a))
        .map(t => InternalRow(t._1, t._2)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (o, p) => bb.putDouble(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble(), bb.getLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType), StructField("payload", LongType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKAgg = copy(left = l, right = r)
}

object TopKAgg {
  /** Single builder shared by ensureRegistered and GraftExtensions so
    * the two registration paths cannot drift. Arity-checked here so a
    * wrong call site fails analysis with the expected signature instead
    * of an IndexOutOfBoundsException at plan time (and extra arguments
    * are rejected rather than silently dropped). */
  val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "topk5",
          "expectedNum" -> "2 (topk5(ord, payload))",
          "actualNum" -> exprs.length.toString,
          "docroot" -> ""))
    TopKAgg(Cast(exprs.head, DoubleType), Cast(exprs(1), LongType), 5)
  }

  /** Registers `topk5(ord, payload)`: top-5 pairs per group. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk5", builder, "built-in")
}
