package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom `TypedImperativeAggregate`: fixed-width histogram of a double
  * column over [lo, hi) with `bins` buckets, out-of-range values clamped
  * to the edge buckets. This is the buffer-shaped aggregation pattern
  * real sketches (HLL, t-digest, count-min) use — a mutable Array[Long]
  * buffer, elementwise merge, explicit serialize — but with exactly
  * reproducible output, so unlike those sketches it can be oracled
  * bucket-for-bucket in SQL (SURVEY.md §2.K custom-aggregation surface;
  * the partial/merge split means shuffles carry bins longs per group,
  * never rows).
  */
case class HistogramAgg(
    child: Expression,
    bins: Int,
    lo: Double,
    hi: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val width = (hi - lo) / bins

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val b = math.min(bins - 1, math.max(0, math.floor((x - lo) / width).toInt))
      buf(b) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bins)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bins)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): HistogramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HistogramAgg =
    copy(child = c)
}

object HistogramAgg {
  /** Single builder shared by ensureRegistered and GraftExtensions so
    * the two registration paths cannot drift. The input is cast to
    * double here (AbstractDataType/ImplicitCastInputTypes are
    * private[sql], so the cast replaces the implicit coercion). */
  val builder: Seq[Expression] => Expression =
    exprs => HistogramAgg(Cast(exprs.head, DoubleType), 10, 0.0, 500.0)

  /** Registers `histogram10(x)`: 10 bins over [0, 500). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "histogram10", builder, "built-in")
}
