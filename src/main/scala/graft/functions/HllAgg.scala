package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types._

/** HLL++ distinct-count with a COMPACT buffer (round-18 optimization).
  *
  * Spark's built-in `approx_count_distinct` is a DeclarativeAggregate
  * whose buffer is one ROW ATTRIBUTE per register word — at rsd 0.01
  * that is 1,639 long columns per group, which makes the generated
  * hash-aggregate update loop enormous (codegen over 1,640-field rows)
  * and ships 1,640-field rows through the partial/final exchange. This
  * aggregate runs the IDENTICAL sketch — the same public
  * [[HyperLogLogPlusPlusHelper]] (same xxhash64, same register update,
  * same bias-corrected estimator), so the estimate is bit-for-bit the
  * built-in's — but holds the register words as ONE binary buffer
  * (a TypedImperativeAggregate), so the row layout stays 2 fields and
  * the shuffle carries `numWords`·8 bytes per group. */
case class HllSketchAgg(
    child: Expression,
    relativeSD: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GenericInternalRow]
  with UnaryLike[Expression] {

  @transient private lazy val hll = new HyperLogLogPlusPlusHelper(relativeSD)

  override def createAggregationBuffer(): GenericInternalRow =
    new GenericInternalRow(Array.fill[Any](hll.numWords)(0L))

  override def update(buf: GenericInternalRow, input: InternalRow): GenericInternalRow = {
    val v = child.eval(input)
    if (v != null) hll.update(buf, 0, v, child.dataType)
    buf
  }

  override def merge(b1: GenericInternalRow, b2: GenericInternalRow): GenericInternalRow = {
    hll.merge(b1, b2, 0, 0)
    b1
  }

  override def eval(buf: GenericInternalRow): Any = hll.query(buf, 0)

  override def serialize(buf: GenericInternalRow): Array[Byte] = {
    val n = hll.numWords
    val bb = ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putLong(buf.getLong(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GenericInternalRow = {
    val bb = ByteBuffer.wrap(bytes)
    val n = hll.numWords
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new GenericInternalRow(arr)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllSketchAgg =
    copy(child = c)
}
