package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a string column
  * as a `TypedImperativeAggregate`: DEPTH×WIDTH long counters, one
  * +1 per row per depth row, elementwise merge — the mergeable-sketch
  * shape (shuffles carry DEPTH·WIDTH longs per group, never rows; the
  * partial/merge split makes the build a single map-side pass at scale).
  *
  * The row hashes are the md5 hex substrings
  * `conv(substring(md5(tok), 1+8i, 8), 16, 10) % WIDTH` — chosen so the
  * POINT ESTIMATE can be read back from the flattened sketch array in
  * pure SQL/DataFrame code (`least(element_at(sk, i·WIDTH + h_i + 1)…)`),
  * keeping the probe inside codegen with no UDF. Estimates are
  * one-sided (est ≥ true count, LawsSpec) but not reproducible across
  * width changes → no oracle, like the other sketches (§2.D precedent).
  */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  import CountMinAgg.{DEPTH, WIDTH}

  // fail at analysis, not with an executor-side ClassCastException,
  // when a session-wide registration (GraftExtensions) is misused
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"countmin requires a STRING argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](DEPTH * WIDTH)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // hex substring [8i, 8i+8) of the md5 == digest bytes 4i..4i+3
      // big-endian unsigned — computed directly, no hex-string round trip
      val dg = CountMinAgg.md5(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < DEPTH) {
        val word = ((dg(4 * i) & 0xffL) << 24) | ((dg(4 * i + 1) & 0xffL) << 16) |
          ((dg(4 * i + 2) & 0xffL) << 8) | (dg(4 * i + 3) & 0xffL)
        buf(i * WIDTH + (word % WIDTH).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(DEPTH * WIDTH)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

object CountMinAgg {
  val DEPTH = 4
  val WIDTH = 256

  /** Same md5 the SQL surface sees, raw digest bytes; the MessageDigest
    * instance is reused per thread (per-row getInstance is the dominant
    * allocation in the update path). */
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private[functions] def md5(bytes: Array[Byte]): Array[Byte] = {
    val md = mdLocal.get()
    md.reset()
    md.digest(bytes)
  }

  /** Single builder shared by ensureRegistered and GraftExtensions so
    * the two registration paths cannot drift. */
  val builder: Seq[Expression] => Expression = exprs => CountMinAgg(exprs.head)

  /** Registers `countmin(tok)` returning the flattened DEPTH×WIDTH
    * counter array. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "countmin", builder, "built-in")
}
