package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row text-signal kernels (round-18 optimization) — the
  * codegen replacement for the per-char posexplode → partial-agg →
  * collect_list → HOF-fold pipelines behind the perceptual signatures
  * and the audio-frame energy ops. One generated-code call per ROW
  * replaces one generated ROW PER CHARACTER plus two exchanges per
  * consumer; the integer math is identical term by term, so every
  * output bit matches the pipeline formulation (pinned in VectorSpec's
  * equivalence sweep and by the unchanged DuckDB oracles).
  *
  * Character semantics contract (must equal `split(text, '')` +
  * `ascii(c)`): iterate UNICODE CODE POINTS in order. Spark's
  * `split("")` splits between code points (Java `Pattern` does not
  * split surrogate pairs) and `Ascii` is `codePointAt(0)` of the
  * 1-char slice — both reproduced here by decoding UTF-8 sequences
  * directly off the UTF8String bytes, no per-char allocation. */
object TextSig {
  /** Decoded code point at byte offset i (callers advance by
    * [[UTF8String.numBytesForFirstByte]]). Standard UTF-8; the fixture
    * corpus is ASCII-only but the decode is total so the expressions
    * stay correct on any well-formed input. */
  @inline private def codePointAt(s: UTF8String, i: Int, len: Int): Int =
    len match {
      case 1 => s.getByte(i) & 0xFF
      case 2 => ((s.getByte(i) & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F)
      case 3 => ((s.getByte(i) & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
                (s.getByte(i + 2) & 0x3F)
      case _ => ((s.getByte(i) & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
                ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
    }

  /** The 16-block whole-blob perceptual signature — bit b set iff
    * bsum_b·n > ts·blen_b with block = pos·16 div n, all exact int64
    * (the multimodal_phash rule, one fused pass). Blocks with no
    * characters (only possible when n < 16) contribute no bit, like
    * the grouped pipeline that never materialized their rows. */
  def phashSig16(s: UTF8String): Long = {
    val n = s.numChars().toLong
    if (n <= 0L) return 0L
    val bsum = new Array[Long](16)
    val blen = new Array[Long](16)
    var ts = 0L
    val nb = s.numBytes()
    var i = 0
    var k = 0L
    while (i < nb) {
      val l = UTF8String.numBytesForFirstByte(s.getByte(i))
      val cp = codePointAt(s, i, l).toLong
      val b = ((k * 16L) / n).toInt
      bsum(b) += cp; blen(b) += 1L; ts += cp
      i += l; k += 1L
    }
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (blen(b) > 0L && bsum(b) * n > ts * blen(b)) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Per-64-char-frame 32-block signatures (2 chars per block; bit =
    * bsum·32 > ts, the multimodal_scene_detect / frame-dedup rule).
    * Returns one int64 sig per complete frame — the ragged tail is
    * dropped exactly like the `pos < (n div 64)·64` explode filter. */
  def frameSigs32(s: UTF8String): ArrayData = {
    val n = s.numChars().toLong
    val nf = (n / 64L).toInt
    if (nf <= 0) return new GenericArrayData(Array.empty[Long])
    val sigs = new Array[Long](nf)
    val bsum = new Array[Long](32)
    val nb = s.numBytes()
    var i = 0
    var k = 0L
    var f = 0
    var ts = 0L
    while (i < nb && f < nf) {
      val l = UTF8String.numBytesForFirstByte(s.getByte(i))
      val cp = codePointAt(s, i, l).toLong
      val pif = (k % 64L).toInt
      bsum(pif / 2) += cp; ts += cp
      if (pif == 63) {
        var sig = 0L
        var b = 0
        while (b < 32) {
          if (bsum(b) * 32L > ts) sig |= (1L << b)
          bsum(b) = 0L
          b += 1
        }
        sigs(f) = sig
        f += 1; ts = 0L
      }
      i += l; k += 1L
    }
    new GenericArrayData(sigs)
  }

  /** Σ(cp − 128)² over the chunk's code points — the audio-frame
    * energy fold (multimodal_audio_rms / _vad), exact int64 in char
    * order like the HOF aggregate it replaces. */
  def ssq128(s: UTF8String): Long = {
    val nb = s.numBytes()
    var ssq = 0L
    var i = 0
    while (i < nb) {
      val l = UTF8String.numBytesForFirstByte(s.getByte(i))
      val d = codePointAt(s, i, l).toLong - 128L
      ssq += d * d
      i += l
    }
    ssq
  }
}

/** Fused 48-bit md5-prefix bucket hash (round-18 opt): the value of
  * `conv(substring(md5(s), 1, 12), 16, 10)` — the suite's shared
  * content-address primitive (gram base, DSIR/CLIP token buckets,
  * sampling membership) — computed straight off the digest bytes
  * (first 6 bytes big-endian), skipping the 32-char hex string and the
  * base-16 re-parse the expression chain allocated per call.
  * Bit-identical by construction; pinned in TextSigSpec. */
object Md5Prefix48 {
  private val mdTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hash48(s: UTF8String): Long = {
    val md = mdTL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
      ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }
}

case class Md5Prefix48(child: Expression) extends TextSigExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix48"
  override def nullSafeEval(input: Any): Any =
    Md5Prefix48.hash48(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix48.hash48($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused 32-bit sign pack (round-18 opt): bit i set iff
  * `embedding[off + i] >= 0` — the value of the unrolled 32-term
  * IF-sum `packSignBits(off)` as ONE loop instead of 32 branch
  * expressions per row (and a fraction of the generated-code size).
  * Bit-identical; pinned in TextSigSpec. */
case class SignPack32(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_pack32"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) if second.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sign_pack32 expects (array<float>, int literal offset), got $t")
    }
  override def nullSafeEval(a: Any, o: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[Int]
    var acc = 0L
    var i = 0
    while (i < 32) {
      if (x.getFloat(off + i) >= 0f) acc |= (1L << i)
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, o) => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  if ($a.getFloat($o + $i) >= 0f) $acc |= (1L << $i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(first = l, second = r)
}

private[functions] trait TextSigExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects a string column, got $t")
  }
}

/** `phash_sig16(text)`: the fused 16-block perceptual signature. */
case class PhashSig16(child: Expression) extends TextSigExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "phash_sig16"
  override def nullSafeEval(input: Any): Any =
    TextSig.phashSig16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSig.phashSig16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `frame_sigs32(text)`: per-64-char-frame 32-block signatures. */
case class FrameSigs32(child: Expression) extends TextSigExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "frame_sigs32"
  override def nullSafeEval(input: Any): Any =
    TextSig.frameSigs32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSig.frameSigs32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ssq128(text)`: exact Σ(cp−128)² audio-frame energy. */
case class Ssq128(child: Expression) extends TextSigExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "ssq128"
  override def nullSafeEval(input: Any): Any =
    TextSig.ssq128(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSig.ssq128($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
