package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused sequential BPE merge chain (round-18 optimization):
  * `bpe_merge_all(tk, array(array(x1,y1), ..., array(xk,yk)))` applies
  * every trained merge pair in order in ONE pass per row, replacing k
  * chained interpreted [[graft.operators.LlmText.bpeMergeExpr]] HOF
  * passes (each of which allocated a sequence array and evaluated two
  * closures per token, per merge).
  *
  * Semantics contract: each single-pair step is the greedy
  * left-to-right non-overlapping merge — exactly the pure-Scala
  * reference DedupProps proves equal to bpeMergeExpr's transform/filter
  * (x ≠ y) AND fold (x = y) branches on a dense 3-symbol alphabet; a
  * LawsSpec case additionally pins the full-chain equality on the real
  * corpus merges. Null token elements never match and PASS THROUGH —
  * note (round-19, ADVICE r18): this is the fold-branch (x = y)
  * semantics; bpeMergeExpr's transform/filter branch (x ≠ y) instead
  * DROPS pre-existing nulls via its filter(isNotNull). The two only
  * diverge on inputs containing null elements, which split() can never
  * produce — but this function is registered session-wide, so callers
  * feeding hand-built arrays with nulls get pass-through, not drop.
  * The merge-pair argument must
  * be foldable — pairs are trained driver-side (bpeFit) and enter as
  * Column literals, never through SQL text (the round-11 quoting rule).
  */
case class BpeMergeAll(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Sep = UTF8String.fromString("▁")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_all"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _))
        if right.foldable => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "bpe_merge_all expects (array<string> tokens, foldable array<array<string>> merge pairs), " +
        s"got (${left.dataType}, ${right.dataType}, foldable=${right.foldable})")
  }

  /** (x, y, x▁y) per merge, decoded once — the pair list is foldable. */
  @transient private lazy val pairs: Array[(UTF8String, UTF8String, UTF8String)] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      val p = arr.getArray(i)
      val x = p.getUTF8String(0)
      val y = p.getUTF8String(1)
      (x, y, UTF8String.concat(x, Sep, y))
    }
  }

  /** Greedy left-to-right scan per pair, pairs in training order. */
  def applyMerges(in: ArrayData): ArrayData = {
    var cur = new Array[UTF8String](in.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = in.getUTF8String(i); i += 1 }
    var pi = 0
    while (pi < pairs.length) {
      val (x, y, m) = pairs(pi)
      if (cur.length >= 2) {
        val out = new Array[UTF8String](cur.length)
        var o = 0
        var j = 0
        while (j < cur.length) {
          if (j < cur.length - 1 && cur(j) != null && cur(j + 1) != null &&
              x.equals(cur(j)) && y.equals(cur(j + 1))) {
            out(o) = m; o += 1; j += 2
          } else {
            out(o) = cur(j); o += 1; j += 1
          }
        }
        cur = if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      }
      pi += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(tk: Any, ms: Any): Any =
    applyMerges(tk.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMergeAll", this, classOf[BpeMergeAll].getName)
    nullSafeCodeGen(ctx, ev, (tk, _) => s"${ev.value} = $self.applyMerges($tk);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
