package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: fused cosine similarity over two
  * `array<float>` columns (SURVEY.md §2.K's optional perf item — made
  * non-optional by Bench: the HOF zip_with/aggregate form costs ~100 s on
  * the sf0.1 all-pairs query; this codegen loop reads ArrayData floats
  * with no boxing and no intermediate arrays).
  *
  * Numerics contract: accumulates in double, index order, three
  * independent accumulators — bit-identical to the HOF formula
  * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)),0D,+)` over
  * `sqrt(Σx²)·sqrt(Σy²)` and therefore to the DuckDB oracle recipe
  * (SURVEY.md §7.3.3). VectorSpec asserts the equivalence exactly.
  *
  * Edge cases (deliberately NOT the HOF behavior, which null-propagates):
  * unequal lengths truncate to the shorter array; null elements read as
  * 0.0. Callers needing null-propagation should pre-filter — the fixture
  * embeddings are fixed-width non-null, so oracled queries are unaffected.
  */
case class CosineSimF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_f32 expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val builder: Seq[Expression] => Expression = exprs => CosineSimF32(exprs(0), exprs(1))

  /** Session-level registration so queries can say `expr("cosine_f32(a,b)")`. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32", builder, "built-in")
}

/** SparkSessionExtensions hook for users who load the library via
  * `spark.sql.extensions=graft.functions.GraftExtensions` — every graft
  * custom function arrives with the session, no per-query registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSimF32].getName, "cosine_f32"),
      GraftFunctions.builder))
    e.injectFunction((
      FunctionIdentifier("histogram10"),
      new ExpressionInfo(classOf[HistogramAgg].getName, "histogram10"),
      HistogramAgg.builder))
    e.injectFunction((
      FunctionIdentifier("countmin"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "countmin"),
      CountMinAgg.builder))
    e.injectFunction((
      FunctionIdentifier("topk5"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk5"),
      TopKAgg.builder))
    // whole-operator extension: plans graft.plans.RangeJoinPlan into the
    // per-key sliding-window sweep (RangeJoinExec)
    e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}
