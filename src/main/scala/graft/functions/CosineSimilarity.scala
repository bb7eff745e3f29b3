package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen cosine similarity over two numeric arrays (SURVEY §7.6).
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — every element round-trips through interpreted lambda
  * dispatch. This expression generates one fused Java loop (dot product and
  * both norms in a single pass), keeping Q82/Q83/Q89-class scans inside
  * whole-stage codegen; at 10⁸ vectors that's the difference between a
  * CPU-bound scan and an allocation-bound one.
  *
  * Accumulation is a sequential left fold in double — bit-identical to the
  * HOF formulation and to DuckDB's `list_dot_product`, so t2 hashes are
  * unchanged by the swap.
  *
  * Contract: both arrays non-null, same length, elements non-null
  * (embedding columns); float elements are widened to double per element.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lt = elemType(left); val rt = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // all locals via freshName: with non-nullable inputs nullSafeExec adds
      // no brace scope, so two cosine_sim instances in one codegen scope
      // would otherwise redeclare the same Java locals and fail to compile
      // (silently falling back to interpreted eval)
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val lGet = CodeGenerator.getValue(a, elemType(left), i)
      val rGet = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $lGet;
         |  double $yv = (double) $rGet;
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
