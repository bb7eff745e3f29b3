package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Hamming distance over two strings — the verify kernel of
  * [[graft.llm.Dedup.hammingLink]] and any fixed-format fuzzy compare.
  *
  * The `aggregate` HOF formulation is CodegenFallback: every character
  * round-trips through interpreted lambda dispatch plus a per-row substring
  * allocation for each position. This expression compares UTF-8 bytes in
  * one fused loop inside whole-stage codegen — at a million candidate
  * pairs per second the difference is an allocation-bound scan vs a
  * CPU-bound one.
  *
  * Semantics: BYTE-wise distance, NULL when byte lengths differ. For
  * ASCII inputs (every fixed-format key this engine links on: digits,
  * codes, phones) byte = character and this matches the per-position
  * substring compare exactly. Non-ASCII strings are compared per UTF-8
  * byte — a multi-byte substitution can count as 2-4, and equal char
  * counts with different byte lengths return NULL (no aligned byte
  * Hamming exists); callers needing char-Hamming over non-ASCII text
  * should normalize or transliterate keys first, as real record-linkage
  * pipelines do before blocking.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming requires string inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    if (x.length != y.length) null
    else {
      var d = 0
      var i = 0
      while (i < x.length) {
        if (x(i) != y(i)) d += 1
        i += 1
      }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |if ($xb.length != $yb.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $xb.length; $i++) {
         |    if ($xb[$i] != $yb[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming"
}
