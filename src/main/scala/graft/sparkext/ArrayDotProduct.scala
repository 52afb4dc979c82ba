/* Hosted under org.apache.spark.sql.* to reach the private[sql] helpers
 * (ExpressionUtils, AbstractDataType) needed to expose a custom Catalyst
 * expression as a Column — the standard extension-point idiom. */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * A Catalyst `BinaryExpression` with `doGenCode`: the inner loop compiles
  * into the surrounding whole-stage-codegen'd Java (a tight primitive
  * `double` loop over `ArrayData`), where the equivalent
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` higher-order-function tree
  * allocates an intermediate array and interprets two lambdas per row.
  * On the all-pairs similarity workloads this is the per-pair hot path.
  *
  * Float inputs are handled by `ImplicitCastInputTypes` (array cast to
  * double). Accumulation is left-to-right, matching both the HOF
  * formulation and external oracles. Null elements are treated as 0.
  * Lengths are not required to match; the shorter array bounds the loop.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column API: `dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
