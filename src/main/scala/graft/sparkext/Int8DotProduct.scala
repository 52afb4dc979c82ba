package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, LongType}

/** Native integer dot product over two `array<tinyint>` columns — the
  * scoring kernel for int8-quantized embeddings (`graft.functions
  * .Quantize`).
  *
  * A 64-dim int8 dot is bounded by 64 × 127² < 2²⁰, so the accumulation
  * is EXACT in a long — no float rounding at all — and the loop reads a
  * quarter (vs float32; an eighth vs float64) of the memory per pair,
  * which is the real win at 100 TB: all-pairs and top-k scoring over
  * quantized corpora are memory-bandwidth-bound. Cosine needs no
  * dequantization either: the per-vector scales cancel, so
  * cos(deq(a), deq(b)) = Σab / (√Σaa·√Σbb) computed purely from integer
  * dots (see `Similarity.quantizedTopK`).
  *
  * Same structure as [[ArrayDotProduct]]: codegen'd tight loop, null
  * elements read as 0, shorter array bounds the loop. */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def dataType: DataType = LongType

  override def prettyName: String = "int8_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getByte(i).toLong * y.getByte(i)
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
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ((long) $a.getByte($i)) * $b.getByte($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8DotProduct =
    copy(left = newLeft, right = newRight)
}

object Int8DotProduct {
  /** Column API: exact integer `dot(a, b)` over tinyint arrays. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(Int8DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
