package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** All `tables` hyperplane-LSH sign-buckets of a vector in one pass.
  *
  * Bucket t packs the sign bits of the vector against planes
  * `[t·numPlanes, (t+1)·numPlanes)`: bit p = (vec · plane ≥ 0). The
  * equivalent Column-tree formulation (tables × numPlanes literal-array
  * dot products per row) produces a huge expression that overflows
  * whole-stage codegen's method budget and falls back to interpreted
  * eval; this expression is one static call around a tight
  * multiply-accumulate loop — tables × numPlanes × dim flops per row.
  *
  * The plane matrix rides in the expression node (row-major
  * `planes(t·numPlanes + p)(d)`, flattened) and reaches generated code
  * via `addReferenceObj`, so it is shipped once per task, not per row. */
case class HyperplaneSignBuckets(child: Expression, planes: IndexedSeq[Double],
                                 numPlanes: Int, tables: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(numPlanes >= 1 && numPlanes <= 63, "numPlanes must be in [1, 63]")
  require(tables >= 1, "tables must be >= 1")
  require(planes.length % (numPlanes * tables) == 0,
    "planes length must be tables * numPlanes * dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_sign_buckets"

  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def nullSafeEval(arr: Any): Any =
    HyperplaneSignBuckets.compute(arr.asInstanceOf[ArrayData], planesArr,
      numPlanes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftext.HyperplaneSignBuckets" +
        s".compute($a, $planesRef, $numPlanes, $tables);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignBuckets = copy(child = newChild)
}

object HyperplaneSignBuckets {

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(vec: ArrayData, planes: Array[Double],
              numPlanes: Int, tables: Int): ArrayData = {
    val dim = planes.length / (numPlanes * tables)
    // a dim mismatch must fail LOUDLY: silently truncating the dot would
    // put the row in a quietly wrong bucket and the recall loss would be
    // undetectable downstream
    if (vec.numElements() != dim) throw new IllegalArgumentException(
      s"hyperplane_sign_buckets: vector has ${vec.numElements()} elements " +
        s"but the planes were built for dim=$dim")
    val n = dim
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dim
        var s = 0.0
        var d = 0
        while (d < n) {
          if (!vec.isNullAt(d)) s += vec.getDouble(d) * planes(base + d)
          d += 1
        }
        if (s >= 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array of `tables` sign-bucket ids for `vec`. */
  def apply(vec: Column, planes: Seq[Seq[Double]], numPlanes: Int,
            tables: Int): Column =
    ExpressionUtils.column(HyperplaneSignBuckets(
      ExpressionUtils.expression(vec),
      planes.flatten.toIndexedSeq, numPlanes, tables))

  /** Deterministic Gaussian plane matrix — the ONE source of truth shared
    * by the Column-API callers (`Similarity`) and the SQL registration
    * (`GraftExtensions`); a divergent copy would silently change every
    * bucket. */
  def gaussianPlanes(numPlanes: Int, dim: Int,
                     seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(numPlanes)(_ => Seq.fill(dim)(rnd.nextGaussian()))
  }
}
