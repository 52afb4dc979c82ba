package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance (ADC) cosine for product-quantized vectors: the
  * query stays float, the corpus row is `m` small codebook indices, and
  * the approximate cosine is
  *
  *   cos ≈ (Σ_j q_j · c_{j,code_j}) / (|q| · sqrt(Σ_j |c_{j,code_j}|²))
  *
  * computed in one compiled pass. The codebook matrix rides INSIDE the
  * expression (flattened row-major, like [[NearestCentroid]]) — a
  * literal-array lookup tree would put m·ksub·dsub doubles in the plan,
  * the exact O(nlist·dim) blow-up the centroid kernels exist to avoid.
  * Per-pair cost is m·dsub multiplies (= dim), but the corpus side
  * reads only m SMALL integers per row — the 32–64× storage/bandwidth
  * reduction that makes PQ the standard billion-vector layout.
  *
  * Accumulation orders are pinned for external replication: each
  * subspace dot and squared norm folds left-to-right, and the m
  * per-subspace terms fold left-to-right (DuckDB:
  * `list_reduce([list_dot_product(...) FOR j IN range(m)], (a,b) -> a+b)`
  * over the same slices gives bit-identical doubles). */
case class PqAdcCosine(left: Expression, right: Expression,
                       codebooks: IndexedSeq[Double],
                       m: Int, ksub: Int, dsub: Int)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(m >= 1 && ksub >= 1 && dsub >= 1, "m, ksub, dsub must be >= 1")
  require(codebooks.length == m * ksub * dsub,
    s"codebook matrix must be m*ksub*dsub = ${m * ksub * dsub} doubles, " +
      s"got ${codebooks.length}")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc_cosine"

  @transient private lazy val flat: Array[Double] = codebooks.toArray

  // |c_{j,cid}|², folded left-to-right over dsub like the dots
  @transient private lazy val norms2: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val x = flat(jc * dsub + i)
        s += x * x
        i += 1
      }
      out(jc) = s
      jc += 1
    }
    out
  }

  override def nullSafeEval(vecAny: Any, codesAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    if (vec.numElements() != m * dsub) {
      throw new IllegalArgumentException(
        s"pq_adc_cosine: codebooks were built for dim ${m * dsub}, " +
          s"got a vector of ${vec.numElements()}")
    }
    if (codes.numElements() != m) {
      throw new IllegalArgumentException(
        s"pq_adc_cosine: expected $m codes, got ${codes.numElements()}")
    }
    val v = vec.toDoubleArray()
    var adot = 0.0
    var cn2 = 0.0
    var qdot = 0.0
    var i = 0
    while (i < v.length) { // full-vector |q|², left-to-right
      qdot += v(i) * v(i)
      i += 1
    }
    var j = 0
    while (j < m) {
      val cid = codes.getInt(j)
      if (cid < 0 || cid >= ksub) {
        throw new IllegalArgumentException(
          s"pq_adc_cosine: code $cid out of [0, $ksub) in subspace $j")
      }
      val off = (j * ksub + cid) * dsub
      val voff = j * dsub
      var d = 0.0
      var t = 0
      while (t < dsub) {
        d += v(voff + t) * flat(off + t)
        t += 1
      }
      adot += d
      cn2 += norms2(j * ksub + cid)
      j += 1
    }
    adot / (math.sqrt(qdot) * math.sqrt(cn2))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcCosine =
    copy(left = newLeft, right = newRight)
}

object PqAdcCosine {
  def apply(vec: Column, codes: Column,
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqAdcCosine(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(codes),
      codebooks.flatten.flatten.toIndexedSeq,
      codebooks.size, codebooks.head.size, codebooks.head.head.size))
}

/** [[PqAdcCosine]] with a per-row reconstruction SHIFT — the
  * residual-encoded IVF-PQ score (Jégou et al. 2011): the stored codes
  * quantize `v − µ_cell`, so the reconstruction is `µ_cell + r̂` and
  *
  *   cos ≈ (q · (s + r̂)) / (|q| · |s + r̂|),   s = the shift column
  *
  * with r̂_j = c_{j,code_j}. Unlike the raw form, the reconstructed
  * norm needs the shift/code cross terms, so both the dot and the norm
  * are folded over the reconstructed subspace values directly —
  * left-to-right per subspace, subspaces left-to-right, same pinning
  * discipline as [[PqAdcCosine]]. The shift rides in a COLUMN (each
  * probed cell's centroid joins on, one small array per candidate row)
  * while the codebooks ride inside the expression. */
case class PqAdcCosineShifted(first: Expression, second: Expression,
                              third: Expression,
                              codebooks: IndexedSeq[Double],
                              m: Int, ksub: Int, dsub: Int)
    extends TernaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  require(m >= 1 && ksub >= 1 && dsub >= 1, "m, ksub, dsub must be >= 1")
  require(codebooks.length == m * ksub * dsub,
    s"codebook matrix must be m*ksub*dsub = ${m * ksub * dsub} doubles, " +
      s"got ${codebooks.length}")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc_cosine_shifted"

  @transient private lazy val flat: Array[Double] = codebooks.toArray

  override def nullSafeEval(vecAny: Any, codesAny: Any,
                            shiftAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val shift = shiftAny.asInstanceOf[ArrayData]
    if (vec.numElements() != m * dsub || shift.numElements() != m * dsub) {
      throw new IllegalArgumentException(
        s"pq_adc_cosine_shifted: codebooks were built for dim ${m * dsub}, " +
          s"got vector ${vec.numElements()} / shift ${shift.numElements()}")
    }
    if (codes.numElements() != m) {
      throw new IllegalArgumentException(
        s"pq_adc_cosine_shifted: expected $m codes, got ${codes.numElements()}")
    }
    val v = vec.toDoubleArray()
    val s = shift.toDoubleArray()
    var qdot = 0.0
    var i = 0
    while (i < v.length) { // full-vector |q|², left-to-right
      qdot += v(i) * v(i)
      i += 1
    }
    var adot = 0.0
    var wn2 = 0.0
    var j = 0
    while (j < m) {
      val cid = codes.getInt(j)
      if (cid < 0 || cid >= ksub) {
        throw new IllegalArgumentException(
          s"pq_adc_cosine_shifted: code $cid out of [0, $ksub) in subspace $j")
      }
      val off = (j * ksub + cid) * dsub
      val voff = j * dsub
      var t = 0
      while (t < dsub) {
        val w = s(voff + t) + flat(off + t) // reconstructed element
        adot += v(voff + t) * w
        wn2 += w * w
        t += 1
      }
      j += 1
    }
    adot / (math.sqrt(qdot) * math.sqrt(wn2))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcCosineShifted =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcCosineShifted {
  def apply(vec: Column, codes: Column, shift: Column,
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqAdcCosineShifted(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(codes),
      ExpressionUtils.expression(shift),
      codebooks.flatten.flatten.toIndexedSeq,
      codebooks.size, codebooks.head.size, codebooks.head.head.size))
}
