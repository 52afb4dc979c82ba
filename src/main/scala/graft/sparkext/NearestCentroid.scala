package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid (k-means cell) assignment as one compiled argmax —
  * the assignment kernel for the IVF and SemDeDup paths.
  *
  * The Column-tree equivalent (`greatest()` over `nlist` structs, each
  * holding a `dim`-literal dot product) grows the plan O(nlist · dim):
  * at nlist ≈ 500 the task binary passes 1.6 MB, codegen gives up, and
  * assignment dominated a 33k-vector SemDeDup probe. This expression
  * carries the centroid matrix once (flattened row-major) and loops in
  * compiled Scala.
  *
  * Semantics are IDENTICAL to the struct form (oracle-pinned by
  * q_dedup_semantic / the IVF gates): score = v·c − |c|²/2 with the
  * same left-to-right double accumulation, ties break toward the
  * LARGER cell index (iterate ascending, replace on >=), mirroring
  * `greatest()`-struct lexicographic max. */
case class NearestCentroid(child: Expression, centroids: IndexedSeq[Double],
                           nlist: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(nlist >= 1 && dim >= 1, "nlist and dim must be >= 1")
  require(centroids.length == nlist * dim,
    s"centroid matrix must be nlist*dim = ${nlist * dim} doubles, " +
      s"got ${centroids.length}")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  // |c|²/2 per cell, accumulated left-to-right like the literal form
  // (v.map(x => x*x).sum / 2) so scores are bit-identical to it
  @transient private lazy val halfNorms: Array[Double] = {
    val out = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val x = centroids(c * dim + i)
        s += x * x
        i += 1
      }
      out(c) = s / 2
      c += 1
    }
    out
  }

  @transient private lazy val flat: Array[Double] = centroids.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"nearest_centroid: centroids were built for dim $dim, " +
          s"got a vector of ${v.numElements()}")
    }
    val vec = v.toDoubleArray()
    var best = Double.NegativeInfinity
    var bestCell = 0
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        dot += vec(i) * flat(off + i)
        i += 1
      }
      val score = dot - halfNorms(c)
      // Double.compare orders NaN LARGEST — exactly Spark's double
      // ordering, so a NaN score wins like it would under greatest();
      // >= 0 keeps ties going to the larger cell
      if (java.lang.Double.compare(score, best) >= 0) {
        best = score
        bestCell = c
      }
      c += 1
    }
    bestCell
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(vec),
      centroids.flatten.toIndexedSeq,
      centroids.size, centroids.head.size))
}

/** The `nprobe` nearest cells, ordered (score desc, cell desc) — the
  * probe-side companion of [[NearestCentroid]]. The previous Column
  * form (explode over nlist literal structs + a rank window) carried
  * the same O(nlist·dim) plan-size flaw AND a per-query-side shuffle
  * for the window; this emits the ordered prefix directly, so probing
  * is a narrow projection. Ordering uses `Double.compare` (NaN
  * largest) to match Spark's window sort exactly. */
case class NearestCentroidsTopK(child: Expression,
                                centroids: IndexedSeq[Double],
                                nlist: Int, dim: Int, nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(nlist >= 1 && dim >= 1, "nlist and dim must be >= 1")
  require(nprobe >= 1, "nprobe must be >= 1")
  require(centroids.length == nlist * dim,
    s"centroid matrix must be nlist*dim = ${nlist * dim} doubles, " +
      s"got ${centroids.length}")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nearest_centroids_topk"

  @transient private lazy val halfNorms: Array[Double] = {
    val out = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val x = centroids(c * dim + i)
        s += x * x
        i += 1
      }
      out(c) = s / 2
      c += 1
    }
    out
  }

  @transient private lazy val flat: Array[Double] = centroids.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"nearest_centroids_topk: centroids were built for dim $dim, " +
          s"got a vector of ${v.numElements()}")
    }
    val vec = v.toDoubleArray()
    val scores = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        dot += vec(i) * flat(off + i)
        i += 1
      }
      scores(c) = dot - halfNorms(c)
      c += 1
    }
    val order = Array.tabulate(nlist)(identity)
    val sorted = order.sortWith { (a, b) =>
      val cmp = java.lang.Double.compare(scores(a), scores(b))
      if (cmp != 0) cmp > 0 else a > b // score desc, then cell desc
    }
    new GenericArrayData(
      sorted.take(math.min(nprobe, nlist)).map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsTopK =
    copy(child = newChild)
}

object NearestCentroidsTopK {
  def apply(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ExpressionUtils.column(NearestCentroidsTopK(
      ExpressionUtils.expression(vec),
      centroids.flatten.toIndexedSeq,
      centroids.size, centroids.head.size, nprobe))
}
