package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Scalar (per-row) MinHash signature over a shingle-hash array.
  *
  * `minhash_signature(shingles, k)` is the projection form of
  * [[MinHashSketch]]: same seeds, same per-hash values
  * (`xxhash64(lit(i), shingle)`, seed 42), so a signature computed here is
  * interchangeable with the aggregate's — pinned by a spec. The scalar
  * form exists for pipelines that cannot aggregate, e.g. Structured
  * Streaming ahead of a stateful operator (an agg before
  * `flatMapGroupsWithState` is not allowed in append mode), or corpus
  * scoring where one row already carries the whole document.
  *
  * Codegen emits a single static call, so the k×|shingles| hash loop
  * runs as compiled JVM code inside the surrounding whole-stage span. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(arr: Any): Any =
    MinHashSignature.compute(arr.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftext.MinHashSignature" +
        s".compute($a, $numHashes);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {

  // per-k seeds depend only on k — cache per signature width
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes,
      k => Array.tabulate(k)(i => XXH64.hashInt(i, 42L)))

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(a: ArrayData, numHashes: Int): ArrayData = {
    val s = seeds(numHashes)
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val sh = a.getLong(i)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashLong(sh, s(k))
          if (h < buf(k)) buf(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  /** Column API: per-row signature of a shingle array. */
  def apply(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingles), numHashes))
}
