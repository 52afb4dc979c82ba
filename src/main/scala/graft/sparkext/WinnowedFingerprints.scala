package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting") in one
  * native pass: hash every word `k`-gram positionally, slide a window of
  * `w` consecutive gram hashes, select each window's MINIMUM, and return
  * the sorted distinct selected hashes. The winnowing guarantee: two
  * documents sharing any run of `w + k - 1` words share at least one
  * fingerprint, while the fingerprint density is ~2/(w+1) of the grams —
  * the standard robust near-dup/plagiarism sketch, far smaller than the
  * full shingle set.
  *
  * The gram hash is the first 48 bits of md5 over the space-joined gram
  * text — chosen deliberately so an external engine can replicate the
  * fingerprints exactly (DuckDB: `('0x' || substr(md5(gram), 1, 12))
  * ::BIGINT`); the fingerprint SET only depends on window-minimum
  * VALUES, never on tie positions, so both engines agree without
  * replicating tie-breaking. A document with fewer than `k` words has no
  * grams and an empty fingerprint set; with fewer than `w` grams the
  * whole sequence forms one window.
  *
  * CodegenFallback like the other graftext sketches: all per-document
  * work (tokenize, md5, monotonic-deque sliding minimum — O(m) total)
  * runs in compiled Scala behind one virtual call. */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(k >= 1, "gram width k must be >= 1")
  require(w >= 1, "window width w must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnowed_fingerprints"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val m = words.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val digest = Md548.digest()
      var j = 0
      while (j < k) {
        if (j > 0) digest.update(' '.toByte)
        digest.update(words(i + j).getBytes)
        j += 1
      }
      // first 12 hex chars = first 6 bytes, as an unsigned 48-bit long
      h(i) = Md548.fold48(digest.digest())
      i += 1
    }
    val ww = math.min(w, m)
    // monotonic deque of indices: amortized O(1) per slide
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = Array.newBuilder[Long]
    i = 0
    while (i < m) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - ww) head += 1
      if (i >= ww - 1 && seen.add(h(deque(head)))) out += h(deque(head))
      i += 1
    }
    val arr = out.result()
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

object WinnowedFingerprints {
  def apply(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowedFingerprints(ExpressionUtils.expression(text), k, w))
}
