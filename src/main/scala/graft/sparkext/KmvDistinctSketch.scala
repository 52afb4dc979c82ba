package org.apache.spark.sql.graftext

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch over per-row token arrays
  * (Bar-Yossef et al. 2002; mergeable per Agarwal et al. 2013).
  *
  * Why not `count(distinct token)`: exact distinct needs a shuffle that
  * carries every distinct key — unbounded in corpus vocabulary. Why not
  * Spark's `approx_count_distinct`: its HLL++ register layout is an
  * internal implementation detail no external engine replicates, so its
  * answers can't be oracle-checked. KMV's state is just "the k smallest
  * distinct hash values" — a set-level property that is independent of
  * partitioning and row order BY CONSTRUCTION (not merely in a degenerate
  * exact regime), so the estimate is bit-replicable by any engine that
  * can hash the same way. The exchange carries at most k longs per group
  * regardless of vocabulary: bounded-state distinct counting at 100 TB.
  *
  * Hash: first 48 bits of MD5 of the UTF-8 token — the repo's standard
  * externally-replicable hash (DuckDB: `('0x' || substr(md5(t),1,12))
  * ::BIGINT`), uniform on [0, 2^48).
  *
  * Estimate (emitted as `struct<estimate double, kept int, exact bool>`):
  *   - buffer holds < k distinct hashes → every distinct hash is present,
  *     estimate = kept exactly, `exact` = true;
  *   - else the classic KMV estimator `(k-1) * 2^48 / h_(k)` with h_(k)
  *     the k-th smallest hash. Both factors are exact BIGINTs rounded to
  *     double once, then one IEEE division — the same two operations an
  *     external SQL engine performs, so the double is bit-identical.
  *
  * Relative error is ~1/sqrt(k-2); k=1024 gives ~3%. Distinct-hash
  * collisions (2^-48-scale) bias both the sketch and any same-hash
  * oracle identically. */
case class KmvDistinctSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes {

  // upper bound: (k-1) << 48 must stay exact in a Long (and a larger k
  // buys nothing — error is already ~1.8% at the cap)
  require(k >= 2 && k <= 32768,
    "kmv_distinct_sketch: k must be in [2, 32768]")

  override def children: Seq[Expression] = Seq(child)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("kept", IntegerType, nullable = false),
    StructField("exact", BooleanType, nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "kmv_distinct_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(s: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (s.size < k) { s.add(h); () }
    else if (h < s.last()) {
      // strict <: equal to the current max means h is either already
      // present (distinct set) or displaced by an identical value — no-op
      if (s.add(h)) { s.pollLast(); () }
    }
  }

  override def update(s: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i))
          add(s, Md548.hashBytes(a.getUTF8String(i).getBytes))
        i += 1
      }
    }
    s
  }

  override def merge(s1: java.util.TreeSet[java.lang.Long],
                     s2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = s2.iterator()
    while (it.hasNext) add(s1, it.next())
    s1
  }

  override def eval(s: java.util.TreeSet[java.lang.Long]): Any = {
    val kept = s.size
    if (kept < k) InternalRow(kept.toDouble, kept, true)
    else {
      // ((k-1) * 2^48) is exact in a Long for any sane k (< 2^15); one
      // rounding per operand then one IEEE division — replicable in SQL
      val est = ((k - 1).toLong << 48).toDouble / s.last().toDouble
      InternalRow(est, kept, false)
    }
  }

  override def serialize(s: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * s.size)
    bb.putInt(s.size)
    val it = s.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinctSketch =
    copy(child = newChildren.head)
}

object KmvDistinctSketch {

  def apply(tokens: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvDistinctSketch(ExpressionUtils.expression(tokens), k)
        .toAggregateExpression())
}
