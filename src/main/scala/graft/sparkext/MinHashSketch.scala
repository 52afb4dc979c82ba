package org.apache.spark.sql.graftext

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate over per-row shingle-hash arrays.
  *
  * `minhash_sketch(shingles, k)` folds every shingle of every row of the
  * group into a k-wide minimum buffer — the classic sketch as a
  * `TypedImperativeAggregate`. Compared with the
  * explode + k × `min(xxhash64(i, shingle))` formulation it needs no
  * generator (no row multiplication before the partial aggregate) and its
  * shuffle payload is exactly one k-long buffer per group per partition.
  *
  * Per-hash values replicate Spark's `xxhash64(lit(i), shingle)` exactly
  * (seed 42, int then long through XXH64), so signatures are
  * interchangeable with the expression formulation — pinned by a spec.
  *
  * Merge is elementwise min, so the aggregate is commutative/associative
  * and safe under partial aggregation and AQE re-planning. Also usable to
  * sketch a WHOLE corpus partition per group at 100 TB: state is O(k)
  * regardless of group size.
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  // per-k seeds depend only on k: hash them once per task, not once per
  // shingle (halves the hot-loop hash work)
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) {
          val sh = a.getLong(i)
          var k = 0
          while (k < numHashes) {
            // == xxhash64(lit(k), shingle): int k then long, seed 42
            val h = XXH64.hashLong(sh, seeds(k))
            if (h < buffer(k)) buffer(k) = h
            k += 1
          }
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (b2(k) < b1(k)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}

object MinHashSketch {
  /** Column API: aggregate a group's shingle arrays to one signature. */
  def apply(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSketch(ExpressionUtils.expression(shingles), numHashes)
        .toAggregateExpression())
}
