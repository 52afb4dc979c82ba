package org.apache.spark.sql.graftext

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** One-pass 64-bit SimHash aggregate over per-row shingle-hash arrays.
  *
  * Buffer = 64 per-bit ±1 balances; each shingle hash (re-mixed with
  * XXH64 so signature bits are independent of the shingle id used as a
  * join key) votes on every bit; eval packs the balance signs into one
  * long, MSB first. Bit values replicate the previous explode +
  * 64 × sum(when(...)) formulation exactly (same re-mix hash, same
  * 63-i bit order, same `> 0` sign rule), so SimHash signatures — and
  * therefore the pigeonhole chunk join's candidates — are unchanged.
  *
  * Merge adds balances, so the aggregate is safe under partial
  * aggregation; state is O(64) per group regardless of document size.
  */
case class SimHashSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "simhash_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) {
          val h = XXH64.hashLong(a.getLong(i), 42L) // == xxhash64(shingle)
          var bit = 0
          while (bit < 64) {
            if (((h >>> (63 - bit)) & 1L) == 1L) buffer(bit) += 1
            else buffer(bit) -= 1
            bit += 1
          }
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var acc = 0L
    var i = 0
    while (i < 64) {
      acc = (acc << 1) + (if (buffer(i) > 0) 1L else 0L)
      i += 1
    }
    acc
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSketch =
    copy(child = newChildren.head)
}

object SimHashSketch {
  def apply(shingles: Column): Column =
    ExpressionUtils.column(
      SimHashSketch(ExpressionUtils.expression(shingles))
        .toAggregateExpression())
}
