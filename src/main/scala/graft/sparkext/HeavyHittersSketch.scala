package org.apache.spark.sql.graftext

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary over per-row token arrays — frequent
  * items with a bounded-memory, MERGEABLE state (Misra & Gries 1982;
  * merge rule from Agarwal et al. 2013, "Mergeable Summaries").
  *
  * Why not `explode + groupBy + count`: that shuffle carries one row per
  * DISTINCT token per map partition — unbounded in corpus vocabulary (at
  * web scale, billions of keys). This aggregate's partial state is at
  * most `capacity` counters per group per partition, so the exchange
  * carries a fixed-size summary regardless of vocabulary: the canonical
  * map-side-combine win for frequency estimation at 100 TB.
  *
  * Guarantees (n = total token count in the group):
  *   - every token with true frequency > n / (capacity + 1) is present;
  *   - each reported `count_lb` is a LOWER bound, and
  *     `count_lb ≤ true ≤ count_lb + max_err` where `max_err` is the
  *     summary's accumulated decrement total (≤ n / (capacity + 1)),
  *     emitted alongside every item;
  *   - with `capacity ≥` distinct tokens, no decrement ever fires
  *     anywhere (update or merge), so every count is EXACT, `max_err`
  *     is 0, and the result is independent of partitioning — the
  *     deterministic parameterization an external SQL oracle replicates
  *     with a plain `count(*)`.
  *
  * update: classic MG — known key +1; else insert if below capacity;
  * else decrement every counter by 1 (dropping zeros) and discard the
  * arriving token. The decrement pass costs O(capacity) but fires at
  * most once per `capacity` insertions, so updates stay amortized O(1).
  * merge: add counts pointwise; if over capacity, subtract the
  * (capacity+1)-th largest count from all and keep the positives —
  * decrement totals add, preserving the error bound.
  *
  * eval emits the summary sorted by (count desc, token asc) as
  * `array<struct<term, count_lb, max_err>>` — deterministic given the
  * summary, so `posexplode` downstream yields a stable ranking. */
case class HeavyHittersSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersSketch.MgBuffer]
  with ImplicitCastInputTypes {

  require(capacity >= 1, "heavy-hitters capacity must be >= 1")

  import HeavyHittersSketch.MgBuffer

  override def children: Seq[Expression] = Seq(child)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count_lb", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))))

  override def nullable: Boolean = false

  override def prettyName: String = "heavy_hitters_sketch"

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(new java.util.HashMap[String, Long](capacity * 2), 0L)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val m = buffer.counts
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) {
          val term = a.getUTF8String(i).toString
          val c = m.get(term)
          if (c != 0L || m.containsKey(term)) m.put(term, c + 1L)
          else if (m.size < capacity) m.put(term, 1L)
          else {
            // decrement-all: every stored counter and the arriving
            // token lose 1 together (the arriving token is discarded)
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
            }
            buffer.maxErr += 1L
          }
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    val m = b1.counts
    b2.counts.forEach((k, v) => m.merge(k, v, (a, b) => a + b))
    b1.maxErr += b2.maxErr
    if (m.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything;
      // exactly `capacity` positive counters can survive
      val vals = new java.util.ArrayList[Long](m.values())
      vals.sort(java.util.Collections.reverseOrder[Long]())
      val cut = vals.get(capacity)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
      b1.maxErr += cut
    }
    b1
  }

  override def eval(buffer: MgBuffer): Any = {
    val items = new Array[(String, Long)](buffer.counts.size)
    var i = 0
    buffer.counts.forEach((k, v) => { items(i) = (k, v); i += 1 })
    java.util.Arrays.sort(items, (x: (String, Long), y: (String, Long)) => {
      val byCount = java.lang.Long.compare(y._2, x._2)
      if (byCount != 0) byCount else x._1.compareTo(y._1)
    })
    new GenericArrayData(items.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c, buffer.maxErr)
    })
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    var bytes = 12 // maxErr + size
    val encoded = new java.util.ArrayList[(Array[Byte], Long)](buffer.counts.size)
    buffer.counts.forEach((k, v) => {
      val b = k.getBytes(StandardCharsets.UTF_8)
      encoded.add((b, v))
      bytes += 12 + b.length
    })
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(buffer.maxErr)
    bb.putInt(encoded.size())
    encoded.forEach { case (b, v) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val maxErr = bb.getLong
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](math.max(n, capacity) * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    new MgBuffer(m, maxErr)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersSketch =
    copy(child = newChildren.head)
}

object HeavyHittersSketch {

  /** Mutable MG state: bounded counter map + accumulated decrement total
    * (the additive error bound reported as `max_err`). */
  final class MgBuffer(val counts: java.util.HashMap[String, Long],
                       var maxErr: Long)

  def apply(tokens: Column, capacity: Int): Column =
    ExpressionUtils.column(
      HeavyHittersSketch(ExpressionUtils.expression(tokens), capacity)
        .toAggregateExpression())
}
