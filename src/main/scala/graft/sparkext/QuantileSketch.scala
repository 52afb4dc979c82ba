package org.apache.spark.sql.graftext

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Greenwald-Khanna ε-approximate quantile summary (GK 2001), the
  * mergeable-summaries formulation (Agarwal et al. 2013): a sorted list
  * of (value, g, Δ) tuples where g increments rmin and Δ bounds the
  * rank uncertainty, compressed so the state stays O((1/ε)·log(εn))
  * regardless of input size.
  *
  * Shared core for the [[QuantileSketch]] / [[QuantileSketchState]] /
  * [[QuantileSketchMerge]] aggregates. ε = 0 is the EXACT degenerate
  * regime: nothing ever compresses, the summary is just the sorted
  * multiset, and every operation (including merge) is independent of
  * partitioning — the externally-oracle-able parameterization, with
  * state ∝ group size (use it when groups are modest). ε > 0 is the
  * bounded-state scale path; the compression threshold uses ε/3
  * internally so one partial→final merge level (Spark's aggregation
  * topology) keeps the end-to-end rank error within ε·n (spec-checked
  * empirically against adversarial partitionings). */
private[graftext] object GkCore {

  /** One summary tuple: rmin(i) = Σ g(1..i), rmax(i) = rmin(i) + Δ(i). */
  final case class T(v: Double, g: Long, d: Long)

  final class Buf(var tuples: ArrayBuffer[T], var n: Long,
                  val pending: ArrayBuffer[Double])

  def emptyBuf(): Buf = new Buf(ArrayBuffer.empty, 0L, ArrayBuffer.empty)

  /** Compression threshold at count n (internal ε/3 slack). */
  private def thresh(eps: Double, n: Long): Long =
    math.floor(2.0 * (eps / 3.0) * n).toLong

  /** Sort the pending buffer and merge it into the summary, then
    * compress. Classic GK batch insert: a value landing strictly inside
    * the summary takes Δ = threshold (its rank is uncertain by at most
    * the compression slack); values at either end are exact. */
  def flush(buf: Buf, eps: Double): Unit = {
    if (buf.pending.isEmpty) return
    val batch = buf.pending.sorted
    buf.pending.clear()
    val out = new ArrayBuffer[T](buf.tuples.length + batch.length)
    var i = 0
    var j = 0
    buf.n += batch.length
    val dMid = thresh(eps, buf.n)
    while (i < buf.tuples.length || j < batch.length) {
      if (j >= batch.length ||
          (i < buf.tuples.length && buf.tuples(i).v <= batch(j))) {
        out += buf.tuples(i)
        i += 1
      } else {
        val atEdge = out.isEmpty || i >= buf.tuples.length
        out += T(batch(j), 1L, if (atEdge) 0L else dMid)
        j += 1
      }
    }
    buf.tuples = out
    compress(buf, eps)
  }

  /** Merge adjacent tuples while the combined uncertainty stays under
    * the threshold — right-to-left so g accumulates into the survivor. */
  def compress(buf: Buf, eps: Double): Unit = {
    val t = buf.tuples
    if (t.length <= 2) return
    val lim = thresh(eps, buf.n)
    if (lim <= 0) return
    val out = new ArrayBuffer[T](t.length)
    out += t.last
    var i = t.length - 2
    while (i >= 1) { // never fold the first tuple: rmin(1) must stay 1
      val cur = t(i)
      val nxt = out.last
      if (cur.g + nxt.g + nxt.d <= lim)
        out(out.length - 1) = T(nxt.v, cur.g + nxt.g, nxt.d)
      else out += cur
      i -= 1
    }
    out += t.head
    buf.tuples = ArrayBuffer.from(out.reverse)
  }

  /** Mergeable-summaries combine: merge-sort the tuple lists; a tuple
    * keeps its own Δ plus the local spread (g + Δ − 1) of the OTHER
    * summary's next tuple — the rank uncertainty the other side
    * contributes at that position. ε = 0 degenerates to a plain sorted
    * merge (every term is 0). */
  def merge(a: Buf, b: Buf, eps: Double): Buf = {
    flush(a, eps); flush(b, eps)
    if (b.n == 0) return a
    if (a.n == 0) { a.tuples = b.tuples; a.n = b.n; return a }
    val out = new ArrayBuffer[T](a.tuples.length + b.tuples.length)
    var i = 0
    var j = 0
    def spread(list: ArrayBuffer[T], k: Int): Long =
      if (k < list.length) list(k).g + list(k).d - 1L else 0L
    while (i < a.tuples.length || j < b.tuples.length) {
      val takeA = j >= b.tuples.length ||
        (i < a.tuples.length && a.tuples(i).v <= b.tuples(j).v)
      if (takeA) {
        val t = a.tuples(i)
        out += T(t.v, t.g, t.d + spread(b.tuples, j))
        i += 1
      } else {
        val t = b.tuples(j)
        out += T(t.v, t.g, t.d + spread(a.tuples, i))
        j += 1
      }
    }
    a.tuples = out
    a.n += b.n
    compress(a, eps)
    a
  }

  /** Nearest-rank (lower) query: target rank r = 1 + ⌊q·(n−1)⌋, answer
    * the first tuple whose rmax covers r. Exact regime: the r-th
    * smallest value, the `quantile_disc` contract. */
  def query(buf: Buf, q: Double): Double = {
    val t = buf.tuples
    if (t.isEmpty) return Double.NaN
    val r = 1L + math.floor(q * (buf.n - 1)).toLong
    var rmin = 0L
    var i = 0
    while (i < t.length) {
      rmin += t(i).g
      if (rmin + t(i).d >= r) return t(i).v
      i += 1
    }
    t.last.v
  }

  val TupleSchema: StructType = StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("g", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))

  def toArrayData(buf: Buf): GenericArrayData =
    new GenericArrayData(buf.tuples.map(t => InternalRow(t.v, t.g, t.d)).toArray)

  def serialize(buf: Buf, eps: Double): Array[Byte] = {
    flush(buf, eps)
    val bb = ByteBuffer.allocate(12 + 24 * buf.tuples.length)
    bb.putLong(buf.n)
    bb.putInt(buf.tuples.length)
    buf.tuples.foreach { t =>
      bb.putDouble(t.v); bb.putLong(t.g); bb.putLong(t.d)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    val tuples = new ArrayBuffer[T](len)
    var i = 0
    while (i < len) {
      tuples += T(bb.getDouble, bb.getLong, bb.getLong)
      i += 1
    }
    val buf = new Buf(tuples, n, ArrayBuffer.empty)
    buf
  }

  /** Pending-buffer size before a sort-merge flush. */
  val BatchSize = 1024
}

/** Base plumbing shared by the three GK aggregates. */
sealed trait GkAggregate extends TypedImperativeAggregate[GkCore.Buf] {
  def eps: Double
  override def createAggregationBuffer(): GkCore.Buf = GkCore.emptyBuf()
  override def merge(a: GkCore.Buf, b: GkCore.Buf): GkCore.Buf =
    GkCore.merge(a, b, eps)
  override def serialize(buf: GkCore.Buf): Array[Byte] =
    GkCore.serialize(buf, eps)
  override def deserialize(bytes: Array[Byte]): GkCore.Buf =
    GkCore.deserialize(bytes)
  override def nullable: Boolean = false
  protected def updateDouble(buf: GkCore.Buf, v: Double): Unit = {
    buf.pending += v
    if (buf.pending.length >= GkCore.BatchSize) GkCore.flush(buf, eps)
  }
}

/** Quantiles of a double column at the given probabilities — one
  * bounded-state pass, emitted as array<double> parallel to `qs`. */
case class QuantileSketch(
    child: Expression,
    eps: Double,
    qs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends GkAggregate with ImplicitCastInputTypes {

  require(eps >= 0 && eps < 1, "quantile_sketch: eps must be in [0, 1)")
  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
    "quantile_sketch: quantiles must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_sketch"

  override def update(buf: GkCore.Buf, input: InternalRow): GkCore.Buf = {
    val v = child.eval(input)
    if (v != null) updateDouble(buf, v.asInstanceOf[Double])
    buf
  }

  override def eval(buf: GkCore.Buf): Any = {
    GkCore.flush(buf, eps)
    new GenericArrayData(qs.map(q => GkCore.query(buf, q)).toArray)
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketch = copy(child = c.head)
}

/** The summary itself as data — array<struct<v, g, d>> — so per-shard
  * sketches can be PERSISTED (parquet) and merged later with
  * [[QuantileSketchMerge]] without rescanning the shards: incremental
  * corpus statistics, the quantile analogue of the LSH signature
  * store. */
case class QuantileSketchState(
    child: Expression,
    eps: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends GkAggregate with ImplicitCastInputTypes {

  require(eps >= 0 && eps < 1, "quantile_sketch_state: eps must be in [0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType =
    ArrayType(GkCore.TupleSchema, containsNull = false)
  override def prettyName: String = "quantile_sketch_state"

  override def update(buf: GkCore.Buf, input: InternalRow): GkCore.Buf = {
    val v = child.eval(input)
    if (v != null) updateDouble(buf, v.asInstanceOf[Double])
    buf
  }

  override def eval(buf: GkCore.Buf): Any = {
    GkCore.flush(buf, eps)
    GkCore.toArrayData(buf)
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchState = copy(child = c.head)
}

/** Merge persisted summaries (rows of array<struct<v, g, d>>) back into
  * one and answer quantiles — the read side of the persisted layout. */
case class QuantileSketchMerge(
    child: Expression,
    eps: Double,
    qs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends GkAggregate {

  require(eps >= 0 && eps < 1, "quantile_sketch_merge: eps must be in [0, 1)")
  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
    "quantile_sketch_merge: quantiles must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_sketch_merge"

  override def update(buf: GkCore.Buf, input: InternalRow): GkCore.Buf = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val other = new ArrayBuffer[GkCore.T](a.numElements())
      var n = 0L
      var i = 0
      while (i < a.numElements()) {
        val row = a.getStruct(i, 3)
        val t = GkCore.T(row.getDouble(0), row.getLong(1), row.getLong(2))
        other += t
        n += t.g
        i += 1
      }
      GkCore.merge(buf,
        new GkCore.Buf(other, n, ArrayBuffer.empty), eps)
    }
    buf
  }

  override def eval(buf: GkCore.Buf): Any = {
    GkCore.flush(buf, eps)
    new GenericArrayData(qs.map(q => GkCore.query(buf, q)).toArray)
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchMerge = copy(child = c.head)
}

object QuantileSketch {
  def apply(value: Column, eps: Double, qs: Seq[Double]): Column =
    ExpressionUtils.column(
      QuantileSketch(ExpressionUtils.expression(value), eps, qs)
        .toAggregateExpression())
}

object QuantileSketchState {
  def apply(value: Column, eps: Double): Column =
    ExpressionUtils.column(
      QuantileSketchState(ExpressionUtils.expression(value), eps)
        .toAggregateExpression())
}

object QuantileSketchMerge {
  def apply(state: Column, eps: Double, qs: Seq[Double]): Column =
    ExpressionUtils.column(
      QuantileSketchMerge(ExpressionUtils.expression(state), eps, qs)
        .toAggregateExpression())
}
