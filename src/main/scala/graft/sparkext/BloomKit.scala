package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column wrappers over Spark's own bloom-filter expressions (the pair
  * the optimizer's `InjectRuntimeFilter` uses): a build-side aggregate
  * producing a serialized filter, and a stream-side `might_contain`
  * predicate over the same XxHash64 hashing. Exposed here because the
  * expressions are `private[spark]`-adjacent internals with no public
  * `functions._` surface, and [[graft.operators.Joins.bloomReducedJoin]]
  * needs them explicitly: the automatic runtime filter only fires
  * within narrow size/plan thresholds, while an explicit semi-join
  * reduction must be guaranteed. */
object BloomKit {

  /** Aggregate a key column into a serialized bloom filter sized for
    * `expectedItems` at false-positive rate `fpp`. */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, "expectedItems must be > 0")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))),
      Literal(expectedItems), Literal(bits)).toAggregateExpression())
  }

  /** Membership probe against a collected filter: false only when the
    * key is definitely absent (no false negatives, so filtering with it
    * before an inner/semi join is exact). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
