package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Range (interval) join: all (left, right) pairs with the same key and
  * `rightTs` within `[leftTs − lowerBound, leftTs + upperBound]` — the
  * event-correlation join Spark SQL only plans as a key-equi join plus a
  * residual filter, which degenerates to a per-key cross product on hot
  * keys.
  *
  * Scale path: both sides are bucketed into fixed time bins of width
  * `lowerBound + upperBound` (the window span). A right row lands in
  * exactly ONE bin; each left row's window overlaps at most TWO
  * consecutive bins, so the left side fans out ≤2× and the join becomes
  * an equi-join on `(key, bin)` with the exact range predicate as a
  * post-filter. Each qualifying pair meets in exactly one bin (the right
  * row's), so no dedup stage is needed. Cost: one shuffle of
  * |R| + 2|L| rows keyed by (key, bin) — hot TIME ranges spread across
  * bins instead of piling onto one key, which the plain key-equi plan
  * cannot do. Bin width follows the window span, so selectivity of the
  * residual filter is ≥ ~50% regardless of parameters.
  */
object RangeJoin {

  /** @param lowerSeconds how far BACK from the left timestamp the window
    *                     reaches (≥ 0)
    * @param upperSeconds how far FORWARD it reaches (≥ 0; both 0 is a
    *                     plain ts-equality join — rejected)
    * @param leftCols     columns of `left` to carry (besides key/ts)
    * @param rightCols    columns of `right` to attach (inner-join
    *                     semantics: lefts with no match drop out) */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, lowerSeconds: Long, upperSeconds: Long,
                leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    require(lowerSeconds >= 0 && upperSeconds >= 0,
      "bounds must be non-negative")
    val spanMicros = (lowerSeconds + upperSeconds) * 1000000L
    require(spanMicros > 0, "window span must be positive")
    // the post-join select resolves payload columns by bare name; any
    // overlap — across sides, with key/ts, or with the internal working
    // columns — would silently shadow or throw AMBIGUOUS_REFERENCE
    // downstream, so fail up front with a clear message
    val reserved = Set(keyCol, tsCol, "__key", "__bin", "__lts", "__rts")
    val clash = (leftCols.toSet & rightCols.toSet) ++
      ((leftCols.toSet ++ rightCols.toSet) & reserved)
    require(clash.isEmpty,
      s"left/right payload column names must be disjoint and distinct " +
        s"from key/ts/internal names; clashing: ${clash.mkString(", ")} " +
        "— rename upstream (e.g. withColumnRenamed)")

    // floor division in EXACT arithmetic: plain floor(micros / span) would
    // divide as double, and a quotient within an ulp of an integer can
    // floor to the wrong bin; (m - pmod(m, span)) is an exact multiple of
    // span (≤2^53), so its double division is exact, and pmod keeps floor
    // semantics for pre-1970 timestamps
    def binOf(ts: Column): Column = {
      val m = unix_micros(ts)
      ((m - pmod(m, lit(spanMicros))) / lit(spanMicros)).cast("long")
    }

    val l = left.select(
      (Seq(col(keyCol).as("__key"), col(tsCol).as("__lts")) ++
        leftCols.map(col)): _*)
      // the window [lts − lower, lts + upper] overlaps exactly the bins of
      // its two endpoints (window span == bin width), distinct when equal
      .withColumn("__bin", explode(array_distinct(array(
        binOf(col("__lts") - expr(s"INTERVAL $lowerSeconds SECONDS")),
        binOf(col("__lts") + expr(s"INTERVAL $upperSeconds SECONDS"))))))
    val r = right.select(
      (Seq(col(keyCol).as("__key"), col(tsCol).as("__rts")) ++
        rightCols.map(col)): _*)
      .withColumn("__bin", binOf(col("__rts")))

    l.join(r, Seq("__key", "__bin"))
      .filter(
        col("__rts") >= col("__lts") - expr(s"INTERVAL $lowerSeconds SECONDS") &&
        col("__rts") <= col("__lts") + expr(s"INTERVAL $upperSeconds SECONDS"))
      .select(
        Seq(col("__key").as(keyCol), col("__lts").as(tsCol)) ++
          leftCols.map(col) ++ rightCols.map(col): _*)
  }
}
