package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{QuantileSketch, QuantileSketchMerge, QuantileSketchState}

/** Corpus distribution statistics via the mergeable Greenwald-Khanna
  * quantile sketch — the third sketch family next to frequency
  * (Misra-Gries) and distinct count (KMV).
  *
  * Scale story: exact percentiles need a sort (or a full multiset per
  * group); the GK summary is O((1/ε)·log(εn)) per group and MERGEABLE,
  * so the exchange carries bounded summaries and — via
  * [[writeQuantileShards]] / [[quantilesFromShards]] — per-shard
  * summaries persist to parquet and combine later WITHOUT rescanning
  * the data: incremental corpus statistics, the quantile analogue of
  * the persisted LSH signature store. ε = 0 is the exact degenerate
  * regime (state ∝ group size, partition-order independent, externally
  * oracle-able); ε > 0 is the bounded-state scale path with rank error
  * ≤ ε·n (spec-checked). */
object Stats {

  /** Per-group quantiles of `valueCol`: one row per (group, q) —
    * (groupCols..., q double, value double). Nearest-rank-lower
    * contract: rank 1 + ⌊q·(n−1)⌋. */
  def quantileStats(df: DataFrame, valueCol: String, qs: Seq[Double],
                    eps: Double = 0.0,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val sketch =
      QuantileSketch(col(valueCol).cast("double"), eps, qs).as("qv")
    val agged =
      if (groupCols.isEmpty) df.groupBy().agg(sketch)
      else df.groupBy(groupCols.map(col): _*).agg(sketch)
    val qlits = array(qs.map(lit): _*)
    agged.select(groupCols.map(col) :+ posexplode(col("qv")): _*)
      .select(groupCols.map(col) ++ Seq(
        element_at(qlits, col("pos") + 1).as("q"),
        col("col").as("value")): _*)
  }

  /** Persist one GK summary per `shardCols` group to `path` — the write
    * side of incremental stats. Each row: shardCols + the summary as
    * array<struct<v, g, d>>. */
  def writeQuantileShards(df: DataFrame, path: String, valueCol: String,
                          shardCols: Seq[String],
                          eps: Double = 0.0): Unit = {
    require(shardCols.nonEmpty, "shardCols must be non-empty")
    df.groupBy(shardCols.map(col): _*)
      .agg(QuantileSketchState(col(valueCol).cast("double"), eps)
        .as("summary"))
      .write.mode("overwrite").parquet(path)
  }

  /** Combine persisted shard summaries into corpus-level quantiles
    * without touching the original data: one row per q — (q, value).
    * Reading N summary rows replaces rescanning the N shards' raw
    * values; appending a shard later is one more summary row. */
  def quantilesFromShards(spark: SparkSession, path: String,
                          qs: Seq[Double],
                          eps: Double = 0.0): DataFrame = {
    val merged = spark.read.parquet(path)
      .agg(QuantileSketchMerge(col("summary"), eps, qs).as("qv"))
    val qlits = array(qs.map(lit): _*)
    merged.select(posexplode(col("qv")))
      .select(element_at(qlits, col("pos") + 1).as("q"),
        col("col").as("value"))
  }
}
