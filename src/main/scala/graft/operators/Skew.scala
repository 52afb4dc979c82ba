package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints.TruncateOps

/** Skew-mitigation operators.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; explicit
  * salting is still the tool of choice when one side must be broadcast
  * per-salt or when a single hot key dominates a shuffle. Both forms here
  * are exact (pure plan rewrites of the unsalted equivalent). */
object Skew {

  /** Skew-safe equi-join: the big side gets a deterministic per-row salt
    * in [0, saltFactor); the small side is replicated once per salt value;
    * the join key becomes (keys..., salt), splitting each hot key's rows
    * across `saltFactor` reducers. Result equals the plain inner join.
    *
    * The salt is a function of row CONTENT, never position: positional
    * salts (mid()/rand) reassign rows on task retry after partial shuffle
    * recomputation and silently duplicate/drop join rows (the SPARK-23207
    * failure class). The tradeoff: byte-identical duplicate rows share a
    * salt and do not spread — their joined outputs are identical anyway,
    * so this costs balance, not correctness; dedupe or add a
    * disambiguating column upstream if that skew matters. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallReplicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-stage (salted) aggregation for re-aggregatable statistics: a hot
    * group is first reduced across `saltFactor` sub-groups map-side-ish,
    * then combined. Exact for count/min/max and integral or decimal sums;
    * floating-point sums may differ from the one-stage result in
    * low-order bits (summation re-association). */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  saltFactor: Int): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val partial = salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"),
        min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    partial.groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"),
        min(col("__mn")).as("min"), max(col("__mx")).as("max"))
  }

  /** Key-skew diagnostic: the report to run BEFORE a big join or
    * aggregation — which keys are hot, how hot, and what salt factor
    * the hottest key implies. A join that looks fine at sf0.01 dies at
    * 100 TB on one mega-key; this makes that visible for the cost of
    * one count aggregate (map-side partial combine, so the diagnosis
    * itself survives the very skew it measures).
    *
    * Shape: per-key counts are the only corpus-sized work; the
    * summary (key count, mean, max) reduces the key-sized frame, rides
    * back on a broadcast one-row cross join, and the top-N selection is
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    * Output: `topN` rows — (rank, key [null-safe "\u0000"-joined; null parts
    * coalesce to the "\u0001" sentinel so (a,null) and (null,a) stay
    * distinct — concat_ws alone silently skips nulls],
    * cnt, share[round 6], n_keys, mean_cnt[round 6], max_cnt,
    * skew_ratio[round 6] = max/mean — the suggested salt-factor floor
    * for [[saltedJoin]]). */
  def keySkewReport(df: DataFrame, keys: Seq[String],
                    topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(topN >= 1, "topN must be >= 1")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(concat_ws("\u0000",
        keys.map(c => coalesce(col(c).cast("string"), lit("\u0001"))):
          _*).as("key"), col("cnt"))
      .truncateLineage(false)
    val summary = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
      max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topN)
      .coalesce(1)
      .sortWithinPartitions(col("cnt").desc, col("key"))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
      .crossJoin(broadcast(summary))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        col("n_keys"),
        round(col("total").cast("double") / col("n_keys").cast("double"), 6)
          .as("mean_cnt"),
        col("max_cnt"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double") /
          col("total").cast("double"), 6).as("skew_ratio"))
  }
}
