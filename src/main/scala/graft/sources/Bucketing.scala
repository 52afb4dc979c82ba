package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time so
  * repeated joins/aggregations on the bucket keys run exchange-free.
  *
  * At 100 TB the dominant recurring cost of a star-schema pipeline is
  * re-shuffling the fact table for every join on its key; bucketing pays
  * that shuffle once. Both sides of a join must be bucketed with the same
  * key and bucket count (partitions then line up one-to-one); `sortBy`
  * additionally lets sort-merge join skip its sort. */
object Bucketing {

  /** Write `df` as a bucketed (+ sorted) managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — the resulting
    * physical plan contains no shuffle exchange (asserted in
    * BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
