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
    * ScaleOpsSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Drop + clean + rewrite a bucketed table. A fresh session's in-memory
    * catalog has no tables but the warehouse directory survives on disk,
    * so a plain overwrite `saveAsTable` can trip over the stale location;
    * this makes the write idempotent across sessions. When `sourceToken`
    * is non-empty and this session already wrote `table` from the same
    * token, the write is skipped — bucketing pays its shuffle ONCE, which
    * is the whole point of the layout. (The skip keys on the token, not
    * file contents: if the files under the same source dir are replaced
    * mid-session, pass a new token to force a rewrite.) */
  def rewriteBucketed(spark: SparkSession, df: DataFrame, table: String,
                      numBuckets: Int, keys: Seq[String],
                      sourceToken: String = ""): Unit = {
    val confKey = s"graft.bucketed.$table"
    if (sourceToken.nonEmpty &&
        spark.conf.getOption(confKey).contains(sourceToken) &&
        spark.catalog.tableExists(table)) return
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Hadoop FS API so the stale-location cleanup also works when the
    // warehouse is remote (HDFS/S3) — java.io.File would silently no-op
    // there and the saveAsTable below could trip over the old files.
    val stale = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    stale.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(stale, true)
    writeBucketed(df, table, numBuckets, keys)
    if (sourceToken.nonEmpty) spark.conf.set(confKey, sourceToken)
  }
}
