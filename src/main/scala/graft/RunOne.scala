package graft

/** Dev utility: run ONE SparkEntry query and dump its result parquet —
  * spot-checking a single entry at a larger SF without paying the full
  * Verify + DuckDB-oracle sweep.
  *
  * Usage: runMain graft.RunOne <queryName> <sfDir> <outPath>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outPath) = args
    val spark = LocalSession()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
