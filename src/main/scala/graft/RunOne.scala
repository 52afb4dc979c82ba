package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE SparkEntry query and dump its result parquet —
  * spot-checking a single entry at a larger SF without paying the full
  * Verify + DuckDB-oracle sweep.
  *
  * Usage: runMain graft.RunOne <queryName> <sfDir> <outPath>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
