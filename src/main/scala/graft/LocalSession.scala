package graft

import org.apache.spark.sql.SparkSession

/** The driver-tool SparkSession — ONE definition of the local-mode
  * settings (`local[cpus]`, matching shuffle partitions, AQE, UTC,
  * UI off) shared by `Bench`, `Verify`, `RunOne`, and `ScaleProbe`, so
  * the tools can't silently drift onto different configurations.
  * `SPARK_GRAFT_CPUS` overrides the parallelism. */
object LocalSession {
  def apply(defaultCpus: String = "32"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
