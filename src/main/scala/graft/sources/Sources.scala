package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the harness star schema, normalizing
  * physical quirks so operators see clean logical types. */
object Sources {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark refuses
    * ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and truncate to
    * microsecond timestamps (integer division — the values exceed 2^53 so
    * a double round-trip would corrupt them). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } finally {
      // don't leak the legacy flag into unrelated reads on this session;
      // the scan itself keeps working (the relation captures the conf at
      // read() time — exercised by SourcesSpec)
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
