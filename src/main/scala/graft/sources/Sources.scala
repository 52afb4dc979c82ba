package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the harness star schema, normalizing
  * physical quirks so operators see clean logical types. */
object Sources {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** JSONL (one JSON object per line) sink — the interchange format
    * LLM data pipelines actually exchange; Spark's json datasource IS
    * line-delimited JSON, so the write distributes like any other. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL source with a REQUIRED explicit schema: schema inference
    * reads the whole dataset once before the query even plans — at
    * 100 TB that is a full extra pass, so it is not offered. Types and
    * content round-trip writeJsonl -> readJsonl exactly (oracle-checked
    * end-to-end in the harness). */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

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
