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

  /** `events.ts` has shipped in two physical forms across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark refuses —
    * [PARQUET_TYPE_ILLEGAL] — unless nanos are read as long) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark reads as
    * TIMESTAMP_NTZ). Normalize BOTH to session-zone microsecond
    * timestamps so operators see one logical type:
    *   - ntz micros → cast to timestamp (UTC session ⇒ same instant);
    *   - nanos → read as long under the legacy flag and truncate with
    *     integer division (the values exceed 2⁵³, so a double
    *     round-trip would corrupt them), restoring the flag
    *     immediately so it never leaks into unrelated reads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    scala.util.Try(spark.read.parquet(path)) match {
      case scala.util.Success(df) =>
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast("timestamp"))
          case org.apache.spark.sql.types.LongType => // flag already on
            df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          case _ => df
        }
      case scala.util.Failure(_) => // INT64 nanos: the legacy-flag dance
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        try {
          spark.read.parquet(path)
            .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        } finally {
          // the relation captures the conf at read() time (exercised by
          // SourcesSpec), so restoring here cannot break the scan
          prior match {
            case Some(v) => spark.conf.set(key, v)
            case None    => spark.conf.unset(key)
          }
        }
    }
  }
}
