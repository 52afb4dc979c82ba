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

  /** CSV sink with header and full quoting — the lowest-common-
    * denominator interchange format (spreadsheet handoffs, legacy
    * ingest). Spark quotes embedded delimiters/quotes/newlines, so
    * content round-trips writeCsv -> readCsv exactly EXCEPT the
    * format's inherent null ambiguity: null and empty string both
    * serialize to an empty field and read back as null — prefer
    * [[writeJsonl]] when empty-vs-null matters. Distributes like any
    * other file sink. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true")
      // the writer TRIMS field whitespace by default (the reader does
      // not) — a silent content edit; disable both sides of it
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite").csv(path)

  /** CSV source with a REQUIRED explicit schema (same contract as
    * [[readJsonl]]: inference would scan the whole dataset before the
    * query plans — a full extra pass at 100 TB). Header line skipped
    * per file. `multiLine` so quoted embedded newlines parse — which
    * makes the FILE the parallelism unit instead of line ranges; the
    * write side produces one file per task, so a round-trip stays
    * fully parallel (a single giant hand-made CSV would not). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").csv(path)

  /** ORC sink — the other columnar warehouse format (Hive/Presto
    * estates). Zstd-compressed stripes with min/max stripe statistics,
    * so downstream predicate pushdown skips stripes the same way
    * parquet row-group stats do. Types round-trip exactly (columnar
    * format, no text-serialization lossiness) — oracle-checked
    * end-to-end in the harness. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.option("compression", "zstd").mode("overwrite").orc(path)

  /** ORC source. Schema is taken from the file footers (columnar
    * formats self-describe — no inference pass to pay for, unlike
    * [[readCsv]]/[[readJsonl]]); an explicit schema is still accepted
    * for projection-pruned reads of wide tables. Spark's native
    * vectorized ORC reader applies the same pushdown/pruning as the
    * parquet scan (`PushedFilters`/`ReadSchema` in explain). */
  def readOrc(spark: SparkSession, path: String,
              schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).orc(path)
  }

  /** Avro object-container sink — the row-oriented interchange format
    * of Kafka/warehouse estates. Deflate-compressed blocks with sync
    * markers, so the files READ BACK SPLITTABLE (each task syncs into
    * its byte range); written through Spark's own commit protocol via
    * the registered `graftavro` format ([[org.apache.spark.sql
    * .graftext.AvroFileFormat]] — built on the avro core library the
    * Spark distribution vendors; the spark-avro connector module does
    * not ship here). Types round-trip exactly for the documented
    * subset (primitives, string, binary, timestamp-micros, date,
    * struct/array/string-keyed map, [null, T] nullability) —
    * oracle-checked end-to-end in the harness; unsupported types
    * throw at plan time. */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.format("graftavro").mode("overwrite").save(path)

  /** Avro source. Schema comes from the container header (self-
    * describing — no inference pass, unlike [[readCsv]]/[[readJsonl]]);
    * an explicit schema is accepted for projection-pruned reads (only
    * requested fields decode per record either way). */
  def readAvro(spark: SparkSession, path: String,
               schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).format("graftavro").load(path)
  }

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
