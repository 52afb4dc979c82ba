package org.apache.spark.sql.graftext

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `spark.read.format("warcgz")` / `spark.readStream.format("warcgz")`
  * — the file-source registration of the streaming `.warc.gz` record
  * walk ([[WarcGzRecords]]): one row per WARC record, the same
  * `(path, rec_id, __rec)` shape as [[WarcGzFiles.recordRows]], but
  * composed into Spark's file-source machinery, so
  *
  *  - batch reads take paths/globs/directories, partition-directory
  *    columns, and the catalog like any built-in format, and
  *  - Structured Streaming's file discovery ingests NEWLY-ARRIVING
  *    shards (`readStream.format("warcgz").load(dir)` picks up
  *    archives dropped in later — the continuously-landing-crawl
  *    entry point the function form cannot offer).
  *
  * Scale posture: gzip is not splittable, so `isSplitable` = false
  * and the parallelism unit is the file (Spark's file packing gives
  * a ~1 GiB CommonCrawl shard its own partition and bins small
  * fixtures together). Per-task memory is the record walk's bound:
  * one gzip member + one in-progress record. Column pruning is
  * honored — a `rec_id`-only count never materializes record bytes
  * into rows (the walk itself still runs; gzip offers no shortcut).
  * Read-only by design: `prepareWrite` throws. */
final class WarcGzFileFormat extends FileFormat with DataSourceRegister {

  override def shortName(): String = "warcgz"

  override def inferSchema(sparkSession: SparkSession,
                           options: Map[String, String],
                           files: Seq[org.apache.hadoop.fs.FileStatus])
      : Option[StructType] = Some(WarcGzFileFormat.schema)

  override def isSplitable(sparkSession: SparkSession,
                           options: Map[String, String],
                           path: org.apache.hadoop.fs.Path): Boolean =
    false

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "warcgz is a read-only format (WARC archives are written by " +
        "crawlers, not by this engine)")

  override def toString: String = "WarcGz"

  override protected def buildReader(
      sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] =
    // a dedicated Serializable function class: the read function
    // ships to executors, and a lambda here would drag this
    // (non-serializable) format instance along with it. The conf is
    // captured directly (NOT broadcast): the function is serialized
    // once per stage inside the task binary, so a broadcast buys
    // nothing here — and a long-running streaming query replans
    // buildReader every micro-batch, which would accumulate
    // broadcasts on the driver until ContextCleaner GC.
    WarcGzFileFormat.RecordReader(
      new SerializableConfiguration(hadoopConf), requiredSchema)
}

object WarcGzFileFormat {
  /** The fixed record schema — [[WarcGzFiles.recordRows]]'s shape. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rec_id", IntegerType, nullable = false),
    StructField("__rec", BinaryType, nullable = false)))

  /** The per-file read function: walks one archive's records and
    * emits only the columns `requiredSchema` asks for (pruning a
    * `rec_id`-only scan down to no byte payloads in rows).
    *
    * Lifecycle: the input stream closes via the task-completion
    * listener and again on iterator exhaustion. GUARANTEED cleanup
    * therefore requires an active `TaskContext` (always true on
    * executors); a driver-side/local caller that short-circuits the
    * iterator without exhausting it keeps the file handle until GC —
    * exhaust the iterator (or read through Spark) in that case. */
  private final case class RecordReader(
      conf: SerializableConfiguration,
      requiredSchema: StructType)
      extends (PartitionedFile => Iterator[InternalRow])
      with Serializable {

    override def apply(file: PartitionedFile): Iterator[InternalRow] = {
      val names = requiredSchema.fieldNames
      val path = file.toPath
      val in = new java.io.BufferedInputStream(
        path.getFileSystem(conf.value).open(path))
      var closed = false
      def closeOnce(): Unit =
        if (!closed) { closed = true; in.close() }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => closeOnce()))
      val pathStr = UTF8String.fromString(path.toString)
      val proj = UnsafeProjection.create(requiredSchema)
      val recs = WarcGzRecords.over(in).zipWithIndex.map {
        case (rec, i) =>
          val row = new GenericInternalRow(names.length)
          var j = 0
          while (j < names.length) {
            names(j) match {
              case "path" => row.update(j, pathStr)
              case "rec_id" => row.setInt(j, i)
              case "__rec" => row.update(j, rec)
            }
            j += 1
          }
          proj(row): InternalRow
      }
      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val h = recs.hasNext
          if (!h) closeOnce()
          h
        }
        override def next(): InternalRow = recs.next()
      }
    }
  }
}
