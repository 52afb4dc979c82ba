package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with batched per-partition feature extraction.
  *
  * The decode step is STUBBED (no image/audio codecs in this environment):
  * [[decodeStub]] derives deterministic fake features from the raw bytes.
  * Everything around it is the real Spark shape — schema, partition-level
  * batching via `mapPartitions`, metadata struct, size-aware repartition —
  * so swapping in a real decoder is a one-function change.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collection, no string round-trip); `repartitionBySize` keeps partition
  * byte-budgets bounded when payload sizes are skewed; extraction is a
  * narrow mapPartitions so it pipelines with the scan.
  */
object Multimodal {

  /** Metadata carried alongside every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("source", StringType),
    StructField("n_bytes", LongType)))

  /** Feature row produced by the extractor. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_bytes", LongType),
    StructField("content_hash", LongType),
    StructField("feature", ArrayType(DoubleType))))

  /** Wrap a string column as a multimodal (binary payload + metadata)
    * asset table: (id, content binary, meta struct). */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String,
               mime: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        lit(mime).as("mime"),
        col(sourceCol).as("source"),
        octet_length(encode(col(payloadCol), "UTF-8")).cast("long")
          .as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic fake features from raw bytes (length,
    * 64-bit FNV-1a content hash, and an 8-dim embedding from byte
    * histogram moments). Replace with a real codec per `meta.mime`. */
  def decodeStub(id: Long, content: Array[Byte]): Row = {
    val h = graft.functions.Hashing.fnv1a(content)
    val hist = new Array[Long](8)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) % 8) += 1
      i += 1
    }
    val n = math.max(content.length, 1).toDouble
    Row(id, content.length.toLong, h, hist.map(_ / n).toSeq)
  }

  /** Batched feature extraction over the asset table: one decoder pass per
    * partition (mapPartitions — the Scala analogue of a batched
    * mapInPandas), emitting [[FeatureSchema]] rows. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(FeatureSchema)
    assets.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  /** STUB resize: real image resize needs a codec; the stub keeps the
    * Spark shape (narrow binary→binary projection, codegen'd substring)
    * by truncating/padding the payload to `targetBytes`. Swap the column
    * expression for a decode→resize→encode UDF per `meta.mime`. */
  def resizeStub(assets: DataFrame, targetBytes: Int): DataFrame =
    assets
      .withColumn("content",
        rpad(substring(col("content"), 1, targetBytes), targetBytes,
          Array[Byte](0)))
      // keep the metadata invariant consumed by repartitionBySize
      .withColumn("meta",
        col("meta").withField("n_bytes", lit(targetBytes.toLong)))

  /** Frame sampling over a chunked binary payload: treats `content` as
    * fixed-size `frameBytes` frames and keeps every `everyN`-th one,
    * exploded to (id, frame_index, frame). The chunk arithmetic and
    * explode are the real distributed plumbing; for real video, frame
    * boundaries come from the container parser instead of fixed stride. */
  def sampleFrames(assets: DataFrame, frameBytes: Int,
                   everyN: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("content")).cast("double") / frameBytes)
      .cast("int")
    // stride directly in the sequence: only kept frame indices are ever
    // materialized (no explode-then-filter waste)
    assets.select(col("id"), col("content"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)),
          lit(everyN))).as("frame_index"))
      .select(col("id"), col("frame_index"),
        expr(s"substring(content, frame_index * $frameBytes + 1, $frameBytes)")
          .as("frame"))
  }

  /** Repartition so each partition carries roughly `targetBytes` of
    * payload — a skew guard for mixed image/video corpora where row count
    * is a bad proxy for partition weight. */
  def repartitionBySize(assets: DataFrame, targetBytes: Long): DataFrame = {
    val row = assets.agg(sum(col("meta.n_bytes"))).first()
    val totalBytes = if (row.isNullAt(0)) 0L else row.getLong(0) // empty input
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    assets.repartition(parts, col("id"))
  }
}
