package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftext.{CharsetDecode, WarcRecords}

/** WARC (ISO 28500) record parsing — the container format every
  * CommonCrawl-style corpus arrives in, and the entry point in front
  * of the crawl chain ([[graft.operators.HtmlExtract]] →
  * [[graft.operators.Normalize]] → quality/dedup): a blob column of
  * concatenated WARC records becomes one row per record with typed
  * headers and the exact payload.
  *
  * Record splitting is the native length-driven walk
  * ([[org.apache.spark.sql.graftext.WarcRecords]]) — `Content-Length`
  * is the only correct boundary (payloads may contain the `WARC/1.0`
  * sentinel). Header FIELD extraction on the per-record rows is then
  * plain anchored regexps — codegen'd, and replicated in the oracle.
  *
  * Two ingest forms:
  *   - [[parseWarc]]: STRING blobs (pre-decoded fixtures, payloads
  *     known UTF-8) → string payloads;
  *   - [[parseWarcGz]] / [[readWarcGz]]: BINARY `.warc.gz` blobs /
  *     files, the real CommonCrawl shape — per-record gzip members
  *     decompress ONE AT A TIME with records streaming out as they
  *     complete ([[org.apache.spark.sql.graftext.WarcGzRecords]];
  *     per-member CRC verify, drop-tail on corruption, task memory
  *     bounded by one member + one record); the walk runs on raw
  *     BYTES (bodies may be non-UTF-8; Content-Length counts
  *     octets), and payloads emit as binary for [[httpResponses]]
  *     to split and charset-decode.
  *
  * Emits (id, rec_id, warc_version, warc_type, target_uri, warc_date,
  * content_length, payload):
  *   - `rec_id`: 0-based record position within the blob;
  *   - headers absent from a record emit null;
  *   - `content_length` is the DECLARED byte count (the walk already
  *     enforced it — payload slicing used it);
  *   - a malformed / truncated tail drops, shortening the array —
  *     compare `sum(octet_length(blob))` against parsed volume
  *     upstream to monitor drop rates.
  *
  * Plan shape: one Generate over the native walk + one codegen'd
  * projection — zero shuffle at any scale. Gzip is not splittable, so
  * one blob costs one task: parallelism comes from the FILE fan-out
  * (CommonCrawl shards archives at ~1 GiB; a `binaryFile` read of a
  * shard directory spreads thousands of member-concatenated files
  * across executors — the standard Hadoop-lineage gzip shape). */
object Warc {

  private def header(headers: Column, name: String): Column = {
    val v = regexp_extract(headers, "(?mi)^" + name + ":\\s*(\\S+)", 1)
    when(v =!= "", v)
  }

  /** The per-record WARC header projection over a STRING view of the
    * record — shared by both ingest forms so the header grammar can
    * never diverge between them. */
  private def recordFields(rec: Column): Seq[Column] = {
    val headers = substring_index(rec, "\r\n\r\n", 1)
    val cl = regexp_extract(headers,
      "(?mi)^Content-Length:\\s*([0-9]+)\\s*$", 1)
    Seq(
      regexp_extract(rec, "^WARC/([0-9.]+)", 1).as("warc_version"),
      header(headers, "WARC-Type").as("warc_type"),
      header(headers, "WARC-Target-URI").as("target_uri"),
      header(headers, "WARC-Date").as("warc_date"),
      when(cl =!= "", cl.cast("long")).as("content_length"))
  }

  def parseWarc(df: DataFrame, idCol: String = "doc_id",
                blobCol: String = "blob"): DataFrame = {
    val rec = col("col")
    df.select(col(idCol), posexplode(WarcRecords(col(blobCol))))
      .select(col(idCol) +: col("pos").as("rec_id") +:
        recordFields(rec) :+
        regexp_replace(rec, "(?s)^.*?\\r\\n\\r\\n", "").as("payload"): _*)
  }

  /** Real-corpus ingest: BINARY `.warc.gz` blobs (each WARC record its
    * own gzip member, members concatenated — the CommonCrawl layout).
    * Decompression and the record walk run on raw bytes; header
    * extraction then uses an ISO-8859-1 STRING VIEW of each record —
    * latin-1 maps bytes 1:1 to chars, so regex character positions ARE
    * byte positions and re-encoding the payload slice back through
    * latin-1 is byte-exact (a UTF-8 view would corrupt non-UTF-8
    * bodies and break the octet arithmetic). WARC headers themselves
    * are ASCII by spec, so the extracted header fields are unaffected.
    *
    * Records STREAM out of each blob
    * ([[org.apache.spark.sql.graftext.WarcGzRecords]]): gzip members
    * inflate one at a time with per-member CRC32/ISIZE verification
    * and records emit as their declared length completes, so task
    * memory is bounded by one member + one record — NOT the
    * decompressed archive, which for a standard ~1 GiB CommonCrawl
    * shard (~4 GiB decompressed) would blow the ~2 GiB JVM array cap
    * that a gunzip-whole-then-walk plan hits. For archives arriving
    * as FILES (the usual case), [[readWarcGz]] skips the blob
    * column entirely.
    *
    * `payload` emits as BINARY — feed response records through
    * [[httpResponses]] for the HTTP split + charset decode. */
  def parseWarcGz(df: DataFrame, idCol: String = "doc_id",
                  blobCol: String = "blob"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, IntegerType, StructField, StructType}
    val sel = df.select(col(idCol), col(blobCol))
    val schema = StructType(Seq(
      sel.schema.head,
      StructField("rec_id", IntegerType, nullable = false),
      StructField("__rec", BinaryType, nullable = false)))
    val recs = sel.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](1)
        if (blob == null) Iterator.empty
        else {
          val id = r.get(0)
          org.apache.spark.sql.graftext.WarcGzRecords
            .over(new java.io.ByteArrayInputStream(blob))
            .zipWithIndex.map { case (rec, i) => Row(id, i, rec) }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    projectRecords(recs, idCol)
  }

  /** The shared record projection over streamed (id, rec_id, __rec)
    * rows — the latin-1 string-view trick from [[parseWarcGz]]'s
    * scaladoc, one codegen'd select. */
  private def projectRecords(recs: DataFrame, idCol: String): DataFrame = {
    val rec = decode(col("__rec"), "ISO-8859-1")
    recs.select(col(idCol) +: col("rec_id") +: recordFields(rec) :+
      encode(regexp_replace(rec, "(?s)^.*?\\r\\n\\r\\n", ""),
        "ISO-8859-1").as("payload"): _*)
  }

  /** `.warc.gz` ingest straight from FILES — the 100 TB entry point:
    * gzip is not splittable, so the parallelism unit is the file
    * (CommonCrawl shards at ~1 GiB), one file per task, scheduled
    * largest-first. Per-task memory stays bounded by one gzip member
    * + one record regardless of archive size (the
    * [[org.apache.spark.sql.graftext.WarcGzRecords]] streaming walk),
    * so shards whose decompressed size exceeds the JVM array cap
    * ingest fine. Accepts files, directories, and globs; emits the
    * [[parseWarcGz]] schema with the source file's full URI as
    * `path`. */
  def readWarcGz(spark: org.apache.spark.sql.SparkSession,
                 paths: Seq[String],
                 pathCol: String = "path"): DataFrame =
    projectRecords(
      org.apache.spark.sql.graftext.WarcGzFiles
        .recordRows(spark, paths, pathCol),
      pathCol)

  /** Project raw `(idCol, rec_id, __rec)` record rows — what
    * `spark.read.format("warcgz")` / `readStream.format("warcgz")`
    * and [[org.apache.spark.sql.graftext.WarcGzFiles.recordRows]]
    * emit — into the [[parseWarcGz]] record shape (warc_type,
    * target_uri, content_length, payload, ...): the composition
    * point between the file-source registration and the record
    * operators. Pure projection; streams unchanged. */
  def parseRecordRows(recs: DataFrame,
                      idCol: String = "path"): DataFrame =
    projectRecords(recs, idCol)

  /** HTTP response split + charset-aware body decode over
    * [[parseWarcGz]] rows: a WARC `response` payload is an HTTP
    * message — status line, headers, `\r\n\r\n`, body in whatever
    * charset the server sent. Emits the input columns minus `payload`
    * plus:
    *   - `http_status`: from the status line (null: not HTTP);
    *   - `content_type`: media type, parameters stripped (null: none);
    *   - `charset`: the decoder that ACTUALLY succeeded (declared →
    *     UTF-8 → windows-1252, each strict; see
    *     [[org.apache.spark.sql.graftext.CharsetDecode]]) — compare
    *     against the declared value to monitor mis-labeled payloads;
    *   - `body`: the decoded text, ready for
    *     [[graft.operators.HtmlExtract]].
    * Non-HTTP payloads (warcinfo, metadata, request records) pass
    * through whole as the "body" with null status/content_type — the
    * same charset chain applies (they are usually ASCII).
    *
    * Pure projection over the latin-1 string view (byte-faithful, as
    * in [[parseWarcGz]]) + one native decode call — zero shuffle. */
  def httpResponses(records: DataFrame,
                    payloadCol: String = "payload"): DataFrame = {
    val p = decode(col(payloadCol), "ISO-8859-1")
    val isHttp = p.rlike("^HTTP/[0-9.]+ [0-9]{3}")
    val hasTerm = instr(p, "\r\n\r\n") > 0
    // header block: whole payload when the terminator never arrives
    // (truncated message — keep the headers, empty body)
    val headers = when(isHttp,
      when(hasTerm, substring_index(p, "\r\n\r\n", 1)).otherwise(p))
    val bodyStr = when(!isHttp, p)
      .when(hasTerm, regexp_replace(p, "(?s)^.*?\\r\\n\\r\\n", ""))
      .otherwise(lit(""))
    // charset sniff is scoped to the Content-Type VALUE — a
    // `charset=` token in any other header (Link rels carry them)
    // must not win over the media type's own declaration
    val ctypeFull = regexp_extract(headers,
      "(?mi)^Content-Type:\\s*([^\\r\\n]+)", 1)
    val declared = regexp_extract(ctypeFull,
      "(?i)charset=\"?([A-Za-z0-9_.:\\-]+)", 1)
    val ctype = regexp_extract(ctypeFull, "^([^;]+)", 1)
    // null payload → null struct (CharsetDecode's contract), not a
    // decoded-empty body="" / charset="utf-8" row
    val decoded = when(col(payloadCol).isNotNull,
      CharsetDecode(encode(bodyStr, "ISO-8859-1"),
        when(declared =!= "", declared)))
    records
      .withColumn("__hdr", headers)
      .withColumn("__d", decoded)
      .withColumn("http_status", when(isHttp,
        regexp_extract(p, "^HTTP/[0-9.]+ ([0-9]{3})", 1).cast("int")))
      .withColumn("content_type",
        when(trim(ctype) =!= "", trim(ctype)))
      .withColumn("charset", col("__d.charset"))
      .withColumn("body", col("__d.text"))
      .drop(payloadCol, "__hdr", "__d")
  }
}
