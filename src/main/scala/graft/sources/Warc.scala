package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftext.WarcRecords

/** WARC (ISO 28500) record parsing — the container format every
  * CommonCrawl-style corpus arrives in, and the missing entry point in
  * front of the crawl chain ([[graft.operators.HtmlExtract]] →
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
  * projection — zero shuffle at any scale; a 1 GiB WARC blob costs
  * one task, so feed splittable inputs (one blob per fetched page or
  * per record batch), not whole-file strings. */
object Warc {

  private def header(headers: Column, name: String): Column = {
    val v = regexp_extract(headers, "(?mi)^" + name + ":\\s*(\\S+)", 1)
    when(v =!= "", v)
  }

  def parseWarc(df: DataFrame, idCol: String = "doc_id",
                blobCol: String = "blob"): DataFrame = {
    val rec = col("col")
    val headers = substring_index(rec, "\r\n\r\n", 1)
    val cl = regexp_extract(headers,
      "(?mi)^Content-Length:\\s*([0-9]+)\\s*$", 1)
    df.select(col(idCol), posexplode(WarcRecords(col(blobCol))))
      .select(col(idCol),
        col("pos").as("rec_id"),
        regexp_extract(rec, "^WARC/([0-9.]+)", 1).as("warc_version"),
        header(headers, "WARC-Type").as("warc_type"),
        header(headers, "WARC-Target-URI").as("target_uri"),
        header(headers, "WARC-Date").as("warc_date"),
        when(cl =!= "", cl.cast("long")).as("content_length"),
        regexp_replace(rec, "(?s)^.*?\\r\\n\\r\\n", "").as("payload"))
  }
}
