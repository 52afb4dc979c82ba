package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Split a WARC blob (ISO 28500 — the CommonCrawl container format)
  * into its records with the LENGTH-DRIVEN walk the spec requires.
  *
  * Why a native expression and not `split` on the `WARC/1.0` sentinel:
  * record payloads are arbitrary bytes — a crawled page may itself
  * contain `WARC/1.0\r\n` (an article ABOUT web archiving does) — so
  * the only correct record boundary is the one the `Content-Length`
  * header declares. That walk (find the header terminator, read the
  * declared length, jump) is inherently sequential per blob and not
  * expressible in builtin columnar functions; the per-blob loop in
  * compiled Scala is the same trade every other `graftext` native
  * makes. CodegenFallback: all per-blob work happens inside one
  * virtual call.
  *
  * Walk contract, per record: the blob position must start with
  * `WARC/` (else: stop — trailing garbage and truncation DROP the
  * tail rather than mis-parse it); headers run to the first
  * `\r\n\r\n`; `Content-Length:` (case-insensitive) declares the
  * payload BYTE count; the record string is headers + terminator +
  * payload; any number of `\r\n` separator pairs skip before the next
  * record. Byte-level throughout — `Content-Length` counts octets,
  * not characters, so the walk operates on the UTF-8 bytes and
  * re-wraps slices.
  */
case class WarcRecords(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "warc_records"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(WarcWalk.split(bytes).map { case (s, e) =>
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, s, e))
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {
  def apply(blob: Column): Column =
    ExpressionUtils.column(WarcRecords(ExpressionUtils.expression(blob)))
}

/** [[WarcRecords]] over a BINARY blob, emitting binary records — the
  * form real `.warc.gz` ingest needs: response payloads carry bodies
  * in whatever charset the server sent (cp1252 is endemic), and a
  * UTF-8 string round-trip would re-encode those bytes so the
  * `Content-Length` octet counts no longer match the data. The walk
  * itself is byte-identical to the string form (one shared
  * [[WarcWalk]] — the splitter can never diverge between the two). */
case class WarcRecordsBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)

  override def prettyName: String = "warc_records_bytes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    new GenericArrayData(WarcWalk.split(bytes).map { case (s, e) =>
      java.util.Arrays.copyOfRange(bytes, s, e)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(
      newChild: Expression): WarcRecordsBytes = copy(child = newChild)
}

object WarcRecordsBytes {
  def apply(blob: Column): Column =
    ExpressionUtils.column(
      WarcRecordsBytes(ExpressionUtils.expression(blob)))
}

/** The length-driven record walk shared by [[WarcRecords]] (string
  * blobs) and [[WarcRecordsBytes]] (binary blobs): byte offsets in,
  * record (start, end) spans out. One implementation so the two
  * entry points cannot drift. */
private[graftext] object WarcWalk {

  private val Magic = "WARC/".getBytes("US-ASCII")

  private val ContentLength =
    java.util.regex.Pattern.compile(
      "(?mi)^Content-Length:\\s*([0-9]+)\\s*$")

  private def startsWith(b: Array[Byte], pos: Int, pat: Array[Byte]): Boolean = {
    if (pos + pat.length > b.length) return false
    var i = 0
    while (i < pat.length) {
      if (b(pos + i) != pat(i)) return false
      i += 1
    }
    true
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
          b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  def split(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      if (!startsWith(bytes, pos, Magic)) ok = false
      else {
        val hdrEnd = indexOfCrlfCrlf(bytes, pos)
        if (hdrEnd < 0) ok = false
        else {
          val headers = new String(bytes, pos, hdrEnd - pos,
            java.nio.charset.StandardCharsets.UTF_8)
          val m = ContentLength.matcher(headers)
          // the 18-digit cap keeps parseLong from THROWING on an
          // adversarial 20+-digit length — a malformed record must
          // drop the tail (the walk contract), not kill the stage
          if (!m.find() || m.group(1).length > 18) ok = false
          else {
            val cl = java.lang.Long.parseLong(m.group(1))
            val end = hdrEnd + 4 + cl
            if (cl < 0 || end > bytes.length) ok = false // truncated
            else {
              out += ((pos, end.toInt))
              pos = end.toInt
              while (pos + 1 < bytes.length &&
                     bytes(pos) == '\r' && bytes(pos + 1) == '\n')
                pos += 2
            }
          }
        }
      }
    }
    out.toSeq
  }
}
