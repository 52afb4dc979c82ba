package org.apache.spark.sql.graftext

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** Gzip decompression over a binary column — the codec in front of
  * `.warc.gz` ingest: CommonCrawl ships each WARC record as its OWN
  * gzip member and concatenates the members into one file, so a
  * correct reader must walk ALL members, not stop at the first
  * trailer (a plain single-member gunzip reads exactly one record of
  * a million-record archive).
  *
  * Members decompress ONE AT A TIME (manual RFC 1952 framing +
  * `Inflater`, not the JDK's auto-concatenating `GZIPInputStream`):
  * a member's bytes append to the output only after its deflate
  * stream finishes AND its CRC32/ISIZE trailer verifies. A corrupt,
  * truncated, or checksum-failing member therefore contributes
  * NOTHING — the whole tail from that member on drops (the
  * [[WarcRecords]] walk contract), never a partial or bit-flipped
  * record (the JDK stream emits corrupted literal bytes before its
  * trailer check fires, which would let a mangled record through).
  * Trailing non-gzip bytes end the walk cleanly. All work is one
  * static call inside the surrounding span (the [[DeflateRatio]]
  * pattern).
  *
  * SCALE CAVEAT: this expression materializes the whole decompressed
  * output as one JVM array (≤ ~2 GiB) — right for bounded payloads
  * (a gzip Content-Encoding body, a fixture), WRONG for archives: a
  * standard ~1 GiB CommonCrawl shard decompresses past the array
  * cap. Archive ingest goes through [[WarcGzRecords]] /
  * [[graft.sources.Warc.readWarcGz]], which stream members one at a
  * time and bound task memory by one record. */
case class GunzipBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = BinaryType

  override def prettyName: String = "gunzip_bytes"

  override def nullSafeEval(input: Any): Any =
    GunzipBytes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftext.GunzipBytes" +
        s".compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): GunzipBytes = copy(child = newChild)
}

object GunzipBytes {

  // RFC 1952 FLG bits
  private final val FHCRC = 0x02
  private final val FEXTRA = 0x04
  private final val FNAME = 0x08
  private final val FCOMMENT = 0x10

  /** Header length at `pos`, or -1 if not a well-formed gzip member
    * header (magic 0x1F 0x8B, CM = 8 deflate, optional fields). */
  private def headerLen(b: Array[Byte], pos: Int): Int = {
    if (pos + 10 > b.length) return -1
    if (b(pos) != 0x1F.toByte || b(pos + 1) != 0x8B.toByte ||
        b(pos + 2) != 8) return -1
    val flg = b(pos + 3) & 0xFF
    var p = pos + 10
    if ((flg & FEXTRA) != 0) {
      if (p + 2 > b.length) return -1
      val xlen = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      p += 2 + xlen
    }
    if ((flg & FNAME) != 0) {
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & FCOMMENT) != 0) {
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & FHCRC) != 0) p += 2
    if (p > b.length) -1 else p - pos
  }

  private def readLe32(b: Array[Byte], pos: Int): Long =
    (b(pos) & 0xFFL) | ((b(pos + 1) & 0xFFL) << 8) |
      ((b(pos + 2) & 0xFFL) << 16) | ((b(pos + 3) & 0xFFL) << 24)

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length == 0) return Array.emptyByteArray
    // Long math: `length * 3` overflows Int past ~683 MiB and would
    // pick the 64-byte floor for exactly the ~1 GiB shards the
    // scaladoc recommends (correct but quadratic re-copying)
    val out = new ByteArrayOutputStream(math.max(64L,
      math.min(bytes.length.toLong * 3, Int.MaxValue - 8L)).toInt)
    val buf = new Array[Byte](8192)
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      val hl = headerLen(bytes, pos)
      if (hl < 0) ok = false
      else {
        val inf = new java.util.zip.Inflater(true) // raw deflate
        val crc = new java.util.zip.CRC32()
        val member = new ByteArrayOutputStream(8192)
        try {
          inf.setInput(bytes, pos + hl, bytes.length - pos - hl)
          while (!inf.finished() && !inf.needsInput()) {
            val n = inf.inflate(buf)
            if (n > 0) { member.write(buf, 0, n); crc.update(buf, 0, n) }
          }
          if (!inf.finished()) ok = false // truncated deflate stream
          else {
            val end = pos + hl + inf.getBytesRead.toInt
            if (end + 8 > bytes.length) ok = false // missing trailer
            else if (readLe32(bytes, end) != crc.getValue ||
                readLe32(bytes, end + 4) !=
                  (member.size().toLong & 0xFFFFFFFFL)) {
              ok = false // checksum/length mismatch: bit-flipped member
            } else {
              member.writeTo(out)
              pos = end + 8
            }
          }
        } catch {
          case _: java.util.zip.DataFormatException => ok = false
        } finally inf.end()
      }
    }
    out.toByteArray
  }

  def apply(blob: Column): Column =
    ExpressionUtils.column(GunzipBytes(ExpressionUtils.expression(blob)))
}

/** Gzip compression of a binary column into ONE member — the write
  * side of the per-record-member `.warc.gz` layout (compress each
  * record, concatenate the members), and the fixture constructor for
  * the gz-ingest oracle. JDK `GZIPOutputStream` with the fixed
  * zero'd header (no mtime, no OS tag): output is deterministic for
  * a given input. */
case class GzipBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = BinaryType

  override def prettyName: String = "gzip_bytes"

  override def nullSafeEval(input: Any): Any =
    GzipBytes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftext.GzipBytes" +
        s".compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): GzipBytes = copy(child = newChild)
}

object GzipBytes {

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  def apply(payload: Column): Column =
    ExpressionUtils.column(GzipBytes(ExpressionUtils.expression(payload)))
}
