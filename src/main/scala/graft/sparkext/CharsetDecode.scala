package org.apache.spark.sql.graftext

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, IllegalCharsetNameException, StandardCharsets, UnsupportedCharsetException}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware payload decode with the web-standard fallback chain —
  * the step between a raw HTTP body and [[graft.operators.Normalize]]:
  * real crawl payloads declare a charset in `Content-Type` (often
  * wrongly), declare none, or lie, and a UTF-8-only reader silently
  * mojibakes every cp1252 page (still a double-digit share of the
  * web).
  *
  * Trial order, first success wins — each step a STRICT decode
  * (malformed or unmappable input REPORTs, no silent U+FFFD):
  *   1. the DECLARED charset (second argument; empty/unknown skips);
  *   2. UTF-8 (catches both undeclared-UTF-8 and declared-but-wrong);
  *   3. windows-1252 with replacement — the WHATWG fallback; its
  *      decoder maps every byte except five undefined slots
  *      (0x81 8D 8F 90 9D → U+FFFD), so this step cannot fail.
  *
  * Emits struct(charset, text): `charset` is the canonical name of
  * the decoder that ACTUALLY succeeded, lowercased (so "latin1",
  * "ISO8859-1" and "iso-8859-1" all report "iso-8859-1") — keep it;
  * the declared-vs-used mismatch rate is a crawl-quality metric.
  * Null body → null struct. Codegen is one static call (the
  * [[DeflateRatio]] pattern). */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("charset", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  override def prettyName: String = "charset_decode"

  override def nullSafeEval(body: Any, declared: Any): Any =
    CharsetDecode.compute(body.asInstanceOf[Array[Byte]],
      declared.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"org.apache.spark.sql.graftext.CharsetDecode.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)
}

object CharsetDecode {

  private val Cp1252 = Charset.forName("windows-1252")

  private def tryStrict(bytes: Array[Byte], cs: Charset): UTF8String =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: CharacterCodingException => null
    }

  /** Shared by interpreted eval and generated code. */
  def compute(body: Array[Byte], declared: UTF8String): InternalRow = {
    val declaredCs: Charset =
      try {
        val name = declared.toString.trim
        if (name.isEmpty) null else Charset.forName(name)
      } catch {
        case _: IllegalCharsetNameException => null
        case _: UnsupportedCharsetException => null
      }
    if (declaredCs != null) {
      val t = tryStrict(body, declaredCs)
      if (t != null) {
        // Locale.ROOT: under e.g. a Turkish default locale, a bare
        // toLowerCase maps 'I' to dotless 'ı' and breaks the
        // documented canonical charset name ("ıso-8859-1")
        return InternalRow(UTF8String.fromString(
          declaredCs.name.toLowerCase(java.util.Locale.ROOT)), t)
      }
    }
    if (declaredCs == null || declaredCs != StandardCharsets.UTF_8) {
      val t = tryStrict(body, StandardCharsets.UTF_8)
      if (t != null) return InternalRow(UTF8String.fromString("utf-8"), t)
    }
    val dec = Cp1252.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    InternalRow(UTF8String.fromString("windows-1252"),
      UTF8String.fromString(dec.decode(ByteBuffer.wrap(body)).toString))
  }

  /** `declared` null/absent means "no declaration" (fallback chain
    * from step 2) — normalized to the empty string so the expression
    * itself stays null-strict. */
  def apply(body: Column, declared: Column): Column =
    ExpressionUtils.column(CharsetDecode(
      ExpressionUtils.expression(body),
      ExpressionUtils.expression(coalesce(declared, lit("")))))
}
