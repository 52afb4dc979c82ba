package org.apache.spark.sql.graftext

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization (NFC/NFD/NFKC/NFKD)
  * as a native codegen'd expression — Spark SQL ships no normalizer
  * builtin, and a corpus that skips normalization fractures every
  * downstream signal: "café" (NFC) and "café" (NFD, e + combining
  * acute) hash apart, dedup misses them, tokenizers learn two vocab
  * entries, language-ID profiles drift. The JDK's
  * `java.text.Normalizer` (ICU-derived tables) does the work; the
  * expression's value is keeping it INSIDE whole-stage codegen next to
  * the rest of the cleaning chain instead of a UDF boundary.
  *
  * The `form` is a construction-time literal (validated eagerly, like
  * the registry's unknown-name errors), so the generated code
  * dispatches on a constant. Fast path: a pure-ASCII string (1 byte
  * per char) is normalized under every form and returns unchanged —
  * the overwhelmingly common case in crawl text, checked in O(1)
  * via numChars == numBytes.
  *
  * External replication: NFC output is pinned by the DuckDB oracle
  * (`nfc_normalize`); the compatibility forms (NFKC/NFKD) have no
  * DuckDB counterpart and are pinned by spec instead (ﬁ → fi,
  * ① → 1, full-width → ASCII). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(UnicodeNormalize.Forms.contains(form),
    s"unknown normalization form '$form' " +
      s"(one of ${UnicodeNormalize.Forms.keys.mkString(", ")})")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.compute(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.graftext.UnicodeNormalize
         |  .compute($c, "$form");""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {

  private[graftext] val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  def compute(s: UTF8String, form: String): UTF8String = {
    // ASCII is closed under all four forms: skip the char[] round-trip
    if (s.numBytes() == s.numChars()) return s
    val j = s.toString
    val f = Forms(form)
    if (Normalizer.isNormalized(j, f)) s
    else UTF8String.fromString(Normalizer.normalize(j, f))
  }

  def apply(c: Column, form: String): Column =
    ExpressionUtils.column(
      UnicodeNormalize(ExpressionUtils.expression(c), form))
}
