package org.apache.spark.sql.graftext

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row deflate compression ratio: compressed bytes / raw UTF-8
  * bytes — the repetitiveness signal web-scale curation pipelines use
  * alongside the rule-based gates (MassiveText/RefinedWeb drop pages
  * that compress too WELL, i.e. low ratio = boilerplate/template spam,
  * and flag ones that don't compress at all, i.e. ~1 = random noise /
  * encoded binary). Complements the exact n-gram fractions
  * ([[NgramRepetition]]): deflate sees ANY redundancy within its 32 KiB
  * window, not just fixed-width token repeats.
  *
  * Pure JDK zlib (level `level`, raw deflate, one shared per-thread
  * Deflater reset between rows — allocation-free on the hot path); the
  * compressed stream is counted, never stored. Codegen emits a single
  * static call inside the surrounding whole-stage span. Empty text
  * reports 1.0. Not SQL-oracle-able (no external engine replicates
  * zlib) — spec-pinned on ordering: template spam << prose < noise. */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(level >= 1 && level <= 9, "deflate level must be in [1, 9]")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(s: Any): Any =
    DeflateRatio.compute(s.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftext.DeflateRatio" +
        s".compute($a, $level);")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateRatio = copy(child = newChild)
}

object DeflateRatio {

  // one Deflater per (thread, level) plus one thread-owned sink buffer:
  // Deflater is stateful native memory, and the hot path must not
  // allocate per row
  private val deflaters = new ThreadLocal[java.util.HashMap[Integer, Deflater]] {
    override def initialValue() = new java.util.HashMap[Integer, Deflater]()
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](8192)
  }

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, level: Int): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get().computeIfAbsent(level,
      l => new Deflater(l, true))
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = sink.get()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / bytes.length
  }

  def apply(text: Column, level: Int = 6): Column =
    ExpressionUtils.column(
      DeflateRatio(ExpressionUtils.expression(text), level))
}
