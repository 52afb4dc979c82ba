package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character share of repeated word n-grams in a document — the Gopher
  * repetition-removal measurements (Rae et al. 2021, "Scaling Language
  * Models", Appendix A: "fraction of characters in the most frequent
  * n-gram" for n = 2..4 and "fraction of characters in duplicated
  * n-grams" for n = 5..10), in one native pass.
  *
  * Definitions (deterministic and engine-replicable by construction):
  *   - the token stream is the single-space split ([[graft.operators
  *     .TextAnalysis.tokens]]); an n-gram's char length is the length of
  *     its space-joined form; the denominator is the char length of the
  *     whole space-joined stream.
  *   - `dup = false` (top-gram form): max over n-grams of
  *     occurrences × gramLen, / total — taking the max of the PRODUCT
  *     (not "len of the most frequent gram") makes ties irrelevant, so
  *     no tie-break rule has to be replicated in an oracle.
  *   - `dup = true`: Σ over n-grams occurring ≥ 2 times of
  *     occurrences × gramLen, / total.
  *   - overlapping occurrences make both numerators over-count the
  *     physically-covered span ("a a a a" has 3 overlapping "a a"s), so
  *     both fractions cap at 1.0 — the documented upper-bound form;
  *     published implementations differ here and a position-marking
  *     exact form would not be SQL-expressible.
  *
  * The equivalent builtin composition (transform + sequence +
  * array HOFs + a groupBy per n) would either run the interpreted HOF
  * evaluator per gram or spend one shuffle per n-gram width; this
  * expression counts with one token pass and a hash map — microseconds
  * per document, zero shuffle at any corpus size. Gram identity is a
  * 64-bit mix of per-word FNV-1a hashes (collisions ~m²/2⁶⁵ per doc —
  * negligible, the [[HashedNGramShingles]] precedent). CodegenFallback:
  * all per-document work happens inside one compiled call. */
case class NgramCharFraction(child: Expression, n: Int, dup: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(n >= 1, "n-gram width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String =
    if (dup) "dup_ngram_char_fraction" else "top_ngram_char_fraction"

  private val space = UTF8String.fromString(" ")

  import graft.functions.Hashing.{fnv1a, mix}

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val m = words.length - n + 1
    if (m <= 0) return 0.0
    val wordHash = new Array[Long](words.length)
    val wordLen = new Array[Long](words.length)
    var total = (words.length - 1).toLong // the joining spaces
    var i = 0
    while (i < words.length) {
      wordHash(i) = fnv1a(words(i).getBytes)
      wordLen(i) = words(i).numChars().toLong
      total += wordLen(i)
      i += 1
    }
    if (total <= 0L) return 0.0
    // gram id -> (count, charLen); charLen = member lens + n-1 spaces
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]](m * 2)
    i = 0
    while (i < m) {
      var h = 42L
      var len = (n - 1).toLong
      var j = 0
      while (j < n) {
        h = mix(h, wordHash(i + j))
        len += wordLen(i + j)
        j += 1
      }
      val e = counts.get(h)
      if (e == null) counts.put(h, Array(1L, len)) else e(0) += 1L
      i += 1
    }
    var chars = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (dup) { if (e(0) >= 2L) chars += e(0) * e(1) }
      else chars = math.max(chars, e(0) * e(1))
    }
    math.min(chars.toDouble / total.toDouble, 1.0)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramCharFraction =
    copy(child = newChild)
}

object NgramCharFraction {
  def apply(text: Column, n: Int, dup: Boolean): Column =
    ExpressionUtils.column(
      NgramCharFraction(ExpressionUtils.expression(text), n, dup))
}

/** Character share of duplicated segments (lines or paragraphs) of a
  * document — the other half of Gopher's repetition measurements:
  * Σ over segments occurring ≥ 2 times of occurrences × segLen, over
  * the total chars across all segments (separators excluded from both
  * sides, so the value is a true fraction ≤ 1 with no cap needed).
  * 0.0 for an empty segment list or zero total chars.
  *
  * `sep` splits literally (no regex), matching DuckDB's `string_split`
  * so the oracle replicates exactly. One pass, one hash map keyed by
  * the segment text itself (no hash-collision caveat: segment counts
  * are exact). */
case class DupSegmentCharFraction(child: Expression, sep: String)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(sep.nonEmpty, "separator must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dup_segment_char_fraction"

  override def nullSafeEval(input: Any): Any = {
    val segs = input.asInstanceOf[UTF8String].toString
      .split(java.util.regex.Pattern.quote(sep), -1)
    val counts = new java.util.HashMap[String, Array[Long]](segs.length * 2)
    var total = 0L
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      val len = s.codePointCount(0, s.length).toLong
      total += len
      val e = counts.get(s)
      if (e == null) counts.put(s, Array(1L, len)) else e(0) += 1L
      i += 1
    }
    if (total <= 0L) return 0.0
    var chars = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e(0) >= 2L) chars += e(0) * e(1)
    }
    chars.toDouble / total.toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): DupSegmentCharFraction =
    copy(child = newChild)
}

object DupSegmentCharFraction {
  def apply(text: Column, sep: String): Column =
    ExpressionUtils.column(
      DupSegmentCharFraction(ExpressionUtils.expression(text), sep))
}

/** All of Gopher's n-gram repetition measurements in ONE token pass —
  * the fused form of [[NgramCharFraction]]: emits
  * `array<double>` of `topNs.map(top-fraction) ++ dupNs.map(
  * dup-fraction)`, each element exactly equal to the corresponding
  * single-width expression (same hashes, same cap, same zero cases).
  *
  * Why: the repetition gate needs 9 widths (top 2..4, dup 5..10);
  * nine independent expressions each re-split the text and re-hash
  * every word — ~9× the per-row CPU of this fused pass on what is
  * designed to be a scan-speed ingest gate. Here the split, per-word
  * FNV hashing, and length accounting happen once; only the per-width
  * gram-counting loop (inherent work) repeats, reusing one cleared
  * hash map. */
case class NgramCharFractions(child: Expression, topNs: Seq[Int],
                              dupNs: Seq[Int])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require((topNs ++ dupNs).forall(_ >= 1), "n-gram widths must be >= 1")
  require(topNs.nonEmpty || dupNs.nonEmpty, "at least one width")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "ngram_char_fractions"

  private val space = UTF8String.fromString(" ")
  private val widths: Array[(Int, Boolean)] =
    (topNs.map((_, false)) ++ dupNs.map((_, true))).toArray

  import graft.functions.Hashing.{fnv1a, mix}

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val wordHash = new Array[Long](words.length)
    val wordLen = new Array[Long](words.length)
    var total = (words.length - 1).toLong
    var i = 0
    while (i < words.length) {
      wordHash(i) = fnv1a(words(i).getBytes)
      wordLen(i) = words(i).numChars().toLong
      total += wordLen(i)
      i += 1
    }
    val out = new Array[Any](widths.length)
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var k = 0
    while (k < widths.length) {
      val (n, dup) = widths(k)
      val m = words.length - n + 1
      if (m <= 0 || total <= 0L) out(k) = 0.0
      else {
        counts.clear()
        i = 0
        while (i < m) {
          var h = 42L
          var len = (n - 1).toLong
          var j = 0
          while (j < n) {
            h = mix(h, wordHash(i + j))
            len += wordLen(i + j)
            j += 1
          }
          val e = counts.get(h)
          if (e == null) counts.put(h, Array(1L, len)) else e(0) += 1L
          i += 1
        }
        var chars = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (dup) { if (e(0) >= 2L) chars += e(0) * e(1) }
          else chars = math.max(chars, e(0) * e(1))
        }
        out(k) = math.min(chars.toDouble / total.toDouble, 1.0)
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramCharFractions =
    copy(child = newChild)
}

object NgramCharFractions {
  def apply(text: Column, topNs: Seq[Int], dupNs: Seq[Int]): Column =
    ExpressionUtils.column(
      NgramCharFractions(ExpressionUtils.expression(text), topNs, dupNs))
}
