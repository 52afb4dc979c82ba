package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-prefix-first subword segmentation of one word against
  * a fixed piece inventory — WordPiece inference (Devlin et al. 2019,
  * BERT §A; continuation markers omitted — pieces match raw
  * substrings): at each position take the LONGEST vocabulary piece that
  * prefixes the remainder; if not even one character matches, emit
  * `[UNK]` and advance one character.
  *
  * The inventory rides INSIDE the expression (the codebook/hyperplane
  * literal discipline): a vocabulary of topN pieces is driver-bounded
  * by construction, so tokenization is a scan-speed narrow projection —
  * no join, no broadcast variable, nothing corpus-sized. Lookups hit a
  * pre-built hash set once per candidate length (≤ maxLen per emitted
  * piece). Greedy longest-match is deterministic — no tie is possible
  * at a fixed position — so a DuckDB recursive CTE replicates the
  * segmentation exactly.
  *
  * CodegenFallback: all per-word work happens inside one compiled
  * method (the [[HashedNGramShingles]] rationale); position arithmetic
  * is UTF-16-unit based, which coincides with character semantics on
  * the BMP text this corpus carries. */
case class GreedyPieces(child: Expression, pieces: IndexedSeq[String],
                        maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  require(maxLen >= 1, "maxLen must be >= 1")
  require(pieces.nonEmpty, "piece inventory must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "greedy_pieces"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }

  private val unk = UTF8String.fromString("[UNK]")

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < word.length) {
      var len = math.min(maxLen, word.length - pos)
      var matched: String = null
      while (len >= 1 && matched == null) {
        val cand = word.substring(pos, pos + len)
        if (set.contains(cand)) matched = cand
        len -= 1
      }
      if (matched == null) {
        out += unk
        pos += 1
      } else {
        out += UTF8String.fromString(matched)
        pos += matched.length
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GreedyPieces = copy(child = newChild)
}

object GreedyPieces {
  def apply(word: Column, pieces: Seq[String], maxLen: Int): Column =
    ExpressionUtils.column(
      GreedyPieces(ExpressionUtils.expression(word),
        pieces.toIndexedSeq, maxLen))
}
