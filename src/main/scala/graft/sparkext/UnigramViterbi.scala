package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi (max-likelihood) segmentation of one word against a fixed
  * piece → log-probability table — unigram-LM tokenizer inference
  * (Kudo 2018, "Subword Regularization", the SentencePiece default
  * model family; [[GreedyPieces]] is the WordPiece greedy counterpart,
  * this one picks the GLOBALLY best-scoring segmentation).
  *
  * DP over end positions: best(0) = 0; best(j) = max over piece
  * lengths len = 1..min(maxLen, j) of best(j−len) + lp(word[j−len, j)).
  * A single character absent from the table is still a candidate with
  * the constant `unkLp` penalty, emitted as `[UNK]` — so every word
  * segments (the [[GreedyPieces]] UNK convention). Deterministic
  * tie-break, pinned for external replication: candidate lengths scan
  * ASCENDING with a strict `>` comparison, so among equal scores the
  * SHORTEST final piece wins — exactly `ORDER BY score DESC, len ASC
  * LIMIT 1` in SQL. All score arithmetic is plain double addition of
  * the caller's (round-9) log-probs in a fixed order, so the DuckDB
  * oracle's unrolled DP reproduces every score bit-for-bit.
  *
  * The table rides INSIDE the expression (the codebook/hyperplane
  * literal discipline — inventories are topN-bounded by construction):
  * tokenization is a scan-speed narrow projection, no join, nothing
  * corpus-sized. CodegenFallback: per-word work is one compiled
  * method; position arithmetic is UTF-16-unit based (== characters on
  * BMP text). */
case class UnigramViterbi(child: Expression,
                          pieces: IndexedSeq[(String, Double)],
                          maxLen: Int, unkLp: Double)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  require(maxLen >= 1, "maxLen must be >= 1")
  require(pieces.nonEmpty, "piece table must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unigram_viterbi"

  // value type must be the BOXED double: with a primitive type
  // parameter, scala unboxes get()'s null (missing key) to 0.0 and the
  // null check below silently passes for every absent piece
  @transient private lazy val table
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      pieces.length * 2)
    pieces.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }

  private val unk = UTF8String.fromString("[UNK]")

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // chosen piece length; -1 = UNK
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var len = 1
      val lmax = math.min(maxLen, j)
      while (len <= lmax) {
        val i = j - len
        if (best(i) != Double.NegativeInfinity) {
          val lpObj = table.get(word.substring(i, j))
          if (lpObj != null) {
            val sc = best(i) + lpObj.doubleValue()
            if (sc > best(j)) { best(j) = sc; back(j) = len }
          } else if (len == 1) {
            val sc = best(i) + unkLp
            if (sc > best(j)) { best(j) = sc; back(j) = -1 }
          }
        }
        len += 1
      }
      j += 1
    }
    // walk back; with the UNK fallback every position is reachable
    val rev = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = n
    while (p > 0) {
      if (back(p) == -1) { rev += unk; p -= 1 }
      else {
        rev += UTF8String.fromString(word.substring(p - back(p), p))
        p -= back(p)
      }
    }
    new GenericArrayData(rev.reverse.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbi = copy(child = newChild)
}

object UnigramViterbi {
  def apply(word: Column, pieces: Seq[(String, Double)], maxLen: Int,
            unkLp: Double = -100.0): Column =
    ExpressionUtils.column(
      UnigramViterbi(ExpressionUtils.expression(word),
        pieces.toIndexedSeq, maxLen, unkLp))
}
