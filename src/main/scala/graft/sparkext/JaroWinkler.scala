package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the name-matching scorer of record for
  * entity resolution (census linkage lineage): Jaro's matching-window
  * similarity plus Winkler's common-prefix bonus, rewarding the
  * front-anchored typo patterns human-entered names actually exhibit.
  * Complements [[graft.operators.Dedup.editDistancePairs]]'s
  * Levenshtein: JW is length-normalized (a score, not a count), so one
  * threshold works across short and long names.
  *
  * Exactly the textbook parameterization every engine ships (and
  * DuckDB's `jaro_winkler_similarity` replicates, which is what makes
  * the operator externally oracle-able): match window
  * ⌊max(|a|,|b|)/2⌋−1, prefix bonus p=0.1 capped at 4 chars, applied
  * only above the 0.7 boost threshold. Either string empty scores 0.0
  * (the DuckDB/rapidfuzz convention, including the both-empty corner).
  * Comparison is per UTF-16 unit — identical to code points on the
  * BMP, where name data lives.
  *
  * O(|a|·|b|) bitset-free scan per row with two thread-local marker
  * buffers (allocation-free hot path); codegen emits a single static
  * call inside the surrounding whole-stage span. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftext.JaroWinkler" +
        s".compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  // match-marker scratch, grown geometrically and reused across rows:
  // the hot path must not allocate per comparison
  private val marks = new ThreadLocal[Array[Boolean]] {
    override def initialValue() = new Array[Boolean](128)
  }

  private def scratch(n: Int): Array[Boolean] = {
    var m = marks.get()
    if (m.length < n) {
      m = new Array[Boolean](Integer.highestOneBit(n - 1) << 1)
      marks.set(m)
    } else {
      java.util.Arrays.fill(m, 0, n, false)
    }
    m
  }

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    // two marker stripes in one scratch buffer
    val m = scratch(la + lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m(la + j) && a.charAt(i) == b.charAt(j)) {
          m(i) = true
          m(la + j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (m(i)) {
        while (!m(la + j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = matches.toDouble
    // t/2 is deliberately INTEGER halving: with an odd mismatch count
    // (possible — matched subsequences 'abc' vs 'bca') DuckDB/rapidfuzz
    // truncate, and this expression pins their convention so the
    // operator stays externally oracle-able (probed: jaro('abcxxx',
    // 'bcaxxx') = 17/18, the t=1 value, not the float-t=1.5 one)
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b)))
}
