package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins its subtree to the plan position where
  * it was declared: the expression reports non-deterministic, so
  * Catalyst will not push a predicate containing it below a join or
  * aggregate, reorder it before earlier filters, or constant-fold it
  * away — while evaluation (interpreted and codegen) is the child's,
  * bit for bit, at zero runtime cost.
  *
  * Built for in-plan contracts (`expect_condition`): an assert that
  * rides a filter must fire on exactly the rows that reach its
  * declared step, never on a pre-image superset an optimizer move
  * would expose (e.g. rows an inner join drops). A plain `rand()`
  * anchor is NOT enough on Spark 4.1: the `OptimizeRand` rule folds
  * range-impossible comparisons like `rand() < -1` to a literal,
  * the predicate turns deterministic, and pushdown proceeds — this
  * wrapper has no such rewrite rule by construction. */
case class PlanAnchor(child: Expression)
    extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "plan_anchor"

  override protected def initializeInternal(partitionIndex: Int): Unit =
    // the child may carry its own stateful expressions; initialize
    // them the way InterpretedPredicate would
    child.foreach {
      case n: Nondeterministic => n.initialize(partitionIndex)
      case _ =>
    }

  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PlanAnchor = copy(child = newChild)
}

object PlanAnchor {
  def apply(c: Column): Column =
    ExpressionUtils.column(PlanAnchor(ExpressionUtils.expression(c)))
}
