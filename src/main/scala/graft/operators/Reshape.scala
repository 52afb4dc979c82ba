package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping — the feature-matrix surface every downstream
  * trainer expects (one row per entity, one column per signal) and its
  * inverse (tidy long form for per-signal aggregation/plotting).
  *
  * Scale shape, both directions:
  *   - [[pivotAgg]] with a known value list is ONE hash aggregate of
  *     conditional aggregates — exactly the shuffle the plain groupBy
  *     would cost, zero extra passes; the output schema is bounded by
  *     the caller (or by `maxValues`, loudly), never by data skew.
  *     Value discovery, when needed, is one distinct over the single
  *     pivot column (column-pruned scan), not the full table.
  *   - [[melt]] compiles to Catalyst's `Expand`: a zero-shuffle,
  *     zero-join projection that emits one row per (input row ×
  *     melted column). Output is |valueCols|× the rows but each row is
  *     narrow — the transpose never materializes a matrix anywhere.
  */
object Reshape {

  /** One row per `groupCols`, one column per pivot value, cells =
    * `aggExpr` over the matching rows (Spark's null when a (group,
    * value) cell has no rows — same as SQL conditional aggregation).
    *
    * `values`: pass the expected pivot values to keep the plan a
    * single aggregate AND make the output schema independent of the
    * data (a training-feature contract: absent categories still get
    * their column). When empty, values are discovered with one
    * distinct pass, sorted for deterministic column order, and capped
    * at `maxValues` — exceeding the cap throws rather than silently
    * building a 100k-column schema, because a pivot column with
    * unbounded cardinality is a modeling bug, not a bigger-cluster
    * problem. */
  def pivotAgg(df: DataFrame, groupCols: Seq[String], pivotCol: String,
               aggExpr: Column, values: Seq[String] = Nil,
               maxValues: Int = 1000): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(maxValues >= 1, "maxValues must be >= 1")
    val vals: Seq[String] =
      if (values.nonEmpty) values
      else {
        val found = df.select(col(pivotCol).cast("string").as("__v"))
          .na.drop().distinct().limit(maxValues + 1)
          .collect().map(_.getString(0)).toSeq
        if (found.size > maxValues) throw new IllegalArgumentException(
          s"pivotAgg: '$pivotCol' has more than $maxValues distinct " +
            "values — pass an explicit `values` list or raise " +
            "`maxValues` if the cardinality is genuinely intended")
        found.sorted
      }
    df.groupBy(groupCols.map(col): _*)
      .pivot(col(pivotCol).cast("string"), vals)
      .agg(aggExpr)
  }

  /** Long/tidy form of `valueCols`: one output row per (input row,
    * melted column) — (idCols..., varName string, valName). Columns
    * must share a common coercible type (Spark resolves the least
    * common type; mixing string and numeric throws, as it should). */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable",
           valName: String = "value"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)
  }
}
