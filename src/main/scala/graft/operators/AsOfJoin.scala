package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the latest right
  * row with the same key and `rightTs <= leftTs` — the standard
  * event-to-snapshot enrichment Spark SQL lacks natively.
  *
  * Built by composition (the preferred extension path — no custom
  * strategy needed): tag and union both sides, then one
  * `last(_, ignoreNulls)` running window per key ordered by (ts, side)
  * carries the most recent right payload forward onto each left row.
  * Cost: ONE shuffle of |L|+|R| rows keyed by the join key — the same
  * lower bound a native as-of physical operator would have; ties on the
  * timestamp admit the right row (side ordering puts right before left).
  */
object AsOfJoin {

  /** @param leftCols  columns of `left` to carry through (besides key/ts)
    * @param rightCols columns of `right` to attach, nulled when no right
    *                  row precedes the left row */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, leftCols: Seq[String],
               rightCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, cols: Seq[String], tag: Int,
             payloadName: String, otherName: String,
             otherSchema: Column): DataFrame =
      df.select(
        col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(tag).as("__side"),
        struct(cols.map(col): _*).as(payloadName),
        otherSchema.as(otherName))

    val l = side(left, leftCols, 1, "__l", "__r",
      lit(null).cast(structTypeOf(right, rightCols)))
    val r = side(right, rightCols, 0, "__r", "__l",
      lit(null).cast(structTypeOf(left, leftCols)))
      .select("__key", "__ts", "__side", "__l", "__r") // align column order

    // right rows sort before left rows at equal ts, so an exactly
    // simultaneous right row is visible to the left row (asof >=); the
    // content-hash tail makes the order TOTAL, so duplicate (key, ts)
    // right rows resolve deterministically across runs/partitionings
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), xxhash64(col("__r")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select("__key", "__ts", "__side", "__l", "__r").union(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col("__key").as(keyCol), col("__ts").as(tsCol)) ++
          leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
