package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reshape

class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", 10.0), (1L, "a", 5.0), (1L, "b", 2.0),
    (2L, "b", 7.0), (2L, "c", 1.0)
  ).toDF("id", "k", "v")

  test("pivotAgg with pinned values: conditional-aggregate cells, " +
    "absent categories present as null columns") {
    val wide = Reshape.pivotAgg(sample, Seq("id"), "k",
        sum(col("v")), values = Seq("a", "b", "c", "d"))
      .orderBy("id").collect()
    assert(wide.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val r1 = wide(0); val r2 = wide(1)
    assert(r1.getDouble(r1.fieldIndex("a")) == 15.0)
    assert(r1.getDouble(r1.fieldIndex("b")) == 2.0)
    assert(r1.isNullAt(r1.fieldIndex("c")) && r1.isNullAt(r1.fieldIndex("d")))
    assert(r2.isNullAt(r2.fieldIndex("a")))
    assert(r2.getDouble(r2.fieldIndex("b")) == 7.0)
    assert(r2.getDouble(r2.fieldIndex("c")) == 1.0)
  }

  test("pivotAgg discovers values sorted when none are pinned") {
    val wide = Reshape.pivotAgg(sample, Seq("id"), "k", count(lit(1)))
    assert(wide.columns.toSeq == Seq("id", "a", "b", "c"))
  }

  test("pivotAgg refuses unbounded discovered cardinality") {
    val many = spark.range(50)
      .select(lit(1L).as("id"), concat(lit("k"), col("id")).as("k"),
        lit(1.0).as("v"))
    val ex = intercept[IllegalArgumentException] {
      Reshape.pivotAgg(many, Seq("id"), "k", sum(col("v")),
        maxValues = 10)
    }
    assert(ex.getMessage.contains("more than 10 distinct"))
  }

  test("melt emits one narrow row per (row, column) and round-trips " +
    "through pivotAgg") {
    val wide = Seq((1L, 2.0, 3.0), (2L, 5.0, 7.0))
      .toDF("id", "x", "y")
    val long = Reshape.melt(wide, Seq("id"), Seq("x", "y"))
    assert(long.columns.toSeq == Seq("id", "variable", "value"))
    assert(long.count() == 4)
    assert(long.filter(col("id") === 1L && col("variable") === "y")
      .head.getDouble(2) == 3.0)
    // inverse: pivot the long form back to the wide original
    val back = Reshape.pivotAgg(long, Seq("id"), "variable",
        first(col("value")), values = Seq("x", "y"))
      .orderBy("id")
    assert(back.collect().toSeq == wide.orderBy("id").collect().toSeq)
  }

  test("melt keeps null cells as null-valued rows") {
    val wide = Seq((1L, Some(2.0), None: Option[Double]))
      .toDF("id", "x", "y")
    val long = Reshape.melt(wide, Seq("id"), Seq("x", "y"))
    assert(long.count() == 2)
    val yRow = long.filter(col("variable") === "y").head
    assert(yRow.isNullAt(2))
  }
}
