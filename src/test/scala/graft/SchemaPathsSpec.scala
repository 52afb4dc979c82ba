package graft

import org.scalatest.funsuite.AnyFunSuite

/** Port of `/root/reference/test/test_utils.py` (+ array-of-array probe). */
class SchemaPathsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("flatten_schema emits []-tokenised dotted paths in schema order") {
    val df = jsonDf(
      """[{"id": 1, "name": "John",
         | "address": {"street": "123 Main St", "city": "New York"},
         | "pets": [{"name": "dog",
         |           "face": {"eyes": [{"which": "left", "colour": "brown"},
         |                             {"which": "right", "colour": "orange"}],
         |                    "nose": "yes"}}]}]""".stripMargin)
    assert(SchemaPaths.flattenSchema(df.schema) == Seq(
      "address.city", "address.street", "id", "name",
      "pets[].face.eyes[].colour", "pets[].face.eyes[].which",
      "pets[].face.nose", "pets[].name"))
  }

  test("array of primitives flattens to path[]") {
    val df = jsonDf("""[{"a": [1, 2], "b": "x"}]""")
    assert(SchemaPaths.flattenSchema(df.schema) == Seq("a[]", "b"))
  }

  test("array of arrays flattens to path[][]") {
    val df = jsonDf("""[{"aa": [[1], [2, 3]]}]""")
    assert(SchemaPaths.flattenSchema(df.schema) == Seq("aa[][]"))
  }

  test("maps flatten to a whole-column leaf plus {}-token value paths") {
    val df = spark.sql(
      """select map('a', 1) as m,
        |  map('k', named_struct('x', 'v', 'y', 2)) as ms,
        |  array(map('a', 1)) as am""".stripMargin)
    assert(SchemaPaths.flattenSchema(df.schema) == Seq(
      "m", "m{}",
      "ms", "ms{}.x", "ms{}.y",
      "am[]", "am[]{}"))
  }

  test("limit_depth with int depth") {
    assert(SchemaPaths.limitDepth("a.b.c.d", 2) == "a.b")
    assert(SchemaPaths.limitDepth("a.b.c.d", 10) == "a.b.c.d")
  }

  test("limit_depth default drops the final segment") {
    assert(SchemaPaths.limitDepth("a.b.c.d") == "a.b.c")
    assert(SchemaPaths.limitDepth("a") == "")
  }

  test("limit_depth with string reference keeps array tokens") {
    assert(SchemaPaths.limitDepth("pets[].face.eyes[].colour", "pets.face") ==
      "pets[].face")
    assert(SchemaPaths.limitDepth("hoomans[].address.house", "hoomans") ==
      "hoomans[]")
  }
}
