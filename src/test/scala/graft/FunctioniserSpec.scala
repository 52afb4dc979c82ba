package graft

import org.apache.spark.sql.{AnalysisException, Column, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference behavior suite
  * (`/root/reference/test/test_functioniser.py`, 32 tests) plus the §8
  * probe matrix from SURVEY.md as regression tests. */
class FunctioniserSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Row array fields come back as mutable.ArraySeq; normalize to Seq. */
  private def seqAs[T](r: Row, field: String): Seq[T] =
    r.getSeq[T](r.fieldIndex(field))

  // ---- fixtures (FIXTURES.md F1/F2/F3/F5/F6) ----

  private def rootData = jsonDf(
    """[{"id": 1, "firstname": "Christopher", "lastname": "Lee", "unchanged": "yes", "rootarray": [1, 2]},
       |{"id": 2, "firstname": "Miriam", "lastname": "Margolyes", "unchanged": "yes", "rootarray": [10, 20, 30]}]"""
      .stripMargin)

  private def nestedData = jsonDf(
    """[{"pets": {"has_pets": "yes",
       |          "pet_names": ["Fido", "Spot"],
       |          "pet_details": [{"some": [{"contrived": {"array": [{"setup": "   SILLINESS  "}]}}]}]},
       | "hoomans": [{"names": ["Jack", "Jill"],
       |              "address": {"house": 23, "street": "A Nice Street"}}]}]""".stripMargin)

  private def mechanicsData = jsonDf(
    """[{"id": 1,
       | "nested": [{"schmested": {"foo": 1, "bar": 2, "baz": [3]}, "beep": "boop"}],
       | "something": "else"}]""".stripMargin)

  private def abcData = jsonDf("""[{"a": "aA", "b": "bB", "c": "  cC  "}]""")

  // ---- TestRootColumns (test_functioniser.py:11-118) ----

  test("simple function: increase id") {
    val r = new Functioniser().add("id", (c: Column) => c + 1)
      .apply(rootData).orderBy("id").collect()
    assert(r.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L))
    assert(r.map(_.getAs[String]("unchanged")).toSeq == Seq("yes", "yes"))
  }

  test("simple function: uppercase firstname") {
    val r = new Functioniser().add("firstname", upper _)
      .apply(rootData).orderBy("id").collect()
    assert(r.map(_.getAs[String]("firstname")).toSeq == Seq("CHRISTOPHER", "MIRIAM"))
    assert(r.map(_.getAs[String]("unchanged")).toSeq == Seq("yes", "yes"))
  }

  test("simple function: column literal lastname") {
    val r = new Functioniser().add("lastname", (_: Column) => lit("foo"))
      .apply(rootData).orderBy("id").collect()
    assert(r.map(_.getAs[String]("lastname")).toSeq == Seq("foo", "foo"))
  }

  test("constant Column config replaces values") {
    val r = new Functioniser().add("id", lit("foo"))
      .apply(rootData).collect()
    assert(r.map(_.getAs[String]("id")).toSeq == Seq("foo", "foo"))
  }

  test("multiple fields in one apply") {
    val r = new Functioniser()
      .add("id", (c: Column) => c + 1)
      .add("firstname", upper _)
      .add("lastname", lower _)
      .apply(rootData).orderBy("id").collect()
    assert(r.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L))
    assert(r.map(_.getAs[String]("firstname")).toSeq == Seq("CHRISTOPHER", "MIRIAM"))
    assert(r.map(_.getAs[String]("lastname")).toSeq == Seq("lee", "margolyes"))
    assert(r.map(_.getAs[String]("unchanged")).toSeq == Seq("yes", "yes"))
  }

  test("create new root fields, appended sorted after existing") {
    val df = rootData
    val result = new Functioniser()
      .add("newroot1", lit("yippee!"))
      .add("newroot2", (_: Column) =>
        concat(col("firstname"), lit(" "), col("lastname")))
      .apply(df).orderBy("id")
    assert(result.columns.toSeq == df.columns.toSeq ++ Seq("newroot1", "newroot2"))
    val rows = result.select("newroot1", "newroot2").collect()
    assert(rows(0) == Row("yippee!", "Christopher Lee"))
    assert(rows(1) == Row("yippee!", "Miriam Margolyes"))
  }

  test("root array function applies element-wise") {
    val r = new Functioniser().add("rootarray", (c: Column) => c + 1)
      .apply(rootData).orderBy("id").collect()
    assert(r.map(seqAs[Long](_, "rootarray")).toSeq ==
      Seq(Seq(2L, 3L), Seq(11L, 21L, 31L)))
  }

  // ---- TestNested (test_functioniser.py:121-221) ----

  test("nested struct leaf") {
    val r = new Functioniser().add("pets.has_pets", upper _)
      .apply(nestedData).collect()
    assert(r(0).getAs[Row]("pets").getAs[String]("has_pets") == "YES")
  }

  test("array of strings inside struct") {
    val r = new Functioniser().add("pets.pet_names", upper _)
      .apply(nestedData).collect()
    assert(seqAs[String](r(0).getAs[Row]("pets"), "pet_names") ==
      Seq("FIDO", "SPOT"))
  }

  test("very nested array path with composition (lower then trim)") {
    val r = new Functioniser()
      .add("pets.pet_details.some.contrived.array.setup", lower _)
      .add("pets.pet_details.some.contrived.array.setup", (c: Column) => trim(c))
      .apply(nestedData).collect()
    val pets = r(0).getAs[Row]("pets")
    val contrived = seqAs[Row](seqAs[Row](pets, "pet_details")(0), "some")(0)
      .getAs[Row]("contrived")
    val setup = seqAs[Row](contrived, "array")(0).getAs[String]("setup")
    assert(setup == "silliness")
  }

  test("conditional per-element when/otherwise in root array of structs") {
    val r = new Functioniser()
      .add("hoomans.names",
        (v: Column) => when(v === "Jack", upper(v)).otherwise(v))
      .apply(nestedData).collect()
    assert(seqAs[String](seqAs[Row](r(0), "hoomans")(0), "names") ==
      Seq("JACK", "Jill"))
  }

  test("create new nested members incl. inside arrays") {
    val df = nestedData
    val result = new Functioniser()
      .add("newroot1", lit("yippee!"))
      .add("pets.pet_details.foo", lit("bar!"))
      .add("hoomans.address.city", lit("baz!"))
      .apply(df)
    assert(result.columns.length == df.columns.length + 1)
    val row = result.collect()(0)
    assert(row.getAs[String]("newroot1") == "yippee!")
    assert(seqAs[Row](row.getAs[Row]("pets"), "pet_details")(0)
      .getAs[String]("foo") == "bar!")
    val address = seqAs[Row](row, "hoomans")(0).getAs[Row]("address")
    assert(address.getAs[Long]("house") == 23L)
    assert(address.getAs[String]("street") == "A Nice Street")
    assert(address.getAs[String]("city") == "baz!")
  }

  // ---- TestMechanics (test_functioniser.py:224-318) ----

  test("plan walker invoked once per root with no configs") {
    val df = mechanicsData
    val runner = new Functioniser()
    runner.apply(df)
    assert(runner.planWalkCount == df.columns.length)
  }

  for (field <- Seq("nested.schmested.foo", "nested.schmested.baz", "nested.beep")) {
    test(s"plan walker invoked once per path segment: $field") {
      val df = mechanicsData.select("nested")
      val runner = new Functioniser().add(field, lit("x"))
      runner.apply(df)
      assert(runner.planWalkCount == field.split('.').length)
    }
  }

  test("config paths are case-insensitive") {
    val r = new Functioniser()
      .add("iD", lit("x")).add("nested.schmested.BAZ", lit("y"))
      .apply(mechanicsData).collect()
    assert(r(0).getAs[String]("id") == "x")
    assert(seqAs[String](seqAs[Row](r(0), "nested")(0)
      .getAs[Row]("schmested"), "baz") == Seq("y"))
  }

  for (field <- Seq("rooty", "nested.schmested.f00b4r")) {
    test(s"warning emitted for absent field: $field") {
      val runner = new Functioniser()
        .add("iD", lit("x")).add(field, lit("ain't there, buddy"))
      val result = runner.apply(mechanicsData)
      assert(runner.recordedWarnings.exists(_.contains(field)))
      assert(!runner.recordedWarnings.exists(_.contains("id not found")))
      assert(result.collect()(0).getAs[String]("id") == "x")
    }
  }

  test("error for absent parent struct") {
    val runner = new Functioniser()
      .add("nested.schmested.a.b.c", lit("ain't there, buddy"))
    val e = intercept[IllegalArgumentException](runner.apply(mechanicsData))
    assert(e.getMessage.contains(
      "Parent struct for nested.schmested.a.b.c not found"))
  }

  // ---- TestStringConfigs (test_functioniser.py:321-376) ----

  test("builtin registry contains the expected names") {
    assert(Functioniser.builtinFunctionNames.contains("lower"))
    assert(Functioniser.builtinFunctionNames.contains("upper"))
    assert(Functioniser.builtinFunctionNames.contains("trim"))
  }

  test("builtins usable by name") {
    val r = new Functioniser()
      .add("a", "lower").add("b", "upper").add("c", "trim")
      .apply(abcData).collect()
    assert(r(0) == Row("aa", "BB", "cC"))
  }

  test("custom function by name") {
    val runner = new Functioniser()
    runner.registerFunction("foo", (_: Column) => lit("bar"))
    val r = runner.add("a", "foo").apply(jsonDf("""[{"a": "a"}]""")).collect()
    assert(r(0).getAs[String]("a") == "bar")
  }

  test("custom registration overrides builtin") {
    val runner = new Functioniser()
    runner.registerFunction("trim", (_: Column) => lit("TRIMMED"))
    val r = runner.add("a", "trim").apply(jsonDf("""[{"a": "a"}]""")).collect()
    assert(r(0).getAs[String]("a") == "TRIMMED")
  }

  test("unknown function name errors at add time") {
    val e = intercept[IllegalArgumentException](new Functioniser().add("a", "foo"))
    assert(e.getMessage.contains("foo"))
  }

  // ---- TestConfigDriven (test_functioniser.py:379-397) ----

  test("map-driven config loop") {
    val config = Seq("a" -> "upper", "b" -> "lower", "c" -> "trim")
    val runner = new Functioniser()
    config.foreach { case (f, fn) => runner.add(f, fn) }
    val r = runner.apply(jsonDf("""[{"a": "aA", "b": "bB", "c": " cC "}]""")).collect()
    assert(r(0).getAs[String]("a") == "AA")
    assert(r(0).getAs[String]("b") == "bb")
    assert(r(0).getAs[String]("c") == "cC")
  }

  // ---- TestReadme (test_functioniser.py:400-471) ----

  test("readme setup example (cross-field function)") {
    val df = jsonDf(
      """[{"some_root": "a/b/c",
         | "another_root": {"nested_field": "baz", "another_nested_field": "abbage"}}]"""
        .stripMargin)
    val r = new Functioniser()
      .add("some_root", "upper")
      .add("another_root.nested_field", lit("foo"))
      .add("another_root.another_nested_field",
        (c: Column) => concat(split_part(col("some_root"), lit("/"), lit(3)), c))
      .apply(df).collect()
    assert(r(0).getAs[String]("some_root") == "A/B/C")
    val another = r(0).getAs[Row]("another_root")
    assert(another.getAs[String]("nested_field") == "foo")
    assert(another.getAs[String]("another_nested_field") == "cabbage")
  }

  test("readme custom example (config map, registered fns, array constant)") {
    val df = jsonDf(
      """[{"my_root": {"field_a": "  trim me  ", "field_b": "123456", "field_c": ["", "x"]}}]""")
    val config = Seq(
      "my_root.field_a" -> "trim",
      "my_root.field_b" -> "substr_first_four",
      "my_root.field_c" -> "set_to_foo")
    val runner = new Functioniser()
    runner.registerFunction("substr_first_four",
      (c: Column) => substring(c, 0, 4))
    runner.registerFunction("set_to_foo", lit("foo"))
    config.foreach { case (f, fn) => runner.add(f, fn) }
    val r = runner.apply(df).collect()
    assert(r(0).getAs[Row]("my_root") == Row("trim me", "1234", Seq("foo", "foo")))
  }

  // ---- SURVEY.md §8 probe matrix (regression) ----

  test("probe: whole-struct function via prefix path") {
    val r = new Functioniser()
      .add("pets", (c: Column) => c.withField("has_pets", lit("no")))
      .apply(nestedData).collect()
    val pets = r(0).getAs[Row]("pets")
    assert(pets.getAs[String]("has_pets") == "no")
    assert(seqAs[String](pets, "pet_names") == Seq("Fido", "Spot"))
  }

  test("probe: array-of-structs prefix path gives function each element") {
    val r = new Functioniser()
      .add("hoomans", (el: Column) =>
        el.withField("names", array(lit("gone"))))
      .apply(nestedData).collect()
    assert(seqAs[String](seqAs[Row](r(0), "hoomans")(0), "names") ==
      Seq("gone"))
  }

  test("probe: composition order is non-commutative (g2 after g1)") {
    val r = new Functioniser()
      .add("a", (c: Column) => concat(c, lit("X")))
      .add("a", (c: Column) => concat(c, lit("Y")))
      .apply(jsonDf("""[{"a": "ab"}]""")).collect()
    assert(r(0).getAs[String]("a") == "abXY")
  }

  test("probe: member function applies before parent's own function") {
    val r = new Functioniser()
      .add("a.b", upper _)
      .add("a", (c: Column) => concat(c.getField("b"), lit("!")))
      .apply(jsonDf("""[{"a": {"b": "hi"}}]""")).collect()
    assert(r(0).getAs[String]("a") == "HI!")
  }

  test("probe: new root whose function reads its input fails analysis") {
    val runner = new Functioniser().add("newroot", upper _)
    intercept[AnalysisException](runner.apply(rootData).collect())
  }

  test("probe: array-level op on array leaf is inexpressible (element-wise only)") {
    val runner = new Functioniser().add("rootarray", (c: Column) => size(c))
    intercept[AnalysisException](runner.apply(rootData).collect())
  }

  test("divergence: doubly-nested array a[][] works (reference fails)") {
    val r = new Functioniser().add("aa", (c: Column) => c + 1)
      .apply(jsonDf("""[{"aa": [[1, 2], [3]]}]""")).collect()
    assert(seqAs[scala.collection.Seq[Long]](r(0), "aa").map(_.toSeq) ==
      Seq(Seq(2L, 3L), Seq(4L)))
  }

  test("two configured members of one array-of-structs rewrite in one pass") {
    val df = jsonDf("""[{"arr": [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]}]""")
    val result = new Functioniser()
      .add("arr.x", (c: Column) => c + 1)
      .add("arr.y", upper _)
      .apply(df)
    val rows = seqAs[Row](result.collect()(0), "arr")
    assert(rows.map(r => (r.getAs[Long]("x"), r.getAs[String]("y"))) ==
      Seq((2L, "A"), (3L, "B")))
    // divergence §4-4: merged into a single transform (reference emits two)
    val optimized = result.queryExecution.optimizedPlan.toString
    assert("transform\\(".r.findAllIn(optimized.toLowerCase).length == 1)
  }

  test("divergence: MapType passes through and is targetable as a leaf") {
    val df = spark.sql("select map('a', 1) as m, 'z' as s")
    val passthrough = new Functioniser().add("s", upper _).apply(df).collect()
    assert(passthrough(0).getAs[Map[String, Int]]("m") == Map("a" -> 1))
    val mapped = new Functioniser()
      .add("m", (c: Column) => map_concat(c, map(lit("b"), lit(2))))
      .apply(df).collect()
    assert(mapped(0).getAs[Map[String, Int]]("m") == Map("a" -> 1, "b" -> 2))
  }

  test("divergence: a {} path rewrites map VALUES element-wise, keys untouched") {
    val df = spark.sql("select map('a', 'x', 'b', 'y') as m, 'z' as s")
    val out = new Functioniser().add("m{}", "upper").apply(df).collect()
    assert(out(0).getAs[Map[String, String]]("m") ==
      Map("a" -> "X", "b" -> "Y"))
    assert(out(0).getAs[String]("s") == "z") // pass-through untouched
  }

  test("divergence: a path into struct-valued map values rewrites one field per value") {
    val df = spark.sql(
      "select map('k1', named_struct('x', 'ab', 'y', 7)," +
        "          'k2', named_struct('x', 'cd', 'y', 9)) as m")
    val out = new Functioniser()
      .add("m{}.x", "upper")
      .add("m{}.y", (c: Column) => c + 1)
      .apply(df).collect()
    val m = out(0).getMap[String, org.apache.spark.sql.Row](0)
    assert(m("k1").getAs[String]("x") == "AB" && m("k1").getAs[Int]("y") == 8)
    assert(m("k2").getAs[String]("x") == "CD" && m("k2").getAs[Int]("y") == 10)
  }

  test("divergence: whole-map and {}-value paths on one column are rejected, not merged") {
    val df = spark.sql("select map('a', 1) as m")
    val e = intercept[IllegalArgumentException] {
      new Functioniser()
        .add("m", (c: Column) => map_concat(c, map(lit("b"), lit(2))))
        .add("m{}", (c: Column) => c * 10)
        .apply(df)
    }
    assert(e.getMessage.contains("Conflicting container targeting"))
  }

  test("divergence: nested-map {} tokens resolve at the exact level") {
    val df = spark.sql(
      "select map('k', named_struct('inner', map('a', 2))) as m")
    val out = new Functioniser()
      .add("m{}.inner{}", (c: Column) => c * 3)
      .apply(df).collect()
    val inner = out(0).getMap[String, org.apache.spark.sql.Row](0)("k")
      .getMap[String, Int](0)
    assert(inner == Map("a" -> 6))
  }

  test("divergence: an unmatched {} path errors instead of becoming a broken new root") {
    val df = spark.sql("select 1 as a")
    val e = intercept[IllegalArgumentException] {
      new Functioniser().add("x{}", (c: Column) => c).apply(df)
    }
    assert(e.getMessage.contains("matches no schema path"))
  }

  test("divergence: a bare dotted path does NOT silently target map values") {
    val df = spark.sql("select map('k', named_struct('x', 'ab')) as ms")
    val f = new Functioniser().add("ms.x", "upper")
    f.flatSchema = SchemaPaths.flattenSchema(df.schema)
    // no {} token → must not resolve into the map's value structs
    assert(f.getFieldNameWithTokens("ms.x").isEmpty)
    // full apply goes down the reference's unknown-leaf path (warn +
    // create-on-parent, which then fails analysis on the map parent) —
    // never a silent value rewrite
    val g = new Functioniser().add("ms.x", "upper")
    intercept[Exception](g.apply(df).collect())
    assert(g.recordedWarnings.exists(_.contains("ms.x not found")))
  }

  test("divergence: map inside an array rewrites per element per value") {
    val df = spark.sql(
      "select array(map('a', 'p'), map('b', 'q')) as am")
    val out = new Functioniser().add("am{}", "upper").apply(df).collect()
    val seq = out(0).getSeq[Map[String, String]](0)
    assert(seq == Seq(Map("a" -> "P"), Map("b" -> "Q")))
  }

  test("single Project: whole rewrite compiles to one narrow select") {
    val result = new Functioniser()
      .add("pets.has_pets", upper _)
      .add("hoomans.address.house", (c: Column) => c + 1)
      .apply(nestedData)
    val optimized = result.queryExecution.optimizedPlan
    // exactly one Project over the scan, no other operators
    assert(optimized.getClass.getSimpleName == "Project")
    assert(optimized.children.size == 1)
  }

  test("reset clears configs but keeps custom registry") {
    val runner = new Functioniser()
    runner.registerFunction("foo", (_: Column) => lit("bar"))
    runner.add("a", "foo")
    runner.reset()
    val r = runner.add("a", "foo").apply(jsonDf("""[{"a": "x"}]""")).collect()
    assert(r(0).getAs[String]("a") == "bar")
  }
}
