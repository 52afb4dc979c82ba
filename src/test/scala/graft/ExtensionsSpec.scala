package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions + config-map API. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes native expressions to SQL") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val dot = s.sql(
      "select array_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .first().getDouble(0)
    assert(dot == 11.0)
    val sh = s.sql(
      "select size(hashed_ngram_shingles('a b c d', 3))").first().getInt(0)
    assert(sh == 2)
    // float arrays implicitly cast
    val dotF = s.sql(
      "select array_dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f))")
      .first().getDouble(0)
    assert(dotF == 11.0)
    val e = intercept[Exception](
      s.sql("select hashed_ngram_shingles('a b c', 1 + 2)").collect())
    assert(e.getMessage.contains("integer literal") || e.getCause != null)
    // scalar signature == aggregate sketch, straight from SQL
    val sig = s.sql(
      """select minhash_signature(hashed_ngram_shingles('a b c d e', 3), 8)
        |     = minhash_sketch(hashed_ngram_shingles('a b c d e', 3), 8)
        |""".stripMargin).first().getBoolean(0)
    assert(sig)
    // int8 kernel from SQL: exact integer dot over tinyint arrays
    val i8 = s.sql(
      """select int8_dot_product(array(cast(3 as tinyint), cast(-2 as tinyint)),
        |       array(cast(10 as tinyint), cast(5 as tinyint)))""".stripMargin)
      .first().getLong(0)
    assert(i8 == 20L)
    // hyperplane_sign_buckets: the SQL form takes (vec, dim, numPlanes,
    // tables, seed) literals and generates the SAME deterministic plane
    // matrix as the Column API — buckets must be byte-identical
    import org.apache.spark.sql.functions.col
    val fromSql = s.sql(
      "select hyperplane_sign_buckets(array(0.5d, -1.5d, 2.0d), 3, 4, 2, 42)")
      .first().getSeq[Long](0)
    val planes = org.apache.spark.sql.graftext.HyperplaneSignBuckets
      .gaussianPlanes(2 * 4, 3, 42L)
    val fromApi = s.sql("select array(0.5d, -1.5d, 2.0d) as v")
      .select(org.apache.spark.sql.graftext.HyperplaneSignBuckets(
        col("v"), planes, 4, 2))
      .first().getSeq[Long](0)
    assert(fromSql == fromApi && fromSql.length == 2)
    // the seed is a Long in the Column API; a long-typed SQL literal
    // (42L) must be accepted too, not just an int literal
    val fromSqlLong = s.sql(
      "select hyperplane_sign_buckets(array(0.5d, -1.5d, 2.0d), 3, 4, 2, 42L)")
      .first().getSeq[Long](0)
    assert(fromSqlLong == fromApi)
    // a dim-mismatched vector still fails loudly through the SQL surface
    val e2 = intercept[Exception](
      s.sql("select hyperplane_sign_buckets(array(1.0d), 3, 4, 2, 42)")
        .collect())
    assert(e2.getMessage.contains("planes were built for dim") ||
      (e2.getCause != null &&
        e2.getCause.getMessage.contains("planes were built for dim")))
    // malformed literals are rejected at analysis with a NAMED error,
    // not per-row arithmetic exceptions
    val e3 = intercept[Exception](
      s.sql("select hyperplane_sign_buckets(array(1.0d), 1, 0, 2, 42)"))
    assert(e3.getMessage.contains("numPlanes must be in [1, 63]") ||
      (e3.getCause != null &&
        e3.getCause.getMessage.contains("numPlanes must be in [1, 63]")))
  }

  test("fromConfig builds a runner from (path, functionName) pairs") {
    import SparkTestSession._
    val r = Functioniser.fromConfig(Seq(
        "a" -> "upper", "b" -> "trim"))
      .apply(jsonDf("""[{"a": "x", "b": " y "}]""")).collect()
    assert(r(0).getAs[String]("a") == "X")
    assert(r(0).getAs[String]("b") == "y")
  }
}
