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

  test("matrix-constant kernels work from SQL via foldable array literals") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    // nearest_centroid: argmax of dot - |c|^2/2, ties to the larger cell
    val cell = s.sql(
      """select nearest_centroid(array(1.0d, 0.0d),
        |  array(array(1.0d, 0.0d), array(0.0d, 1.0d)))""".stripMargin)
      .first().getInt(0)
    assert(cell == 0)
    // nearest_centroids_topk: ordered probe list (score desc, cell desc)
    val probes = s.sql(
      """select nearest_centroids_topk(array(1.0d, 0.2d),
        |  array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 2)""".stripMargin)
      .first().getSeq[Int](0)
    assert(probes == Seq(0, 1))
    // pq_adc_cosine: m=2 subspaces, ksub=2, dsub=1 — codes (0, 1)
    // reconstruct [1.0, 4.0]; query [1.0, 4.0] => cosine 1.0
    val adc = s.sql(
      """select pq_adc_cosine(array(1.0d, 4.0d), array(0, 1),
        |  array(array(array(1.0d), array(2.0d)),
        |        array(array(3.0d), array(4.0d))))""".stripMargin)
      .first().getDouble(0)
    assert(math.abs(adc - 1.0) < 1e-12)
    // shifted form: reconstruction = shift + codebook entries
    val shifted = s.sql(
      """select pq_adc_cosine_shifted(array(2.0d, 6.0d), array(0, 1),
        |  array(1.0d, 2.0d),
        |  array(array(array(1.0d), array(2.0d)),
        |        array(array(3.0d), array(4.0d))))""".stripMargin)
      .first().getDouble(0)
    assert(math.abs(shifted - 1.0) < 1e-12) // [1+1, 2+4] ∥ [2, 6]
    // non-foldable or non-double matrices are rejected with named errors
    val e = intercept[Exception](s.sql(
      "select nearest_centroid(array(1.0d), array(array(1)))"))
    assert(e.getMessage.contains("array<array<double>>") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("array<array<double>>")))
  }

  test("greedy_pieces segments from SQL with a literal inventory") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val out = s.sql(
      """select greedy_pieces('unbelievable',
        |  array('un', 'believ', 'able', 'a'), 8) as p""".stripMargin)
      .first().getSeq[String](0)
    assert(out == Seq("un", "believ", "able"))
    // non-foldable or mistyped inventories are rejected loudly
    intercept[Exception] {
      s.sql("select greedy_pieces('x', array(1, 2), 8)").collect()
    }
  }

  test("heavy_hitters_sketch aggregates from SQL with literal capacity") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val rows = s.sql(
      """select inline(hh) from (
        |  select heavy_hitters_sketch(split(t, ' '), 8) as hh
        |  from values ('a b a'), ('b c') as v(t))""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // capacity 8 >= 3 distinct: exact counts, (count desc, term asc) order
    assert(rows == Seq(("a", 2L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
    // the builder returns a raw AggregateFunction, so SQL aggregate
    // modifiers like FILTER still attach
    val filtered = s.sql(
      """select inline(heavy_hitters_sketch(split(t, ' '), 8)
        |  filter (where t != 'b c'))
        |from values ('a b a'), ('b c') as v(t)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(filtered == Seq(("a", 2L), ("b", 1L)))
    val e = intercept[Exception](s.sql(
      "select heavy_hitters_sketch(split('a', ' '), 1 + 1)").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("heavy_hitters_sketch: capacity")))
  }

  test("kmv_distinct_sketch aggregates from SQL with literal k") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val r = s.sql(
      """select kmv.* from (
        |  select kmv_distinct_sketch(split(t, ' '), 4) as kmv
        |  from values ('a b a'), ('b c') as v(t))""".stripMargin).first()
    // 3 distinct < k = 4: exact regime
    assert((r.getDouble(0), r.getInt(1), r.getBoolean(2)) == ((3.0, 3, true)))
    // raw-AggregateFunction builder: FILTER attaches
    val f = s.sql(
      """select kmv.kept from (
        |  select kmv_distinct_sketch(split(t, ' '), 4)
        |    filter (where t != 'b c') as kmv
        |  from values ('a b a'), ('b c') as v(t))""".stripMargin)
      .first().getInt(0)
    assert(f == 2)
    val e = intercept[Exception](s.sql(
      "select kmv_distinct_sketch(split('a', ' '), 1)").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("kmv_distinct_sketch: k")))
  }

  test("quantile_sketch aggregates from SQL with literal eps and quantiles") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val r = s.sql(
      """select quantile_sketch(CAST(v AS DOUBLE), 0.0, 0.0, 0.5, 1.0)
        |from values (1), (2), (3), (4), (5) as t(v)""".stripMargin)
      .first().getSeq[Double](0)
    // exact regime, ranks 1 + floor(q*4): min, median, max
    assert(r == Seq(1.0, 3.0, 5.0))
    val e = intercept[Exception](s.sql(
      "select quantile_sketch(CAST(v AS DOUBLE), v, 0.5) " +
        "from values (1.0) as t(v)").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("quantile_sketch: eps")))
  }

  test("psl_domain and plan_anchor are SQL-registered: eTLD+1 under " +
       "a literal rule list; the anchor is a non-deterministic " +
       "identity") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val got = s.sql(
      """select psl_domain(h, array('com', 'co.uk', 'io',
        |         'github.io', '*.ck', '!www.ck')) AS d
        |from values ('a.b.co.uk'), ('x.github.io'), ('a.www.ck'),
        |     ('deep.other.ck') as t(h)""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("b.co.uk", "x.github.io", "www.ck",
      "deep.other.ck"))
    // rules must be a literal array (the table itself can't carry it)
    val e = intercept[Exception](s.sql(
      "select psl_domain('a.com', array(h)) from values ('x') t(h)")
      .collect())
    assert(e.getMessage != null)
    // plan_anchor: value-identical, but reports non-deterministic
    val anchored = s.sql("select plan_anchor(1 + 1)")
    assert(anchored.first().getInt(0) == 2)
    assert(!anchored.queryExecution.analyzed.expressions
      .forall(_.deterministic))
  }

  test("deflate_ratio is SQL-registered with an optional level") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val r = s.sql(
      "select deflate_ratio(repeat('ab ', 500)), deflate_ratio('x', 9)")
      .first()
    assert(r.getDouble(0) < 0.05 && r.getDouble(1) > 1.0)
    val e = intercept[Exception](s.sql(
      "select deflate_ratio('x', 0)").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("deflate level")))
  }

  test("jaro_winkler is SQL-registered, pinned to the DuckDB values") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    val r = s.sql(
      """select jaro_winkler('martha', 'marhta'),
        |       jaro_winkler('dixon', 'dicksonx'),
        |       jaro_winkler('abqqqqqq', 'abzzzzzz'),
        |       jaro_winkler('abcxxx', 'bcaxxx'),
        |       jaro_winkler('', ''),
        |       jaro_winkler('abc', 'abc'),
        |       jaro_winkler('ab', 'ba')""".stripMargin).first()
    // classic Winkler example: jaro 17/18, prefix 3
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    // prefix bonus engaged above threshold (DuckDB-probed value)
    assert(math.abs(r.getDouble(1) - 0.8133333333333332) < 1e-12)
    // jaro 0.5 <= boost threshold: NO prefix bonus despite prefix 2
    assert(r.getDouble(2) == 0.5)
    // odd mismatch count: INTEGER transposition halving (t=1, not 1.5)
    assert(math.abs(r.getDouble(3) - 17.0 / 18.0) < 1e-12)
    // DuckDB convention: either side empty scores 0 (even both-empty)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 1.0)
    // window floor(max/2)-1 = 0: adjacent swap finds no matches
    assert(r.getDouble(6) == 0.0)
    val e = intercept[Exception](
      s.sql("select jaro_winkler('x')").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("jaro_winkler expects")))
  }

  test("repetition-measure expressions are SQL-registered") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    // 'a b a b': total 7 chars; 'a b' occurs 2x at len 3 -> 6/7 for
    // both the top-gram and the duplicated-gram form ('b a' is unique)
    val top = s.sql("select top_ngram_char_fraction('a b a b', 2)")
      .first().getDouble(0)
    assert(math.abs(top - 6.0 / 7.0) < 1e-12)
    val dup = s.sql("select dup_ngram_char_fraction('a b a b', 2)")
      .first().getDouble(0)
    assert(math.abs(dup - 6.0 / 7.0) < 1e-12)
    // segments x, yy, x: 4 chars, duplicated 'x' covers 2 -> 0.5
    val seg = s.sql("select dup_segment_char_fraction('x\nyy\nx', '\n')")
      .first().getDouble(0)
    assert(seg == 0.5)
    val e = intercept[Exception](s.sql(
      "select dup_segment_char_fraction('x', concat('a', 'b'))").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("separator")))
  }

  test("bloom sketch and probe are SQL-registered (subquery build side)") {
    val s = SparkTestSession.spark
    org.apache.spark.sql.graftext.GraftExtensions.register(s)
    // keys 1..3 in the filter: 2 must be maybe-present, 99 can be
    // definitely absent at this fpp with near-certainty
    val rows = s.sql(
      """select k, bloom_might_contain(
        |  (select bloom_filter_sketch(v, 100, 0.001d)
        |   from values (1L), (2L), (3L) as b(v)), k)
        |from values (2L), (99L) as q(k)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(rows(2L)) // no false negatives, ever
    assert(!rows(99L)) // 1e-3 fpp on a 2-key probe: absent stays absent
    val e = intercept[Exception](s.sql(
      "select bloom_filter_sketch(1L, 100, 2.0d)").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("fpp")))
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
