package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Session extension registering the graft native expressions as SQL
  * functions, so `spark.sql("SELECT array_dot_product(a, b)")` and
  * `hashed_ngram_shingles(text, 3)` work for SQL-surface users.
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("array_dot_product",
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "array_dot_product expects exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }),
    ("hashed_ngram_shingles",
      new ExpressionInfo(classOf[HashedNGramShingles].getName,
        "hashed_ngram_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "hashed_ngram_shingles expects (text, n)")
        HashedNGramShingles(children.head,
          intLiteral(children(1), "hashed_ngram_shingles: n"))
      }),
    ("greedy_pieces",
      new ExpressionInfo(classOf[GreedyPieces].getName, "greedy_pieces"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "greedy_pieces expects (word, pieces, maxLen)")
        children(1).dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) => ()
          case dt => throw new IllegalArgumentException(
            s"greedy_pieces: pieces must be array<string>, got $dt")
        }
        val arr = foldedNonEmptyArray(children(1),
          "greedy_pieces: pieces")
        val pieces = (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString)
        GreedyPieces(children.head, pieces.toIndexedSeq,
          intLiteral(children(2), "greedy_pieces: maxLen"))
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_signature expects (shingles, numHashes)")
        MinHashSignature(children.head,
          intLiteral(children(1), "minhash_signature: numHashes"))
      }),
    ("minhash_sketch",
      new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_sketch expects (shingles, numHashes)")
        MinHashSketch(children.head,
          intLiteral(children(1), "minhash_sketch: numHashes"))
      }),
    ("simhash_sketch",
      new ExpressionInfo(classOf[SimHashSketch].getName, "simhash_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash_sketch expects (shingles)")
        SimHashSketch(children.head)
      }),
    ("heavy_hitters_sketch",
      new ExpressionInfo(classOf[HeavyHittersSketch].getName,
        "heavy_hitters_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "heavy_hitters_sketch expects (tokens, capacity)")
        val capacity =
          intLiteral(children(1), "heavy_hitters_sketch: capacity")
        require(capacity >= 1,
          s"heavy_hitters_sketch: capacity must be >= 1, got $capacity")
        // return the raw AggregateFunction (sibling-sketch pattern):
        // the analyzer wraps it itself, so FILTER/DISTINCT clauses
        // still attach
        HeavyHittersSketch(children.head, capacity)
      }),
    ("kmv_distinct_sketch",
      new ExpressionInfo(classOf[KmvDistinctSketch].getName,
        "kmv_distinct_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "kmv_distinct_sketch expects (tokens, k)")
        val k = intLiteral(children(1), "kmv_distinct_sketch: k")
        require(k >= 2,
          s"kmv_distinct_sketch: k must be >= 2, got $k")
        KmvDistinctSketch(children.head, k)
      }),
    ("deflate_ratio",
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "deflate_ratio expects (text[, level])")
        val level = if (children.size == 2)
          intLiteral(children(1), "deflate_ratio: level") else 6
        DeflateRatio(children.head, level)
      }),
    ("psl_domain",
      new ExpressionInfo(classOf[PslDomain].getName, "psl_domain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "psl_domain expects (host, rules) — rules a literal " +
            "array of publicsuffix.org-format lines")
        val arr = foldedNonEmptyArray(children(1), "psl_domain: rules")
        val lines = (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString)
        PslDomain(children.head, PslRules.parse(lines))
      }),
    ("plan_anchor",
      new ExpressionInfo(classOf[PlanAnchor].getName, "plan_anchor"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "plan_anchor expects (expr)")
        PlanAnchor(children.head)
      }),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "jaro_winkler expects (string, string)")
        JaroWinkler(children.head, children(1))
      }),
    ("quantile_sketch",
      new ExpressionInfo(classOf[QuantileSketch].getName,
        "quantile_sketch"),
      (children: Seq[Expression]) => {
        require(children.size >= 3,
          "quantile_sketch expects (value, eps, q1[, q2, ...])")
        val eps = doubleLiteral(children(1), "quantile_sketch: eps")
        val qs = children.drop(2)
          .map(doubleLiteral(_, "quantile_sketch: quantile"))
        QuantileSketch(children.head, eps, qs)
      }),
    ("bloom_filter_sketch",
      new ExpressionInfo(classOf[BloomKit.type].getName,
        "bloom_filter_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "bloom_filter_sketch expects (key, expectedItems, fpp)")
        val expected =
          longLiteral(children(1), "bloom_filter_sketch: expectedItems")
        require(expected > 0,
          s"bloom_filter_sketch: expectedItems must be > 0, got $expected")
        val fpp = children(2) match {
          case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
          case other => throw new IllegalArgumentException(
            s"bloom_filter_sketch: fpp must be a double literal, got $other")
        }
        require(fpp > 0 && fpp < 1,
          s"bloom_filter_sketch: fpp must be in (0, 1), got $fpp")
        val bits = org.apache.spark.util.sketch.BloomFilter
          .optimalNumOfBits(expected, fpp)
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            new org.apache.spark.sql.catalyst.expressions.XxHash64(
              Seq(children.head)),
            Literal(expected), Literal(bits))
      }),
    ("bloom_might_contain",
      new ExpressionInfo(classOf[BloomKit.type].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "bloom_might_contain expects (bloom, key)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(children(1))))
      }),
    ("top_ngram_char_fraction",
      new ExpressionInfo(classOf[NgramCharFraction].getName,
        "top_ngram_char_fraction"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "top_ngram_char_fraction expects (text, n)")
        NgramCharFraction(children.head,
          intLiteral(children(1), "top_ngram_char_fraction: n"),
          dup = false)
      }),
    ("dup_ngram_char_fraction",
      new ExpressionInfo(classOf[NgramCharFraction].getName,
        "dup_ngram_char_fraction"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "dup_ngram_char_fraction expects (text, n)")
        NgramCharFraction(children.head,
          intLiteral(children(1), "dup_ngram_char_fraction: n"),
          dup = true)
      }),
    ("dup_segment_char_fraction",
      new ExpressionInfo(classOf[DupSegmentCharFraction].getName,
        "dup_segment_char_fraction"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "dup_segment_char_fraction expects (text, separator)")
        DupSegmentCharFraction(children.head,
          stringLiteral(children(1), "dup_segment_char_fraction: separator"))
      }),
    ("winnowed_fingerprints",
      new ExpressionInfo(classOf[WinnowedFingerprints].getName,
        "winnowed_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "winnowed_fingerprints expects (text, k, w)")
        WinnowedFingerprints(children.head,
          intLiteral(children(1), "winnowed_fingerprints: k"),
          intLiteral(children(2), "winnowed_fingerprints: w"))
      }),
    ("int8_dot_product",
      new ExpressionInfo(classOf[Int8DotProduct].getName, "int8_dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "int8_dot_product expects exactly 2 arguments")
        Int8DotProduct(children.head, children(1))
      }),
    ("hyperplane_sign_buckets",
      new ExpressionInfo(classOf[HyperplaneSignBuckets].getName,
        "hyperplane_sign_buckets"),
      (children: Seq[Expression]) => {
        require(children.size == 5,
          "hyperplane_sign_buckets expects (vec, dim, numPlanes, tables, seed)")
        val dim = intLiteral(children(1), "hyperplane_sign_buckets: dim")
        val numPlanes =
          intLiteral(children(2), "hyperplane_sign_buckets: numPlanes")
        val tables = intLiteral(children(3), "hyperplane_sign_buckets: tables")
        // the seed is a Long in the Column API; accept either literal
        // width so `42L`-style SQL seeds aren't rejected
        val seed = longLiteral(children(4), "hyperplane_sign_buckets: seed")
        // validate HERE with named errors — malformed literals would
        // otherwise surface per-row as a bare ArithmeticException from
        // the plane-matrix arithmetic
        require(dim >= 1, s"hyperplane_sign_buckets: dim must be >= 1, got $dim")
        require(numPlanes >= 1 && numPlanes <= 63,
          s"hyperplane_sign_buckets: numPlanes must be in [1, 63], got $numPlanes")
        require(tables >= 1,
          s"hyperplane_sign_buckets: tables must be >= 1, got $tables")
        // checked in Long: tables * numPlanes * dim can overflow Int and
        // sail through the per-factor checks; also bound the literal
        // plane matrix the driver must materialize (and codegen ship)
        require(tables.toLong * numPlanes * dim <= 4000000L,
          s"hyperplane_sign_buckets: plane matrix tables*numPlanes*dim = " +
            s"${tables.toLong * numPlanes * dim} doubles exceeds the " +
            "4e6 bound")
        HyperplaneSignBuckets(children.head,
          HyperplaneSignBuckets
            .gaussianPlanes(tables * numPlanes, dim, seed)
            .flatten.toIndexedSeq,
          numPlanes, tables)
      }),
    ("nearest_centroid",
      new ExpressionInfo(classOf[NearestCentroid].getName,
        "nearest_centroid"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "nearest_centroid expects (vec, centroids)")
        val m = matrixLiteral(children(1), "nearest_centroid: centroids")
        NearestCentroid(children.head, m.flatten.toIndexedSeq,
          m.size, m.head.size)
      }),
    ("nearest_centroids_topk",
      new ExpressionInfo(classOf[NearestCentroidsTopK].getName,
        "nearest_centroids_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "nearest_centroids_topk expects (vec, centroids, nprobe)")
        val m = matrixLiteral(children(1),
          "nearest_centroids_topk: centroids")
        NearestCentroidsTopK(children.head, m.flatten.toIndexedSeq,
          m.size, m.head.size,
          intLiteral(children(2), "nearest_centroids_topk: nprobe"))
      }),
    ("pq_adc_cosine",
      new ExpressionInfo(classOf[PqAdcCosine].getName, "pq_adc_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "pq_adc_cosine expects (vec, codes, codebooks)")
        val cb = cubeLiteral(children(2), "pq_adc_cosine: codebooks")
        PqAdcCosine(children.head, children(1),
          cb.flatten.flatten.toIndexedSeq,
          cb.size, cb.head.size, cb.head.head.size)
      }),
    ("pq_adc_cosine_shifted",
      new ExpressionInfo(classOf[PqAdcCosineShifted].getName,
        "pq_adc_cosine_shifted"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "pq_adc_cosine_shifted expects (vec, codes, shift, codebooks)")
        val cb = cubeLiteral(children(3),
          "pq_adc_cosine_shifted: codebooks")
        PqAdcCosineShifted(children.head, children(1), children(2),
          cb.flatten.flatten.toIndexedSeq,
          cb.size, cb.head.size, cb.head.head.size)
      }))

  private def doubleLiteral(e: Expression, what: String): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringLiteral(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longLiteral(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer or long literal, got $other")
  }

  // centroid / codebook matrices arrive from SQL as FOLDABLE nested
  // array literals (`array(array(1.0D, …), …)`) and are evaluated once
  // at resolution time — the constants then ride inside the compiled
  // expression exactly as in the Column API, never in the plan tree
  private def foldedNonEmptyArray(
      e: Expression,
      what: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, s"$what must be a foldable array literal")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData
          if a.numElements() > 0 => a
      case _ => throw new IllegalArgumentException(
        s"$what must be a non-empty array literal")
    }
  }

  private def matrixLiteral(e: Expression,
                            what: String): Seq[Seq[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ()
      case dt => throw new IllegalArgumentException(
        s"$what must be array<array<double>> (write 1.0D-style literals), " +
          s"got $dt")
    }
    val outer = foldedNonEmptyArray(e, what)
    val rows = (0 until outer.numElements())
      .map(i => outer.getArray(i).toDoubleArray().toSeq)
    require(rows.forall(_.size == rows.head.size) && rows.head.nonEmpty,
      s"$what must be rectangular and non-empty")
    rows
  }

  private def cubeLiteral(e: Expression,
                          what: String): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    e.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => ()
      case dt => throw new IllegalArgumentException(
        s"$what must be array<array<array<double>>>, got $dt")
    }
    val outer = foldedNonEmptyArray(e, what)
    val books = (0 until outer.numElements()).map { j =>
      val inner = outer.getArray(j)
      require(inner.numElements() > 0, s"$what: empty codebook $j")
      (0 until inner.numElements())
        .map(i => inner.getArray(i).toDoubleArray().toSeq)
    }
    require(books.forall(b => b.size == books.head.size &&
        b.forall(_.size == books.head.head.size)),
      s"$what must be rectangular (equal ksub and dsub per subspace)")
    books
  }

  /** Register on an already-built session (the extension class covers
    * builder-time wiring; this covers everything else). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
