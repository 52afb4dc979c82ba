package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests the reference lacks (SURVEY.md §5): randomized configs
  * against a direct-select oracle, and pure-function path laws.
  * (Raw ScalaCheck generators sampled in a loop — the scalatest bridge
  * artifact is not in the offline cache.) */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def forAll[A](gen: Gen[A], minSuccessful: Int)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(minSuccessful).foreach(body)

  private val fnPool: Seq[(String, Column => Column)] = Seq(
    "upper" -> (upper(_)),
    "lower" -> (lower(_)),
    "reverse" -> (reverse(_)),
    "constant" -> ((_: Column) => lit("k")))

  test("property: configured root fields equal a direct select; " +
    "unconfigured fields pass through byte-identically") {
    val df = jsonDf(
      """[{"c1": "Ab", "c2": "cD", "c3": "eF", "c4": "gH"},
         |{"c1": "iJ", "c2": "kL", "c3": "mN", "c4": "oP"}]""".stripMargin)
    val genConfig = Gen.someOf(Seq("c1", "c2", "c3")).flatMap { cols =>
      Gen.sequence[Seq[(String, (String, Column => Column))], (String, (String, Column => Column))](
        cols.map(c => Gen.oneOf(fnPool).map(c -> _)))
    }
    forAll(genConfig, 15) { config =>
      val runner = new Functioniser
      config.foreach { case (field, (_, fn)) => runner.add(field, fn) }
      val got = runner.apply(df)
      val fnByField = config.toMap
      val expectCols = df.columns.toSeq.map { c =>
        fnByField.get(c).map { case (_, fn) => fn(col(c)).as(c) }
          .getOrElse(col(c))
      }
      val expect = df.select(expectCols: _*)
      assert(got.columns.toSeq == expect.columns.toSeq)
      assert(got.collect().toSeq == expect.collect().toSeq)
    }
  }

  test("property: composition on one path equals function composition") {
    val df = jsonDf("""[{"x": "aBcDe"}]""")
    forAll(Gen.listOfN(3, Gen.oneOf(fnPool.take(3))), 10) { fns =>
      val runner = new Functioniser
      fns.foreach { case (_, fn) => runner.add("x", fn) }
      val direct = fns.map(_._2).foldLeft(col("x")) { (c, fn) => fn(c) }
      assert(runner.apply(df).select("x").first() ==
        df.select(direct.as("x")).first())
    }
  }

  test("property: limitDepth(f, depth) keeps exactly depth segments") {
    val seg = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
    val pathGen = for {
      n <- Gen.choose(1, 6)
      segs <- Gen.listOfN(n, seg)
      marks <- Gen.listOfN(n, Gen.oneOf("", "[]", "[][]"))
    } yield segs.zip(marks).map { case (s, m) => s + m }
    forAll(pathGen.flatMap(p => Gen.choose(0, 8).map(p -> _)), 50) { case (segs, d) =>
      val path = segs.mkString(".")
      val out = SchemaPaths.limitDepth(path, d)
      val kept = if (out.isEmpty) Nil else out.split('.').toList
      assert(kept == segs.take(d))
    }
  }

  test("property: limitDepth(f, like) matches like's segment count") {
    val seg = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
    val gen = for {
      n <- Gen.choose(1, 6)
      segs <- Gen.listOfN(n, seg)
      m <- Gen.choose(1, n)
      likeSegs <- Gen.listOfN(m, seg)
    } yield (segs, likeSegs)
    forAll(gen, 50) { case (segs, likeSegs) =>
      val out = SchemaPaths.limitDepth(segs.mkString("."), likeSegs.mkString("."))
      assert(out.split('.').length == likeSegs.length)
    }
  }

  test("property: random nested-leaf configs match a hand-built rewrite") {
    // fixed nested fixture; randomized (leaf path, function) choices
    val df = jsonDf(
      """[{"s": {"x": "Ab", "y": "Cd", "inner": {"z": "Ef"}},
         | "arr": [{"p": "Gh", "q": "Ij"}, {"p": "Kl", "q": "Mn"}],
         | "keep": "v"}]""".stripMargin)
    val leaves = Seq("s.x", "s.y", "s.inner.z", "arr.p", "arr.q")
    val gen = Gen.someOf(leaves).flatMap { picked =>
      Gen.sequence[Seq[(String, (String, Column => Column))], (String, (String, Column => Column))](
        picked.map(l => Gen.oneOf(fnPool).map(l -> _)))
    }
    forAll(gen, 15) { config =>
      val runner = new Functioniser
      config.foreach { case (path, (_, fn)) => runner.add(path, fn) }
      val got = runner.apply(df)
      // hand-built oracle with withField/transform
      val byPath = config.toMap.map { case (k, v) => k -> v._2 }
      def applyOr(path: String, c: Column): Column =
        byPath.get(path).map(_(c)).getOrElse(c)
      var s = col("s")
      s = s.withField("x", applyOr("s.x", s.getField("x")))
      s = s.withField("y", applyOr("s.y", s.getField("y")))
      s = s.withField("inner",
        s.getField("inner").withField("z",
          applyOr("s.inner.z", s.getField("inner").getField("z"))))
      val arr = transform(col("arr"), el =>
        el.withField("p", applyOr("arr.p", el.getField("p")))
          .withField("q", applyOr("arr.q", el.getField("q"))))
      val expect = df.select(s.as("s"), arr.as("arr"), col("keep"))
      // compare field-by-field (column order differs: oracle fixed order)
      val g = got.select("s.x", "s.y", "s.inner.z", "arr.p", "arr.q", "keep")
      val e = expect.select("s.x", "s.y", "s.inner.z", "arr.p", "arr.q", "keep")
      assert(g.collect().toSeq == e.collect().toSeq, s"config=${config.map(_._1)}")
    }
  }

  test("property: jaccardPairs equals a driver-side exhaustive oracle on random corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.choose(5, 14).flatMap(n => Gen.listOfN(n, word))
    val corpus = Gen.choose(6, 12).flatMap(n => Gen.listOfN(n, doc))
    forAll(corpus, 8) { docsList =>
      val rows = docsList.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      val got = operators.Dedup.jaccardPairs(df, "doc_id", "text", 2, 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exhaustive driver-side oracle over string 2-gram shingle sets
      def sh(ws: Seq[String]) = ws.sliding(2).map(_.mkString(" ")).toSet
      val expect = (for {
        (a, i) <- docsList.zipWithIndex
        (b, j) <- docsList.zipWithIndex if i < j
        sa = sh(a); sb = sh(b)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        if inter.toDouble / (sa.size + sb.size - inter) >= 0.3
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expect, s"docs=${rows.map(_._2)}")
    }
  }

  test("property: embeddingNearDupPairs equals a driver-side cosine oracle") {
    val vec = Gen.listOfN(6, Gen.choose(-5, 5).map(_.toFloat))
    val corpus = Gen.choose(5, 10).flatMap(n => Gen.listOfN(n, vec))
      .suchThat(_.forall(v => v.exists(_ != 0f)))
    forAll(corpus, 8) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
      val got = operators.Dedup
        .embeddingNearDupPairs(df, "vec_id", "embedding", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
        val d = ad.zip(bd).map { case (x, y) => x * y }.sum
        d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
      }
      val expect = (for {
        (a, i) <- vecs.zipWithIndex
        (b, j) <- vecs.zipWithIndex if i < j
        if cos(a, b) >= 0.5
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expect, s"vecs=$vecs")
    }
  }

  test("property: rangeJoin equals a driver-side oracle, incl. boundary-aligned timestamps") {
    // timestamps drawn from multiples of 60s so many land EXACTLY on bin
    // boundaries — the failure surface of inexact floor division
    val ts = Gen.choose(0L, 200L).map(m => m * 60L)
    val side = Gen.choose(3, 10).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(1L, 3L), ts)))
    val bounds = Gen.oneOf((60L, 60L), (120L, 0L), (0L, 300L), (90L, 30L))
    forAll(Gen.zip(side, side, bounds), 8) { case (ls, rs, (lower, upper)) =>
      import java.sql.Timestamp
      val lrows = ls.zipWithIndex.map { case ((k, t), i) =>
        (k, new Timestamp(t * 1000L), i.toLong) }
      val rrows = rs.zipWithIndex.map { case ((k, t), i) =>
        (k, new Timestamp(t * 1000L), (1000 + i).toLong) }
      val ldf = spark.createDataFrame(lrows).toDF("k", "ts", "lid")
      val rdf = spark.createDataFrame(rrows).toDF("k", "ts", "rid")
      val got = operators.RangeJoin.rangeJoin(ldf, rdf, "k", "ts",
          lower, upper, Seq("lid"), Seq("rid"))
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expect = (for {
        ((lk, lt), i) <- ls.zipWithIndex
        ((rk, rt), j) <- rs.zipWithIndex
        if lk == rk && rt >= lt - lower && rt <= lt + upper
      } yield (i.toLong, (1000 + j).toLong)).sorted
      assert(got == expect,
        s"lower=$lower upper=$upper ls=$ls rs=$rs")
    }
  }

  test("property: hashedShingles cardinality equals distinct string shingles") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    forAll(Gen.listOfN(12, word), 20) { words =>
      val text = words.mkString(" ")
      val df = spark.sql(s"select '$text' as t")
      val hashed = df.select(operators.TextAnalysis.hashedShingles(col("t"), 3))
        .first().getSeq[Long](0)
      val expect = words.sliding(3).map(_.mkString(" ")).toSet
      assert(hashed.size == expect.size)
    }
  }

  test("property: winnowing guarantee — a shared (w+k-1)-word run forces a shared fingerprint") {
    val s = spark
    import s.implicits._
    val word = Gen.oneOf((1 to 12).map(i => s"t$i"))
    val gen = for {
      a <- Gen.listOfN(8, word)
      b <- Gen.listOfN(8, word)
      run <- Gen.listOfN(6, word) // w + k - 1 = 4 + 3 - 1 = 6
      posA <- Gen.choose(0, a.size)
      posB <- Gen.choose(0, b.size)
    } yield (
      (a.take(posA) ++ run ++ a.drop(posA)).mkString(" "),
      (b.take(posB) ++ run ++ b.drop(posB)).mkString(" "))
    forAll(gen, 20) { case (ta, tb) =>
      val out = Seq((1L, ta), (2L, tb)).toDF("id", "t")
        .select(col("id"),
          operators.TextAnalysis.winnowedFingerprints(col("t"), 3, 4).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert((out(1L) & out(2L)).nonEmpty,
        s"no shared fingerprint:\n  $ta\n  $tb")
    }
  }

  test("property: dedupPassages keeps each distinct passage exactly once, corpus-wide") {
    val s = spark
    import s.implicits._
    val word = Gen.oneOf("a", "b", "c") // tiny vocab forces collisions
    val doc = Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, word))
    val gen = Gen.listOfN(5, doc)
    forAll(gen, 10) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = operators.Dedup.dedupPassages(df, "doc_id", "text", 2)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // every input doc comes back, and kept+dropped = its chunk count
      assert(out.length == docs.size)
      out.foreach { case (id, _, kept, dropped) =>
        val n = docs(id.toInt).size
        assert(kept + dropped == (n + 1) / 2, s"doc $id")
      }
      // corpus-wide: each distinct passage's first occurrence is kept
      // exactly once, so total kept = distinct chunk count
      val allChunks = docs.flatMap(_.grouped(2).map(_.mkString(" ")))
      assert(out.map(_._3).sum == allChunks.distinct.size)
    }
  }

  test("property: PNG decode inverts encode for arbitrary images") {
    // pure-JVM codec law, no Spark: decodePngRaw(encodePng(img)) == img
    // for random dimensions, channel counts, and pixel bytes — the
    // filter reconstruction, inflate, and chunk walk all roundtrip
    import graft.operators.Multimodal
    val genImg = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      ch <- Gen.oneOf(1, 2, 3, 4)
      px <- Gen.listOfN(w * h * ch, Gen.choose(0, 255))
    } yield Multimodal.PngImage(w, h, ch, px.map(_.toByte).toArray)
    forAll(genImg, 25) { img =>
      val decoded = Multimodal.decodePngRaw(Multimodal.encodePng(img))
      assert(decoded.nonEmpty)
      val d = decoded.get
      assert(d.width == img.width && d.height == img.height &&
        d.channels == img.channels)
      assert(java.util.Arrays.equals(d.pixels, img.pixels))
    }
  }

  test("property: the streaming .warc.gz walk equals the batch " +
       "string walk for ANY member segmentation of the same " +
       "decompressed stream, and corruption only ever drops a tail") {
    import org.apache.spark.sql.graftext.WarcGzRecords
    val rnd = new scala.util.Random(20260814)
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def rec(payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ payload
    (1 to 25).foreach { trial =>
      // random record sizes incl. empty payloads and binary bytes
      val recs = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val p = new Array[Byte](rnd.nextInt(5000))
        rnd.nextBytes(p)
        rec(p)
      }
      val sep = if (rnd.nextBoolean()) "\r\n\r\n".getBytes else
        Array.emptyByteArray
      val whole = recs.reduceLeft((a, b) => a ++ sep ++ b)
      // random segmentation into members at arbitrary byte cuts PLUS
      // deterministic cuts at every record end E and E+2: exactly the
      // offsets where a member boundary lands on (or inside) the
      // record separator — random cuts almost never hit them, and
      // they are the offsets that once lost the separator-skip state
      val nCuts = rnd.nextInt(8)
      val boundaryCuts = recs.indices.flatMap { i =>
        val e = recs.take(i + 1).map(_.length).sum + i * sep.length
        Seq(e, e + 2)
      }.filter(c => c > 0 && c < whole.length)
      val cuts = (Seq(0, whole.length) ++ boundaryCuts ++
        Seq.fill(nCuts)(rnd.nextInt(whole.length + 1))).distinct.sorted
      val members = cuts.zip(cuts.tail)
        .map { case (a, b) => whole.slice(a, b) }
        .filter(_.nonEmpty)
      val blob = members.map(gz).reduce(_ ++ _)
      val got = WarcGzRecords
        .over(new java.io.ByteArrayInputStream(blob)).toSeq
      // the ground truth is the record list itself: segmentation must
      // never change WHAT comes out, only when it becomes available
      assert(got.size == recs.size, s"trial $trial: record count")
      got.zip(recs).foreach { case (g, w) =>
        assert(java.util.Arrays.equals(g, w), s"trial $trial: bytes")
      }
      // corrupt a random member: every record before the member
      // survives byte-exact, nothing after it leaks through
      if (members.size >= 2) {
        val k = rnd.nextInt(members.size)
        val mz = members.map(gz)
        val bad = mz(k).clone()
        bad(bad.length / 2) = (bad(bad.length / 2) ^ 0xFF).toByte
        val blob2 = (mz.take(k) :+ bad).reduce(_ ++ _)
        val got2 = WarcGzRecords
          .over(new java.io.ByteArrayInputStream(blob2)).toSeq
        assert(got2.size <= got.size)
        got2.zip(got).foreach { case (g, w) =>
          assert(java.util.Arrays.equals(g, w),
            s"trial $trial: corrupted-tail prefix")
        }
      }
    }
  }

  test("property: byte-level BPE is UNK-free and LOSSLESS on " +
       "arbitrary Unicode — emitted subwords concatenate back to the " +
       "word's full remapped byte sequence") {
    import graft.operators.TextAnalysis
    val s = spark
    import s.implicits._
    // words over the nastiest scripts: emoji (surrogate pairs), CJK,
    // combining marks, RTL, control-ish punctuation, plus plain ASCII
    val genWord: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"),
      Gen.const("中"), Gen.const("🚀"), Gen.const("́"),
      Gen.const("م"), Gen.const("ß"), Gen.const("…")))
      .map(_.mkString)
    val genDoc: Gen[String] =
      Gen.nonEmptyListOf(genWord).map(_.mkString(" "))
    val alpha = TextAnalysis.byteAlphabet
    def remap(word: String): String =
      word.getBytes("UTF-8").map(b => alpha(b & 0xFF)).mkString
    forAll(Gen.listOfN(6, genDoc), 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val merges = TextAnalysis.trainBpeBytes(docs, "text",
          numMerges = 4)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val out = TextAnalysis.bpeTokenizeBytes(docs, merges)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2),
          r.getString(3))))
        .groupBy(_._1)
        .map { case (k, vs) =>
          k -> vs.map(_._2).sortBy(_._1).map(_._2) }
      // every (doc, word) reconstructs losslessly; no empty subwords,
      // no UNK sentinel anywhere in the alphabet space
      texts.zipWithIndex.foreach { case (t, i) =>
        t.split(" ").zipWithIndex.filter(_._1.nonEmpty)
          .foreach { case (w, wp) =>
            val subs = out((i.toLong, wp))
            assert(subs.forall(_.nonEmpty))
            assert(subs.mkString == remap(w),
              s"word '$w' did not reconstruct")
          }
      }
    }
  }
}
