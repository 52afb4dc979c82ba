package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

/** Order-n Kneser-Ney: every backoff path hand-computed, the
  * trigram-vs-bigram fluency win where context matters, and order-5
  * support. */
class KneserNeySpec extends AnyFunSuite {
  import SparkTestSession._

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("order-3 KN: every backoff path matches the hand-derived " +
       "formula on enumerable counts") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x b c"))
      .toDF("doc_id", "text")
    val lm = LanguageModel.trainNgrams(train, "doc_id", "text", maxN = 3)
    // hand-derived model statistics:
    //   trigram types/counts: (a,b,c):2 (b,c,d):1 (b,c,e):1 (x,b,c):1
    //   bigram types T=5 {ab,bc,cd,ce,xb}; unigram types V=6
    //   ctx3(a,b)=2 n1p3(a,b)=1; cc2(b)=2; cn2(b,c)=2; np2(b)=1
    //   cont(c)=1 cont(d)=1 cont(x)=0
    val D = 0.75
    val denomUni = 5.0 + 0.5 * (6.0 + 1.0) // 8.5
    def p1(cont: Long) = (cont.toDouble + 0.5) / denomUni
    // held docs, one trigram each, exercising each path:
    val held = Seq(
      (10L, "a b c"), // full path: n3, ctx3, cn2, cc2 all present
      (11L, "a b x"), // seen ctx3, unseen target everywhere
      (12L, "q q d"), // unseen trigram AND bigram context -> floor(d)
      (13L, "q q q")) // unknown everything -> bare floor
      .toDF("doc_id", "text")
    val got = LanguageModel.scoreByKneserNeyN(held, lm,
        "doc_id", "text", order = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def expected(p3: Double) = round6(round9(math.log(p3)))
    // doc 10: p2 = (max(2-D,0) + D*1*p1(1))/2; p3 = (max(2-D,0)+D*1*p2)/2
    val p2a = ((2 - D) + D * 1 * p1(1)) / 2
    assert(got(10L) == expected(((2 - D) + D * 1 * p2a) / 2))
    // doc 11: cn2(b,x)=0, cont(x)=0: p2 = (0 + D*1*p1(0))/2;
    //         n3(a,b,x)=0: p3 = (0 + D*1*p2)/2
    val p2b = (D * 1 * p1(0)) / 2
    assert(got(11L) == expected((D * 1 * p2b) / 2))
    // doc 12: cc2(q) null -> p2 = p1(cont(d)=1); ctx3 null -> p3 = p2
    assert(got(12L) == expected(p1(1)))
    // doc 13: bare floor
    assert(got(13L) == expected(p1(0)))
  }

  test("trigram KN beats bigram KN exactly where the trigram context " +
       "disambiguates (held-out fluency)") {
    val s = spark
    import s.implicits._
    // after 'b' alone, c and d are equally likely; after 'a b' the
    // continuation is always c — an order-3 model must score 'a b c'
    // strictly higher than the order-2 model does
    val train = Seq.tabulate(20)(i =>
      (i.toLong, if (i % 2 == 0) "a b c" else "x b d"))
      .toDF("doc_id", "text")
    val held = Seq((100L, "a b c")).toDF("doc_id", "text")
    val kn3 = LanguageModel.scoreByKneserNeyN(held,
        LanguageModel.trainNgrams(train, "doc_id", "text", maxN = 3),
        "doc_id", "text", order = 3)
      .head.getDouble(2)
    val kn2 = LanguageModel.scoreByKneserNey(held,
        LanguageModel.trainBigram(train, "doc_id", "text"),
        "doc_id", "text")
      .head.getDouble(2)
    assert(kn3 > kn2,
      s"order-3 avg logprob $kn3 should beat order-2 $kn2 on a " +
        "trigram-disambiguated continuation")
  }

  test("order-5 scoring works over a maxN=5 model; an under-trained " +
       "model is rejected eagerly") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "v w x y z"), (2L, "v w x y q"),
      (3L, "v w x y z a"))
      .toDF("doc_id", "text")
    val lm5 = LanguageModel.trainNgrams(train, "doc_id", "text",
      maxN = 5)
    val out = LanguageModel.scoreByKneserNeyN(
        Seq((10L, "v w x y z"), (11L, "a b c d e f"))
          .toDF("doc_id", "text"),
        lm5, "doc_id", "text", order = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(10L)._2 == 1L) // one 5-gram
    assert(byId(11L)._2 == 2L) // two 5-grams, all-OOV floor path
    assert(out.forall(r => r._3 < 0 && !r._3.isNaN && !r._3.isInfinite))
    // 4-token docs carry no 5-grams and drop out
    assert(LanguageModel.scoreByKneserNeyN(
      Seq((12L, "v w x y")).toDF("doc_id", "text"),
      lm5, "doc_id", "text", order = 5).count() == 0)
    val e = intercept[IllegalArgumentException] {
      LanguageModel.scoreByKneserNeyN(
        Seq((13L, "v w x")).toDF("doc_id", "text"),
        LanguageModel.trainNgrams(train, "doc_id", "text", maxN = 3),
        "doc_id", "text", order = 5)
    }
    assert(e.getMessage.contains("maxN >= 5"))
    // an EMPTY model (zero n-gram rows) names the problem instead of
    // NPE-ing on the null max(ord)
    val empty = intercept[IllegalArgumentException] {
      LanguageModel.scoreByKneserNeyN(
        Seq((14L, "v w x")).toDF("doc_id", "text"),
        lm5.filter("ord > 99"), "doc_id", "text", order = 3)
    }
    assert(empty.getMessage.contains("empty language model"))
  }

  test("trainNgrams emits every order once, counted over one corpus " +
       "pass, with nulls past the order") {
    val s = spark
    import s.implicits._
    val lm = LanguageModel.trainNgrams(
      Seq((1L, "p q p q")).toDF("doc_id", "text"),
      "doc_id", "text", maxN = 3)
    val rows = lm.collect().map(r => (r.getInt(0),
      (1 to 3).map(j => Option(r.getString(j)).getOrElse("-"))
        .mkString(" "), r.getLong(4))).toSet
    assert(rows == Set(
      (1, "p - -", 2L), (1, "q - -", 2L),
      (2, "p q -", 2L), (2, "q p -", 1L),
      (3, "p q p", 1L), (3, "q p q", 1L)))
  }
}
