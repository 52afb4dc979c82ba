package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LanguageModel, ModelStore, TextAnalysis, TextClassify}

/** Persisted-model contract: every store loads back an encoder/scorer
  * whose output is BIT-IDENTICAL to the in-session one, the kind tag
  * gates eagerly, and a torn table fails the row-count check. */
class ModelStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/m"

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick quick fox and the slow slow dog", "en"),
      (3L, "der schnelle braune fuchs springt", "de"),
      (4L, "the dog and the fox and the quick brown cat", "en"),
      (5L, "ein fuchs und ein hund und eine katze", "de"),
      (6L, "quick brown foxes jump over lazy dogs daily", "en"))
      .toDF("doc_id", "text", "lang")
  }

  test("BPE model round-trips: stored merges encode identically, in " +
       "rank order") {
    val path = tmp("graft-ms-bpe")
    val merges = TextAnalysis.trainBpe(docs, "text", numMerges = 5)
    ModelStore.writeBpeModel(merges, path)
    val loaded = ModelStore.bpeFromModel(spark, path)
    val direct = merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(loaded == direct)
    val a = ModelStore.bpeTokenizeFromModel(docs, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val b = TextAnalysis.bpeTokenize(docs, direct).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(a == b && a.nonEmpty)
  }

  test("unigram model round-trips with maxPieceLen riding in meta") {
    val path = tmp("graft-ms-uni")
    val vocab = TextAnalysis.trainUnigram(docs, "text", seedTopN = 30,
      maxPieceLen = 3, keepN = 25, emRounds = 1, maxWordLen = 8)
    ModelStore.writeUnigramModel(vocab, path, maxPieceLen = 3)
    val a = ModelStore.unigramTokenizeFromModel(docs, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val b = TextAnalysis.unigramTokenize(docs, "doc_id", "text", vocab,
        maxPieceLen = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(a == b && a.nonEmpty)
  }

  test("pieces model round-trips with maxPieceLen riding in meta") {
    val path = tmp("graft-ms-pieces")
    val vocab = TextAnalysis.trainPieces(docs, "text", topN = 40,
      maxPieceLen = 4)
    ModelStore.writePiecesModel(vocab, path, maxPieceLen = 4)
    val a = ModelStore.piecesTokenizeFromModel(docs, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val b = TextAnalysis.piecesTokenize(docs, "doc_id", "text", vocab,
        maxPieceLen = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(a == b && a.nonEmpty)
  }

  test("bigram LM round-trips: stored model KN-scores bit-identically") {
    val path = tmp("graft-ms-lm")
    val lm = LanguageModel.trainBigram(docs, "doc_id", "text")
    ModelStore.writeLmModel(lm, path)
    def scores(m: org.apache.spark.sql.DataFrame) =
      LanguageModel.scoreByKneserNey(docs, m, "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(scores(ModelStore.lmFromModel(spark, path)) == scores(lm))
  }

  test("n-gram LM round-trips: stored stack KN3-scores " +
       "bit-identically, maxN riding in meta") {
    val path = tmp("graft-ms-ngram")
    val lm = LanguageModel.trainNgrams(docs, "doc_id", "text", maxN = 3)
    ModelStore.writeNgramModel(lm, path, maxN = 3)
    def scores(m: org.apache.spark.sql.DataFrame) =
      LanguageModel.scoreByKneserNeyN(docs, m, "doc_id", "text",
          order = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = scores(ModelStore.ngramsFromModel(spark, path))
    assert(got == scores(lm) && got.nonEmpty)
  }

  test("logistic model round-trips: stored weights score " +
       "bit-identically on both scorer forms") {
    val path = tmp("graft-ms-logreg")
    val wts = TextClassify.trainLogisticHashed(
      docs.withColumn("is_en", col("lang") === "en"),
      "doc_id", "text", "is_en", dim = 8, iters = 2)
    ModelStore.writeLogisticModel(wts, path)
    val loaded = ModelStore.logisticFromModel(spark, path)
    def p(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(p(TextClassify.scoreLogisticInline(docs, loaded)) ==
      p(TextClassify.scoreLogisticInline(docs, wts)))
    assert(p(TextClassify.scoreLogisticHashed(docs, loaded)) ==
      p(TextClassify.scoreLogisticHashed(docs, wts)))
  }

  test("kind tag gates eagerly: a BPE loader pointed at a pieces " +
       "store errors before any encode job") {
    val path = tmp("graft-ms-kind")
    ModelStore.writePiecesModel(
      TextAnalysis.trainPieces(docs, "text", topN = 10), path,
      maxPieceLen = 4)
    val e = intercept[IllegalArgumentException] {
      ModelStore.bpeFromModel(spark, path)
    }
    assert(e.getMessage.contains("pieces") &&
      e.getMessage.contains("bpe"))
  }

  test("a torn table (rows missing vs meta) fails the load gate") {
    val path = tmp("graft-ms-torn")
    ModelStore.writeBpeModel(
      TextAnalysis.trainBpe(docs, "text", numMerges = 5), path)
    // simulate the tear: rewrite the table with a row dropped
    val tbl = spark.read.parquet(s"$path/table")
      .filter(col("merge_rank") =!= 1)
      .collect()
    val schema = spark.read.parquet(s"$path/table").schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(tbl.toSeq, 1), schema)
      .write.mode("overwrite").parquet(s"$path/table")
    val e = intercept[IllegalArgumentException] {
      ModelStore.bpeFromModel(spark, path)
    }
    assert(e.getMessage.contains("torn"))
  }

  test("a write missing contract columns errors eagerly") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      ModelStore.writeBpeModel(
        Seq((1, "a")).toDF("merge_rank", "left_sym"),
        tmp("graft-ms-cols"))
    }
    assert(e.getMessage.contains("must carry"))
  }
}
