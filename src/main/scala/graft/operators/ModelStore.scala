package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer / model store — the artifact layer that lets a
  * model trained Monday gate Tuesday's batch or stream WITHOUT
  * retraining: BPE merge tables ([[TextAnalysis.trainBpe]]), unigram
  * vocabularies ([[TextAnalysis.trainUnigram]]), WordPiece piece
  * inventories ([[TextAnalysis.trainPieces]]), bigram language models
  * ([[LanguageModel.trainBigram]]) and hashed logistic-regression
  * weights ([[TextClassify.trainLogisticHashed]]) write to parquet
  * and load back bit-identical (spec-pinned: the loaded encoder's
  * output equals the in-session encoder's, row for row).
  *
  * Layout follows the [[TextSearch.writeSearchIndex]] contract:
  * `path/meta` (kind tag, row count, the inference parameter the
  * encoder needs) + `path/table` (the model rows). Loading verifies
  * the kind EAGERLY — pointing a BPE loader at a unigram store is a
  * driver-side error before any job runs — and checks the row count
  * against meta so a torn write cannot score silently.
  *
  * Scale posture: tokenizer inventories and weight frames are
  * driver-bounded by construction (topN / keepN / numMerges / dim
  * rows) and write as a single file; the bigram LM is corpus-vocab
  * sized and writes range-sharded on `w1` so scoring joins read only
  * the contexts they touch. */
object ModelStore {

  /** kind → (required, optional) column names the model table must /
    * may carry (a write with missing required columns fails eagerly,
    * not at load time). */
  private val contracts: Map[String, (Seq[String], Seq[String])] = Map(
    "bpe" -> (Seq("merge_rank", "left_sym", "right_sym", "merged",
      "pair_count"), Nil),
    "unigram" -> (Seq("rank", "piece", "weight", "logprob"), Nil),
    "pieces" -> (Seq("piece", "weight", "rank"), Nil),
    "bigram_lm" -> (Seq("w1", "w2", "n", "ctx"), Nil),
    // the order-n stack: w3..w5 present when maxN reaches them
    "ngram_lm" -> (Seq("ord", "w1", "w2", "n"), Seq("w3", "w4", "w5")),
    "logistic" -> (Seq("feature", "weight"), Nil))

  private def writeModel(model: DataFrame, path: String, kind: String,
                         param: Option[Int]): Unit = {
    val (need, opt) = contracts(kind)
    val have = model.columns.toSet
    require(need.forall(have.contains),
      s"$kind model must carry columns ${need.mkString(", ")}; " +
        s"got ${model.columns.mkString(", ")}")
    val slim = model.select(
      (need ++ opt.filter(have.contains)).map(col): _*)
    val spark = model.sparkSession
    val persisted =
      if (kind == "bigram_lm") slim.repartitionByRange(col("w1"))
      else if (kind == "ngram_lm") {
        slim.repartitionByRange(col("ord"), col("w1"))
      } else slim.coalesce(1) // driver-bounded inventory: one file
    // the meta row count is observed DURING the write (one scan) —
    // the lm kinds are corpus-vocab sized, so a post-write re-read
    // or a pre-write count() would each cost a full extra pass
    val obs = org.apache.spark.sql.Observation()
    persisted.observe(obs, count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(s"$path/table")
    val n = obs.get("n_rows").asInstanceOf[Long]
    spark.range(1)
      .select(lit(kind).as("kind"), lit(n).as("n_rows"),
        param.map(p => lit(p)).getOrElse(lit(null).cast("int"))
          .as("param"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (table, param) with the kind and row count verified — the shared
    * load gate every `*FromModel` entry point goes through. */
  private def readModel(spark: SparkSession, path: String,
                        kind: String): (DataFrame, Option[Int]) = {
    val meta = spark.read.parquet(s"$path/meta").head
    val storedKind = meta.getString(0)
    require(storedKind == kind,
      s"model at $path is '$storedKind', expected '$kind'")
    val tbl = spark.read.parquet(s"$path/table")
    val n = tbl.count()
    require(n == meta.getLong(1),
      s"model at $path is torn: meta says ${meta.getLong(1)} rows, " +
        s"table has $n")
    (tbl, if (meta.isNullAt(2)) None else Some(meta.getInt(2)))
  }

  // ---- BPE (merge-rule family) ----

  def writeBpeModel(merges: DataFrame, path: String): Unit =
    writeModel(merges, path, "bpe", None)

  /** The ordered merge list [[TextAnalysis.bpeTokenize]] consumes —
    * rank order restored explicitly (parquet files carry no order). */
  def bpeFromModel(spark: SparkSession, path: String): Seq[(String, String)] =
    readModel(spark, path, "bpe")._1
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"))).toSeq

  /** Load + encode in one call: bit-identical to
    * [[TextAnalysis.bpeTokenize]] with the in-session merge table. */
  def bpeTokenizeFromModel(docs: DataFrame, path: String,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame =
    TextAnalysis.bpeTokenize(docs,
      bpeFromModel(docs.sparkSession, path), textCol, idCol)

  // ---- Unigram LM tokenizer (SentencePiece-default family) ----

  /** `maxPieceLen` rides in meta: the Viterbi window is a MODEL
    * property (train and inference must agree), not a call site's. */
  def writeUnigramModel(vocab: DataFrame, path: String,
                        maxPieceLen: Int): Unit =
    writeModel(vocab, path, "unigram", Some(maxPieceLen))

  /** Rank-ordered vocab + Viterbi window, for callers that need the
    * LOAD separately from the encode — the pipeline registry loads
    * (and kind-verifies) at config-compile time so a mispointed
    * store fails before any job. */
  def unigramVocabFromModel(spark: SparkSession,
                            path: String): (DataFrame, Int) = {
    val (tbl, param) = readModel(spark, path, "unigram")
    (tbl.orderBy(col("rank")), param.get)
  }

  def unigramTokenizeFromModel(docs: DataFrame, path: String,
                               idCol: String = "doc_id",
                               textCol: String = "text",
                               unkLp: Double = -100.0): DataFrame = {
    val (tbl, param) = readModel(docs.sparkSession, path, "unigram")
    TextAnalysis.unigramTokenize(docs, idCol, textCol,
      tbl.orderBy(col("rank")), maxPieceLen = param.get, unkLp = unkLp)
  }

  // ---- WordPiece piece inventory (greedy longest-match family) ----

  def writePiecesModel(vocab: DataFrame, path: String,
                       maxPieceLen: Int): Unit =
    writeModel(vocab, path, "pieces", Some(maxPieceLen))

  /** Rank-ordered piece inventory + window — the separated-load
    * twin of [[unigramVocabFromModel]]. */
  def piecesVocabFromModel(spark: SparkSession,
                           path: String): (DataFrame, Int) = {
    val (tbl, param) = readModel(spark, path, "pieces")
    (tbl.orderBy(col("rank")), param.get)
  }

  def piecesTokenizeFromModel(docs: DataFrame, path: String,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    val (tbl, param) = readModel(docs.sparkSession, path, "pieces")
    TextAnalysis.piecesTokenize(docs, idCol, textCol,
      tbl.orderBy(col("rank")), maxPieceLen = param.get)
  }

  // ---- Bigram language model (KN / add-k fluency scoring) ----

  def writeLmModel(lm: DataFrame, path: String): Unit =
    writeModel(lm, path, "bigram_lm", None)

  /** The (w1, w2, n, ctx) frame [[LanguageModel.scoreByBigram]] /
    * [[LanguageModel.scoreByKneserNey]] consume, range-sharded on w1. */
  def lmFromModel(spark: SparkSession, path: String): DataFrame =
    readModel(spark, path, "bigram_lm")._1

  // ---- Order-n n-gram stack (Kneser-Ney backoff scoring) ----

  /** `maxN` rides in meta (the stack's top order — what
    * [[LanguageModel.scoreByKneserNeyN]] validates against). Sharded
    * on (ord, w1): each order's contexts cluster, so score-side
    * aggregates and joins read only the orders and ranges they
    * touch. */
  def writeNgramModel(lm: DataFrame, path: String, maxN: Int): Unit =
    writeModel(lm, path, "ngram_lm", Some(maxN))

  /** The (ord, w1..wN, n) frame [[LanguageModel.scoreByKneserNeyN]]
    * consumes. */
  def ngramsFromModel(spark: SparkSession, path: String): DataFrame =
    readModel(spark, path, "ngram_lm")._1

  // ---- Hashed logistic regression (quality-filter weights) ----

  def writeLogisticModel(weights: DataFrame, path: String): Unit =
    writeModel(weights, path, "logistic", None)

  /** The (feature, weight) frame both scorers consume
    * ([[TextClassify.scoreLogisticInline]] /
    * [[TextClassify.scoreLogisticHashed]]). */
  def logisticFromModel(spark: SparkSession, path: String): DataFrame =
    readModel(spark, path, "logistic")._1
}
