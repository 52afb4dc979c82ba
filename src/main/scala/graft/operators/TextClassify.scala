package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes text classification — the quality / domain /
  * language classifier stage of corpus curation (label a trusted split,
  * train, classify the rest of the corpus; the exact-arithmetic
  * stand-in for a fastText-style filter model).
  *
  * Model: P(c | doc) ∝ P(c) · Π_w P(w | c) with add-k smoothing,
  * P(w | c) = (n_{w,c} + k) / (N_c + k·V) over the training vocabulary
  * V; unseen tokens take the smoothing floor against the class's token
  * total. Prediction is the arg-max class with ties broken by label
  * (deterministic).
  *
  * Scale design: training is one exchange — the (label, token) count
  * groupBy; class totals and priors are label-cardinality tables and
  * broadcast. Scoring explodes test tokens, cross-joins the (tiny)
  * label list, and left-joins the likelihood table keyed (token, label)
  * — the model is vocabulary-bounded, never corpus-bounded, so it
  * broadcasts at any corpus scale once the vocabulary is capped (hash
  * the tokens into buckets as [[Curation.importanceWeights]] does if it
  * is not). V and the training row count are the only driver scalars.
  * Per-token log-likelihoods round to 9 decimals and sum as DECIMAL, so
  * scores are summation-order-independent and engine-reproducible (the
  * q_text_lm float discipline).
  *
  * Tokenization is the text stack's shared whitespace tokenizer. */
object TextClassify {

  /** Train on `train` (labelCol, textCol) and classify `test`: one row
    * per test document — (idCol, pred_label, score) where score is the
    * winning class's joint log-likelihood (rounded to 6 decimals).
    * Columns in `keepCols` are carried through from `test`. */
  def naiveBayesClassify(train: DataFrame, test: DataFrame,
                         labelCol: String, idCol: String, textCol: String,
                         k: Double = 0.5,
                         keepCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    val trainToks = train.select(col(labelCol).as("label"),
      explode(toks).as("token"))
    // likelihood counts are read twice (class totals + the scoring
    // join): one lazy materialization, as LanguageModel does for lm
    val lik = trainToks.groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = lik.groupBy(col("label")).agg(sum(col("n")).as("tot"))
    // bounded driver scalars: vocabulary size and training doc count
    val v = trainToks.agg(count_distinct(col("token"))).head.getLong(0)
    val nTrain = train.count()
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
    val testToks = test.select(col(idCol).as("__id"),
      explode(toks).as("token"))
    val scored = testToks
      .crossJoin(broadcast(priors.select(col("label"))))
      .join(lik, Seq("token", "label"), "left")
      // the class total joins separately from the (token, label) count:
      // an unseen token must still be penalized against N_c (the same
      // two-join reasoning as LanguageModel.scoreByBigram)
      .join(broadcast(tot), Seq("label"))
      .withColumn("logp", round(
        log((coalesce(col("n"), lit(0L)) + k) / (col("tot") + k * v)), 9)
        .cast("decimal(28,9)"))
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("logp")).as("s"))
      .join(broadcast(priors), Seq("label"))
      .withColumn("score_dec", col("s") +
        round(log(col("nd").cast("double") / nTrain), 9)
          .cast("decimal(28,9)"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score_dec").desc, col("label"))
    val pred = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("label").as("pred_label"),
        round(col("score_dec").cast("double"), 6).as("score"))
    if (keepCols.isEmpty) pred
    else pred.join(test.select(col(idCol) +: keepCols.map(col): _*),
      Seq(idCol))
  }
}
