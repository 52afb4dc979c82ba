package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints.TruncateOps

/** Corpus-trained n-gram language-model scoring — the perplexity-proxy
  * quality filter of large-corpus curation pipelines (score each document
  * by how probable its token sequence is under a model trained on the
  * corpus itself or on a trusted reference corpus; gate on the score).
  *
  * Model: bigrams with add-k smoothing. P(w₂|w₁) = (c(w₁w₂) + k) /
  * (ctx(w₁) + k·V), where ctx(w₁) sums the bigram counts starting at w₁
  * and V is the corpus vocabulary size. A document's score is the MEAN
  * log-probability of its bigrams (higher = more fluent under the model);
  * documents with fewer than 2 tokens have no bigrams and drop out.
  *
  * Scale design: training is one exchange — bigram pairs are exploded
  * map-side from a narrow projection, the tf groupBy is keyed by a
  * `repartition(w1)` so the per-context sum reuses the same partitioning
  * as a window (the BM25 trick). Scoring joins each document bigram
  * against the model on (w1, w2): the model rides a broadcast when small,
  * a keyed shuffle when not — either way no corpus×corpus pairing. V is
  * the only driver scalar. Per-bigram log-probs round to 9 decimals and
  * sum as DECIMAL, so document scores are independent of summation order
  * (reproducible across partitionings and engines — the DuckDB oracle
  * sums the same way).
  *
  * Tokenization is whitespace splitting, shared with the text stack. */
object LanguageModel {

  // the text stack's ONE tokenizer — a private copy would silently
  // desynchronize LM training/scoring from the other text operators
  private def tokens(textCol: String) = TextAnalysis.tokens(col(textCol))

  private def bigramRows(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val t = tokens(textCol)
    docs.select(col(idCol).as("doc_id"),
        explode(zip_with(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Train the bigram table: (w1, w2, n, ctx) with ctx = Σ n over w1.
    * One exchange keyed by w1 — the count groupBy and the context-sum
    * window share the partitioning. */
  def trainBigram(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    bigramRows(docs, idCol, textCol)
      .repartition(col("w1"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ctx", sum(col("n")).over(Window.partitionBy(col("w1"))))

  /** Mean bigram log-probability per document under interpolated
    * Kneser–Ney smoothing — the CCNet-class perplexity filter (Wenzek
    * 2020 trains KN models to rank CommonCrawl by fluency; add-k
    * over-penalizes frequent-word contexts, KN's continuation
    * probability fixes exactly that).
    *
    * Model math (Kneser–Ney 1995, interpolated form; D = `discount`):
    * P(w₂|w₁) = (max(c(w₁w₂)−D, 0) + D·N₁₊(w₁•)·Pc(w₂)) / c(w₁) when
    * context w₁ is known, else Pc(w₂), where N₁₊(w₁•) counts distinct
    * continuations of w₁ and the continuation probability
    * Pc(w₂) = (N₁₊(•w₂) + ½) / (T + ½·(V+1)) is add-half smoothed over
    * the T distinct bigram types so out-of-vocabulary words keep a
    * strictly positive floor (textbook Pc is zero on unseen w₂, which
    * would put −∞ in a mean; V = the model's vocabulary, the distinct
    * tokens appearing in any training bigram).
    *
    * Scale shape is [[scoreByBigram]]'s: the model derivatives (per-w₁
    * continuations, per-w₂ contexts) are two aggregates of the skinny
    * bigram table; scoring is keyed left joins, no corpus×corpus
    * pairing; T and V are the only driver scalars. Per-bigram log-probs
    * round to 9 decimals and sum as DECIMAL — summation-order- and
    * engine-independent, so DuckDB replicates scores bit-for-bit.
    * Output: (doc_id, n_bigrams, avg_logprob); docs without bigrams
    * drop out. */
  def scoreByKneserNey(docs: DataFrame, lm: DataFrame, idCol: String,
                       textCol: String,
                       discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val lmOnce = lm.select(col("w1"), col("w2"), col("n"), col("ctx"))
      .truncateLineage(false)
    val types = lmOnce.count()
    require(types > 0, "empty language model")
    val v = lmOnce.select(col("w1").as("w"))
      .union(lmOnce.select(col("w2").as("w")))
      .distinct().count()
    val contDenom = types.toDouble + 0.5 * (v.toDouble + 1.0)
    val n1f = lmOnce.groupBy(col("w1")).agg(count(lit(1)).as("n1f"))
    val contTbl = lmOnce.groupBy(col("w2")).agg(count(lit(1)).as("cont"))
    val ctxTbl = lmOnce.select(col("w1"), col("ctx")).distinct()
    val pc = (coalesce(col("cont"), lit(0L)).cast("double") + lit(0.5)) /
      lit(contDenom)
    val p = when(col("ctx").isNotNull,
      (greatest(coalesce(col("n"), lit(0L)).cast("double") - lit(discount),
          lit(0.0)) +
        lit(discount) * col("n1f").cast("double") * col("pc")) /
        col("ctx").cast("double"))
      .otherwise(col("pc"))
    val scored = bigramRows(docs, idCol, textCol)
      .join(lmOnce.select(col("w1"), col("w2"), col("n")),
        Seq("w1", "w2"), "left")
      .join(ctxTbl, Seq("w1"), "left")
      .join(n1f, Seq("w1"), "left")
      .join(contTbl, Seq("w2"), "left")
      .withColumn("pc", pc)
      .withColumn("logp", round(log(p), 9).cast("decimal(28,9)"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp")).as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("lp_sum").cast("double") / col("n_bigrams"), 6)
          .as("avg_logprob"))
  }

  /** Mean bigram log-probability per document under `lm` (a
    * [[trainBigram]] result). Output: (doc_id, n_bigrams, avg_logprob),
    * higher = more fluent; docs without bigrams drop out. `vocab`
    * defaults to the scored corpus's distinct-token count — pass the
    * TRAINING corpus's vocabulary when scoring a different corpus. */
  def scoreByBigram(docs: DataFrame, lm: DataFrame, idCol: String,
                    textCol: String, k: Double = 0.5,
                    vocab: Option[Long] = None): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val v = vocab.getOrElse(
      docs.select(explode(tokens(textCol)).as("w"))
        .agg(count_distinct(col("w"))).head.getLong(0))
    // two left joins, not one: an UNSEEN bigram whose w1 IS known must
    // still be penalized against ctx(w1), not against an empty context —
    // a (w1,w2)-join alone would null out ctx for exactly those rows.
    // The model is read by BOTH joins: one lazy materialization so the
    // training pipeline (shuffle + window) doesn't execute twice
    val lmOnce = lm.truncateLineage(false)
    val scored = bigramRows(docs, idCol, textCol)
      .join(lmOnce.select(col("w1"), col("w2"), col("n")),
        Seq("w1", "w2"), "left")
      .join(lmOnce.select(col("w1"), col("ctx")).distinct(),
        Seq("w1"), "left")
      .withColumn("logp", round(
        log((coalesce(col("n"), lit(0L)) + k) /
          (coalesce(col("ctx"), lit(0L)) + k * v)), 9)
        .cast("decimal(28,9)"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp")).as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("lp_sum").cast("double") / col("n_bigrams"), 6)
          .as("avg_logprob"))
  }
}
