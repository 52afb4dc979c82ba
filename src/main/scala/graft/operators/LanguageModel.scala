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
    // token array behind its own select boundary (one split per row,
    // not one per use site — the trainNgrams lesson, 3× here)
    val t = col("__t")
    docs.select(col(idCol).as("doc_id"), tokens(textCol).as("__t"))
      .select(col("doc_id"),
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

  /** Per-document n-gram rows (g1..gn), the scoring-side slide: one
    * narrow map-side projection; docs with fewer than `n` tokens emit
    * nothing. The index FILTER (not a sequence bound) is what keeps
    * short docs safe — `sequence(1, 0)` would generate a DESCENDING
    * range, not an empty one. */
  private def ngramRows(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    // the token array materializes behind its own select boundary:
    // inlining `split` into every use (CollapseProject's default for
    // cheap-looking aliases) would re-split the text inside the
    // PER-ELEMENT filter lambda — O(tokens²) per document
    val t = col("__t")
    val idx = filter(sequence(lit(1), size(t)),
      i => i <= size(t) - (n - 1))
    docs.select(col(idCol).as("doc_id"), tokens(textCol).as("__t"))
      .select(col("doc_id"),
        explode(transform(idx, i => struct(
          (0 until n).map(j => element_at(t, i + j).as(s"g${j + 1}")): _*
        ))).as("gr"))
      .select(col("doc_id") +:
        (1 to n).map(j => col(s"gr.g$j").as(s"g$j")): _*)
  }

  /** Train the FULL n-gram count stack, orders 1..maxN in ONE corpus
    * pass: (ord, w1..w{maxN}, n) rows — order-k rows carry nulls past
    * w_k. Every slide for every order generates map-side from the one
    * token array (a concat of per-order transforms), so the single
    * shuffle is the count groupBy keyed (ord, words) — corpus-scale
    * once, NOT once per order. This is the model [[scoreByKneserNeyN]]
    * consumes: the highest order contributes raw counts, the lower
    * orders contribute the TYPE statistics (continuation counts) that
    * Kneser-Ney is built from, and which cannot be derived from the
    * top-order table alone (each document's last k positions carry
    * k-grams that extend no (k+1)-gram). */
  def trainNgrams(docs: DataFrame, idCol: String, textCol: String,
                  maxN: Int): DataFrame = {
    require(maxN >= 2 && maxN <= 5, "maxN must be in [2, 5]")
    // token array behind its own select boundary — see ngramRows
    val t = col("__t")
    val perOrder = (1 to maxN).map { k =>
      val idx = filter(sequence(lit(1), size(t)),
        i => i <= size(t) - (k - 1))
      transform(idx, i => struct(
        lit(k).as("ord") +:
          (0 until maxN).map { j =>
            (if (j < k) element_at(t, i + j)
             else lit(null).cast("string")).as(s"w${j + 1}")
          }: _*))
    }
    docs.select(tokens(textCol).as("__t"))
      .select(explode(concat(perOrder: _*)).as("gr"))
      .select(col("gr.ord").as("ord") +:
        (1 to maxN).map(j => col(s"gr.w$j").as(s"w$j")): _*)
      .groupBy(col("ord") +: (1 to maxN).map(j => col(s"w$j")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Mean n-gram log-probability per document under interpolated
    * order-n Kneser–Ney (default order 3, supported to 5) — the
    * CCNet-class fluency filter at the order its paper actually uses
    * (Wenzek 2020 trains 5-gram KN models), generalizing
    * [[scoreByKneserNey]]'s bigram form to full backoff chains.
    *
    * Model math (interpolated KN, discount D; v = the k−1-word
    * context, t = the target):
    *   - TOP order n uses RAW counts:
    *     Pₙ(t|v) = (max(c(vt)−D, 0) + D·N₁₊(v•)·Pₙ₋₁) / c(v)
    *     when c(v) > 0, else Pₙ = Pₙ₋₁ (unseen context backs off
    *     whole);
    *   - MIDDLE orders 2 ≤ k < n use CONTINUATION counts (the
    *     Kneser-Ney insight — how many distinct contexts a gram
    *     continues, not how often):
    *     Pₖ(t|v) = (max(N₁₊(•vt)−D, 0) + D·N₁₊(v•)·Pₖ₋₁) / N₁₊(•v•)
    *     when N₁₊(•v•) > 0, else Pₖ = Pₖ₋₁;
    *   - the UNIGRAM floor keeps [[scoreByKneserNey]]'s add-half
    *     smoothing so out-of-vocabulary targets stay strictly
    *     positive: P₁(t) = (N₁₊(•t) + ½) / (T + ½·(V+1)), T = bigram
    *     types, V = order-1 types.
    * Every context path is exercised and replicated in the oracle:
    * fully-seen n-grams, seen-context/unseen-target, each partial
    * backoff depth, and the unknown-everything floor.
    *
    * Scale shape: the model derivatives (top raw counts + prefix
    * sums, per-order continuation tables) are aggregates of the
    * model-sized [[trainNgrams]] frame, never the corpus; scoring is
    * one doc-side slide plus keyed LEFT joins (2 per order level) —
    * no corpus×corpus pairing; T and V are the only driver scalars.
    * Per-gram log-probs round to 9 decimals and sum as DECIMAL —
    * engine- and order-independent, bit-replicated by DuckDB.
    * Output: (doc_id, n_ngrams, avg_logprob); docs with fewer than
    * `order` tokens drop out. */
  def scoreByKneserNeyN(docs: DataFrame, lm: DataFrame, idCol: String,
                        textCol: String, order: Int = 3,
                        discount: Double = 0.75): DataFrame = {
    require(order >= 2 && order <= 5, "order must be in [2, 5]")
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val n = order
    val lmOnce = lm.truncateLineage(false)
    val maxOrdRow = lmOnce.agg(max(col("ord"))).head
    require(!maxOrdRow.isNullAt(0),
      "empty language model: no n-gram rows (train with trainNgrams " +
        "on a non-empty corpus before scoring)")
    val maxOrd = maxOrdRow.getInt(0)
    require(maxOrd >= order,
      s"model carries orders up to $maxOrd; order-$order scoring " +
        s"needs trainNgrams(maxN >= $order)")
    def ordTypes(k: Int) = lmOnce.filter(col("ord") === k)
    // the doc-position names each stat table keys on: the order-k
    // level looks at the LAST k gram positions (context tail + target)
    def pos(from: Int, to: Int): Seq[String] =
      (from to to).map(j => s"g$j")

    // top order: raw counts + prefix aggregates
    val top = ordTypes(n).select(
      (1 to n).map(j => col(s"w$j").as(s"g$j")) :+
        col("n").as("num_n"): _*)
    val topCtx = ordTypes(n)
      .groupBy((1 until n).map(j => col(s"w$j").as(s"g$j")): _*)
      .agg(sum(col("n")).as("ctx_n"), count(lit(1)).as("n1p_n"))

    // middle orders: continuation-count tables from the (k+1)-gram
    // TYPE inventory, interpolation weight from the order-k types
    val midTables: Seq[(Int, DataFrame, DataFrame)] =
      (2 until n).map { k =>
        val keyNum = pos(n - k + 1, n) // k words ending at the target
        val keyCtx = pos(n - k + 1, n - 1) // the k-1 context words
        val contNum = ordTypes(k + 1)
          .groupBy((2 to k + 1).zip(keyNum)
            .map { case (j, g) => col(s"w$j").as(g) }: _*)
          .agg(count(lit(1)).as(s"cn_$k"))
        val contCtx = ordTypes(k + 1)
          .groupBy((2 to k).zip(keyCtx)
            .map { case (j, g) => col(s"w$j").as(g) }: _*)
          .agg(count(lit(1)).as(s"cc_$k"))
        val n1p = ordTypes(k)
          .groupBy((1 until k).zip(keyCtx)
            .map { case (j, g) => col(s"w$j").as(g) }: _*)
          .agg(count(lit(1)).as(s"np_$k"))
        (k, contNum, contCtx.join(n1p, keyCtx, "outer"))
      }

    // unigram floor: continuation counts from bigram types
    val contUni = ordTypes(2).groupBy(col("w2").as(s"g$n"))
      .agg(count(lit(1)).as("cont_uni"))
    val tTypes = ordTypes(2).count().toDouble
    val vTypes = ordTypes(1).count().toDouble

    var joined = ngramRows(docs, idCol, textCol, n)
      .join(top, pos(1, n), "left")
      .join(topCtx, pos(1, n - 1), "left")
      .join(contUni, Seq(s"g$n"), "left")
    midTables.foreach { case (k, contNum, ctxSide) =>
      joined = joined
        .join(contNum, pos(n - k + 1, n), "left")
        .join(ctxSide, pos(n - k + 1, n - 1), "left")
    }

    val d = lit(discount)
    val p1 = (coalesce(col("cont_uni"), lit(0L)).cast("double") +
      lit(0.5)) / lit(tTypes + 0.5 * (vTypes + 1.0))
    val pMid = (2 until n).foldLeft(p1) { (pk, k) =>
      when(col(s"cc_$k").isNotNull,
        (greatest(coalesce(col(s"cn_$k"), lit(0L)).cast("double") - d,
            lit(0.0)) +
          d * coalesce(col(s"np_$k"), lit(0L)).cast("double") * pk) /
          col(s"cc_$k").cast("double"))
        .otherwise(pk)
    }
    val pTop = when(col("ctx_n").isNotNull,
      (greatest(coalesce(col("num_n"), lit(0L)).cast("double") - d,
          lit(0.0)) +
        d * col("n1p_n").cast("double") * pMid) /
        col("ctx_n").cast("double"))
      .otherwise(pMid)

    joined
      .withColumn("logp", round(log(pTop), 9).cast("decimal(28,9)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("logp")).as("lp_sum"))
      .select(col("doc_id"), col("n_ngrams"),
        round(col("lp_sum").cast("double") / col("n_ngrams"), 6)
          .as("avg_logprob"))
  }
}
