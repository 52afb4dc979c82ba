package graft.operators


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints.TruncateOps

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Scale design: queries are a small set (broadcast); the corpus is the
  * 100 TB side and is only ever scanned. Brute-force top-k does the scan
  * with a broadcast nested loop and a TWO-STAGE top-k: a partition-local
  * top-k first (map-side, no data movement), then a global top-k over
  * k × numPartitions survivors — the shuffle carries kilobytes per query
  * instead of the scored corpus. The LSH variant hashes the corpus once
  * into hyperplane sign-buckets so each query probes one bucket
  * (+ optional multi-probe), trading recall for a corpus-fraction scan.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank[, cosine]) — deterministic
    * tie-break on neighbor id. Zero vectors have no direction (cosine is
    * 0/0 = NaN, which Spark ORDERS FIRST under desc), so they are
    * excluded from both sides up front: a zero corpus vector never
    * appears as a neighbor, a zero query emits no rows. Every cosine
    * path in this object applies the same rule. */
  /** Long-form (id, index, value) rows → (id, dense vector) — the
    * bridge from [[graft.operators.Graph.trainNodeEmbeddings]]'
    * matrix rows (and any other long-form factor table) into the
    * vector column every similarity operator here consumes. One
    * groupBy; elements ordered by index (sort_array on the (index,
    * value) struct). Missing indices are the caller's bug — the
    * assembled vector is exactly the rows present. */
  def assembleVectors(df: DataFrame, idCol: String, idxCol: String,
                      valCol: String,
                      outCol: String = "embedding"): DataFrame =
    df.groupBy(col(idCol))
      .agg(transform(sort_array(collect_list(struct(
        col(idxCol).cast("int").as("i"),
        col(valCol).cast("double").as("v")))), x => x("v"))
        .as(outCol))

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     includeScore: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
      .filter(col("cnorm") > 0)
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
      .filter(col("qnorm") > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineWithNorms(
        dotProduct(col("qvec"), col("cvec")), col("qnorm"), col("cnorm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))

    // One rank window: Spark's WindowGroupLimit rewrites the rank<=k
    // filter into partial (per scan partition, pre-shuffle) + final
    // stages, so the exchange carries ≤ k rows per (query, partition) —
    // the two-stage top-k, planned automatically (verified in the
    // physical plan).
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val top = scored
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
    val cols = Seq(col("query_id"), col("neighbor_id"), col("rank")) ++
      (if (includeScore) Seq(round(col("cosine"), 6).as("cosine")) else Nil)
    top.select(cols: _*)
  }

  /** Hard-negative mining for contrastive / retriever training data
    * (the in-batch-negatives upgrade of Karpukhin et al. 2020, DPR):
    * for each anchor, the top-k highest-cosine corpus vectors whose
    * label DIFFERS from the anchor's — the near-misses a ranker most
    * needs to learn to separate. Same exact-cosine kernel, broadcast
    * anchor side, and WindowGroupLimit top-k shape as
    * [[bruteForceTopK]]; the label inequality rides in the join
    * predicate, so excluded same-label pairs never reach the scorer.
    * Output: (query_id, anchor_label, neighbor_id, neighbor_label,
    * rank, cosine) — deterministic tie-break on neighbor id. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"),
      toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
      .filter(col("cnorm") > 0)
    val q = anchors.select(col(idCol).as("query_id"),
      col(labelCol).as("anchor_label"),
      toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
      .filter(col("qnorm") > 0)
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
        col("anchor_label") =!= col("neighbor_label"))
      .withColumn("cosine", cosineWithNorms(
        dotProduct(col("qvec"), col("cvec")), col("qnorm"), col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("anchor_label"), col("neighbor_id"),
        col("neighbor_label"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified re-ranking: greedily select `k` of each query's
    * candidates maximizing `λ·relevance − (1−λ)·max-sim-to-selected` —
    * the standard retrieval-diversification pass between ANN candidate
    * generation and serving (or between mining and training-pair
    * selection, where near-identical positives waste batch slots).
    * The running max-sim is seeded at 0, so negative-cosine candidates
    * are never REWARDED for anti-similarity — only penalized once they
    * resemble a pick.
    *
    * Scale shape: each of the k rounds is one window over the
    * per-query candidate group (bounded by the candidate-gen k) plus
    * one broadcast join against the single picked row per query — the
    * corpus never re-enters; cost is k × |candidates|, embarrassingly
    * parallel across queries. Candidate vectors join in once, norms
    * precomputed; every round's frame is lazily checkpointed so the
    * k-deep lineage neither re-executes nor bloats task binaries.
    * Selection ranks on the UNROUNDED mmr (ties → lowest id); the
    * reported mmr is rounded for display. Output: (query_id, sel_rank,
    * neighbor_id, mmr). */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame,
                idCol: String, vecCol: String,
                scoreCol: String = "cosine",
                k: Int = 5, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0,
      "need k >= 1 and lambda in [0, 1]")
    val v = vectors.select(col(idCol).as("__vid"),
        toDouble(col(vecCol)).as("__vec"))
      .withColumn("__norm", l2Norm(col("__vec")))
      .filter(col("__norm") > 0)
    var rem = candidates.select(col("query_id"), col("neighbor_id"),
        col(scoreCol).cast("double").as("__score"))
      .join(v, col("neighbor_id") === col("__vid"))
      .select(col("query_id"), col("neighbor_id"), col("__score"),
        col("__vec"), col("__norm"))
      .withColumn("__maxsim", lit(0.0))
      .truncateLineage(false)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__mmr").desc, col("neighbor_id"))
    val picks = (1 to k).map { r =>
      val pick = rem
        .withColumn("__mmr", lit(lambda) * col("__score") -
          lit(1 - lambda) * col("__maxsim"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("neighbor_id").as("__sid"),
          col("__vec").as("__svec"), col("__norm").as("__snorm"),
          col("__mmr"))
        .truncateLineage(false)
      if (r < k)
        rem = rem.join(broadcast(pick.drop("__mmr")), Seq("query_id"))
          .filter(col("neighbor_id") =!= col("__sid"))
          .withColumn("__maxsim", greatest(col("__maxsim"),
            cosineWithNorms(dotProduct(col("__vec"), col("__svec")),
              col("__norm"), col("__snorm"))))
          .drop("__sid", "__svec", "__snorm")
          .truncateLineage(false)
      // display rounding at INTEGER scale (round(x·10⁶)/10⁶): Spark's
      // fractional round goes through the double's shortest decimal
      // repr while external engines round the binary value — at scale 0
      // the two rules provably agree, so a boundary-landing mmr (seen
      // in practice) renders identically everywhere
      pick.select(col("query_id"), lit(r).as("sel_rank"),
        col("__sid").as("neighbor_id"),
        (round(col("__mmr") * lit(1e6)) / lit(1e6)).as("mmr"))
    }
    picks.reduce(_ unionByName _)
  }

  /** Deterministic random hyperplanes (fixed seed) as a literal column of
    * `numPlanes` × `dim` doubles — broadcast for free as part of the plan.
    * Delegates to the graftext generator so the SQL surface
    * (`hyperplane_sign_buckets(...)` via `GraftExtensions`) hashes into
    * byte-identical buckets. */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int, seed: Long) =
    org.apache.spark.sql.graftext.HyperplaneSignBuckets
      .gaussianPlanes(numPlanes, dim, seed)

  /** Sign-bucket id for a vector under `planes`: bit p = sign(v · h_p).
    * Zero planes = one shared bucket (the exact-search degenerate). */
  private def signBucket(vec: org.apache.spark.sql.Column,
                         planes: Seq[Seq[Double]]) =
    if (planes.isEmpty) lit(0L)
    else planes.zipWithIndex.map { case (h, p) =>
      val hCol = array(h.map(lit): _*)
      when(dotProduct(vec, hCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Vector dimension probed from the SMALL queries side (one cheap
    * action); 0 on an empty query set, which yields an empty result
    * instead of a crash. */
  private def probeDim(queries: DataFrame, vecCol: String): Int =
    queries.select(size(col(vecCol))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Johnson–Lindenstrauss random projection to `k` dimensions:
    * y = (G·v)/√k with G a fixed-seed Gaussian matrix — the standard
    * pre-ANN compaction (JL: pairwise distances survive within 1±ε for
    * k = O(ln n / ε²), independent of the SOURCE dimension, so a
    * 4096-dim embedding column shrinks to 64 before any index is
    * built, cutting every downstream shuffle and scan by dim/k).
    *
    * Scale shape: the projection matrix is a LITERAL inside the
    * compiled expression (the hyperplane/codebook discipline — nothing
    * joins, nothing broadcasts explicitly); the operator is a narrow
    * codegen'd projection at scan speed. Components round to 6
    * decimals — deterministic, and replicated exactly by interpolating
    * the same literal matrix into the SQL oracle. Output: (id,
    * reduced array<double>). */
  def reduceDims(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                 seed: Long = 42L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val dim = probeDim(emb, vecCol)
    val v = col(vecCol).cast("array<double>")
    if (dim == 0)
      return emb.select(col(idCol).as("id"), v.as("reduced")).limit(0)
    val planes = hyperplanes(k, dim, seed)
    val scale = math.sqrt(k.toDouble)
    val comps = planes.map { h =>
      round(dotProduct(v, array(h.map(lit): _*)) / lit(scale), 6)
    }
    emb.select(col(idCol).as("id"), array(comps: _*).as("reduced"))
  }

  /** ANN top-k via random-hyperplane LSH: corpus and queries are hashed
    * into sign buckets; each query is scored only against its bucket
    * cohort (multi-probed to Hamming radius 1 — near-misses on one
    * hyperplane are the dominant loss mode), then exact cosine re-ranks.
    * `numPlanes` trades recall (fewer planes → bigger buckets → higher
    * recall & cost); the corpus side stays single-bucket so the index is
    * one hash pass over the 100 TB side, and only the small query side
    * fans out ×(numPlanes+1). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    require(numPlanes >= 0 && numPlanes <= 62,
      "numPlanes must be in [0, 62]; 0 = single shared bucket (exact)")
    val dim = probeDim(queries, vecCol)
    val planes = hyperplanes(numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("cvec"),
        signBucket(col(vecCol), planes).as("bucket"))
      .withColumn("cnorm", l2Norm(col("cvec")))
      .filter(col("cnorm") > 0) // zero vectors: no direction, no rank
    val probes = (0 until numPlanes).foldLeft(
      array(col("b0"))) { (acc, p) =>
      concat(acc, array(col("b0").bitwiseXOR(lit(1L << p))))
    }
    val q = queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("qvec"),
        signBucket(col(vecCol), planes).as("b0"))
      .withColumn("qnorm", l2Norm(col("qvec")))
      .filter(col("qnorm") > 0)
      .withColumn("bucket", explode(probes))
      .drop("b0")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineWithNorms(
        dotProduct(col("qvec"), col("cvec")), col("qnorm"), col("cnorm")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** IVF (inverted-file) ANN top-k: k-means-partition the corpus into
    * `nlist` cells, then score each query only against its `nprobe`
    * nearest cells.
    *
    * Training is a few Lloyd iterations run as Spark aggregations with
    * deterministic init (the `nlist` lowest-id vectors); only the
    * nlist×dim centroid table ever reaches the driver. At scale the cell
    * assignment is computed once per corpus vector (scan + broadcast
    * centroids, no shuffle) and could be persisted as a partition column,
    * making each query's work a `nprobe/nlist` fraction of the corpus.
    * `nprobe = nlist` degenerates to exact search (asserted in specs). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              lloydIters: Int = 2): DataFrame = {
    val c = ivfPrep(corpus, idCol, vecCol)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.isEmpty) {
      // empty corpus: empty result, correct schema, no crash
      return queries.limit(0).select(
        col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("cosine"))
    }
    val assigned = c.withColumn("cell",
      assignExpr(col("cvec"), centroids.toSeq))
    ivfScoreTopK(assigned,
      probeCells(queries, idCol, vecCol, centroids.toSeq, nprobe), k)
  }

  /** (neighbor_id, cvec, cnorm) prep shared by the IVF paths. Zero
    * vectors are dropped here — before training, assignment, and
    * persistence — so no IVF form can rank a NaN cosine. */
  private def ivfPrep(corpus: DataFrame, idCol: String,
                      vecCol: String): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
      .filter(col("cnorm") > 0)
      .truncateLineage(false)

  // One compiled argmax over the centroid matrix. The previous
  // greatest()-over-structs Column tree grew the plan O(nlist·dim) —
  // at nlist ≈ 500 (a 33k-vector SemDeDup probe) task binaries passed
  // 1.6 MB and assignment dominated the runtime. Same scores, same
  // larger-cell tie-break (oracle-pinned).
  private def assignExpr(vec: Column, centroids: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftext.NearestCentroid(vec, centroids)

  /** Lloyd training over the prepped corpus. Deterministic init (the
    * `nlist` lowest-id vectors); only nlist×dim values ever reach the
    * driver. Empty corpus → empty result.
    *
    * The refinement mean uses the integer-lattice long-sum discipline
    * (the pageRank-mass / correlation-moment precedent): elements
    * quantize to `round(v·10⁹)` longs, sum as hi/lo long halves against
    * overflow (exact, order-independent — longs never leave Spark's
    * compact unsafe-row fast path, unlike the decimal(38,12) sums this
    * replaced, which cost the whole IVF family 1.5–1.9× at bench), and
    * the exact reconstructed total takes ONE double division. Refined
    * centroids stay bit-identical across partitionings AND externally
    * replicable — a `lloydIters > 0` IVF query runs under a full DuckDB
    * oracle (q_sim_ivf_lloyd: HUGEINT sums of the same lattice points,
    * same double division). In-plan guard: |element| must stay below
    * 10⁹ (lattice point < 10¹⁸, so the hi-half long sum holds to
    * ~9·10⁹ rows per cell·dim; the lo half, bounded by 10⁹ per row,
    * holds the same). Same shuffle shape as the float form; the long
    * partials are map-side-combined identically. */
  private def trainCentroids(c: DataFrame, nlist: Int,
                             lloydIters: Int): Array[Seq[Double]] = {
    var centroids: Array[Seq[Double]] = c.orderBy(col("neighbor_id"))
      .limit(nlist).collect()
      .map(_.getSeq[Double](1))
    if (centroids.isEmpty) return centroids
    val split = 1000000000L
    (0 until lloydIters).foreach { _ =>
      // new centroid = per-cell per-dimension mean; nlist×dim values.
      // assert_true returns null when the bound holds, so gating the
      // mean on its null-ness evaluates the guard exactly once (the
      // correlationMatrix convention); mxq >= 0 catches double->long
      // saturation (abs(Long.MinValue) is negative).
      val means = c
        .withColumn("cell", assignExpr(col("cvec"), centroids.toSeq))
        .select(col("cell"), posexplode(col("cvec")).as(Seq("pos", "v")))
        .withColumn("q", round(col("v") * lit(1e9)).cast("long"))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(expr(s"q DIV $split")).as("hi"),
          sum(expr(s"q % $split")).as("lo"),
          max(abs(col("q"))).as("mxq"),
          count(lit(1)).as("cnt"))
        .select(col("cell"), col("pos"),
          when(assert_true(
              col("mxq") >= 0 && col("mxq") < lit(1000000000000000000L),
              lit("trainCentroids: |element| must stay below 1e9"))
            .isNull,
            (col("hi").cast("decimal(38,0)") * lit(split) + col("lo"))
              .cast("double") /
              (lit(1e9) * col("cnt").cast("double")))
            .as("m"))
        .groupBy(col("cell"))
        .agg(map_from_arrays(collect_list(col("pos")),
          collect_list(col("m"))).as("byPos"))
        .collect()
        .map(r => r.getInt(0) -> r.getMap[Int, Double](1))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        means.get(i)
          .map(m => old.indices.map(p => m.getOrElse(p, 0.0)))
          .getOrElse(old) // empty cell keeps its centroid
      }
    }
    centroids
  }

  /** Each query's `nprobe` nearest cells: (query_id, qvec, qnorm, cell).
    * Tie-break toward the larger cell to MATCH the assignment's tie
    * behavior: duplicate centroids then probe the cell the corpus
    * actually landed in, deterministically. One narrow projection — the
    * native top-K kernel replaced an explode-over-nlist-literal-structs
    * + rank-window form that both carried the O(nlist·dim) plan-size
    * flaw (see [[org.apache.spark.sql.graftext.NearestCentroid]]) and
    * shuffled the query side for the window. */
  private[graft] def probeCells(queries: DataFrame, idCol: String, vecCol: String,
                         centroids: Seq[Seq[Double]],
                         nprobe: Int): DataFrame =
    queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
      .filter(col("qnorm") > 0) // zero queries emit no rows
      .select(col("query_id"), col("qvec"), col("qnorm"),
        explode(org.apache.spark.sql.graftext.NearestCentroidsTopK(
          col("qvec"), centroids, nprobe)).as("cell"))

  /** Score each query against its probed cells; two-stage rank-limit. */
  private def ivfScoreTopK(assigned: DataFrame, probes: DataFrame,
                           k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineWithNorms(
        dotProduct(col("qvec"), col("cvec")), col("qnorm"), col("cnorm")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Train and PERSIST an IVF index: the corpus is written cell-partitioned
    * (`partitionBy("cell")`) so probed queries prune at the FILE level.
    * This is the 100 TB form: assignment is computed once (scan +
    * broadcast centroids, no shuffle), and every later query batch reads
    * only its probed cells' files. Returns the centroid table (nlist×dim)
    * — persist it next to the index for reuse. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    indexPath: String, nlist: Int = 16,
                    lloydIters: Int = 2): Seq[Seq[Double]] = {
    val c = ivfPrep(corpus, idCol, vecCol)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.nonEmpty) {
      c.withColumn("cell", assignExpr(col("cvec"), centroids.toSeq))
        // r16 (guide §6): cluster by cell before the partitioned write —
        // one file per cell directory instead of one per (scan partition
        // × cell), so probe-time reads open nlist files, not N·nlist
        // (appendIvfIndex already wrote this way)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    } else {
      // an empty corpus must not leave a STALE index behind: a caller
      // holding old centroids would silently query deleted data. Hadoop
      // FS API, not java.io.File — the delete must also work when the
      // index lives on HDFS/S3 (the 100 TB deployment), where a local
      // File recursion is a silent no-op.
      val path = new org.apache.hadoop.fs.Path(indexPath)
      path.getFileSystem(
        corpus.sparkSession.sessionState.newHadoopConf())
        .delete(path, true)
    }
    centroids.toSeq
  }

  /** Append NEW vectors to a persisted IVF index under the index's
    * EXISTING centroids — the growing-vector-store operation: a crawl
    * keeps producing embeddings, the index keeps serving probes, and
    * retraining (new centroids = new index) stays a deliberate
    * rebuild, never a silent drift. Batch ids already present in the
    * index are dropped first (one anti join against the index's
    * column-pruned id scan), so re-appending — including a replayed
    * streaming micro-batch — is a no-op, not a duplicate neighbor.
    * Appended rows exchange once by cell so each append lands one
    * file per touched cell directory; probes pick the new vectors up
    * through the same partition-pruned reads. */
  def appendIvfIndex(batch: DataFrame, indexPath: String,
                     centroids: Seq[Seq[Double]], idCol: String,
                     vecCol: String): Unit = {
    require(centroids.nonEmpty,
      "appendIvfIndex needs the index's centroids (rebuild an empty index)")
    // within-batch duplicates survive the store anti join (both copies
    // are absent from the index) — drop them first so the
    // duplicate-free contract holds inside one micro-batch too
    val prepped = ivfPrep(batch, idCol, vecCol)
      .dropDuplicates("neighbor_id")
    val existing = batch.sparkSession.read.parquet(indexPath)
      .select(col("neighbor_id").as("__seen")).distinct()
    prepped
      .join(existing, col("neighbor_id") === col("__seen"), "left_anti")
      .withColumn("cell", assignExpr(col("cvec"), centroids))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(indexPath)
  }

  /** ANN top-k over a persisted IVF index: the union of the query batch's
    * probed cells (≤ nlist ids — a bounded driver value, never vectors)
    * becomes a literal partition filter, so the parquet scan reads only
    * those cells' files (`PartitionFilters` in the plan, asserted in
    * specs). Results are identical to [[ivfTopK]] at equal parameters;
    * empty centroids (empty-corpus build) yield the same empty frame. */
  def ivfTopKIndexed(indexPath: String, centroids: Seq[Seq[Double]],
                     queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, nprobe: Int = 4): DataFrame = {
    if (centroids.isEmpty) {
      return queries.limit(0).select(
        col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("cosine"))
    }
    val probes = probeCells(queries, idCol, vecCol, centroids, nprobe)
      .truncateLineage(false) // read twice: cell-id collect + score join
    val cellIds = probes.select(col("cell")).distinct().collect()
      .map(_.getInt(0)).toSeq
    val assigned = queries.sparkSession.read.parquet(indexPath)
      .filter(col("cell").isin(cellIds: _*))
    ivfScoreTopK(assigned, probes, k)
  }

  /** Train and persist the SQ8 (int8-quantized) IVF index — IVF + scalar
    * quantization, the standard large-scale vector-store layout:
    * training and cell assignment run on the FLOAT vectors (quantization
    * never degrades the partitioning), but the persisted payload is
    * tinyint codes + the integer self-dot, so the index files shrink
    * ~8× vs float64 payloads and queries score in pure integer
    * arithmetic. Same file-level cell pruning as [[buildIvfIndex]];
    * same empty-corpus stale-index cleanup. */
  def buildIvfIndexQuantized(corpus: DataFrame, idCol: String,
                             vecCol: String, indexPath: String,
                             nlist: Int = 16,
                             lloydIters: Int = 2): Seq[Seq[Double]] = {
    import graft.functions.Quantize
    import org.apache.spark.sql.graftext.Int8DotProduct
    val c = ivfPrep(corpus, idCol, vecCol)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.nonEmpty) {
      c.withColumn("cell", assignExpr(col("cvec"), centroids.toSeq))
        .withColumn("scale", Quantize.int8Scale(col("cvec")))
        .withColumn("codes", Quantize.int8Codes(col("cvec"), col("scale")))
        // zero vectors (the only all-zero-codes case under the max-based
        // scale) are already gone via ivfPrep's norm filter, so selfdot
        // is always > 0 here
        .withColumn("selfdot", Int8DotProduct(col("codes"), col("codes")))
        .select(col("neighbor_id"), col("codes"), col("selfdot"), col("cell"))
        .repartition(col("cell")) // r16: one file per cell (guide §6)
        .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    } else {
      val path = new org.apache.hadoop.fs.Path(indexPath)
      path.getFileSystem(
        corpus.sparkSession.sessionState.newHadoopConf())
        .delete(path, true)
    }
    centroids.toSeq
  }

  /** ANN top-k over a persisted SQ8 IVF index: probing is float (the
    * centroids are float — the probe cost is nlist×dim per query, tiny),
    * scoring is pure integer ([[quantizedTopK]]'s cancelled-scale
    * cosine) over the file-pruned cells. At nprobe = nlist this equals
    * [[quantizedTopK]] exactly (every cell probed ⇒ exact search over
    * the quantized corpus — the oracle form). */
  def ivfTopKIndexedQuantized(indexPath: String, centroids: Seq[Seq[Double]],
                              queries: DataFrame, idCol: String,
                              vecCol: String, k: Int,
                              nprobe: Int = 4): DataFrame = {
    import graft.functions.Quantize
    import org.apache.spark.sql.graftext.Int8DotProduct
    if (centroids.isEmpty) {
      return queries.limit(0).select(
        col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("cosine"))
    }
    val probes = probeCells(queries, idCol, vecCol, centroids, nprobe)
      .withColumn("qscale", Quantize.int8Scale(col("qvec")))
      .withColumn("qcodes", Quantize.int8Codes(col("qvec"), col("qscale")))
      // zero queries are already excluded by probeCells' norm filter
      .withColumn("qselfdot",
        Int8DotProduct(col("qcodes"), col("qcodes")).cast("double"))
      .select(col("query_id"), col("qcodes"), col("qselfdot"), col("cell"))
      .truncateLineage(false) // read twice: cell-id collect + score join
    val cellIds = probes.select(col("cell")).distinct().collect()
      .map(_.getInt(0)).toSeq
    val idx = queries.sparkSession.read.parquet(indexPath)
      .filter(col("cell").isin(cellIds: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    idx.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Int8DotProduct(col("qcodes"), col("codes")).cast("double") /
          (sqrt(col("qselfdot")) * sqrt(col("selfdot").cast("double"))))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding near-dup pairs via banded (OR-amplified) hyperplane LSH,
    * verified with exact cosine — the scale path version of
    * [[Dedup.embeddingNearDupPairs]] (which is the O(n²) oracle/baseline).
    *
    * Structure mirrors MinHash-LSH banding: each vector is hashed into
    * `tables` independent sign-buckets of `numPlanes` hyperplanes; a pair
    * is a candidate iff it collides in ≥1 table; candidates are
    * deduplicated and re-scored with exact cosine, so precision is 1 and
    * the output is a subset of the exact result with per-pair miss
    * probability (1 − p^numPlanes)^tables, p = 1 − θ/π.
    *
    * Recall is threshold-dependent: at cosine ≥ 0.8 (the realistic
    * near-dup regime) p ≈ 0.80 and a handful of tables give recall ~1
    * with tiny buckets; at this corpus's adversarial t = 0.45 (θ ≈ 63°,
    * p ≈ 0.65) full recall needs the default 64×5 banding, whose
    * candidate set approaches all-pairs — the information-theoretic
    * price of sign-LSH near the 90° no-gap limit, paid in the cheap
    * verify stage (one codegen'd dot per DISTINCT candidate). Defaults
    * give measured recall 1.0 vs exact on the sf0.01 and sf0.1 corpora
    * (expected misses 6e-3 resp. 6e-2 at worst-case cosine 0.45);
    * asserted each round by `OperatorsSpec` and the `q_dedup_embedding`
    * DuckDB gate.
    *
    * Shuffle posture at 100 TB: the keys frame is (id, table, bucket) —
    * `tables` small rows per vector, no vector payload; the bucket join
    * shuffles keys only, and vectors are joined back just for the
    * candidate verify (shuffle ∝ candidates, not corpus²). */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, numPlanes: Int = 5,
                      tables: Int = 64, seed: Long = 42L): DataFrame = {
    val dim = probeDim(emb, vecCol)
    val planes = hyperplanes(tables * numPlanes, dim, seed)
    val v = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("vec"))
      .withColumn("norm", l2Norm(col("vec")))
      // NaN >= threshold is TRUE under Spark's NaN-largest ordering, so a
      // zero vector would pair with its whole bucket; exclude it instead
      .filter(col("norm") > 0)
      // both the keys frame and both verify branches read this
      .truncateLineage(false)
    lshCandidates(v, planes, numPlanes, tables)
      .join(v.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("norm").as("norm_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("norm").as("norm_b")), "id_b")
      .withColumn("cosine", cosineWithNorms(
        dotProduct(col("vec_a"), col("vec_b")), col("norm_a"), col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Cross-corpus semantic near-dup detection — the embedding analog of
    * [[Dedup.minHashLshPairsAgainst]]: find (corpus, newEmb) pairs with
    * cosine ≥ threshold WITHOUT ever pairing the corpus against itself.
    * The two use cases of corpus maintenance: semantic benchmark
    * decontamination (newEmb = the benchmark's embeddings; every flagged
    * id_a is a training document semantically too close to a test item)
    * and incremental ingest dedup (newEmb = the arriving batch).
    *
    * Same banded hyperplane-LSH shape as [[lshNearDupPairs]] — both
    * sides hash with the SAME planes, candidates are cross-side bucket
    * collisions only, then exact-cosine verification. At 100 TB the
    * corpus is hashed in one scan and the join output is bounded by
    * cross-side collisions (∝ true matches at a realistic threshold —
    * the t08 regime), never |corpus|². Output: (id_a = corpus id,
    * id_b = newEmb id, cosine). */
  def lshNearDupPairsAgainst(newEmb: DataFrame, corpus: DataFrame,
                             idCol: String, vecCol: String,
                             threshold: Double, numPlanes: Int = 5,
                             tables: Int = 64, seed: Long = 42L): DataFrame = {
    val dim = probeDim(newEmb, vecCol)
    val planes = hyperplanes(tables * numPlanes, dim, seed)
    def prep(df: DataFrame) = df
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("vec"))
      .withColumn("norm", l2Norm(col("vec")))
      .filter(col("norm") > 0) // NaN >= t is TRUE; exclude zero vectors
      .truncateLineage(false)  // keys + verify both read each side
    val old = prep(corpus)
    val nw = prep(newEmb)
    def keys(v: DataFrame) = v.select(col("id"),
      posexplode(org.apache.spark.sql.graftext.HyperplaneSignBuckets(
        col("vec"), planes, numPlanes, tables)).as(Seq("t", "bucket")))
    keys(old).as("a").join(keys(nw).as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .join(old.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("norm").as("norm_a")), "id_a")
      .join(nw.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("norm").as("norm_b")), "id_b")
      .withColumn("cosine", cosineWithNorms(
        dotProduct(col("vec_a"), col("vec_b")), col("norm_a"), col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Product-quantization codebooks: the vector space is split into `m`
    * contiguous subspaces and each gets its own `ksub`-centroid
    * codebook. `lloydIters = 0` keeps the deterministic lowest-id init
    * (codebook j = subspace-j slices of the `ksub` lowest-id vectors) —
    * one bounded driver collect, exactly replicable by an external
    * oracle; `lloydIters > 0` runs per-subspace Lloyd refinement via
    * the shared trainer (m bounded Spark aggregations). */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, ksub: Int,
                       lloydIters: Int = 0): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && ksub >= 1, "m and ksub must be >= 1")
    val base = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cvec"))
    val dim = probeDim(corpus, vecCol)
    if (dim == 0) return Seq.fill(m)(Seq.empty)
    require(dim % m == 0, s"m = $m must divide dim = $dim")
    val dsub = dim / m
    if (lloydIters == 0) {
      val init = base.orderBy(col("neighbor_id")).limit(ksub).collect()
        .map(_.getSeq[Double](1))
      (0 until m).map(j =>
        init.map(v => v.slice(j * dsub, (j + 1) * dsub)).toSeq)
    } else {
      (0 until m).map { j =>
        val sliced = base.select(col("neighbor_id"),
          slice(col("cvec"), j * dsub + 1, dsub).as("cvec"))
        trainCentroids(sliced, ksub, lloydIters).toSeq
      }
    }
  }

  /** PQ ANN top-k (asymmetric distance): the corpus is stored as `m`
    * small codebook indices per vector (32–64× smaller than float —
    * the standard billion-vector layout), queries stay float, and every
    * pair is scored with the compiled ADC kernel
    * ([[org.apache.spark.sql.graftext.PqAdcCosine]] — the codebook
    * rides inside the expression, never in the plan). Encoding reuses
    * the [[org.apache.spark.sql.graftext.NearestCentroid]] argmax per
    * subspace, so assignment ties and scores are engine-replicable;
    * with `lloydIters = 0` the whole path — train, encode, score,
    * rank — is deterministic and exactly oracle-able. `ksub` ≥ corpus
    * size degenerates to exact search (every vector reconstructs
    * itself; spec-pinned). Zero-norm vectors are excluded like every
    * ranking path. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
             lloydIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.graftext.{NearestCentroid, PqAdcCosine}
    val cbs = trainPqCodebooks(corpus, idCol, vecCol, m, ksub, lloydIters)
    if (cbs.head.isEmpty) {
      return queries.limit(0).select(
        col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("cosine"))
    }
    val dsub = cbs.head.head.size
    val c = corpus.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
      .filter(col("cnorm") > 0)
      .withColumn("codes", array((0 until m).map(j =>
        NearestCentroid(slice(col("cvec"), j * dsub + 1, dsub),
          cbs(j))): _*))
      .select(col("neighbor_id"), col("codes"))
    val q = queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
      .filter(col("qnorm") > 0)
      .select(col("query_id"), col("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", PqAdcCosine(col("qvec"), col("codes"), cbs))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Train and PERSIST the IVF-PQ index — coarse IVF cells for
    * file-level pruning with PQ codes as the payload, the standard
    * billion-vector layout (inverted file + asymmetric distance,
    * Jégou et al. 2011). The persisted row is (neighbor_id, codes[m]) —
    * m small codebook indices instead of dim floats, so the index pays
    * neither the float storage of [[buildIvfIndex]] nor the dim-bytes
    * payload of the SQ8 index, on top of the same partition pruning.
    * With `residuals = false` (the default) codebooks are trained on
    * the RAW vectors so indexed scoring is bit-identical to [[pqTopK]]
    * under the same codebooks — at nprobe = nlist the two are provably
    * equal (every cell probed ⇒ exact search over the PQ-coded corpus —
    * the oracle form). With `residuals = true` codebooks quantize
    * `v − µ_cell` per FAISS/Jégou 2011 — the accuracy-per-byte standard:
    * residuals concentrate near 0 with far less spread than raw
    * vectors, so the same (m, ksub) budget reconstructs tighter (recall
    * ≥ the raw mode at equal size; spec-measured). Same empty-corpus
    * stale-index cleanup as the other builders. Returns
    * (coarse centroids, PQ codebooks) — persist both next to the index
    * for reuse, and probe with the SAME `residuals` flag. */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      indexPath: String, nlist: Int = 16, m: Int = 8,
                      ksub: Int = 16, lloydIters: Int = 2,
                      pqLloydIters: Int = 0, residuals: Boolean = false)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    import org.apache.spark.sql.graftext.NearestCentroid
    val c = ivfPrep(corpus, idCol, vecCol)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.isEmpty) {
      val path = new org.apache.hadoop.fs.Path(indexPath)
      path.getFileSystem(
        corpus.sparkSession.sessionState.newHadoopConf())
        .delete(path, true)
      return (Seq.empty, Seq.empty)
    }
    val assigned = c.withColumn("cell",
      assignExpr(col("cvec"), centroids.toSeq))
    // the frame the codebooks quantize: raw vectors, or per-cell
    // residuals (broadcast centroid join + elementwise subtract)
    val coded =
      if (!residuals) assigned.withColumn("qvec", col("cvec"))
      else assigned
        .join(broadcast(centroidFrame(corpus.sparkSession, centroids.toSeq)),
          "cell")
        .withColumn("qvec", zip_with(col("cvec"), col("ccent"),
          (x, cc) => x - cc))
        .drop("ccent")
    // raw mode trains on the caller's frame exactly as pqTopK does (the
    // oracle replicates that init); residual mode trains on the
    // residual frame
    val cbs =
      if (!residuals)
        trainPqCodebooks(corpus, idCol, vecCol, m, ksub, pqLloydIters)
      else trainPqCodebooks(coded, "neighbor_id", "qvec", m, ksub,
        pqLloydIters)
    val dsub = cbs.head.head.size
    coded
      .withColumn("codes", array((0 until m).map(j =>
        NearestCentroid(slice(col("qvec"), j * dsub + 1, dsub),
          cbs(j))): _*))
      .select(col("neighbor_id"), col("codes"), col("cell"))
      .repartition(col("cell")) // r16: one file per cell (guide §6)
      .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    (centroids.toSeq, cbs)
  }

  /** K-means cluster assignment of an embedding corpus: (id, cell) for
    * every non-zero vector — the topic-clustering / corpus-partitioning
    * surface of the same machinery the IVF indexes and SemDeDup use
    * (shared trainer, shared compiled argmax, so an external oracle that
    * replicates one replicates all). `lloydIters = 0` keeps the
    * deterministic lowest-id init — the exactly-replicable form; higher
    * values run Lloyd refinement (one bounded aggregation per round).
    * Scale shape: training collects nlist×dim doubles; assignment is a
    * broadcast-centroid scan — zero shuffle. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, lloydIters: Int = 2): DataFrame = {
    val c = ivfPrep(emb, idCol, vecCol)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.isEmpty)
      return emb.limit(0).select(col(idCol).as("id"), lit(0).as("cell"))
    c.select(col("neighbor_id").as("id"),
      assignExpr(col("cvec"), centroids.toSeq).as("cell"))
  }

  /** Small (cell, centroid) frame for broadcast joins — nlist rows. */
  private def centroidFrame(spark: SparkSession,
                            centroids: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (cvec, i) => (i, cvec) }
      .toDF("cell", "ccent")
  }

  /** ANN top-k over a persisted IVF-PQ index: the query batch's probed
    * cells become a literal partition filter like [[ivfTopKIndexed]]
    * (the scan reads only those cells' FILES), and each surviving row
    * costs one compiled ADC pass over m ints like [[pqTopK]]. At
    * nprobe = nlist, raw mode equals [[pqTopK]] at the same (m, ksub,
    * pqLloydIters) exactly — the oracle form; empty centroids (empty
    * corpus) yield the same empty frame as every ranking path. Pass the
    * SAME `residuals` flag the index was built with: residual codes
    * score through [[org.apache.spark.sql.graftext.PqAdcCosineShifted]]
    * with the probed cell's centroid as the reconstruction shift (the
    * centroid joins onto the probe frame — an nlist-bounded broadcast,
    * no per-row lookup tree in the plan). */
  def ivfTopKIndexedPq(indexPath: String, centroids: Seq[Seq[Double]],
                       codebooks: Seq[Seq[Seq[Double]]],
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int = 4,
                       residuals: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftext.{PqAdcCosine, PqAdcCosineShifted}
    if (centroids.isEmpty) {
      return queries.limit(0).select(
        col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("cosine"))
    }
    val probes0 = probeCells(queries, idCol, vecCol, centroids, nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val probes = (if (!residuals) probes0
      else probes0.join(
        broadcast(centroidFrame(queries.sparkSession, centroids)), "cell"))
      .truncateLineage(false) // read twice: cell-id collect + score join
    val cellIds = probes.select(col("cell")).distinct().collect()
      .map(_.getInt(0)).toSeq
    val idx = queries.sparkSession.read.parquet(indexPath)
      .filter(col("cell").isin(cellIds: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    idx.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        if (!residuals) PqAdcCosine(col("qvec"), col("codes"), codebooks)
        else PqAdcCosineShifted(col("qvec"), col("codes"), col("ccent"),
          codebooks))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Semantic dedup (SemDeDup-style, Abbas et al. 2023): k-means the
    * corpus into `nlist` cells, then WITHIN each cell drop every vector
    * whose cosine to a lower-id cellmate is ≥ `threshold`; returns the
    * kept rows as (id, cell). This is the parallel (index-order)
    * variant of the paper's per-cluster sweep: vector i is dropped iff
    * some j < i in its cell has cos(i, j) ≥ t — a pure anti-join, no
    * sequential greedy state.
    *
    * Scale shape: the cells BOUND the quadratic — the pair join is
    * keyed by cell, so cost is Σ|cell|² instead of n², and nlist scales
    * with the corpus (the paper uses n/1000-ish cells at web scale).
    * One keyed shuffle for the join; assignment is scan + broadcast
    * centroids. `nlist = 1` degenerates to exact all-pairs dedup (the
    * oracle form); `lloydIters = 0` keeps the deterministic lowest-id
    * init, making the cell layout reproducible across engines (Lloyd
    * refinement aggregates floats in nondeterministic order). */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nlist: Int = 16,
               lloydIters: Int = 0): DataFrame = {
    // NOT ivfPrep: its zero-norm exclusion is ranking semantics. A
    // dedup operator must KEEP a zero vector (it duplicates nothing —
    // cosine is undefined), so zero rows stay in the frame and the dup
    // condition below guards the norms instead: without the guard,
    // NaN >= t is TRUE under Spark's NaN-largest ordering and a zero
    // vector would be swept as a duplicate of any lower-id cellmate.
    val c = emb.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
      .truncateLineage(false)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.isEmpty) {
      return emb.limit(0).select(col(idCol).as("id"), lit(0).as("cell"))
    }
    val assigned = c
      .withColumn("cell", assignExpr(col("cvec"), centroids.toSeq))
      .select(col("neighbor_id").as("id"), col("cvec").as("vec"),
        col("cnorm").as("norm"), col("cell"))
    val dup = col("a.cell") === col("b.cell") &&
      col("b.id") < col("a.id") &&
      col("a.norm") > 0 && col("b.norm") > 0 &&
      cosineWithNorms(dotProduct(col("a.vec"), col("b.vec")),
        col("a.norm"), col("b.norm")) >= threshold
    assigned.as("a").join(assigned.as("b"), dup, "left_anti")
      .select(col("id"), col("cell"))
  }

  /** Embedding outlier detection — the "flag mislabeled / off-domain /
    * corrupt vectors" pass of embedding-corpus QA: assign every vector
    * to its nearest k-means cell (the [[semDedup]] machinery), measure
    * each vector's cosine DISTANCE to its cell centroid, and flag
    * vectors whose distance z-score within the cell exceeds `zMax` —
    * far-from-every-prototype points that cluster structure can't
    * explain.
    *
    * Scale shape: assignment is a broadcast-centroid scan (no shuffle);
    * per-cell moment stats aggregate to nlist rows (map-side partials,
    * a metadata-sized exchange) and broadcast back; the flag itself is
    * a narrow filter. The corpus is scanned, never shuffled — the same
    * posture as the IVF build. Distances round to 9 decimals and the
    * moments sum as DECIMAL, so mean/std/z are summation-order-
    * independent and engine-reproducible. `lloydIters = 0` keeps the
    * deterministic lowest-id centroid init (exactly replicable by the
    * DuckDB oracle — the [[semDedup]] precedent); zero vectors have no
    * direction and are excluded like every ranking path here. Cells
    * with zero distance variance flag nothing.
    *
    * Output: flagged rows only — (id, cell, dist, z), z rounded to 6. */
  def embeddingOutliers(emb: DataFrame, idCol: String, vecCol: String,
                        nlist: Int = 16, zMax: Double = 2.0,
                        lloydIters: Int = 0): DataFrame = {
    require(zMax > 0, "zMax must be positive")
    val spark = emb.sparkSession
    import spark.implicits._
    val c = ivfPrep(emb, idCol, vecCol)
    val centroids = trainCentroids(c, nlist, lloydIters)
    if (centroids.isEmpty)
      return emb.limit(0).select(col(idCol).as("id"), lit(0).as("cell"),
        lit(0.0).as("dist"), lit(0.0).as("z"))
    val centDf = centroids.toSeq.zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("cell", "centroid")
    val withDist = c
      .withColumn("cell", assignExpr(col("cvec"), centroids.toSeq))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("dist", round(lit(1.0) -
        dotProduct(col("cvec"), col("centroid")) /
          (col("cnorm") * l2Norm(col("centroid"))), 9))
    // per-cell first/second moments as exact decimals: nlist rows out
    val dd = col("dist").cast("decimal(18,9)")
    val stats = withDist
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(dd).as("s1"), sum(dd * dd).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("std", sqrt(greatest(
        col("s2").cast("double") / col("n") - col("mean") * col("mean"),
        lit(0.0))))
      .select(col("cell"), col("mean"), col("std"))
    withDist.join(broadcast(stats), Seq("cell"))
      .filter(col("std") > 0 &&
        (col("dist") - col("mean")) / col("std") > zMax)
      .select(col("neighbor_id").as("id"), col("cell"),
        round(col("dist"), 6).as("dist"),
        round((col("dist") - col("mean")) / col("std"), 6).as("z"))
  }

  /** Exact top-k over the int8-QUANTIZED corpus — the reduced-bandwidth
    * scoring path for quantized embedding stores: both sides quantize to
    * tinyint codes ([[graft.functions.Quantize]]) and every pair is
    * scored with the integer kernel ([[org.apache.spark.sql.graftext
    * .Int8DotProduct]]). The per-vector scales CANCEL in cosine —
    * cos(deq(a), deq(b)) = Σab / (√Σaa·√Σbb) — so scoring never touches
    * a float vector: the hot loop reads ¼ (vs float32) or ⅛ (vs
    * float64) of the bytes per pair, the bound that matters when
    * all-pairs scoring is memory-bandwidth-limited. Results differ from
    * [[bruteForceTopK]] only by the quantization error (measured
    * fidelity ≥ 0.99995 cosine on the test corpus); the ranking itself
    * is deterministic and exactly oracle-able. Zero-norm vectors
    * (cosine 0/0 = NaN, which Spark would order FIRST under desc) are
    * excluded up front on the cheap float side with the SAME l2-norm
    * predicate as [[bruteForceTopK]] — so both paths agree on which ids
    * participate, and the filter never duplicates the quantize+dot tree
    * into a pushed-down predicate (measured 5× on the sf0.1 bench when
    * filtering on selfdot instead). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    import graft.functions.Quantize
    import org.apache.spark.sql.graftext.Int8DotProduct
    def quantized(df: DataFrame, as: String, p: String) =
      df.select(col(idCol).as(as), toDouble(col(vecCol)).as("e"))
        // the SAME norm predicate as the exact path, so both paths agree
        // on which ids participate even for subnormal vectors (where
        // dot(v,v) underflows to 0) or NaN elements (norm NaN > 0 false)
        .filter(l2Norm(col("e")) > 0)
        .withColumn("scale", Quantize.int8Scale(col("e")))
        .select(col(as),
          Quantize.int8Codes(col("e"), col("scale")).as(s"${p}codes"))
        .withColumn(s"${p}selfdot", Int8DotProduct(
          col(s"${p}codes"), col(s"${p}codes")).cast("double"))
    val c = quantized(corpus, "neighbor_id", "c")
    val q = quantized(queries, "query_id", "q")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Int8DotProduct(col("qcodes"), col("ccodes")).cast("double") /
          (sqrt(col("qselfdot")) * sqrt(col("cselfdot"))))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Group-wise embedding pooling: the per-key mean vector (domain /
    * label / cluster centroids — the standard reduction for
    * source-level semantic profiles, retrieval-cluster summaries, and
    * k-NN classifier prototypes). Output: (key, n_vectors, centroid),
    * centroid elements rounded to 6 decimals; `normalize = true`
    * rescales the (rounded) mean to unit L2 norm — zero means stay
    * zero rather than dividing by 0.
    *
    * Determinism: each element is rounded to 9 decimals and summed as
    * DECIMAL — exact, order-independent addition — then one double
    * division by the count, so the centroid is bit-identical across
    * partitionings (and engines), like the BM25/LM scores. Scale
    * shape: posexplode + two-level hash aggregate — per-(key, dim)
    * partials collapse map-side, the shuffle carries keys × dim skinny
    * rows, and nothing collects. */
  def meanPoolByKey(emb: DataFrame, keyCol: String, vecCol: String,
                    normalize: Boolean = false): DataFrame = {
    val byDim = emb
      .select(col(keyCol).as("key"), toDouble(col(vecCol)).as("vec"))
      .select(col("key"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy(col("key"), col("pos"))
      .agg((sum(round(col("x"), 9).cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as("m"), count(lit(1)).as("cnt"))
    val pooled = byDim.groupBy(col("key"))
      // per-dim counts are all the group size for a well-formed (fixed
      // dim) embedding column; max() also gives ragged input a defined
      // meaning (densest dimension's support)
      .agg(max(col("cnt")).as("n_vectors"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => round(s.getField("m"), 6)).as("mean"))
    val out =
      if (!normalize) pooled.withColumn("centroid", col("mean"))
      else pooled.withColumn("centroid",
        when(l2Norm(col("mean")) > 0,
          transform(col("mean"), x => round(x / l2Norm(col("mean")), 6)))
          .otherwise(col("mean")))
    out.select(col("key"), col("n_vectors"), col("centroid"))
  }

  /** Distinct colliding (id_a < id_b) pairs of `v` (columns `id`, `vec`)
    * under the banded sign-bucket layout — the verify-stage candidate
    * volume of [[lshNearDupPairs]]. `private[graft]` so the scale probe
    * measures the operator's OWN candidate pipeline rather than a
    * re-implementation that could silently drift. Native one-pass
    * bucketing: the equivalent Column tree (tables × numPlanes
    * literal-array dots) overflows codegen and interprets. */
  private[graft] def lshCandidates(v: DataFrame, planes: Seq[Seq[Double]],
                                   numPlanes: Int, tables: Int): DataFrame = {
    val keys = v.select(col("id"),
      posexplode(org.apache.spark.sql.graftext.HyperplaneSignBuckets(
        col("vec"), planes, numPlanes, tables)).as(Seq("t", "bucket")))
    keys.as("a").join(keys.as("b"),
        col("a.t") === col("b.t") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Recall@k evaluation — the acceptance metric for every
    * approximate retrieval path in this module (LSH multi-probe, IVF
    * partial probe, PQ/ADC): what fraction of the EXACT top-k did the
    * approximate search return, per query and macro-averaged. Run it
    * whenever an index parameterization changes — a recall number is
    * the only honest way to trade nprobe/planes against latency.
    *
    * Both inputs are (query_id, neighbor_id, ...) top-k frames (the
    * `lshTopK`/`ivfTopK`/`bruteForceTopK` shape); `exact` defines
    * truth, so per-query n_truth is ITS row count (k, or fewer when
    * the corpus is small). One key-keyed left join + one query-keyed
    * aggregate — both sides are top-k-sized (queries·k rows), nothing
    * corpus-scale. Per-query recalls round-9 and DECIMAL-sum into the
    * macro average (order-independent); displays on the 6-decimal
    * integer lattice. Emits (query_id, n_truth, n_hit, recall,
    * macro_recall) with the macro constant across rows. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1))
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
    def disp(c: Column): Column =
      round(c * lit(1e6)).cast("double") / lit(1e6)
    val r = col("n_hit").cast("double") / col("n_truth").cast("double")
    hits
      .withColumn("recall", disp(r))
      .withColumn("__r9", round(r, 9).cast("decimal(38,9)"))
      .withColumn("macro_recall",
        disp(sum(col("__r9")).over(Window.partitionBy()).cast("double") /
          count(lit(1)).over(Window.partitionBy()).cast("double")))
      .drop("__r9")
  }
}
