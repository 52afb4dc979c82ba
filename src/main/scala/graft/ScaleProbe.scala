package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev utility: measured scaling of the similarity operators (the source
  * of BASELINE.md's "Similarity scale behavior" table).
  *
  * Corpus construction mirrors the dedup scale probe: the sf0.1
  * embeddings table (2,000 × dim-64) is replicated R times, replica r
  * circularly shifted by r positions — shifts preserve norms and
  * intra-replica dot products exactly, while cross-replica cosines stay
  * at background level, so the planted near-dup structure scales
  * linearly and replicas never pair with each other. Every 20th vector
  * gets a planted companion (`e + 0.2·reverse(e)`, cosine ≈ 0.98 — the
  * q_dedup_embedding_t08 construction), i.e. 100 true pairs per replica.
  *
  * For each scale it reports, at threshold 0.8:
  *   - lshNearDupPairs wall time, DISTINCT candidate-pair count, found
  *     pairs, and recall vs the planted count. `numPlanes` grows with
  *     log₂(n) so expected bucket occupancy stays O(1) — the knob that
  *     keeps candidates ∝ true pairs instead of ∝ n²/2^planes.
  *   - buildIvfIndex + ivfTopKIndexed wall times (nlist ~ √n, nprobe=4)
  *     vs bruteForceTopK as the linear-scan contrast, 10 queries each.
  *
  * Usage: runMain graft.ScaleProbe [replicas...]   (default 1 5 20 50)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 5, 20, 50)
    // shift = r % dim would alias replica r with replica r-64: identical
    // vectors under different ids would flood the pair counts and
    // silently corrupt the recorded scaling table
    require(replicas.forall(r => r >= 1 && r <= 64),
      s"replicas must be in [1, 64] (dim-64 circular shifts are only " +
        s"injective that far); got ${replicas.mkString(",")}")
    val spark = LocalSession()
    val base = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val dim = 64

    def corpusOf(r: Int): DataFrame = {
      val shift = r % dim
      val shifted = base.select(
        (col("vec_id") + r * 1000000L).as("vec_id"),
        (if (shift == 0) col("e")
         else concat(slice(col("e"), shift + 1, dim - shift),
           slice(col("e"), 1, shift))).as("e"))
      val companions = shifted.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          zip_with(col("e"), reverse(col("e")),
            (x, y) => x + lit(0.2) * y).as("e"))
      shifted.union(companions)
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    replicas.foreach { rep =>
      val corpus = (0 until rep).map(corpusOf).reduce(_ union _)
        .localCheckpoint(true)
      val n = corpus.count()
      val planted = rep * 100L
      // occupancy-preserving banding: 2^planes buckets ∝ n
      val planes = math.max(8, (math.log(n.toDouble / 8) / math.log(2)).ceil.toInt)
      val tables = 16
      // warm once (plane broadcast, codegen), then measure
      Similarity.lshNearDupPairs(corpus, "vec_id", "e", threshold = 0.8,
        numPlanes = planes, tables = tables).count()
      val (pairs, tLsh) = timed {
        Similarity.lshNearDupPairs(corpus, "vec_id", "e", threshold = 0.8,
          numPlanes = planes, tables = tables).count()
      }
      // distinct colliding pairs — counted through the operator's OWN
      // candidate pipeline (same planes, same seed), so the number can't
      // drift from what lshNearDupPairs actually verifies
      val cands = Similarity.lshCandidates(
          corpus.select(col("vec_id").as("id"), col("e").as("vec")),
          Similarity.hyperplanes(tables * planes, dim, 42L),
          planes, tables).count()

      val queries = corpus.filter(col("vec_id") < 10)
      val nlist = math.max(16,
        math.pow(2, (math.log(math.sqrt(n.toDouble)) / math.log(2)).round.toInt).toInt)
      val idxPath = s"/tmp/graft_scaleprobe_ivf_$rep"
      val (centroids, tBuild) = timed {
        Similarity.buildIvfIndex(corpus, "vec_id", "e", idxPath,
          nlist = nlist, lloydIters = 1)
      }
      val (_, tIvf) = timed {
        Similarity.ivfTopKIndexed(idxPath, centroids, queries, "vec_id", "e",
          k = 5, nprobe = 4).count()
      }
      // rows the pruned scan actually reads: the query batch's probed
      // cells, counted off the persisted index
      val probedCells = Similarity.probeCells(queries, "vec_id", "e",
          centroids, 4).select("cell").distinct().collect().map(_.getInt(0))
      val scanned = spark.read.parquet(idxPath)
        .filter(col("cell").isin(probedCells.toIndexedSeq: _*)).count()
      val (_, tBrute) = timed {
        Similarity.bruteForceTopK(corpus, queries, "vec_id", "e", 5).count()
      }

      // IVF-PQ (raw-encoded headline form): same coarse layout, but the
      // persisted payload is m=8 small ints per vector instead of 64
      // floats — measure build, probe, and actual on-disk bytes/vector
      val pqPath = s"/tmp/graft_scaleprobe_ivfpq_$rep"
      val ((pqCents, pqCbs), tPqBuild) = timed {
        Similarity.buildIvfPqIndex(corpus, "vec_id", "e", pqPath,
          nlist = nlist, m = 8, ksub = 16, lloydIters = 1,
          pqLloydIters = 0)
      }
      val (_, tPq) = timed {
        Similarity.ivfTopKIndexedPq(pqPath, pqCents, pqCbs, queries,
          "vec_id", "e", k = 5, nprobe = 4).count()
      }
      def dirBytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(p))
      }
      val pqBpv = dirBytes(pqPath).toDouble / n
      val floatBpv = dirBytes(idxPath).toDouble / n

      // residual-encoded IVF-PQ: same layout and byte budget, codes
      // quantize v − µ_cell (the accuracy-per-byte mode)
      val pqrPath = s"/tmp/graft_scaleprobe_ivfpqr_$rep"
      val ((prCents, prCbs), tPqrBuild) = timed {
        Similarity.buildIvfPqIndex(corpus, "vec_id", "e", pqrPath,
          nlist = nlist, m = 8, ksub = 16, lloydIters = 1,
          pqLloydIters = 0, residuals = true)
      }
      val (_, tPqr) = timed {
        Similarity.ivfTopKIndexedPq(pqrPath, prCents, prCbs, queries,
          "vec_id", "e", k = 5, nprobe = 4, residuals = true).count()
      }

      println(f"SCALE n=$n%7d planes=$planes%2d tables=$tables " +
        f"lsh=$tLsh%6.1fs cands=$cands%9d pairs=$pairs%6d " +
        f"recall=${pairs.toDouble / planted}%.4f | " +
        f"nlist=$nlist%4d build=$tBuild%6.1fs ivf(nprobe=4)=$tIvf%5.2fs " +
        f"scanned=$scanned%7d (${100.0 * scanned / n}%.1f%%) " +
        f"brute=$tBrute%5.2fs | " +
        f"pq: build=$tPqBuild%6.1fs probe=$tPq%5.2fs " +
        f"B/vec=$pqBpv%5.1f (float $floatBpv%5.1f) | " +
        f"pq-resid: build=$tPqrBuild%6.1fs probe=$tPqr%5.2fs")
    }
    spark.stop()
  }
}
