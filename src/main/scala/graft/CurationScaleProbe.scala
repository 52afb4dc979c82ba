package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dev utility: measured scaling of the round-4 dedup operators (the
  * source of BASELINE.md's "Passage dedup / SemDeDup scale behavior"
  * table).
  *
  * Corpus construction follows the established probes:
  *   - documents are replicated with a per-replica suffix on EVERY word
  *     — intra-replica repeated-passage structure is preserved exactly
  *     (the same rewrite applies to every doc), while cross-replica
  *     passages can never collide, so true duplicate volume scales
  *     linearly with R;
  *   - embeddings are replicated with circular shifts + planted
  *     companions (the ScaleProbe construction — 100 true near-dups per
  *     replica, replicas mutually at background cosine).
  *
  * For each scale it reports wall time and found-duplicate volume:
  * passage dedup should scale ~linearly (two keyed shuffles), and
  * semDedup ~linearly when nlist grows ∝ n (constant expected cell
  * size keeps the within-cell pairwise sweep ∝ n·|cell|, the SemDeDup
  * contract).
  *
  * Usage: runMain graft.CurationScaleProbe [replicas...] (default 1 4 16)
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = LocalSession()
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    val emb = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val dim = 64

    def docCorpus(r: Int): DataFrame = docs.select(
      (col("doc_id") + r * 10000000L).as("doc_id"),
      array_join(transform(split(col("text"), " "),
        w => concat(w, lit("#" + r))), " ").as("text"))

    def embCorpus(r: Int): DataFrame = {
      val shift = r % dim
      val shifted = emb.select(
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
      require(rep >= 1 && rep <= 64, "replicas in [1, 64] (shift injectivity)")
      val dc = (0 until rep).map(docCorpus).reduce(_ union _)
        .localCheckpoint(true)
      val nd = dc.count()
      // warm once, then measure (codegen + scan bring-up)
      Dedup.dedupPassages(dc, "doc_id", "text", 10).count()
      val (dropped, tPass) = timed {
        Dedup.dedupPassages(dc, "doc_id", "text", 10)
          .agg(sum(col("n_dropped"))).first().getLong(0)
      }
      // boilerplate shares the chunking and shuffle structure with
      // passage dedup; chunks never collide across replicas (per-replica
      // word suffix), so each replica's df distribution is identical and
      // a fixed threshold keeps dropped volume exactly ∝ R
      Dedup.removeBoilerplate(dc, "doc_id", "text", 10, 3).count()
      val (bpDropped, tBp) = timed {
        Dedup.removeBoilerplate(dc, "doc_id", "text", 10, 3)
          .agg(sum(col("n_dropped"))).first().getLong(0)
      }

      // token-granularity substring dedup: same two-keyed-shuffle family
      // as passage dedup but over the stride-1 shingle index (~k× the
      // corpus through the first shuffle) — time should stay ~linear in
      // R and dropped volume exactly ∝ R (intra-replica repeated spans
      // are preserved by the per-word suffix rewrite; cross-replica
      // shingles can never collide)
      Dedup.dedupTokenSpans(dc, "doc_id", "text", 10).count()
      val (spanDropped, tSpan) = timed {
        Dedup.dedupTokenSpans(dc, "doc_id", "text", 10)
          .agg(sum(col("n_dropped"))).first().getLong(0)
      }

      // winnow overlap pairs WITH the boilerplate cap engaged (the
      // q_text_overlap parameterization): posting lists are bounded by
      // maxDf, fingerprints never collide across replicas, so pair
      // volume is ∝ R and time ~linear — the sub-quadratic contract the
      // cap guarantees
      graft.operators.TextAnalysis.winnowOverlapPairs(
        dc, "doc_id", "text", 3, 4, 2, maxDf = 100).count()
      val (nOverlap, tOverlap) = timed {
        graft.operators.TextAnalysis.winnowOverlapPairs(
          dc, "doc_id", "text", 3, 4, 2, maxDf = 100).count()
      }

      // exact directed containment: the asymmetric prefix filter indexes
      // only each contained-side document's rare prefix, so posting
      // lists stay short and pair volume ∝ R (containment structure is
      // intra-replica by the per-word suffix rewrite)
      Dedup.containmentPairs(dc, "doc_id", "text", 3, 0.6).count()
      val (nContain, tContain) = timed {
        Dedup.containmentPairs(dc, "doc_id", "text", 3, 0.6).count()
      }

      // exact tf-idf cosine APSS in shingle space (the q_dedup_cosine
      // parameterization): shingles never collide across replicas, so
      // prefix postings — and the prefix x prefix candidate join — stay
      // intra-replica and pair volume is exactly ∝ R at ~linear time
      Dedup.tfidfCosinePairs(dc, "doc_id", "text", 0.7, n = 3).count()
      val (nCosine, tCosine) = timed {
        Dedup.tfidfCosinePairs(dc, "doc_id", "text", 0.7, n = 3).count()
      }

      // persisted LSH signature store: write cost scales with the corpus
      // (one-time), but PROBE cost for a fixed batch must stay ~flat as
      // the stored corpus grows — that is the operator's whole point.
      // The fixed batch is 1/5 of the sf0.1 documents; replica-0 text in
      // the store matches it exactly, and cross-replica text can never
      // collide (per-replica word suffix), so true pair volume is ∝
      // batch at every scale.
      val storeDir = s"/tmp/graft-sigstore-probe-r$rep"
      val (_, tWrite) = timed {
        Dedup.writeBandSignatures(dc, "doc_id", "text", storeDir)
      }
      val batch = docCorpus(0).filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
        .localCheckpoint(true)
      Dedup.minHashLshPairsAgainstStore(batch, storeDir,
        "doc_id", "text", 0.5).count()
      val (nPairs, tProbe) = timed {
        Dedup.minHashLshPairsAgainstStore(batch, storeDir,
          "doc_id", "text", 0.5).count()
      }

      val ec = (0 until rep).map(embCorpus).reduce(_ union _)
        .localCheckpoint(true)
      val ne = ec.count()
      val planted = rep * 100L
      // constant expected cell size (~64) — the SemDeDup scaling knob
      val nlist = math.max(8, (ne / 64).toInt)
      Similarity.semDedup(ec, "vec_id", "e", 0.8, nlist, 1).count()
      val (kept, tSem) = timed {
        Similarity.semDedup(ec, "vec_id", "e", 0.8, nlist, 1).count()
      }
      println(f"CURSCALE docs=$nd%7d passes=$tPass%6.1fs dropped=$dropped%7d " +
        f"boiler=$tBp%6.1fs bpDropped=$bpDropped%7d " +
        f"spans=$tSpan%6.1fs spanDropped=$spanDropped%8d " +
        f"winnow=$tOverlap%6.1fs overlapPairs=$nOverlap%7d " +
        f"contain=$tContain%6.1fs containPairs=$nContain%7d " +
        f"cosine=$tCosine%6.1fs cosinePairs=$nCosine%7d | " +
        f"store: write=$tWrite%6.1fs probe=$tProbe%6.1fs pairs=$nPairs%6d | " +
        f"vecs=$ne%7d nlist=$nlist%5d sem=$tSem%6.1fs " +
        f"swept=${ne - kept}%6d (planted=$planted)")
    }
    spark.stop()
  }
}
