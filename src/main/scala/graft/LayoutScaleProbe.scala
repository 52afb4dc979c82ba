package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: measured scaling of the dataset-management operators
  * (the source of BASELINE.md's snapshot-diff / per-group-cap rows).
  *
  * Corpus construction: documents replicated with disjoint id ranges
  * but the ORIGINAL source column, so group count stays constant while
  * rows per group grow ∝ R — the regime that distinguishes a
  * churn-proportional diff and a map-side-pruned cap from their naive
  * shapes:
  *   - snapshotDiff: the "new" version drops ids ≡ 0 (mod 7), edits
  *     texts ≡ 0 (mod 5), so churn is a FIXED FRACTION of the corpus —
  *     emitted rows must scale ∝ R while unchanged rows (the bulk)
  *     never materialize past the join;
  *   - capPerGroup: the cap output is n_groups × cap — CONSTANT in R;
  *     wall time should grow ~linearly (one scan + the group shuffle
  *     whose rows the map-side WindowGroupLimit prunes to ≤ cap per
  *     group per input partition).
  *
  * Usage: runMain graft.LayoutScaleProbe [replicas...] (default 1 4 16)
  */
object LayoutScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = LocalSession()
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"), col("source"))

    def corpus(r: Int): DataFrame = docs.select(
      (col("doc_id") + r * 10000000L).as("doc_id"),
      col("text"), col("source"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    replicas.foreach { rep =>
      val dc = (0 until rep).map(corpus).reduce(_ union _)
        .localCheckpoint(true)
      val nd = dc.count()

      val neu = dc.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.sources.Layout.snapshotDiff(dc, neu,
        Seq("doc_id"), Seq("text")).count() // warm
      val (nDiff, tDiff) = timed {
        graft.sources.Layout.snapshotDiff(dc, neu,
          Seq("doc_id"), Seq("text")).count()
      }

      graft.operators.Curation.capPerGroup(dc, Seq("source"), 50,
        Seq("doc_id")).count() // warm
      val (nCap, tCap) = timed {
        graft.operators.Curation.capPerGroup(dc, Seq("source"), 50,
          Seq("doc_id")).count()
      }

      println(f"LAYSCALE docs=$nd%8d diff=$tDiff%6.1fs diffRows=$nDiff%8d " +
        f"cap=$tCap%6.1fs capRows=$nCap%6d")
    }
    spark.stop()
  }
}
