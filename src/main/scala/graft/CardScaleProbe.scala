package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: measured shuffle volume of COLUMN distinct counting —
  * the source of BASELINE.md's "HLL register shuffle" table (the
  * cardinality-shard companion of [[KmvScaleProbe]], which measures
  * the token-set sketch).
  *
  * Claim under test: `Stats.approxDistinct`'s exchange is bounded by
  * the REGISTER count (≤ m = 4096 rows per map partition, two longs
  * each) regardless of column cardinality, while `count(distinct c)`'s
  * exchange carries one row per distinct value per map partition — ∝
  * cardinality even with partial aggregation. Corpus: documents
  * replicated with per-replica doc_id offsets, so the distinct count
  * grows linearly while the register frame stays fixed.
  *
  * Reported per scale, per path: wall time, shuffle records, shuffle
  * bytes, and the estimate vs the true distinct count (~1.6% expected
  * at m = 4096).
  *
  * Usage: runMain graft.CardScaleProbe [replicas...] (default 1 4 16)
  */
object CardScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = LocalSession()
    val shRecords = new AtomicLong
    val shBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          shBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"))

    def corpus(rep: Int): DataFrame = (0 until rep)
      .map(r => docs.select(
        (col("doc_id") + r * 10000000L).as("doc_id")))
      .reduce(_ union _)

    def measured[T](f: => T): (T, Double, Long, Long) = {
      org.apache.spark.sql.graftext.SparkInternals
        .drainListenerBus(spark.sparkContext)
      val (r0, b0) = (shRecords.get(), shBytes.get())
      val t0 = System.nanoTime()
      val r = f
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftext.SparkInternals
        .drainListenerBus(spark.sparkContext)
      (r, t, shRecords.get() - r0, shBytes.get() - b0)
    }

    replicas.foreach { rep =>
      // fixed map-partition count across scales (coalesce is narrow —
      // no shuffle of its own): the register exchange is bounded per
      // MAP PARTITION, so flatness only shows against a fixed layout
      val dc = corpus(rep).coalesce(32).localCheckpoint(true)
      val nd = dc.count()

      def exactPath(): Long =
        dc.agg(count_distinct(col("doc_id"))).first().getLong(0)
      def hllPath(): Double = graft.operators.Stats
        .approxDistinct(dc, Seq("doc_id"))
        .select(col("estimate")).first().getDouble(0)

      exactPath() // warm: codegen + scan bring-up
      val (truth, tEx, recEx, byEx) = measured(exactPath())
      hllPath()
      val (est, tSk, recSk, bySk) = measured(hllPath())

      val err = math.abs(est - truth) / truth * 100
      println(f"CARDSCALE rows=$nd%8d distinct=$truth%8d | " +
        f"exact: $tEx%6.2fs recs=$recEx%9d bytes=${byEx / 1024}%7dKiB | " +
        f"hll: $tSk%6.2fs recs=$recSk%9d bytes=${bySk / 1024}%7dKiB " +
        f"est=$est%11.1f err=$err%5.2f%%")
    }
    spark.stop()
  }
}
