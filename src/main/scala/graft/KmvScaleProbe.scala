package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: measured shuffle volume of distinct counting — the
  * source of BASELINE.md's "KMV distinct shuffle" table.
  *
  * Claim under test: the KMV sketch aggregate's exchange is
  * VOCABULARY-INDEPENDENT (≤ k 8-byte hashes per map partition), while
  * `count(distinct)`'s exchange carries one row per distinct key per
  * map partition — ∝ vocabulary even with partial aggregation. Same
  * growing-vocabulary corpus construction as [[HeavyHitterScaleProbe]]
  * (per-replica word suffixes, word trigrams).
  *
  * Reported per scale, per path: wall time, shuffle records, shuffle
  * bytes, and the KMV estimate vs the true distinct count (the accuracy
  * actually delivered at k = 1024, ~3% expected).
  *
  * Usage: runMain graft.KmvScaleProbe [replicas...] (default 1 4 16)
  */
object KmvScaleProbe {
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
      .select(col("doc_id"), col("text"))

    def corpus(r: Int): DataFrame = docs.select(
      (col("doc_id") + r * 10000000L).as("doc_id"),
      graft.operators.TextAnalysis.shingles(
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("#" + r))), " "), 3).as("toks"))

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
      val dc = (0 until rep).map(corpus).reduce(_ union _)
        .localCheckpoint(true)
      val nd = dc.count()

      def exactPath(): Long = dc.select(explode(col("toks")).as("t"))
        .agg(count_distinct(col("t"))).first().getLong(0)
      def sketchPath(): Double = dc.groupBy().agg(
          org.apache.spark.sql.graftext.KmvDistinctSketch(
            col("toks"), 1024).as("kmv"))
        .select(col("kmv.estimate")).first().getDouble(0)

      exactPath() // warm: codegen + scan bring-up
      val (vocab, tEx, recEx, byEx) = measured(exactPath())
      sketchPath()
      val (est, tSk, recSk, bySk) = measured(sketchPath())

      val err = math.abs(est - vocab) / vocab * 100
      println(f"KMVSCALE docs=$nd%7d vocab=$vocab%9d | " +
        f"exact: $tEx%6.2fs recs=$recEx%9d bytes=${byEx / 1024}%9dKiB | " +
        f"kmv: $tSk%6.2fs recs=$recSk%9d bytes=${bySk / 1024}%9dKiB " +
        f"est=$est%11.1f err=$err%5.2f%%")
    }
    spark.stop()
  }
}
