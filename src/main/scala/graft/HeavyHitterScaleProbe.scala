package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: measured shuffle volume of heavy-hitter top-k — the
  * source of BASELINE.md's "Heavy-hitters shuffle" table.
  *
  * Claim under test: the Misra-Gries sketch aggregate's exchange is
  * VOCABULARY-INDEPENDENT (one ≤ capacity-counter summary per map
  * partition), while the explode+groupBy formulation's exchange carries
  * one row per distinct token per map partition — ∝ vocabulary even
  * with map-side combine. At web scale vocabulary grows with the
  * corpus (names, ids, typos), so that difference is the difference
  * between a fixed-size exchange and one that grows with the data.
  *
  * Corpus: the CurationScaleProbe replica construction (per-replica
  * suffix on every word), tokenized into word TRIGRAMS so the
  * vocabulary is large and grows ∝ replicas while per-row work stays
  * fixed. Both paths read the same shingle arrays.
  *
  * Reported per scale, per path: wall time, shuffle records, shuffle
  * bytes (captured via a stage-completion listener, delta around each
  * run). Expected: sketch records == number of map partitions
  * (constant), sketch bytes bounded by capacity × partitions
  * (constant); explode records/bytes ∝ distinct trigrams.
  *
  * Usage: runMain graft.HeavyHitterScaleProbe [replicas...] (default 1 4 16)
  */
object HeavyHitterScaleProbe {
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

    // listener delivery is async: drain the bus before reading deltas
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
      val vocab = dc.select(explode(col("toks")).as("t"))
        .agg(countDistinct(col("t"))).first().getLong(0)

      def explodePath() = dc.select(explode(col("toks")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(20)
      def sketchPath() = dc.groupBy().agg(
          org.apache.spark.sql.graftext.HeavyHittersSketch(
            col("toks"), 4096).as("hh"))
        .select(posexplode(col("hh"))).filter(col("pos") < 20)

      explodePath().count() // warm: codegen + scan bring-up
      val (_, tEx, recEx, byEx) = measured(explodePath().count())
      sketchPath().count()
      val (_, tSk, recSk, bySk) = measured(sketchPath().count())

      println(f"HHSCALE docs=$nd%7d trigramVocab=$vocab%9d | " +
        f"explode: $tEx%6.2fs recs=$recEx%9d bytes=${byEx / 1024}%9dKiB | " +
        f"sketch: $tSk%6.2fs recs=$recSk%9d bytes=${bySk / 1024}%9dKiB")
    }
    spark.stop()
  }
}
