package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

/** Dev utility: measured scaling of the order-n Kneser-Ney stack
  * (the source of BASELINE.md's "Order-n LM scale behavior" table).
  *
  * Corpus construction follows CurationScaleProbe: sf0.1 documents
  * replicated with a per-replica suffix on every word (disjoint
  * vocabularies, so model size grows with the corpus — the
  * worst-case regime; natural corpora share vocabulary across
  * growth and re-use model rows). Claims under test: trainNgrams'
  * one-shuffle wall is ~linear in corpus tokens; scoring wall is
  * ~linear in scored grams; no super-linear blowup from the
  * per-order statistic derivations.
  *
  * Usage: runMain graft.LmScaleProbe [order] [replicas...]
  * (default order 3, replicas 1 4 21)
  */
object LmScaleProbe {
  def main(args: Array[String]): Unit = {
    val order = if (args.nonEmpty) args(0).toInt else 3
    val replicas = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 4, 21)
    val spark = LocalSession()
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))

    def corpus(r: Int): DataFrame = (0 until r).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("#" + k))), " ").as("text"))
    }.reduce(_ unionByName _)

    println(s"replicas\tdocs\ttrain${order}_s\tmodel_rows\t" +
      s"score${order}_s\tscored_docs")
    replicas.foreach { r =>
      val c = corpus(r).localCheckpoint(true)
      val n = c.count()
      val t0 = System.nanoTime()
      val lm = LanguageModel.trainNgrams(c, "doc_id", "text",
          maxN = order)
        .localCheckpoint(true)
      val rows = lm.count()
      val t1 = System.nanoTime()
      val held = c.filter(col("doc_id") % 10 === 0)
      val scored = LanguageModel.scoreByKneserNeyN(held, lm,
        "doc_id", "text", order = order).count()
      val t2 = System.nanoTime()
      println(f"$r%d\t$n%d\t${(t1 - t0) / 1e9}%.2f\t$rows%d\t" +
        f"${(t2 - t1) / 1e9}%.2f\t$scored%d")
    }
    spark.stop()
  }
}
