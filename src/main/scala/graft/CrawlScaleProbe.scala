package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{HtmlExtract, Normalize, TextAnalysis, UrlOps}

/** Dev utility: measured scaling of the round-7 crawl-pipeline
  * operators (the source of BASELINE.md's "Crawl-operator scale
  * behavior" table).
  *
  * Corpus construction follows CurationScaleProbe: sf0.1 documents
  * replicated with a per-replica suffix on every word (disjoint ids),
  * each doc wrapped in the deterministic q_text_extract page so the
  * HTML operators see real markup density. The scan-speed claims
  * (extractText, normalizeText, canonicalizeUrls, extractLinks) should
  * show ~linear wall; trainUnigram's corpus-scale word count is its
  * only corpus-sized stage, so it should flatten toward linear with a
  * constant vocab-round overhead.
  *
  * Usage: runMain graft.CrawlScaleProbe [replicas...] (default 1 4 21)
  */
object CrawlScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 21)
    val spark = LocalSession()
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"), col("source"))

    def corpus(r: Int): DataFrame = (0 until r).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("#" + k))), " ").as("text"),
        col("source"))
    }.reduce(_ unionByName _)

    def page(c: DataFrame): DataFrame = c.select(col("doc_id"),
      concat(
        lit("<html><head><script>var x = 1 < 2;</script>" +
          "<style>.n a{color:#00c}</style></head><body>" +
          "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
          "</nav><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><p>This page is the &quot;fast&nbsp;&amp; loose&quot;" +
          " guide; it&#39;s about &lt;scale&gt;.</p>" +
          "<div class=\"footer\"><a href=\"/tos\">Terms of service</a>" +
          "</div></body></html>")).as("html"),
      concat(lit("https://www.ex"), (col("doc_id") % 97).cast("string"),
        lit(".example.co.uk/d/page.html")).as("base"))

    // min of two back-to-back samples: the first run at each scale
    // pays codegen/JIT bring-up that would otherwise swamp the signal
    def timed(label: String, r: Int)(df: => DataFrame): Unit = {
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROBE $label R=$r ${dt}%.2f s")
    }

    // warm: one full scan per replica factor
    replicas.foreach { r =>
      val c = corpus(r).localCheckpoint(true)
      val p = page(c).localCheckpoint(true)
      val n = c.count()
      println(s"PROBE corpus R=$r rows=$n")
      timed("extractText", r)(HtmlExtract.extractText(p,
        minChars = 25, maxLinkDensity = 0.33, minStopFrac = 0.01))
      timed("extractLinks", r)(HtmlExtract.extractLinks(p,
        baseUrlCol = Some("base")))
      timed("normalizeText", r)(Normalize.normalizeText(c))
      timed("canonicalizeUrls", r)(UrlOps.canonicalizeUrls(
        p.select(col("doc_id"), col("base").as("url"))))
      timed("trainUnigram", r)(TextAnalysis.trainUnigram(c,
        seedTopN = 60, maxPieceLen = 4, keepN = 40, emRounds = 2,
        maxWordLen = 12))
    }
    spark.stop()
  }
}
