package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Frontier, Graph, Sentences, Sitemaps}

/** Dev utility: measured scaling of the round-7 frontier/ingest
  * operators (the source of BASELINE.md's "Frontier-operator scale
  * behavior" table).
  *
  * Corpus construction follows CrawlScaleProbe (R-replicated sf0.1
  * documents, disjoint ids, per-replica word suffix). Expectations:
  * splitSentences / readabilityScores / parseSitemaps / parseWarc are
  * zero-shuffle projections -> ~linear wall; Frontier.schedule keeps
  * OUTPUT constant under the per-host cap (map-side WindowGroupLimit)
  * so wall tracks the scan, not the window; personalizedPageRank
  * replicates the edge graph (disjoint per-replica node ids) and
  * should scale like pageRank — linear in edges per iteration.
  *
  * Usage: runMain graft.FrontierScaleProbe [replicas...] (default 1 4 21)
  */
object FrontierScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 21)
    val spark = LocalSession()
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val li = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "lineitem")
      .select(col("l_suppkey"), col("l_partkey"))

    def corpus(r: Int): DataFrame = (0 until r).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("#" + k))), " ").as("text"),
        col("source"))
    }.reduce(_ unionByName _)

    def edges(r: Int): DataFrame = (0 until r).map { k =>
      li.select((col("l_suppkey") + k * 1000000L).as("src"),
        (col("l_partkey") + 10000000L + k * 1000000L).as("dst"))
    }.reduce(_ unionByName _)

    def timed(label: String, r: Int)(df: => DataFrame): Unit = {
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROBE $label R=$r ${dt}%.2f s")
    }

    replicas.foreach { r =>
      val c = corpus(r).localCheckpoint(true)
      val n = c.count()
      println(s"PROBE corpus R=$r rows=$n")
      timed("splitSentences", r)(Sentences.splitSentences(c))
      timed("readabilityScores", r)(Sentences.readabilityScores(c))
      val sm = c.select(concat(col("source"), lit(".ex.com")).as("host"),
        concat(lit("<urlset><url><loc>https://h/p/"),
          col("doc_id").cast("string"),
          lit("?a=1&amp;b=2</loc><lastmod>2026-01-01</lastmod>" +
            "<priority>0.8</priority></url><url><loc>https://h/q/"),
          col("doc_id").cast("string"),
          lit("</loc></url></urlset>")).as("xml"))
        .localCheckpoint(true)
      timed("parseSitemaps", r)(Sitemaps.parseSitemaps(sm))
      val warc = c.select(col("doc_id"),
        concat(lit("WARC/1.0\r\nWARC-Type: response\r\n" +
          "WARC-Target-URI: https://h/p\r\nContent-Length: "),
          octet_length(col("text")).cast("string"),
          lit("\r\n\r\n"), col("text")).as("blob"))
        .localCheckpoint(true)
      timed("parseWarc", r)(graft.sources.Warc.parseWarc(warc))
      val urls = c.select(concat(col("source"), lit(".ex.com")).as("host"),
        concat(lit("https://h/p/"), col("doc_id").cast("string"))
          .as("url"),
        (col("doc_id") % 10).cast("double").as("priority"))
        .localCheckpoint(true)
      timed("frontierSchedule", r)(Frontier.schedule(urls,
        priorityCol = Some("priority"), maxPerHost = 1000))
      val e = edges(r).localCheckpoint(true)
      println(s"PROBE edges R=$r rows=${e.count()}")
      timed("personalizedPageRank", r)(Graph.personalizedPageRank(
        e, e.select(col("src").as("node")).filter(col("node") % 17 === 0),
        "src", "dst", iters = 3))
      timed("adamicAdar", r)(Graph.adamicAdar(e, "src", "dst",
        topN = 20, maxDegree = 64))
      // replica-suffixed words make each replica's shingles disjoint,
      // so the source-pair matrix work grows with the corpus while the
      // source count stays fixed — the realistic axis
      timed("sourceOverlapMatrix", r)(
        graft.operators.Dedup.sourceOverlapMatrix(
          c.withColumn("source",
            concat(lit("s"), (col("doc_id") % 20).cast("string"))),
          n = 3, maxGroups = 10))
    }
    spark.stop()
  }
}
