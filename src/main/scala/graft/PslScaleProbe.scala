package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: measured cost of the FULL publicsuffix.org list
  * (~9.5k rules) vs the compact multi-label subset — the source of
  * BASELINE.md's "Full-PSL hash walk" table.
  *
  * Claim under test: `PslDomain`'s per-row cost is O(host labels)
  * hash lookups INDEPENDENT of rule-table size (label-count-bucketed
  * hash sets), so swapping the ~40-entry compact matrix for the real
  * 9.5k-entry list costs nothing per row — the opposite of a
  * `typedlit`-array scan, which is O(|rules|) per row and is exactly
  * what the compact column grammar (`UrlOps.registeredDomain`) does
  * with its small constant list.
  *
  * Corpus: synthetic hosts spanning every rule family (plain .com,
  * multi-label co.uk, wildcard *.kobe.jp, exception city.kobe.jp,
  * PRIVATE-section blogspot.com, deep subdomains, digit tails),
  * deterministic from the row id. Paths timed per scale (noop sink,
  * warm JVM, min of 3):
  *   full  — PslDomain with the real /usr/share/publicsuffix list
  *   cmpct — PslDomain with the compact subset as a rule table
  *   gram  — UrlOps.registeredDomain (compact column grammar)
  *
  * Usage: runMain graft.PslScaleProbe [rowsM...] (default 2 8)
  */
object PslScaleProbe {
  def main(args: Array[String]): Unit = {
    val scalesM = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(2, 8)
    val spark = LocalSession()
    val real = org.apache.spark.sql.graftext.PslRules.load(spark,
      "file:///usr/share/publicsuffix/public_suffix_list.dat")
    val compact = org.apache.spark.sql.graftext.PslRules.parse(
      graft.operators.UrlOps.MultiLabelSuffixes)
    println(s"PSLSCALE real rules=${real.counts} " +
      s"compact rules=${compact.counts}")

    def hosts(rows: Long): DataFrame =
      spark.range(rows).select(
        concat(
          when(col("id") % 11 === 0, lit("a.b."))
            .when(col("id") % 7 === 0, lit("deep.sub."))
            .otherwise(lit("www.")),
          lit("h"), (col("id") % 200000).cast("string"),
          when(col("id") % 13 === 0, lit(".kobe.jp"))
            .when(col("id") % 13 === 1, lit(".blogspot.com"))
            .when(col("id") % 13 === 2, lit(".co.uk"))
            .when(col("id") % 13 === 3, lit(".github.io"))
            .when(col("id") % 13 === 4, lit(".com.au"))
            .when(col("id") % 13 === 5, lit(".ck"))
            .otherwise(lit(".com"))).as("h"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    scalesM.foreach { m =>
      val rows = m * 1000000L
      val df = hosts(rows).localCheckpoint(true)
      def run(d: org.apache.spark.sql.Column): Unit =
        df.select(d.as("dom")).write.format("noop")
          .mode("overwrite").save()
      val full = graft.operators.UrlOps
        .registeredDomainPsl(col("h"), real)
      val cmpct = graft.operators.UrlOps
        .registeredDomainPsl(col("h"), compact)
      val gram = graft.operators.UrlOps.registeredDomain(col("h"))
      run(full); run(cmpct); run(gram) // warm
      val tFull = (1 to 3).map(_ => timed(run(full))).min
      val tCmpct = (1 to 3).map(_ => timed(run(cmpct))).min
      val tGram = (1 to 3).map(_ => timed(run(gram))).min
      println(f"PSLSCALE rows=${rows}%9d full=$tFull%6.2fs " +
        f"compact=$tCmpct%6.2fs grammar=$tGram%6.2fs " +
        f"full/compact=${tFull / tCmpct}%.2f")
    }
    spark.stop()
  }
}
