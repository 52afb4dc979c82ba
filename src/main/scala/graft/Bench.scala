package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query materialized end-to-end
  * (noop sink — forces all columns, unlike count() which lets Catalyst
  * prune a projection-only query down to a bare scan).
  *
  * Contamination discipline (two lessons from official records):
  *
  *  1. The suite runs as `SPARK_GRAFT_BENCH_RUNS` FULL PASSES (default 3)
  *     of `SPARK_GRAFT_BENCH_SAMPLES` back-to-back samples each (default
  *     2), recording the per-query MIN over all samples. Two failure
  *     modes, two knobs: back-to-back min-of-N alone demonstrably failed
  *     in the r4 official record — a sustained ambient spike spanned all
  *     three consecutive samples of q_text_stats (2.15 s recorded vs
  *     0.27 s quiet) — so samples are spread across passes with a full
  *     suite (~40 s) between them, and a spike must persist for minutes
  *     to corrupt a record. But purely interleaved samples lose the
  *     warm-locality min (the second consecutive run of a query hits hot
  *     page cache and JIT'd codegen — measured ~25% lower on the heavy
  *     dedup queries), so each pass still takes two consecutive samples.
  *
  *  2. Every sfDir table is warmed with one untimed full scan before
  *     timing starts, in addition to the sf0.001 `entry` warm-up for
  *     session/codegen bring-up. Without this the first alphabetical
  *     query was charged the first cold sf0.1 lineitem scan
  *     (q_agg_pricing 1.92 s quiet vs 0.70 s warm in the r3-era record
  *     for unchanged code).
  *
  * Emits ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"failed":[…],"runs":…,"sf":…}`
  * to stdout AND to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * `bench_latest.json` in the cwd) so the driver can parse it without
  * scraping sbt's log-prefixed stdout. A query that throws on every pass
  * is recorded with the `-1` sentinel time and listed in `failed`, and
  * the process exits non-zero — a regression can't masquerade as a
  * speedup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val samples =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "2").toInt.max(1)
    val spark = LocalSession()
    // session bring-up: codegen, noop sink, shuffle machinery
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // IO bring-up: one untimed full scan of each sfDir table so no timed
    // query is charged cold page-cache / parquet-footer costs. Via
    // Sources.table — events needs the nanos-timestamp normalization.
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        sources.Sources.table(spark, sfDir, f.getName.stripSuffix(".parquet"))
          .write.format("noop").mode("overwrite").save()
      }
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    // queries (comma-separated exact names); unset = the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to passes; (name, fn) <- names; _ <- 1 to samples) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    }
    val results = names.map { case (name, _) =>
      (name, best.getOrElse(name, -1.0), best.contains(name))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"runs":$passes,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
