package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query materialized end-to-end
  * (noop sink — forces all columns, unlike count() which lets Catalyst
  * prune a projection-only query down to a bare scan).
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) back-to-back
  * and the recorded time is the per-query MIN: timings on a shared box
  * swing 2-3× under ambient load, and one contaminated sample must not
  * corrupt the round record (the r2 official run recorded 84 s for a
  * 40 s suite that way). The min of back-to-back runs is the
  * load-independent estimator of the code's cost.
  *
  * Emits ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"failed":[…],"runs":…,"sf":…}`
  * to stdout AND to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * `bench_latest.json` in the cwd) so the driver can parse it without
  * scraping sbt's log-prefixed stdout. A query that throws on every run
  * is recorded with the `-1` sentinel time and listed in `failed`, and
  * the process exits non-zero — a regression can't masquerade as a
  * speedup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = LocalSession()
    // warm up codegen/IO paths so the first timed query isn't charged
    // for session bring-up
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      if (times.isEmpty) (name, -1.0, false) else (name, times.min, true)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"runs":$runs,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
