package graft

import java.nio.file.{Files, Paths}

/** Dev utility (optimization rounds): dump `.explain("formatted")` for
  * declared queries to `<outDir>/<name>_<tag>.txt` — the judge-checkable
  * plan evidence for `plans/r16/`. Usage:
  * `runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>`
  * (query list `all` = every declared query). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, list) = args.take(4)
    val spark = LocalSession()
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (list == "all") SparkEntry.queries.keys.toSeq.sorted
      else list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), txt)
      println(s"[plandump] $n -> $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
