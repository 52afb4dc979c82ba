package graft

import java.nio.file.{Files, Paths}

/** Dev utility: write ONE SparkEntry oracle SQL (with all CTEs
  * interpolated) to a file, for spot-checking a single entry against
  * DuckDB without paying the full Verify sweep. Pairs with [[RunOne]].
  *
  * Usage: runMain graft.DumpOracle <queryName> <outFile>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val Array(name, outFile) = args
    Files.write(Paths.get(outFile),
      SparkEntry.oracleSql(name).getBytes("UTF-8"))
  }
}
