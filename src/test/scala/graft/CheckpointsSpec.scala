package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Checkpoints, Graph}

/** Reliable-checkpoint option: with `spark.graft.checkpointDir` set,
  * every iterative-operator truncation site switches from
  * localCheckpoint (executor-block persistence — unrecoverable on
  * executor loss) to Dataset.checkpoint against the directory, with
  * IDENTICAL results. */
class CheckpointsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def edges = {
    val s = spark
    import s.implicits._
    // two components + a chain, enough for several label rounds
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (5L, 1L), (4L, 5L)).toDF("src", "dst")
  }

  test("connectedComponents and pageRank produce identical output " +
       "under the reliable-checkpoint mode, and the directory is " +
       "actually used") {
    val local = Graph.connectedComponents(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val localPr = Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = Graph.connectedComponents(edges, "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reliablePr = Graph.pageRank(edges, "src", "dst", iters = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(reliable == local && reliablePr == localPr)
      // the reliable path really wrote checkpoint data to the dir
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum else 1
      assert(count(new java.io.File(dir)) > 0)
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("an empty conf value keeps the local default (no checkpoint " +
       "dir required)") {
    spark.conf.set(Checkpoints.ConfKey, "")
    try {
      val out = Graph.connectedComponents(edges, "src", "dst").count()
      assert(out > 0)
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }
}
