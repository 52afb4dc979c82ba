package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: measured scaling of the CDC merge pair (the source of
  * BASELINE.md's apply-changes rows).
  *
  * The claim under test: with the bucketed layout sized so bucket
  * volume stays constant (nBuckets ∝ corpus), merging a FIXED delta
  * REWRITES ∝ the delta's bucket spread — flat bytes in corpus size —
  * while the unpartitioned merge rewrites the whole snapshot and must
  * grow ∝ corpus. Bytes rewritten is the scale metric (at toy SF the
  * walls are dominated by fixed job overheads; at 100 TB the rewrite
  * volume IS the cost).
  *
  * Corpus: orders replicated with disjoint key ranges (R×15k rows at
  * sf0.01-shape); delta: a fixed 64-key changeset (32 upserts /
  * 32 deletes) confined to the base replica. nBuckets = 8·R keeps
  * per-bucket rows constant. Reported per R: snapshot rows/bytes,
  * touched buckets, bytes rewritten by the bucketed merge vs by the
  * full rewrite, and both walls.
  *
  * Usage: runMain graft.CdcScaleProbe [replicas...] (default 1 4 16)
  */
object CdcScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = LocalSession()
    val orders = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))

    def corpus(r: Int): DataFrame = orders.select(
      (col("o_orderkey") + r * 100000000L).as("o_orderkey"),
      col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val tmpRoot = java.nio.file.Files
      .createTempDirectory("graft-cdc-probe").toString

    // fixed delta: 64 keys of the base replica, half upserts half
    // deletes, seq above anything applied before
    val delta = orders.filter(col("o_orderkey") % 229 === 1).limit(64)
      .select(col("o_orderkey"), lit(10L).as("seq"),
        when(col("o_orderkey") % 2 === 0, "delete").otherwise("upsert")
          .as("op"),
        col("o_custkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 1).as("o_totalprice"))
      .localCheckpoint(true)
    val nDelta = delta.count()

    replicas.foreach { rep =>
      val snap = (0 until rep).map(corpus).reduce(_ union _)
        .localCheckpoint(true)
      val n = snap.count()
      val nBuckets = 8 * rep
      val bPath = s"$tmpRoot/bucketed_$rep"
      val fPath = s"$tmpRoot/flat_$rep"
      graft.sources.Layout.writeBucketedSnapshot(snap, bPath,
        Seq("o_orderkey"), nBuckets)
      snap.write.mode("overwrite").parquet(fPath)

      def dirBytes(path: String, only: Option[Set[String]] = None): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        val root = new java.io.File(path)
        only match {
          case None => walk(root)
          case Some(names) => Option(root.listFiles()).toSeq.flatten
            .filter(d => names.contains(d.getName)).map(walk).sum
        }
      }
      val snapBytes = dirBytes(bPath)

      val (touched, tBucketed) = timed {
        graft.sources.Layout.applyChangesBucketed(spark, bPath, delta,
          Seq("o_orderkey"), nBuckets)
      }
      val rewritten = dirBytes(bPath,
        Some(touched.map(b => s"__bucket=$b").toSet))
      val (_, tFull) = timed {
        val merged = graft.sources.Layout.applyChanges(
          spark.read.parquet(fPath), delta, Seq("o_orderkey"))
        merged.write.mode("overwrite").parquet(fPath + "_out")
      }
      val fullBytes = dirBytes(fPath + "_out")
      println(f"replicas=$rep%3d rows=$n%9d snapMiB=${snapBytes / 1048576.0}%7.1f " +
        f"nBuckets=$nBuckets%4d touched=${touched.size}%3d " +
        f"rewrittenMiB=${rewritten / 1048576.0}%7.2f " +
        f"fullMiB=${fullBytes / 1048576.0}%7.1f " +
        f"bucketed=$tBucketed%6.2fs full=$tFull%6.2fs")
    }
    spark.stop()
  }
}
