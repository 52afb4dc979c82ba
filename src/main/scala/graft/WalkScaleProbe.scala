package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Dev utility: hub-degree-proofness of [[Graph.seededWalks]] (the
  * source of BASELINE.md's walk-probe row).
  *
  * Corpus: a star hub — node 0 connected to 1..D — plus a small
  * walker seed slice (nWalkers spoke nodes). Every walk bounces
  * spoke → hub → spoke …, so at every odd step the ENTIRE frontier
  * sits on the hub: the worst case for the join-then-filter pick,
  * which materializes walkers × D join rows per step to keep
  * `walkers` of them. The bucketed element_at form touches one
  * (src, bucket) row per walker per step, so its per-step cost must
  * stay FLAT as D grows 100× while the join form grows ~linearly
  * in D.
  *
  * The join form here is [[Graph.deterministicWalks]]' exact loop
  * (same adjacency index, same hash pick) started from the seed
  * slice instead of all nodes — the shape a pre-seededWalks user
  * would compose. Both forms share the hash grammar, so the probe
  * asserts bit-identical walks before reporting (a fast probe that
  * computes the wrong walks measures nothing); at the smallest D it
  * also cross-checks both against the all-nodes operator restricted
  * to the seeds.
  *
  * Usage: runMain graft.WalkScaleProbe [hubDegrees...]
  * (default 10000 100000 1000000)
  */
object WalkScaleProbe {
  def main(args: Array[String]): Unit = {
    val degrees = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(10000, 100000, 1000000)
    val nWalkers = 64
    val steps = 4
    val seed = "wp"
    val spark = LocalSession()

    // deterministicWalks' join-filter loop, seeded starts
    // (Graph.scala's pick grammar verbatim)
    def joinSeeded(edges: DataFrame, seeds: DataFrame): DataFrame = {
      val fwd = edges.select(col("src"), col("dst"))
      val oriented = fwd.union(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"))
      val adj = oriented.filter(col("src") =!= col("dst")).distinct()
        .select(col("src"), col("dst"),
          row_number().over(w.orderBy(col("dst"))).as("idx"),
          count(lit(1)).over(w).as("deg"))
      var walk = seeds.select(col("node").as("start"),
        col("node").as("node"))
      var acc = walk.select(col("start"), lit(0).as("step"),
        col("node"))
      (1 to steps).foreach { k =>
        val pick = pmod(
          conv(substring(md5(concat_ws("|",
            col("start").cast("string"), col("node").cast("string"),
            lit(k.toString), lit(seed))), 1, 12), 16, 10)
            .cast("long"),
          col("deg")) + 1
        walk = walk.join(adj, walk("node") === adj("src"))
          .filter(col("idx") === pick)
          .select(col("start"), col("dst").as("node"))
        acc = acc.union(
          walk.select(col("start"), lit(k).as("step"), col("node")))
      }
      acc
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def rows(df: DataFrame): Set[(Long, Int, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    println("hub_degree,walkers,steps,join_s,bucketed_s,ratio")
    degrees.zipWithIndex.foreach { case (d, i) =>
      val edges = spark.range(1L, d + 1L)
        .select(lit(0L).as("src"), col("id").as("dst"))
        .localCheckpoint(true)
      val seeds = spark.range(1L, nWalkers + 1L)
        .select(col("id").as("node")).localCheckpoint(true)
      val (joinRows, tJoin) = timed(rows(joinSeeded(edges, seeds)))
      val (bucketRows, tBucket) = timed(rows(
        Graph.seededWalks(edges, "src", "dst", seeds, "node", steps,
          seed, bucketCap = 1024)))
      require(bucketRows == joinRows,
        s"bucketed walks diverged from the join form at D=$d")
      if (i == 0) {
        // grammar cross-check against the shipped all-nodes operator
        val all = rows(Graph
          .deterministicWalks(edges, "src", "dst", steps, seed))
          .filter(t => t._1 >= 1 && t._1 <= nWalkers)
        require(all == bucketRows,
          "seeded forms diverged from deterministicWalks")
      }
      println(f"$d,$nWalkers,$steps,$tJoin%.2f,$tBucket%.2f," +
        f"${tJoin / tBucket}%.1f")
    }
    spark.stop()
  }
}
