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

    // ---- second-order (p, q) section: the walker-sweep slope ----
    // Unlike first-order (bucket table O(E/cap + V), so the whole
    // step is walker-bounded), BOTH second-order forms stream the
    // Σ deg² alias table every step — the documented second-order
    // price (on a star, D² entries, which also bounds the probe's
    // feasible D). What the bucketed pick removes is the OUTPUT
    // term: the join form materializes walkers × D rows per hub
    // draw, the bucketed form emits `walkers` rows. So this section
    // fixes the star and sweeps the FRONTIER: the slope between a
    // 2-step and a 6-step run isolates per-step cost (the shared
    // build subtracts out), and the join slope must grow ~linearly
    // in walkers while the bucketed slope stays FLAT.
    // Noise discipline: the per-run cost is build-dominated and the
    // slope is a difference of large numbers, so each configuration
    // takes the MIN of two samples (suppresses ambient spikes), both
    // forms get one untimed warmup (codegen/JIT), and the step span
    // is 2 → 12 so the signal is 10 steps wide.
    val (p2, q2, cap2, d2) = (1, 4, 64, 2000)

    // node2vecWalks' esucc + interval-filter loop verbatim (incl. its
    // lineage truncation — without it the Σ deg² window chain would
    // re-evaluate per step and the probe would measure plan blowup,
    // not the join), started from a seed slice
    def joinSeeded2(edges: DataFrame, seeds: DataFrame,
                    steps: Int): DataFrame = {
      import graft.operators.Checkpoints.TruncateOps
      val w = org.apache.spark.sql.expressions.Window
      val oriented = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val e = oriented.filter(col("src") =!= col("dst")).distinct()
        .truncateLineage(false)
      val w1 = w.partitionBy(col("src"))
      val adj = e.select(col("src"), col("dst"),
        row_number().over(w1.orderBy(col("dst"))).as("idx"),
        count(lit(1)).over(w1).as("deg"))
        .truncateLineage(false)
      val succ0 = e.select(col("src").as("t"), col("dst").as("v"))
        .join(e.select(col("src").as("v"), col("dst").as("x")),
          Seq("v"))
      val flagged = succ0.join(
          e.select(col("src").as("t"), col("dst").as("x"),
            lit(true).as("is1")), Seq("t", "x"), "left")
        .select(col("t"), col("v"), col("x"),
          when(col("x") === col("t"), lit(q2.toLong))
            .when(col("is1").isNotNull, lit(p2.toLong * q2.toLong))
            .otherwise(lit(p2.toLong)).as("w"))
      val wTv = w.partitionBy(col("t"), col("v"))
      val esucc = flagged.select(col("t"), col("v"), col("x"),
        col("w"),
        (sum(col("w")).over(wTv.orderBy(col("x"))
          .rowsBetween(w.unboundedPreceding, 0)) - col("w"))
          .as("cumb"),
        sum(col("w")).over(wTv).as("total"))
        .truncateLineage(false)
      def h48(cols: org.apache.spark.sql.Column*) =
        conv(substring(md5(concat_ws("|", cols: _*)), 1, 12), 16, 10)
          .cast("long")
      val starts = seeds.select(col("node").as("start"))
      var acc = starts.select(col("start"), lit(0).as("step"),
        col("start").as("node"))
      val pick1 = pmod(h48(col("node").cast("string"),
        col("node").cast("string"), lit("1"), lit(seed)),
        col("deg")) + 1
      var wk = starts.select(col("start").as("node"))
        .join(adj, col("node") === adj("src"))
        .filter(col("idx") === pick1)
        .select(col("node").as("start"), col("node").as("prev"),
          col("dst").as("cur"))
        .truncateLineage(false)
      acc = acc.union(
        wk.select(col("start"), lit(1).as("step"), col("cur")))
      (2 to steps).foreach { k =>
        val r = pmod(h48(col("start").cast("string"),
          col("prev").cast("string"), col("cur").cast("string"),
          lit(k.toString), lit(seed)), col("total"))
        wk = wk.join(esucc,
            wk("prev") === esucc("t") && wk("cur") === esucc("v"))
          .filter(r >= col("cumb") && r < col("cumb") + col("w"))
          .select(col("start"), col("cur").as("prev"),
            col("x").as("cur"))
          .truncateLineage(false)
        acc = acc.union(
          wk.select(col("start"), lit(k).as("step"), col("cur")))
      }
      acc
    }

    println(s"-- second-order (p=$p2,q=$q2), star D=$d2: per-step " +
      "slope (t(12 steps) - t(2 steps)) / 10 vs frontier size --")
    println("hub_degree,walkers,join_slope_s,bucketed_slope_s,ratio")
    val edges2 = spark.range(1L, d2 + 1L)
      .select(lit(0L).as("src"), col("id").as("dst"))
      .localCheckpoint(true)
    def seedsOf(n: Int) = spark.range(1L, n + 1L)
      .select(col("id").as("node")).localCheckpoint(true)
    def bucketed(seeds: DataFrame, steps: Int) =
      Graph.node2vecSeededWalks(edges2, "src", "dst", seeds, "node",
        steps, p2, q2, seed, bucketCap = cap2)
    def minT(f: => Unit): Double =
      (1 to 2).map(_ => timed(f)._2).min
    // untimed warmup: both forms' codegen + JIT
    val wSeeds = seedsOf(64)
    rows(joinSeeded2(edges2, wSeeds, 2))
    rows(bucketed(wSeeds, 2))
    require(rows(bucketed(wSeeds, 12)) ==
      rows(joinSeeded2(edges2, wSeeds, 12)),
      "second-order bucketed walks diverged from the join form")
    Seq(512, 4096).foreach { nw =>
      val seeds = seedsOf(nw)
      val tJ12 = minT(rows(joinSeeded2(edges2, seeds, 12)))
      val tJ2 = minT(rows(joinSeeded2(edges2, seeds, 2)))
      val tB12 = minT(rows(bucketed(seeds, 12)))
      val tB2 = minT(rows(bucketed(seeds, 2)))
      val (sJ, sB) = ((tJ12 - tJ2) / 10, (tB12 - tB2) / 10)
      println(f"$d2,$nw,$sJ%.2f,$sB%.2f,${sJ / sB}%.1f")
    }
    spark.stop()
  }
}
