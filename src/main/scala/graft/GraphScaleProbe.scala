package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Dev utility: measured scaling of the graph operators (the source of
  * BASELINE.md's graph-analytics scale table).
  *
  * Corpus construction is a deterministic Holme–Kim-style growth graph
  * (no RNG — hash-based attachment, reproducible across runs): node i
  * attaches to m targets h(i,k) mod i (uniform recursive attachment —
  * early nodes become hubs, degree ~ m·ln n skew), and each node also
  * closes the triad between its first two targets, so triangle volume
  * grows ~linearly with n and the degree-ordered wedge join sees real
  * hub skew rather than a flat random graph.
  *
  * For each size it reports wall time plus invariants: total triangle
  * memberships (= 3·triangles, planted ≥ linear by construction) for
  * [[Graph.triangleCounts]], and total rank mass (≤ 1, dangling leak)
  * for 3-iteration [[Graph.pageRank]]. Both should scale ~linearly in
  * edges: triangles because orientation bounds wedge fan-out by
  * out-degree (hubs generate no wedges unless their neighbors are
  * hubs), PageRank because each iteration is one keyed shuffle.
  *
  * Usage: runMain graft.GraphScaleProbe [nodes...] (default 20000
  * 80000 320000)
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(20000, 80000, 320000)
    val spark = LocalSession()

    def growthGraph(n: Int, m: Int = 4): DataFrame = {
      val attach = spark.range(m.toLong, n.toLong)
        .select(col("id").as("src"),
          explode(sequence(lit(0), lit(m - 1))).as("k"))
        .select(col("src"),
          pmod(xxhash64(col("src"), col("k")), col("src")).as("dst"))
      val triadClose = spark.range(m.toLong, n.toLong)
        .select(pmod(xxhash64(col("id"), lit(0)), col("id")).as("src"),
          pmod(xxhash64(col("id"), lit(1)), col("id")).as("dst"))
        .filter(col("src") =!= col("dst"))
      attach.union(triadClose)
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    sizes.foreach { n =>
      val e = growthGraph(n).localCheckpoint(true)
      val ne = e.count()
      // warm once (codegen + scan bring-up), then measure
      Graph.triangleCounts(e, "src", "dst")
        .agg(sum(col("triangles"))).first()
      val (memb, tTri) = timed {
        Graph.triangleCounts(e, "src", "dst")
          .agg(sum(col("triangles"))).first().getLong(0)
      }
      Graph.pageRank(e, "src", "dst", iters = 3).count()
      val (mass, tPr) = timed {
        Graph.pageRank(e, "src", "dst", iters = 3)
          .agg(sum(col("rank"))).first().getDouble(0)
      }
      // HyperBall: estimated 3-ball mass grows superlinearly with the
      // graph while state is structurally capped at m·nodes register
      // rows (the groupBy(node, bucket) aggregate) — time should
      // scale ~linearly in edges·m
      val hbB = 4
      val (hb, tHb) = timed {
        Graph.harmonicCentrality(e, "src", "dst", iters = 3, b = hbB)
          .agg(sum(col("ball")).as("m"), count(lit(1)).as("n")).first()
      }
      println(f"GRAPHSCALE nodes=$n%7d edges=$ne%8d " +
        f"triangles=${memb / 3}%8d tri=$tTri%6.1fs " +
        f"pagerank=$tPr%6.1fs mass=$mass%.4f " +
        f"hyperball=$tHb%6.1fs ball_mass=${hb.getDouble(0)}%.0f " +
        f"state_cap=${(1L << hbB) * hb.getLong(1)}%d")
    }
    spark.stop()
  }
}
