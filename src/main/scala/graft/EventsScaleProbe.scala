package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Events}

/** Dev utility: measured scaling of the time-series operators and the
  * blocked fuzzy pairing (the source of BASELINE.md's "Time-series /
  * fuzzy-pair scale behavior" table).
  *
  * Corpus construction follows the established probes:
  *   - events are replicated with injective user_id / event_id offsets
  *     and UNCHANGED timestamps — every replica user carries the exact
  *     per-user series shape of an original user, so gap-fill grid
  *     volume and anomaly counts are exactly ∝ R while per-user window
  *     sizes stay constant (the property that makes both operators
  *     ~linear: cost is keyed work per user, never cross-user);
  *   - the fuzzy-pair inventory is the distinct part-name dictionary
  *     replicated with a per-replica suffix on the LAST token, which
  *     relocates each replica into its own disjoint block set while
  *     preserving within-pair distances (a shared suffix never changes
  *     Levenshtein), so pair volume is exactly ∝ R.
  *
  * Usage: runMain graft.EventsScaleProbe [replicas...] (default 1 4 16)
  */
object EventsScaleProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = LocalSession()
    val ev = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val names = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.1", "part")
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("name_id"))

    def evCorpus(r: Int): DataFrame = ev.select(
      (col("event_id") + r * 100000000L).as("event_id"), col("ts"),
      (col("user_id") + r * 1000000L).as("user_id"),
      col("event_type"), col("value"))

    def nameCorpus(r: Int): DataFrame = names.select(
      (col("name_id") + r * 10000000L).as("name_id"),
      // fixed-width suffix: Levenshtein-neutral (shared) AND
      // length-stable across replicas, so the JW scores replicate
      // exactly per replica too
      concat(col("p_name"), lit(f"#$r%02d")).as("p_name"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    replicas.foreach { rep =>
      val ec = (0 until rep).map(evCorpus).reduce(_ union _)
        .localCheckpoint(true)
      val ne = ec.count()

      Events.gapFill(ec).count()
      val (nGrid, tGap) = timed { Events.gapFill(ec).count() }

      Events.rollingAnomalies(ec).count()
      val (nAnom, tAnom) = timed { Events.rollingAnomalies(ec).count() }

      // SCD2: per-user keyed windows — replica users carry the exact
      // per-user change-log shape of an original user, so interval
      // volume is exactly ∝ R at ~constant per-user window size
      Events.scd2(ec, "user_id", "event_type").count()
      val (nIv, tScd) = timed {
        Events.scd2(ec, "user_id", "event_type").count()
      }

      // attribution: one user-keyed pair join; per-user activity is
      // replica-invariant so credited pair volume is exactly ∝ R
      Events.attributeConversions(ec, "purchase", 21600L, "linear")
        .count()
      val (credRow, tAttr) = timed {
        Events.attributeConversions(ec, "purchase", 21600L, "linear")
          .agg(sum(col("n_conversions"))).first().getLong(0)
      }

      // transition matrix: cells stay <= |types|^2; MASS per cell is
      // the replica-linear quantity, so sum(n_pairs) is what must be
      // exactly prop R at ~flat time-per-event
      Events.transitionMatrix(ec).agg(sum(col("n_pairs"))).first()
      val (nTrans, tTrans) = timed {
        Events.transitionMatrix(ec).agg(sum(col("n_pairs")))
          .first().getLong(0)
      }

      // decayed activity: per-user top-k work, rows = users prop R
      Events.decayedActivity(ec).count()
      val (nDecay, tDecay) = timed { Events.decayedActivity(ec).count() }

      val nc = (0 until rep).map(nameCorpus).reduce(_ union _)
        .localCheckpoint(true)
      val nn = nc.count()
      Dedup.editDistancePairs(nc, "name_id", "p_name", 3).count()
      val (nPairs, tFuzzy) = timed {
        Dedup.editDistancePairs(nc, "name_id", "p_name", 3).count()
      }

      Dedup.jaroWinklerPairs(nc, "name_id", "p_name", 0.85).count()
      val (nJw, tJw) = timed {
        Dedup.jaroWinklerPairs(nc, "name_id", "p_name", 0.85).count()
      }

      println(f"EVSCALE events=$ne%8d gapfill=$tGap%6.1fs grid=$nGrid%8d " +
        f"anomalies=$tAnom%6.1fs flagged=$nAnom%6d " +
        f"scd2=$tScd%6.1fs intervals=$nIv%8d " +
        f"attrib=$tAttr%6.1fs credited=$credRow%8d | " +
        f"names=$nn%6d fuzzy=$tFuzzy%6.1fs pairs=$nPairs%6d")
      println(f"EVSCALE2 events=$ne%8d transitions=$tTrans%6.1fs " +
        f"mass=$nTrans%8d decayed=$tDecay%6.1fs users=$nDecay%8d | " +
        f"jw=$tJw%6.1fs jwpairs=$nJw%6d")
    }
    spark.stop()
  }
}
