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
  * Timeout discipline (lesson from the r13 official record, which hit
  * the driver's wall-clock cap and produced NO data because the JSON was
  * written once at the very end):
  *
  *  3. The results file is rewritten after EVERY timed sample, so an
  *     external kill at any point leaves a complete, parseable record of
  *     everything measured so far (`"partial":true` until the suite
  *     finishes cleanly).
  *
  *  4. A wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_S`, default 3000 s
  *     — generously inside the driver's observed cap) bounds the whole
  *     run: pass 1 always takes its full samples; before each later pass
  *     the projected pass cost (from per-query minima, ×1.15 fudge) is
  *     checked against the remaining budget and the pass degrades to one
  *     sample per query, or is dropped entirely, to fit. Mid-pass the
  *     budget is re-checked before every query. Degradation is recorded
  *     in the JSON (`"degraded"`, `"passes_run"`) — a shortened record
  *     says so instead of silently looking like a fast box.
  *
  *  5. Stable-band trim: a query whose recorded min already exceeds
  *     `SPARK_GRAFT_BENCH_SLOW_S` (default 2 s) takes ONE sample on
  *     passes ≥2 instead of two — at that magnitude the warm-locality
  *     delta is noise relative to the signal, and the HyperBall/LM band
  *     alone was ~84 s of redundant re-measurement per sweep.
  *
  *  6. Cross-query source cache (default ON, `SPARK_GRAFT_BENCH_CACHE=0`
  *     reverts, recorded as `"cached"` in the JSON): the sfDir tables
  *     are persisted once up front; `Sources.table` plans canonicalize
  *     identically across queries, so Spark's CacheManager substitutes
  *     the in-memory relation into every query — each query pays its
  *     OWN operators, not a repeated parquet scan of the same table
  *     (the fixed cost that left the r14 official record 1.8 s inside
  *     its budget on a contended box). Because the cache changes what a
  *     total MEASURES (operator cost vs operator+scan cost), records
  *     carry a `"basis"` version (`v2-cached` / `v2-uncached`;
  *     r14-and-earlier records are implicitly `v1-uncached`) — two
  *     records compare like-for-like ONLY on the same basis string.
  *
  *  7. Load-adaptive pass planning (lesson from the r13/r14/r15
  *     official records, all three truncated under ambient load while
  *     quiet sweeps fit with margin): before timing starts, a CANARY
  *     slice — up to 8 mid-band queries spread through the suite — runs
  *     twice each and the second (warm) sample is compared against the
  *     committed quiet minima in `SPARK_GRAFT_BENCH_REF` (default
  *     `bench_quiet_ref.json`; absent → planning disabled, behave as
  *     configured). The median ratio is the measured load factor,
  *     recorded as `"load_factor"` in the JSON. A floor ≥ 1.3× drops
  *     the plan outright to ONE pass with the slow-band trim applied on
  *     pass 1 (ref minima decide the band); below that, the largest
  *     plan whose projected elapsed — load_factor × the ref sweep's
  *     elapsed × a per-plan cost fraction — fits inside 90% of the
  *     budget is chosen (`"passes_planned"`). The mid-run budget checks
  *     of (4) remain the hard guarantee; planning just stops a loaded
  *     box from burning the whole budget on an over-ambitious pass 1.
  *
  * Emits ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"failed":[…],"runs":…,"sf":…}`
  * to stdout AND to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * `bench_latest.json` in the cwd) so the driver can parse it without
  * scraping sbt's log-prefixed stdout. A query that throws on every
  * attempted pass is recorded with the `-1` sentinel time and listed in
  * `failed`, and the process exits non-zero — a regression can't
  * masquerade as a speedup. A query never attempted because the budget
  * ran out keeps the `-1` sentinel but is listed in `skipped`, not
  * `failed` (exit stays 0): missing data is not a regression. */
object Bench {
  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - wall0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val samples =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "2").toInt.max(1)
    val budgetS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "3000").toDouble
    val slowS = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW_S", "2.0").toDouble
    // Cross-query source cache (default ON; SPARK_GRAFT_BENCH_CACHE=0
    // reverts): every query rebuilds its sources via Sources.table,
    // whose logical plan canonicalizes identically call-to-call, so
    // persisting each sfDir table ONCE lets Spark's CacheManager
    // substitute the in-memory relation into every query plan — the
    // repeated parquet scans (the per-query fixed cost that made the
    // r14 official record finish 1.8 s inside its 3000 s budget on a
    // contended box) collapse into one materialization. Recorded in
    // the JSON ("cached") so records state their own basis.
    val cacheTables =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CACHE", "1") == "1"
    val spark = LocalSession()
    // session bring-up: codegen, noop sink, shuffle machinery
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // IO bring-up: one untimed full scan of each sfDir table so no timed
    // query is charged cold page-cache / parquet-footer costs. Via
    // Sources.table — events needs the nanos-timestamp normalization.
    // With the cache on, the same pass materializes the persisted form.
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val tdf = sources.Sources.table(spark, sfDir,
          f.getName.stripSuffix(".parquet"))
        if (cacheTables)
          tdf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tdf.write.format("noop").mode("overwrite").save()
      }
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    // queries (comma-separated exact names); unset = the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val best = collection.mutable.Map.empty[String, Double]
    val attempted = collection.mutable.Set.empty[String]
    var passesRun = 0
    var degraded = "none"

    def timeOne(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[Double] = {
      attempted += name
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
        Some(dt)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }

    // ---- load-adaptive pass planning (header item 7) ----
    // committed quiet reference: per-query minima + sweep elapsed from
    // the last quiet 3-pass record (minimal hand parse — the record is
    // this program's own single-line output, so the shape is known)
    val refPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_quiet_ref.json")
    val ref: Option[(Map[String, Double], Double)] =
      if (!Files.exists(Paths.get(refPath))) None
      else {
        val txt = Files.readString(Paths.get(refPath))
        val qsTxt = txt.indexOf("\"queries\":{") match {
          case -1 => ""
          case i => txt.substring(i + 11, txt.indexOf("}", i))
        }
        val pair = """"([^"]+)":(-?[0-9.]+)""".r
        val mins = pair.findAllMatchIn(qsTxt)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter(_._2 >= 0).toMap
        val el = """"elapsed_s":([0-9.]+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble)
        el.filter(_ => mins.nonEmpty).map(e => (mins, e))
      }
    val refMin: Map[String, Double] = ref.map(_._1).getOrElse(Map.empty)
    var loadFactor = -1.0 // -1 = no reference, planning disabled
    var plannedPasses = passes
    var pass1Trim = false
    ref.foreach { case (mins, refElapsed) =>
      // canary: up to 8 mid-band (0.25–1.0 s quiet) queries evenly
      // spaced through the name-sorted suite; two samples each, the
      // SECOND (warm) one is the load read — the first pays
      // codegen/JIT bring-up the quiet minima never see
      val cand = names.map(_._1)
        .filter(n => mins.get(n).exists(v => v >= 0.25 && v <= 1.0))
      val canary =
        if (cand.size <= 8) cand
        else (0 until 8).map(i => cand(i * cand.size / 8))
      val ratios = canary.flatMap { n =>
        val fn = SparkEntry.queries(n)
        timeOne(n, fn)
        timeOne(n, fn).map(_ / mins(n))
      }.sorted
      if (ratios.nonEmpty) {
        loadFactor = ratios(ratios.size / 2)
        if (loadFactor >= 1.3) { plannedPasses = 1; pass1Trim = true }
        else {
          // plan-cost fractions of the quiet 3-pass sweep's elapsed,
          // estimated from the r15 quiet record's structure (pass 1 =
          // two cold-ish samples of everything; later passes
          // slow-band-trimmed): 2-pass ~0.72, 1-pass ~0.42, 1 pass
          // with the trim applied on pass 1 itself ~0.25
          val frac = Map(3 -> 1.0, 2 -> 0.72, 1 -> 0.42)
          val plans = (passes.min(3) to 1 by -1)
            .map(p => (p, false, frac(p))) :+ ((1, true, 0.25))
          val fit = plans.find { case (_, _, f) =>
            loadFactor.max(1.0) * refElapsed * f <= 0.9 * budgetS }
          fit match {
            case Some((p, trim, _)) => plannedPasses = p; pass1Trim = trim
            case None => plannedPasses = 1; pass1Trim = true
          }
        }
      }
    }
    if (plannedPasses < passes || pass1Trim)
      System.err.println(f"[bench] load_factor=$loadFactor%.2f -> " +
        s"passes_planned=$plannedPasses pass1Trim=$pass1Trim")

    def render(partial: Boolean): String = {
      val results = names.map { case (name, _) =>
        (name, best.getOrElse(name, -1.0), best.contains(name))
      }
      val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
      val failed = results
        .collect { case (k, _, false) if attempted(k) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val skipped = results
        .collect { case (k, _, false) if !attempted(k) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val total = results.collect { case (_, v, true) => v }.sum
      val basis = if (cacheTables) "v2-cached" else "v2-uncached"
      val lf = if (loadFactor < 0) "null" else f"$loadFactor%.2f"
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"skipped":$skipped,"runs":$passes,"passes_run":$passesRun,"passes_planned":$plannedPasses,"load_factor":$lf,"degraded":"$degraded","budget_s":$budgetS%.0f,"elapsed_s":$elapsedS%.1f,"cached":$cacheTables,"basis":"$basis","partial":$partial,"sf":"$sfDir"}"""
    }
    def flush(): Unit = Files.writeString(Paths.get(outPath), render(partial = true) + "\n")

    var outOfBudget = false
    for (pass <- 1 to plannedPasses if !outOfBudget) {
      // samples for this pass: full on pass 1 (unless the load plan
      // applies the slow-band trim there too, judged from REF minima
      // since nothing is measured yet); on later passes the stable
      // slow band takes one, and a projected budget overrun degrades
      // the whole pass to one sample or drops it.
      def samplesFor(name: String): Int =
        if (pass == 1) {
          if (pass1Trim && refMin.getOrElse(name, 0.0) > slowS) 1
          else samples
        }
        else if (degraded == "samples") 1
        else if (best.getOrElse(name, 0.0) > slowS) 1
        else samples
      if (pass > 1) {
        def projected(sPer: String => Int): Double =
          1.15 * names.map { case (n, _) => best.getOrElse(n, 0.5) * sPer(n) }.sum
        if (elapsedS + projected(samplesFor) > budgetS) {
          degraded = "samples"
          if (elapsedS + projected(_ => 1) > budgetS) { outOfBudget = true; degraded = "truncated" }
        }
      }
      if (!outOfBudget) {
        for ((name, fn) <- names; _ <- 1 to samplesFor(name) if !outOfBudget) {
          if (elapsedS + best.getOrElse(name, 0.0) > budgetS) {
            outOfBudget = true; degraded = "truncated"
          } else {
            timeOne(name, fn)
            flush()
          }
        }
        if (!outOfBudget) passesRun = pass
      }
    }
    val json = render(partial = false)
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    if (names.exists { case (n, _) => attempted(n) && !best.contains(n) })
      sys.exit(1)
  }
}
