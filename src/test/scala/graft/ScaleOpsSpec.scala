package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Skew, TextAnalysis}
import graft.sources.Bucketing

object ScaleOpsSpec {
  /** The FINAL adaptive plan only: a finalized AdaptiveSparkPlanExec's
    * toString prints both "== Final Plan ==" and "== Initial Plan =="
    * sections, and counting operators across both double-counts. */
  def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
      .split(java.util.regex.Pattern.quote("== Initial Plan ==")).head
}

/** Bucketing and skew-salting: exactness plus the plan properties that
  * make them worth using. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("labelPropagation plan shape: ONE join per round — the " +
       "(count desc, label asc) argmax is a single max_by aggregate, " +
       "not a votes-join-max-filter round trip") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("u", "v")
    // one ROUND (the truncation-free body) plans exactly one join
    // and two aggregates — the join-max-filter form planned two
    // joins and three aggregates here
    val und = edges.select(col("u").as("a"), col("v").as("b"))
      .union(edges.select(col("v").as("a"), col("u").as("b")))
      .distinct()
    val labels0 = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    val round = graft.operators.Graph.lpaRound(und, labels0)
    val joins = round.queryExecution.optimizedPlan.collect {
      case j: Join => j
    }
    assert(joins.size == 1,
      s"expected 1 join per round, got ${joins.size}:\n" +
        round.queryExecution.optimizedPlan)
    val aggs = round.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.aggregateExpressions.toString.contains("cnt") ||
          a.aggregateExpressions.toString.contains("max_by") => a
    }
    assert(aggs.size == 2,
      s"expected the vote count + argmax aggregates only:\n" +
        round.queryExecution.optimizedPlan)
    // semantics anchor: the triangle resolves to its smallest id and
    // the pendant node joins it (2 rounds suffice on this graph)
    val labels = graft.operators.Graph
      .labelPropagation(edges, "u", "v", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet.size == 1 ||
      labels.values.forall(_ <= 2)) // sync LPA may oscillate 1<->2
  }

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet"), "li_bucketed", 8,
      Seq("l_orderkey"))
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet")
        .withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bucketed", 8,
      Seq("l_orderkey"))
    // AQE wraps the plan; materialize THIS Dataset's QueryExecution
    // (collect — count() builds a separate one and would leave this plan
    // un-finalized, making the assertion inspect the initial plan)
    def shuffleOps(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "Exchange hashpartitioning".r
        .findAllIn(ScaleOpsSpec.finalPlan(df)).length
    }
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed",
        "ord_bucketed", Seq("l_orderkey"))
      assert(joined.count() == 6000L) // every lineitem matches its order
      assert(shuffleOps(joined) == 0, "bucketed join must not shuffle")
      // contrast: the same join on plain parquet must shuffle both sides
      val plain = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet")
          .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
      assert(shuffleOps(plain) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("q_join_bucketed: fact-side join is exchange-free; only the final agg shuffles") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_join_bucketed")(spark, dir)
    // materialize THIS Dataset's QueryExecution so AQE finalizes the
    // inspected plan (count() would execute a separate QueryExecution)
    val bucketed = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plan = ScaleOpsSpec.finalPlan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the 25-row groupBy(n_name) aggregate is the single unavoidable
    // shuffle; the orders⋈customer join must ride the bucketed layout
    assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges\n$plan")
    val plain = SparkEntry.queries("q_join_revenue")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(bucketed == plain)
  }

  test("nearDupClusters runs exactly one Spark action per propagation round") {
    // 1-2-3-8 is a diameter-3 chain: min-label needs 3 propagation rounds
    // + 1 confirming round = 4 actions, + the final collect() = 5. A
    // separate isEmpty convergence probe per round (the r2 shape) would
    // show up as 9. Counting QueryExecutions, not Spark jobs — checkpoint
    // materialization and executeTake split one action into several jobs.
    val pairs = spark.sql(
      """select * from values (1L, 2L), (2L, 3L), (7L, 9L), (4L, 5L), (3L, 8L)
        | as t(id_a, id_b)""".stripMargin)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      // lazy localCheckpoint registers a QueryExecution too but runs no
      // job — exclude it so the count is job-running actions only
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName != "localCheckpoint") { actions.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val labels = graft.operators.Dedup.nearDupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L,
        4L -> 4L, 5L -> 4L, 7L -> 7L, 9L -> 7L))
      // the listener bus is async: wait for the expected count, then for
      // QUIESCENCE (count stable across consecutive polls) so an extra
      // regression-indicating action can't land after the assertion —
      // a fixed grace beat would race a loaded bus
      val deadline = System.nanoTime() + 10_000_000_000L
      while (actions.size < 5 && System.nanoTime() < deadline) Thread.sleep(50)
      var stable = 0
      var last = -1
      while (stable < 10 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        if (actions.size == last) stable += 1 else { stable = 0; last = actions.size }
      }
      assert(actions.size == 5,
        s"expected 5 actions (4 rounds + collect), got $actions")
    } finally spark.listenerManager.unregister(listener)
  }

  test("saltedJoin equals the plain join on skewed data") {
    // skew: 90% of rows carry one hot key
    val big = spark.range(0, 5000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
        .as("k"), col("id").as("payload"))
    val small = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val expect = big.join(small, Seq("k")).orderBy("payload")
      .collect().toSeq
    val got = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "payload", "name").orderBy("payload").collect().toSeq
    assert(got == expect)
  }

  test("dedupPassages plans a map-side partial min, not a window") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.operators.Dedup.dedupPassages(docs, "doc_id", "text", 10)
    out.collect() // finalize AQE before inspecting
    val plan = ScaleOpsSpec.finalPlan(out)
    // the first-occurrence computation must be the skew-safe aggregate
    // form: partial_min below the passage-keyed exchange, and no Window
    // operator anywhere (a window over a hot passage pins one task)
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("buildVocab plans the top-N as TakeOrderedAndProject") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.operators.TextAnalysis.buildVocab(docs, "text", 10)
    out.collect()
    // orderBy+limit must plan as the per-partition-heap form — a global
    // Sort before the limit would materialize the whole token table
    val plan = ScaleOpsSpec.finalPlan(out)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("heavyHitterTokens plans a map-side partial sketch before one exchange") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.operators.TextAnalysis.heavyHitterTokens(
      docs, "text", groupCols = Seq("lang"), capacity = 256, topN = 5)
    out.collect()
    val plan = ScaleOpsSpec.finalPlan(out)
    // the whole point of the sketch: the exchange must carry partial
    // summaries (one <= capacity-counter state per partition per group),
    // not exploded token rows — partial aggregate below the lang-keyed
    // exchange, no Generate (explode) anywhere upstream of it
    assert(plan.contains("partial_heavy_hitters_sketch"), plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    val beforeExchange = plan.substring(plan.indexOf("Exchange"))
    assert(beforeExchange.contains("partial_heavy_hitters_sketch"), plan)
  }

  test("approxDistinctTokens plans a map-side partial sketch before one exchange") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.operators.TextAnalysis.approxDistinctTokens(
      docs, "text", groupCols = Seq("lang"), k = 64)
    out.collect()
    val plan = ScaleOpsSpec.finalPlan(out)
    // the exchange must carry <= k-hash partial states per group, not
    // one row per distinct token (the count(distinct) shape this
    // replaces): partial sketch below the single lang-keyed exchange
    assert(plan.contains("partial_kmv_distinct_sketch"), plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    val beforeExchange = plan.substring(plan.indexOf("Exchange"))
    assert(beforeExchange.contains("partial_kmv_distinct_sketch"), plan)
  }

  test("phraseSearch broadcasts phrases; the one exchange carries hits only") {
    val s = spark
    import s.implicits._
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val queries = Seq((0, "table hash"), (1, "slow hash batch"))
      .toDF("query_id", "phrase")
    val out = graft.operators.TextSearch.phraseSearch(docs, queries)
    out.collect()
    val plan = ScaleOpsSpec.finalPlan(out)
    // corpus grams join the broadcast phrase table map-side; only the
    // (query, doc) hit groupBy may shuffle — one exchange, after the
    // match-proportional filter, never a corpus-keyed sort-merge
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // one SHUFFLE exchange (the hit groupBy); the other Exchange hits
    // in the plan string are the two broadcasts
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("bpeTokenize is one narrow projection: no exchange, no window") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.operators.TextAnalysis.bpeTokenize(
      docs, Seq("a" -> "b", "ab" -> "c"), "text", "doc_id")
    out.collect()
    val plan = ScaleOpsSpec.finalPlan(out)
    // the merge table rides as literals inside compiled folds, so
    // tokenization must stay scan-speed: no shuffle anywhere
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("rankOrderClassify joins the profile model by broadcast only") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.operators.TextClassify.rankOrderClassify(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      labelCol = "lang", idCol = "doc_id", textCol = "text",
      n = 3, topN = 50, topM = 30)
    out.collect()
    val plan = ScaleOpsSpec.finalPlan(out)
    // the model (labels x topN) and the label list must ride as
    // broadcasts; a sort-merge join here would shuffle the corpus
    // against a fixed-size model
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("IVF probe side is a narrow projection (no exchange, no window)") {
    val emb = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val centroids = (0 until 8).map(i =>
      (0 until 64).map(j => (i * 64 + j) * 0.01))
    val probes = graft.operators.Similarity.probeCells(
      queries, "vec_id", "embedding", centroids, 2)
    probes.collect()
    val plan = ScaleOpsSpec.finalPlan(probes)
    // the native top-K kernel replaced an explode+rank-window form that
    // shuffled the query side; probing must stay shuffle-free
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("nearest_centroids_topk"), plan)
  }

  test("zValue interleaves bits; zOrderWrite preserves rows and bounds per-file boxes") {
    // bit-exact interleave: a's bits land at positions 0,2,4 and b's at
    // 1,3,5
    val z = spark.range(1)
      .select(graft.sources.Layout.zValue(
        Seq(lit(5L), lit(3L)), bits = 3).as("z"))
      .head.getLong(0)
    // a=101: bit0->pos0, bit1->pos2, bit2->pos4 = 1 + 0 + 16 = 17
    // b=011: bit0->pos1, bit1->pos3, bit2->pos5 = 2 + 8 + 0  = 10
    assert(z == 27L)

    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = "/tmp/graft_zorder_spec"
    graft.sources.Layout.zOrderWrite(li, Seq("l_partkey", "l_suppkey"),
      out, numFiles = 8)
    val back = spark.read.parquet(out)
    // the rewrite is a relayout, not a transform: same row multiset
    assert(back.count() == li.count())
    assert(back.except(li).isEmpty && li.except(back).isEmpty)
    // measured per-file bounding boxes: range-partitioning on the Morton
    // key must bound BOTH dimensions' spans — the avg per-file box area
    // stays well under the global box (single-column layouts bound one
    // dimension and leave the other at full span)
    val boxes = back.withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max("l_partkey") - min("l_partkey")).as("dp"),
        (max("l_suppkey") - min("l_suppkey")).as("ds"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val g = li.agg((max("l_partkey") - min("l_partkey")).as("gp"),
      (max("l_suppkey") - min("l_suppkey")).as("gs")).head
    val (gp, gs) = (g.getLong(0), g.getLong(1))
    assert(boxes.length >= 4, s"expected several files, got ${boxes.length}")
    val avgArea = boxes.map { case (dp, ds) =>
      dp.toDouble * ds }.sum / boxes.length
    assert(avgArea <= 0.4 * gp * gs,
      s"avg per-file box $avgArea vs global ${gp.toDouble * gs}")
  }

  test("gopher gate and kmeans assignment plan with zero exchanges") {
    // both claim scan-speed shapes: the rule gate is a pure projection,
    // and cluster assignment is a broadcast-centroid scan (training
    // collects nlist×dim bounded metadata, not corpus rows)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gate = TextAnalysis.gopherQualityFlags(docs, minStopwords = 1)
    gate.collect()
    assert(!ScaleOpsSpec.finalPlan(gate).contains("Exchange"),
      ScaleOpsSpec.finalPlan(gate))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = graft.operators.Similarity.kmeansAssign(emb, "vec_id",
      "embedding", nlist = 8, lloydIters = 0)
    cells.collect()
    assert(!ScaleOpsSpec.finalPlan(cells).contains("Exchange"),
      ScaleOpsSpec.finalPlan(cells))
  }

  test("blendQuality plans with zero exchanges; fuzzy/KS/APSS plan equi-joins only") {
    // the blend claims a scan-speed shape: fitted bounds ride as plan
    // literals, so scoring is a pure constant-folded projection
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val blend = TextAnalysis.blendQuality(docs,
      TextAnalysis.fitQualityStats(docs))
    blend.collect()
    assert(!ScaleOpsSpec.finalPlan(blend).contains("Exchange"),
      ScaleOpsSpec.finalPlan(blend))
    // the joins in the round-6 pair/drift operators must all be keyed —
    // a nested-loop sweep would be the quadratic failure mode
    val names = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("name_id"))
    val fuzzy = graft.operators.Dedup.editDistancePairs(
      names, "name_id", "p_name", maxDist = 3)
    fuzzy.collect()
    val fuzzyPlan = ScaleOpsSpec.finalPlan(fuzzy)
    assert(!fuzzyPlan.contains("CartesianProduct") &&
      !fuzzyPlan.contains("BroadcastNestedLoopJoin"), fuzzyPlan)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("value", col("value").cast("double"))
    val ks = graft.operators.Stats.ksDrift(
      ev.limit(500), ev.limit(800), "value", binWidth = 5.0)
    ks.collect()
    val ksPlan = ScaleOpsSpec.finalPlan(ks)
    assert(!ksPlan.contains("CartesianProduct"), ksPlan)
    val apss = graft.operators.Dedup.tfidfCosinePairs(
      docs, "doc_id", "text", 0.7, n = 3)
    apss.collect()
    val apssPlan = ScaleOpsSpec.finalPlan(apss)
    assert(!apssPlan.contains("CartesianProduct") &&
      !apssPlan.contains("BroadcastNestedLoopJoin"), apssPlan)
  }

  test("winnowOverlapPairs plans an equi-join, never a nested-loop sweep") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text")
    pairs.collect()
    val plan = ScaleOpsSpec.finalPlan(pairs)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("triangle counting and phash pairs plan equi-joins, never sweeps") {
    val s = spark
    import s.implicits._
    val edges = (0 until 200).map(i => ((i % 37).toLong, (i % 23).toLong))
      .toDF("src", "dst")
    val tri = graft.operators.Graph.triangleCounts(edges, "src", "dst")
    tri.collect()
    val triPlan = ScaleOpsSpec.finalPlan(tri)
    assert(!triPlan.contains("CartesianProduct") &&
      !triPlan.contains("BroadcastNestedLoopJoin"), triPlan)
    val hashes = (0L until 50L).map(i => (i, i * 1664525L + 1013904223L))
      .toDF("id", "phash")
    val pairs = graft.operators.Multimodal.phashNearDupPairs(hashes)
    pairs.collect()
    val pairPlan = ScaleOpsSpec.finalPlan(pairs)
    assert(!pairPlan.contains("CartesianProduct") &&
      !pairPlan.contains("BroadcastNestedLoopJoin"), pairPlan)
    // the first-agreeing-chunk dedup replaced distinct(): no aggregate
    // over the candidate pairs may appear downstream of the join
    assert(!pairPlan.contains("HashAggregate"), pairPlan)
  }

  test("prCurve plans without any window operator (bounded-join cumsum)") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (i.toDouble, i % 3 == 0))
      .toDF("score", "y")
    val pr = graft.operators.Stats.prCurve(df, "score", "y", bins = 50)
    pr.collect()
    val plan = ScaleOpsSpec.finalPlan(pr)
    assert(!plan.contains("Window"), plan)
  }

  test("reduceDims is a narrow scan-speed projection (zero exchanges)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val red = graft.operators.Similarity
      .reduceDims(emb, "vec_id", "embedding", 8)
    red.collect()
    val plan = ScaleOpsSpec.finalPlan(red)
    assert(!plan.contains("Exchange"), plan)
  }

  test("saltedStats equals direct aggregation") {
    val events = graft.sources.Sources.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sum"),
        min("value").as("min"), max("value").as("max"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedStats(events, Seq("event_type"), "value", 8)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("min"), r.getAs[Double]("max"))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, mn, mx)) =>
      assert((n, mn, mx) == direct(k), s"key $k")
    }
  }

  test("round-6 session ops plan right: cap prunes map-side, diff is one " +
    "join, corr has no decimal sums, oov broadcasts the vocab") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Sources.table(spark, dir, "documents")

    // capPerGroup: rank-limit pushdown must prune BEFORE the exchange
    val cap = graft.operators.Curation.capPerGroup(
      docs.select("doc_id", "source"), Seq("source"), 5, Seq("doc_id"))
    cap.collect()
    val capPlan = ScaleOpsSpec.finalPlan(cap)
    assert(capPlan.contains("WindowGroupLimit"), capPlan)
    assert(capPlan.indexOf("WindowGroupLimit") !=
      capPlan.lastIndexOf("WindowGroupLimit"), // partial AND final
      capPlan)

    // snapshotDiff: exactly ONE join (sort-merge or hash), no window
    val neu = docs.filter(col("doc_id") % 7 =!= 0)
    val diff = graft.sources.Layout.snapshotDiff(docs, neu,
      Seq("doc_id"), Seq("text"))
    diff.collect()
    val diffPlan = ScaleOpsSpec.finalPlan(diff)
    assert(diffPlan.split("Join").length - 1 == 1, diffPlan)
    assert(!diffPlan.contains("Window"), diffPlan)

    // correlationMatrix: the integer-moment form must plan a single
    // pair of partial/final hash aggregates with NO decimal sums and
    // no window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val corr = graft.operators.Stats.correlationMatrix(li,
      Seq("l_quantity", "l_extendedprice", "l_discount"), scale = 2)
    corr.collect()
    val corrPlan = ScaleOpsSpec.finalPlan(corr)
    assert(!corrPlan.toLowerCase.contains("decimal(28"), corrPlan)
    assert(!corrPlan.contains("Window"), corrPlan)

    // vocabCoverage: the vocab side must broadcast (a shuffle join on
    // the exploded token stream would re-key the whole corpus)
    val vocab = graft.operators.TextAnalysis.buildVocab(docs, "text", 50)
    val oov = graft.operators.TextAnalysis.vocabCoverage(docs, vocab)
    oov.collect()
    val oovPlan = ScaleOpsSpec.finalPlan(oov)
    assert(oovPlan.contains("BroadcastHashJoin"), oovPlan)
  }

  test("transition/decayed/JW/integrity operators plan their claimed shapes") {
    val ev = graft.sources.Sources.table(spark,
      "/root/testdata/sf0.001", "events")

    // transitionMatrix: user window -> partial-agg'd matrix exchange ->
    // per-src window over the matrix frame; the partial_count BEFORE
    // the second exchange is what caps its payload at |types|^2 cells
    val tm = graft.operators.Events.transitionMatrix(ev)
    tm.collect()
    val tmPlan = ScaleOpsSpec.finalPlan(tm)
    assert(tmPlan.contains("partial_count"), tmPlan)
    assert(!tmPlan.contains("CartesianProduct"), tmPlan)
    assert("Exchange hashpartitioning".r.findAllIn(tmPlan).length == 3,
      tmPlan)

    // topPaths: both leads share ONE Window node, and the top-N is a
    // TakeOrderedAndProject, never a global Sort
    val tp = graft.operators.Events.topPaths(ev, k = 3, topN = 10)
    tp.collect()
    val tpPlan = ScaleOpsSpec.finalPlan(tp)
    assert(tpPlan.split("Window").length - 1 == 1, tpPlan)
    assert(tpPlan.contains("TakeOrderedAndProject"), tpPlan)

    // decayedActivity: the user-keyed groupBy must RIDE the window's
    // user partitioning — one exchange total, or the top-k prune pays
    // a second full shuffle for nothing
    val da = graft.operators.Events.decayedActivity(ev)
    da.collect()
    val daPlan = ScaleOpsSpec.finalPlan(da)
    assert("Exchange hashpartitioning".r.findAllIn(daPlan).length == 1,
      daPlan)

    // jaroWinklerPairs: keyed self-join only, with the native scorer
    // inlined in the plan (not a BatchEvalPython/udf detour)
    val names = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("name_id"))
    val jw = graft.operators.Dedup.jaroWinklerPairs(
      names, "name_id", "p_name", threshold = 0.85)
    jw.collect()
    val jwPlan = ScaleOpsSpec.finalPlan(jw)
    assert(!jwPlan.contains("CartesianProduct") &&
      !jwPlan.contains("BroadcastNestedLoopJoin"), jwPlan)
    assert(jwPlan.contains("jaro_winkler"), jwPlan)

    // referentialOrphans: the anti-join runs on the collapsed child
    // dictionary (partial_count before any join), as a LeftAnti
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val ro = graft.operators.Stats.referentialOrphans(
      orders, cust, "o_custkey", "c_custkey", "o->c")
    ro.collect()
    val roPlan = ScaleOpsSpec.finalPlan(ro)
    assert(roPlan.contains("LeftAnti"), roPlan)
    assert(roPlan.contains("partial_count"), roPlan)
  }

  test("round-7 scan-speed operators plan with zero exchanges") {
    // extractText, normalizeText, canonicalizeUrls, and unigramTokenize
    // all claim pure-projection shapes: no join, no aggregation, no
    // window — the 100 TB contract is that they ride the scan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val extracted = graft.operators.HtmlExtract.extractText(
      docs.select(col("doc_id"),
        concat(lit("<p>"), col("text"), lit("</p>")).as("html")))
    extracted.collect()
    assert(!ScaleOpsSpec.finalPlan(extracted).contains("Exchange"),
      ScaleOpsSpec.finalPlan(extracted))
    val normed = graft.operators.Normalize.normalizeText(docs)
    normed.collect()
    assert(!ScaleOpsSpec.finalPlan(normed).contains("Exchange"),
      ScaleOpsSpec.finalPlan(normed))
    val urls = graft.operators.UrlOps.canonicalizeUrls(
      docs.select(col("doc_id"),
        concat(lit("https://example.com/"), col("doc_id").cast("string"))
          .as("url")))
    urls.collect()
    assert(!ScaleOpsSpec.finalPlan(urls).contains("Exchange"),
      ScaleOpsSpec.finalPlan(urls))
    val s = spark
    import s.implicits._
    val vocab = Seq((1, "ab", 5L, -1.0), (2, "a", 1L, -3.0),
      (3, "b", 1L, -3.0)).toDF("rank", "piece", "weight", "logprob")
    val toks = graft.operators.TextAnalysis.unigramTokenize(
      docs, "doc_id", "text", vocab, maxPieceLen = 2)
    toks.collect()
    assert(!ScaleOpsSpec.finalPlan(toks).contains("Exchange"),
      ScaleOpsSpec.finalPlan(toks))
  }

  test("sentence/readability/sitemap ops plan zero exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sents = graft.operators.Sentences.splitSentences(docs)
    sents.collect()
    assert(!ScaleOpsSpec.finalPlan(sents).contains("Exchange"),
      ScaleOpsSpec.finalPlan(sents))
    val scores = graft.operators.Sentences.readabilityScores(docs)
    scores.collect()
    assert(!ScaleOpsSpec.finalPlan(scores).contains("Exchange"),
      ScaleOpsSpec.finalPlan(scores))
    val sm = graft.operators.Sitemaps.parseSitemaps(
      docs.select(col("source").as("host"),
        concat(lit("<urlset><url><loc>https://h/"),
          col("doc_id").cast("string"),
          lit("</loc></url></urlset>")).as("xml")))
    sm.collect()
    assert(!ScaleOpsSpec.finalPlan(sm).contains("Exchange"),
      ScaleOpsSpec.finalPlan(sm))
    val warc = graft.sources.Warc.parseWarc(
      docs.select(col("doc_id"),
        concat(lit("WARC/1.0\r\nContent-Length: "),
          octet_length(col("text")).cast("string"),
          lit("\r\n\r\n"), col("text")).as("blob")))
    warc.collect()
    assert(!ScaleOpsSpec.finalPlan(warc).contains("Exchange"),
      ScaleOpsSpec.finalPlan(warc))
  }

  test("coverageCurve plans heap top-cuts; seasonalScore broadcasts its cells") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cov = graft.operators.TextAnalysis.coverageCurve(docs,
      cuts = Seq(5, 50))
    cov.collect()
    val covPlan = ScaleOpsSpec.finalPlan(cov)
    // each cut must cut via per-partition heaps, not a global sort
    assert(covPlan.contains("TakeOrderedAndProject"), covPlan)
    assert(!covPlan.contains("Sort ["), covPlan)
    val events = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "events")
    val sea = graft.operators.Events.seasonalBaseline(events, minObs = 5L)
    sea.collect()
    val seaPlan = ScaleOpsSpec.finalPlan(sea)
    // the cell table joins back as a broadcast: no shuffle join of the
    // raw events against 24x|keys| rows
    assert(seaPlan.contains("BroadcastHashJoin"), seaPlan)
    assert(!seaPlan.contains("SortMergeJoin"), seaPlan)
  }

  test("Frontier.schedule caps map-side: WindowGroupLimit below one exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = docs.select(col("source").as("host"),
      concat(lit("https://h/"), col("doc_id").cast("string")).as("url"))
    val out = graft.operators.Frontier.schedule(urls, maxPerHost = 5)
    out.collect()
    val plan = ScaleOpsSpec.finalPlan(out)
    // the per-host budget must truncate BEFORE the host-keyed shuffle:
    // a partial WindowGroupLimit under the single exchange is what
    // keeps an adversarial 10M-URL host from owning the wire
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert("WindowGroupLimit".r.findAllIn(plan).length == 2, plan)
    val beforeExchange = plan.substring(plan.indexOf("Exchange"))
    assert(beforeExchange.contains("WindowGroupLimit"), plan)
  }

  test("readWarcGz plans with ZERO exchanges: record streaming + " +
       "header projection never shuffle at any archive count") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warc-plan").toFile
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    (0 until 3).foreach { i =>
      val payload = s"payload $i".getBytes
      val rec = (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes ++ payload
      val f = new java.io.FileOutputStream(
        new java.io.File(dir, s"f$i.warc.gz"))
      f.write(gz(rec)); f.close()
    }
    val out = graft.sources.Warc.readWarcGz(spark,
      Seq(dir.getAbsolutePath))
    assert(out.collect().length == 3)
    val plan = ScaleOpsSpec.finalPlan(out)
    assert(!plan.contains("Exchange"), plan)
  }
}
