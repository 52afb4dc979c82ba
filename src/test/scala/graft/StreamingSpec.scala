package graft

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Top-level so the encoder's generated code can call the accessors —
  * a class-nested case class makes Janino fail and every MemoryStream
  * row fall back to interpreted projection. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

case class LangDoc(doc_id: Long, lang: String, text: String)

case class GzDoc(doc_id: Long, blob: Array[Byte])

case class CdcChg(id: Long, seq: Long, op: String, s: String, v: Int)

case class VecRow(vec_id: Long, embedding: Seq[Float])

/** Structured Streaming behavior: the parity engine is a stateless
  * projection and runs unchanged on streams; stateful ops are watermarked. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("Functioniser applies to a streaming DataFrame unchanged") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "name")
    val out = new Functioniser()
      .add("name", "upper")
      .add("tagged", (_: Column) => concat(col("name"), lit("!")))
      .apply(stream)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("fn_stream")
      .outputMode("append").start()
    input.addData((1L, "ada"), (2L, "grace"))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql("select * from fn_stream order by id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "ADA", "ada!"), (2L, "GRACE", "grace!")))
  }

  test("gopherGateStream emits the batch gopherQualityFlags rows per micro-batch") {
    import StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // real corpus text so every rule path (words, symbols, stopwords,
    // bullets) is exercised with non-trivial values, streamed in two
    // out-of-order chunks — the gate is stateless, so arrival order
    // must not matter
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    def tsOf(id: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (id * 17 % 89) * 60000L)
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => StreamDoc(r.getLong(0), r.getString(1), tsOf(r.getLong(0))))
    val batch = graft.operators.TextAnalysis
      .gopherQualityFlags(docsDf, minStopwords = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7),
        r.getBoolean(8))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.gopherGateStream(input.toDS(), minStopwords = 1)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from gopher_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7),
        r.getBoolean(8))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // ts passes through for downstream windowing
    val tsRows = s.sql("select doc_id, ts from gopher_stream").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(docs.forall(d => tsRows(d.doc_id) == d.ts))
  }

  test("fuzzyMatchStream snaps arriving names onto the dictionary per micro-batch") {
    import StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dict = Seq((10L, "red gear"), (11L, "blue gear"),
      (12L, "red widget")).toDF("id", "name")
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.fuzzyMatchStream(input.toDF(), dict,
      "doc_id", "text", "id", "name", maxDist = 2)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("fuzzy_stream")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData(
      StreamDoc(1L, "red gear", t0),   // exact -> dist 0 (+ blue gear d=3 out)
      StreamDoc(2L, "bed gear", t0),   // typo  -> red gear d=1
      StreamDoc(3L, "red gadget", t0), // wrong block -> unmatched
      StreamDoc(4L, "rad widget", t0)) // typo  -> red widget d=1
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select * from fuzzy_stream").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString.toLong),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSet
    assert(got == Set((1L, Some(10L), 0), (2L, Some(10L), 1),
      (3L, None, -1), (4L, Some(12L), 1)))
  }

  test("gapFillStream emits the batch grid rows as the watermark finalizes buckets") {
    import graft.streaming.StreamOps.{GapEvent, GapOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evDf = graft.sources.Sources
      .table(s, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 10)
      .select("event_id", "ts", "user_id", "value")
    val batch = graft.operators.Events.gapFill(evDf, periodSeconds = 21600L)
      .collect()
      .map(r => GapOut(r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val rows = evDf.collect()
      .map(r => GapEvent(r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts"), r.getAs[Double]("value")))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[GapEvent]
    val out = StreamOps.gapFillStream(
      input.toDF().withWatermark("ts", "0 seconds").as[GapEvent],
      periodSeconds = 21600L)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    // time-ordered chunks, each internally reversed: bucket
    // representatives must not depend on arrival order
    val third = (rows.length + 2) / 3
    rows.grouped(third).foreach { chunk =>
      input.addData(chunk.reverse.toSeq: _*)
      q.processAllAvailable()
    }
    // the sentinel finalizes every real bucket (its own bucket stays
    // pending, and a fresh user's single bucket emits observed-only)
    input.addData(GapEvent(999999L, 999999L,
      Timestamp.valueOf("2030-01-01 00:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from gap_stream").as[GapOut]
      .collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(batch.exists(!_.observed)) // real gaps were interpolated
  }

  test("rollingAnomaliesStream flags byte-identical rows to the batch operator") {
    import graft.streaming.StreamOps.{AnomEvent, AnomOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evDf = graft.sources.Sources
      .table(s, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 15)
      .select("event_id", "ts", "user_id", "value")
    val batch = graft.operators.Events
      .rollingAnomalies(evDf, nPrior = 5, minPrior = 3, zThreshold = 1.5)
      .collect()
      .map(r => AnomOut(r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSet
    val rows = evDf.collect()
      .map(r => AnomEvent(r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts"), r.getAs[Double]("value")))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[AnomEvent]
    val out = StreamOps.rollingAnomaliesStream(
      input.toDF().withWatermark("ts", "0 seconds").as[AnomEvent],
      nPrior = 5, minPrior = 3, zThreshold = 1.5)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    // three time-ordered arrival chunks, each internally REVERSED: the
    // buffer must restore chronological order before scoring
    val third = (rows.length + 2) / 3
    rows.grouped(third).foreach { chunk =>
      input.addData(chunk.reverse.toSeq: _*)
      q.processAllAvailable()
    }
    // sentinel advances the watermark past every real event
    input.addData(AnomEvent(999999L, 999999L,
      Timestamp.valueOf("2030-01-01 00:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from anom_stream").as[AnomOut]
      .collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("blendQualityStream scores micro-batches like the batch blendQuality") {
    import StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    // bounds fit once on the reference corpus, shared by both forms
    val stats = graft.operators.TextAnalysis.fitQualityStats(docsDf)
    def tsOf(id: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (id * 13 % 67) * 60000L)
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => StreamDoc(r.getLong(0), r.getString(1), tsOf(r.getLong(0))))
    val batch = graft.operators.TextAnalysis.blendQuality(docsDf, stats)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.blendQualityStream(input.toDS(), stats)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("blend_stream")
      .outputMode("append").start()
    // two out-of-order chunks: a stateless projection must not care
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from blend_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    val tsRows = s.sql("select doc_id, ts from blend_stream").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(docs.forall(d => tsRows(d.doc_id) == d.ts))
  }

  test("scoreLogisticStream scores micro-batches exactly like the " +
    "batch scorer, out of order") {
    import StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80)
    val wts = graft.operators.TextClassify.trainLogisticHashed(
      docsDf.withColumn("is_en", org.apache.spark.sql.functions.col("lang") === "en"),
      "doc_id", "text", "is_en", dim = 16, iters = 2)
    val batch = graft.operators.TextClassify
      .scoreLogisticHashed(docsDf, wts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the inline fold agrees with the batch join/agg form bit-for-bit
    val inline = graft.operators.TextClassify
      .scoreLogisticInline(docsDf, wts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inline == batch)
    def tsOf(id: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (id * 7 % 53) * 60000L)
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => StreamDoc(r.getLong(0), r.getString(1), tsOf(r.getLong(0))))
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.scoreLogisticStream(input.toDS(), wts)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("logreg_stream")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c.toLong).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select doc_id, p from logreg_stream").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("madGateStream gates micro-batches with batch-fit thresholds") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ref = Seq(10.0, 11.0, 12.0, 13.0, 100.0).toDF("v")
    val (med, scaled) = graft.operators.Stats.fitMad(ref, "v")
    val batch = graft.operators.Stats.madGate(ref, "v", med, scaled)
      .collect().map(r => r.getDouble(0) -> r.getBoolean(2)).toMap
    val input = MemoryStream[Double]
    val out = StreamOps.madGateStream(input.toDS().toDF("v"), "v",
      med, scaled)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("mad_stream")
      .outputMode("append").start()
    input.addData(100.0, 12.0)
    q.processAllAvailable()
    input.addData(10.0, 13.0, 11.0)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from mad_stream").collect()
      .map(r => r.getDouble(0) -> r.getBoolean(2)).toMap
    assert(streamed == batch)
    assert(streamed(100.0) == false && streamed(12.0) == true)
  }

  test("heavyHitterTokensStream matches batch heavyHitterTokens in complete mode") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // real corpus text streamed in two chunks; exact regime (capacity
    // >= vocabulary) so the running totals must equal a batch pass over
    // everything seen so far, independent of chunking
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80).select("doc_id", "lang", "text")
    val docs = docsDf.collect()
      .map(r => LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val batch = graft.operators.TextAnalysis
      .heavyHitterTokens(docsDf, "text", Seq("lang"), capacity = 256, topN = 5)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    val input = MemoryStream[LangDoc]
    val out = StreamOps.heavyHitterTokensStream(input.toDF(), "text",
      Seq("lang"), capacity = 256, topN = 5)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from hh_stream").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("quantileStatsStream matches batch GK quantiles in complete mode") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80).select("doc_id", "lang", "n_chars")
    val docs = docsDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val qs = Seq(0.0, 0.5, 1.0)
    val batch = graft.operators.Stats.quantileStats(
        docsDf, "n_chars", qs, groupCols = Seq("lang"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val input = MemoryStream[(Long, String, Long)]
    val out = StreamOps.quantileStatsStream(
      input.toDF().toDF("doc_id", "lang", "n_chars"),
      "n_chars", qs, groupCols = Seq("lang"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("gk_stream")
      .outputMode("complete").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_._1 % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from gk_stream").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("windowedQuantilesStream: closed windows carry the exact batch quantiles") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ev = graft.sources.Sources.events(s, "/root/testdata/sf0.001")
      .limit(200).select("event_id", "event_type", "ts", "value")
    val rows = ev.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), r.getDouble(3)))
    val qs = Seq(0.5, 0.99)
    // batch reference: same GK-exact quantiles per (6h window, type)
    val batch = graft.operators.Stats.quantileStats(
        ev.withColumn("w", window(col("ts"), "6 hours"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("value")),
        "value", qs, groupCols = Seq("window_start", "event_type"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getDouble(2)) -> r.getDouble(3)).toMap
    val input = MemoryStream[(Long, String, Timestamp, Double)]
    val out = StreamOps.windowedQuantilesStream(
      input.toDF().toDF("event_id", "event_type", "ts", "value"),
      "value", qs, windowLength = "6 hours", watermark = "30 days",
      groupCols = Seq("event_type"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("wq_stream")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(rows.filter(_._1 % 2 == c.toLong).toSeq: _*)
      q.processAllAvailable()
    }
    // sentinels push the watermark past every window end
    val far = Timestamp.valueOf("2030-01-01 00:00:00")
    input.addData((900L, "zz", far, 0.0)); q.processAllAvailable()
    input.addData((901L, "zz",
      Timestamp.valueOf("2030-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
        "select * from wq_stream where event_type <> 'zz'").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("quantileBucketStream bands arrivals exactly like the batch gate") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(90).select("doc_id", "n_chars")
    // fit once on the reference frame via the BATCH operator's own
    // threshold discipline (round-6 terciles)
    val row = docsDf.agg(percentile(col("n_chars").cast("double"),
      array(lit(1.0 / 3.0), lit(2.0 / 3.0)))).head
    val thrs = row.getSeq[Double](0).map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val batch = graft.operators.Curation.bucketByQuantile(
        docsDf, col("n_chars").cast("double"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("bucket")).toMap
    val rows = docsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val input = MemoryStream[(Long, Long)]
    val out = StreamOps.quantileBucketStream(
      input.toDF().toDF("doc_id", "n_chars"), "n_chars", thrs)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("qb_stream")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(rows.filter(_._1 % 2 == c.toLong).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select doc_id, bucket from qb_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch && streamed.values.toSet.size == 3)
  }

  test("histogramStream matches the batch histogram after every prefix") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val valsDf = s.read.parquet("/root/testdata/sf0.001/events.parquet")
      .limit(100).select("event_id", "value")
    val rows = valsDf.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val input = MemoryStream[(Long, Double)]
    val out = StreamOps.histogramStream(
      input.toDF().toDF("event_id", "value"), "value", binWidth = 5.0)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    def histOf(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Stats.histogram(df, "value", 5.0).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toSet
    // running answer equals the batch answer on the fed prefix — checked
    // after EACH chunk, not just at the end (counts are prefix-decomposable)
    (0 until 2).foreach { c =>
      input.addData(rows.filter(_._1 % 2 == c.toLong).toSeq: _*)
      q.processAllAvailable()
      val fed = valsDf.filter(col("event_id") % 2 <= c)
      val streamed = s.sql("select * from hist_stream").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toSet
      assert(streamed == histOf(fed) && streamed.nonEmpty)
    }
    q.stop()
  }

  test("phraseSearchStream emits the batch phrase matches in append mode") {
    import StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    def tsOf(id: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (id * 17 % 89) * 60000L)
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => StreamDoc(r.getLong(0), r.getString(1), tsOf(r.getLong(0))))
    val phrases = Seq((0, "table hash"), (1, "slow hash batch"))
    val batch = graft.operators.TextSearch
      .phraseSearch(docsDf, phrases.toDF("query_id", "phrase"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.phraseSearchStream(input.toDF(), phrases)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("phrase_stream")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from phrase_stream").collect()
    // matches arrive with their event time; the match set equals batch
    assert(streamed.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getInt(3))).toSet == batch && batch.nonEmpty)
    val tsRows = streamed.map(r => r.getLong(1) -> r.getTimestamp(4)).toMap
    assert(tsRows.forall { case (id, ts) => ts == tsOf(id) })
  }

  test("approxDistinctTokensStream matches batch KMV in complete mode") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // SKETCH regime (k = 16 < per-lang vocabulary): the running
    // estimate still equals a batch pass over everything seen, because
    // KMV is a pure function of the hashed-token set — chunking-proof
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80).select("doc_id", "lang", "text")
    val docs = docsDf.collect()
      .map(r => LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val batch = graft.operators.TextAnalysis
      .approxDistinctTokens(docsDf, "text", Seq("lang"), k = 16)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getBoolean(3))).toSet
    val input = MemoryStream[LangDoc]
    val out = StreamOps.approxDistinctTokensStream(input.toDF(), "text",
      Seq("lang"), k = 16)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from kmv_stream").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getBoolean(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("windowedStats aggregates a watermarked stream") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamOps.windowedStats(input.toDF(), windowLength = "1 hour",
      watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete").start()
    input.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 00:05:00"), 7, "click", 1.5),
      Ev(2, Timestamp.valueOf("2024-01-01 00:55:00"), 7, "click", 2.0),
      Ev(3, Timestamp.valueOf("2024-01-01 01:05:00"), 8, "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql(
      "select window_start, event_type, n_events, sum_value " +
        "from win_stream order by window_start, event_type").collect()
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1),
      r.getLong(2), r.getDouble(3))).toSeq == Seq(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.5),
      ("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
  }

  test("sessionizeStream closes sessions on gap and on watermark timeout") {
    import graft.streaming.StreamOps.{SessionEvent, SessionOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val events = input.toDF()
      .withWatermark("ts", "0 seconds").as[SessionEvent]
    val out = StreamOps.sessionizeStream(events, gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    // user 7: two events in one session, then a later event past the gap
    input.addData(
      SessionEvent(7, 1, Timestamp.valueOf("2024-01-01 00:00:00")),
      SessionEvent(7, 2, Timestamp.valueOf("2024-01-01 00:10:00")))
    q.processAllAvailable()
    input.addData(
      SessionEvent(7, 3, Timestamp.valueOf("2024-01-01 02:00:00")))
    q.processAllAvailable()
    // first session must now be emitted (gap exceeded)
    val afterGap = s.sql("select * from sess_stream").as[SessionOut].collect()
    assert(afterGap.toSeq == Seq(SessionOut(7, 1, 2, 1, 2)))
    // push the watermark far past the open session -> timeout fires
    input.addData(
      SessionEvent(8, 9, Timestamp.valueOf("2024-01-01 10:00:00")))
    q.processAllAvailable()
    input.addData(
      SessionEvent(8, 10, Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    q.stop()
    val all = s.sql("select * from sess_stream order by user_id, session_index")
      .as[SessionOut].collect().toSeq
    assert(all.contains(SessionOut(7, 2, 1, 3, 3))) // closed by timeout
    assert(all.head == SessionOut(7, 1, 2, 1, 2))
  }

  test("file-source stream over the real events table: read→transform→write") {
    val s = spark
    // stage the ns-normalized events as a streamable parquet dir
    val stageDir = java.nio.file.Files.createTempDirectory("events-stream").toString
    graft.sources.Sources.events(s, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(stageDir)
    val schema = s.read.parquet(stageDir).schema
    val stream = s.readStream.schema(schema).parquet(stageDir)
    val out = StreamOps.windowedStats(stream, windowLength = "1 hour",
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("file_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits watermark-closed windows; compare against the
    // batch result restricted to those windows
    val batch = graft.operators.Events.windowedStats(
      s.read.parquet(stageDir))
    val emitted = s.sql("select * from file_stream")
    val emittedCount = emitted.count()
    assert(emittedCount > 0)
    val joined = emitted.as("e").join(batch.as("b"),
      Seq("window_start", "event_type"))
    assert(joined.count() == emittedCount) // every emitted row matches batch
    assert(joined.filter(
      org.apache.spark.sql.functions.col("e.n_events") =!=
        org.apache.spark.sql.functions.col("b.n_events")).isEmpty)
  }

  test("sessionizeStream: a straggler session is numbered chronologically, not by arrival") {
    import graft.streaming.StreamOps.{SessionEvent, SessionOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val events = input.toDF()
      .withWatermark("ts", "24 hours").as[SessionEvent]
    val out = StreamOps.sessionizeStream(events, gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("sess_straggler")
      .outputMode("append").start()
    input.addData(SessionEvent(7, 5, Timestamp.valueOf("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // 3 hours older than the buffered session and past the gap: its own
    // session, which must come FIRST in chronological numbering
    input.addData(SessionEvent(7, 9, Timestamp.valueOf("2024-01-01 07:00:00")))
    q.processAllAvailable()
    // push the watermark (24h delay) past both sessions' close points
    input.addData(SessionEvent(8, 100, Timestamp.valueOf("2024-01-03 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val emitted = s.sql(
        "select * from sess_straggler where user_id = 7 order by session_index")
      .as[SessionOut].collect().toSeq
    assert(emitted == Seq(
      SessionOut(7, 1, 1, 9, 9),   // 07:00 straggler = chronological first
      SessionOut(7, 2, 1, 5, 5)))  // 10:00 arrival = chronological second
  }

  test("sessionizeStream equals batch sessionize on out-of-order input with stragglers") {
    import graft.streaming.StreamOps.{SessionEvent, SessionOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, id: Long, ts: String) =
      SessionEvent(u, id, Timestamp.valueOf(ts))
    // users 1 and 2, fed OUT of chronological order across batches (every
    // event is within the 24h watermark horizon when it arrives)
    val batches = Seq(
      Seq(ev(1, 12, "2024-01-01 02:00:00"), ev(2, 20, "2024-01-01 01:00:00")),
      Seq(ev(1, 10, "2024-01-01 00:00:00"), // straggler: 2h late, own session
        ev(1, 13, "2024-01-01 02:10:00"), ev(2, 22, "2024-01-01 03:00:00")),
      Seq(ev(1, 11, "2024-01-01 00:20:00"), // joins the straggler's session
        ev(2, 21, "2024-01-01 01:29:00"), ev(1, 14, "2024-01-01 05:00:00")))
    val input = MemoryStream[SessionEvent]
    val events = input.toDF()
      .withWatermark("ts", "24 hours").as[SessionEvent]
    val out = StreamOps.sessionizeStream(events, gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    // sentinel user pushes the watermark past every close point
    input.addData(ev(99, 999, "2024-01-03 12:00:00"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from sess_parity where user_id < 99")
      .as[SessionOut].collect().toSet
    val batch = graft.operators.Events.sessionize(
        batches.flatten.toDS().toDF(), gapSeconds = 1800)
      .as[SessionOut].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == 5) // u1: 3 sessions, u2: 2 sessions
  }

  test("trendingTokensStream: closed windows emit the batch top-k, once") {
    import graft.streaming.StreamOps.{StreamDoc, TrendOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def d(id: Long, ts: String, text: String) =
      StreamDoc(id, text, Timestamp.valueOf(ts))
    // window 0 trends 'alpha'; window 1 trends 'burst' (absent before)
    val w0 = Seq(d(1, "2024-01-01 00:05:00", "alpha alpha beta"),
      d(2, "2024-01-01 00:40:00", "alpha gamma beta"))
    val w1 = Seq(d(3, "2024-01-01 01:10:00", "burst burst burst alpha"),
      d(4, "2024-01-01 01:50:00", "burst delta"))
    val input = MemoryStream[StreamDoc]
    val events = input.toDF()
      .withWatermark("ts", "30 minutes").as[StreamDoc]
    val q = StreamOps.trendingTokensStream(events,
        windowSeconds = 3600L, capacity = 4096, topK = 3)
      .writeStream.format("memory").queryName("trend_stream")
      .outputMode("append").start()
    input.addData(w0(0), w0(1)); q.processAllAvailable()
    input.addData(w1: _*); q.processAllAvailable()
    input.addData(d(9, "2024-01-01 12:00:00", "x")); q.processAllAvailable()
    input.addData(d(9, "2024-01-01 13:00:00", "x")); q.processAllAvailable()
    q.stop()
    val got = s.sql(
        "select * from trend_stream where window_start < timestamp '2024-01-01 02:00:00'")
      .as[TrendOut].collect()
      .groupBy(_.window_start.toString)
      .map { case (k, v) => k -> v.sortBy(_.rank)
        .map(o => (o.rank, o.token, o.cnt)).toSeq }
    // exact regime (capacity >> distinct): ranking == batch counts,
    // (count desc, token asc) ties — w0: alpha 3, beta 2, gamma 1
    assert(got("2024-01-01 00:00:00.0") ==
      Seq((1, "alpha", 3L), (2, "beta", 2L), (3, "gamma", 1L)))
    assert(got("2024-01-01 01:00:00.0") ==
      Seq((1, "burst", 4L), (2, "alpha", 1L), (3, "delta", 1L)))
    assert(got.size == 2)
  }

  test("klDriftStream: each closed window scores the batch KL exactly, once") {
    import graft.streaming.StreamOps.{DriftEvent, DriftOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val reference = s.sql(
      """select * from values ('en'), ('en'), ('en'), ('de'), ('fr')
        |  as t(category)""".stripMargin)
    def ev(ts: String, c: String) = DriftEvent(Timestamp.valueOf(ts), c)
    // two 1-hour windows, fed out of order; window 1 skews hard to 'de'
    // and introduces 'zz' (a category the reference never saw — the
    // smoothed-KL raison d'etre)
    val w0 = Seq(ev("2024-01-01 00:05:00", "en"), ev("2024-01-01 00:20:00", "de"),
      ev("2024-01-01 00:50:00", "en"), ev("2024-01-01 00:10:00", "fr"))
    val w1 = Seq(ev("2024-01-01 01:30:00", "de"), ev("2024-01-01 01:05:00", "de"),
      ev("2024-01-01 01:55:00", "zz"))
    val input = MemoryStream[DriftEvent]
    val events = input.toDF()
      .withWatermark("ts", "30 minutes").as[DriftEvent]
    val q = StreamOps.klDriftStream(events, reference,
        windowSeconds = 3600L)
      .writeStream.format("memory").queryName("kl_stream")
      .outputMode("append").start()
    // out-of-order arrival WITHIN the 30-minute horizon (the engine
    // drops sub-watermark rows upstream of stateful operators, so
    // parity is over the watermark-respecting stream)
    input.addData(w0(1), w0(0)); q.processAllAvailable()
    input.addData(w0(2), w0(3), w1(0)); q.processAllAvailable()
    input.addData(w1(1), w1(2)); q.processAllAvailable()
    // sentinels far ahead close both windows (two: the watermark
    // advances after the first's batch, the timeout fires on the next)
    input.addData(ev("2024-01-01 12:00:00", "en")); q.processAllAvailable()
    input.addData(ev("2024-01-01 13:00:00", "en")); q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
        "select * from kl_stream where window_start < timestamp '2024-01-01 02:00:00'")
      .as[DriftOut].collect()
      .map(o => o.window_start.toString -> o).toMap
    assert(streamed.size == 2)
    def batchKl(evs: Seq[DriftEvent]) =
      graft.operators.Stats.klDivergence(
        evs.toDF().select(col("category")), reference, "category").head
    for ((ws, evs) <- Seq("2024-01-01 00:00:00.0" -> w0,
        "2024-01-01 01:00:00.0" -> w1)) {
      val b = batchKl(evs)
      val o = streamed(ws)
      assert(o.n_events == b.getAs[Long]("n_a"), ws)
      assert(o.n_categories == b.getAs[Long]("n_categories"), ws)
      assert(o.kl_div == b.getAs[Double]("kl_div"), ws)
    }
    assert(streamed("2024-01-01 01:00:00.0").kl_div >
      streamed("2024-01-01 00:00:00.0").kl_div) // the skewed window alarms
  }

  test("scd2Stream equals batch scd2 closed intervals on out-of-order input") {
    import graft.streaming.StreamOps.{Scd2Event, Scd2Out}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, id: Long, ts: String, v: String) =
      Scd2Event(u, id, Timestamp.valueOf(ts), v)
    // out-of-chronological-order chunks, with repeats and an A→B→A flap
    val batches = Seq(
      Seq(ev(1, 3, "2024-01-01 02:00:00", "b"),
        ev(2, 20, "2024-01-01 01:00:00", "x")),
      Seq(ev(1, 1, "2024-01-01 00:00:00", "a"), // straggler opens history
        ev(1, 4, "2024-01-01 03:00:00", "b"),   // repeat inside run b
        ev(2, 21, "2024-01-01 02:30:00", "x")), // repeat inside run x
      Seq(ev(1, 2, "2024-01-01 01:00:00", "a"), // straggler repeat in run a
        ev(1, 5, "2024-01-01 04:00:00", "a"),   // flap back to a
        ev(2, 22, "2024-01-01 05:00:00", "y")))
    val input = MemoryStream[Scd2Event]
    val events = input.toDF()
      .withWatermark("ts", "24 hours").as[Scd2Event]
    val out = StreamOps.scd2Stream(events)
    val q = out.writeStream.format("memory").queryName("scd2_parity")
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    // sentinel pushes the watermark past every boundary
    input.addData(ev(99, 999, "2024-01-05 00:00:00", "z"))
    q.processAllAvailable()
    input.addData(ev(99, 998, "2024-01-06 00:00:00", "z"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from scd2_parity where user_id < 99")
      .as[Scd2Out].collect().toSet
    val batch = graft.operators.Events.scd2(
        batches.flatten.toDS().toDF(), "user_id", "value")
      .filter(col("valid_to").isNotNull)
      .select(col("key").as("user_id"), col("value"),
        col("valid_from"), col("valid_to"))
      .as[Scd2Out].collect().toSet
    assert(streamed == batch)
    // u1: a|b|a -> two closed; u2: x|y -> one closed
    assert(streamed.size == 3)
  }

  test("scd2Stream holds a boundary until the watermark passes it") {
    import graft.streaming.StreamOps.{Scd2Event, Scd2Out}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, id: Long, ts: String, v: String) =
      Scd2Event(u, id, Timestamp.valueOf(ts), v)
    val input = MemoryStream[Scd2Event]
    val events = input.toDF()
      .withWatermark("ts", "0 seconds").as[Scd2Event]
    val q = StreamOps.scd2Stream(events).writeStream.format("memory")
      .queryName("scd2_final").outputMode("append").start()
    input.addData(ev(7, 1, "2024-01-01 00:00:00", "a"))
    q.processAllAvailable()
    input.addData(ev(7, 2, "2024-01-01 01:00:00", "b"))
    q.processAllAvailable()
    // the a->b boundary exists but is not yet below the watermark
    assert(s.sql("select * from scd2_final").count() == 0)
    input.addData(ev(8, 9, "2024-01-01 05:00:00", "z"))
    q.processAllAvailable()
    input.addData(ev(8, 10, "2024-01-01 06:00:00", "z"))
    q.processAllAvailable()
    q.stop()
    // watermark passed 01:00 -> exactly the closed interval emits; the
    // open run b (and user 8's open z) stay in state, not in the sink
    val rows = s.sql("select * from scd2_final").as[Scd2Out].collect()
    assert(rows.toSeq == Seq(Scd2Out(7, "a",
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-01 01:00:00"))))
  }

  test("sessionizeStream idle retention evicts the counter; numbering restarts") {
    import graft.streaming.StreamOps.{SessionEvent, SessionOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val events = input.toDF()
      .withWatermark("ts", "0 seconds").as[SessionEvent]
    val out = StreamOps.sessionizeStream(events, gapSeconds = 1800,
      idleRetentionSeconds = Some(3600))
    val q = out.writeStream.format("memory").queryName("sess_ttl")
      .outputMode("append").start()
    input.addData(SessionEvent(7, 1, Timestamp.valueOf("2024-01-01 00:00:00")))
    q.processAllAvailable()
    // advance the watermark far past close + retention via another user
    input.addData(SessionEvent(8, 2, Timestamp.valueOf("2024-01-02 00:00:00")))
    q.processAllAvailable()
    input.addData(SessionEvent(8, 3, Timestamp.valueOf("2024-01-03 00:00:00")))
    q.processAllAvailable()
    // user 7 returns long after the retention horizon
    input.addData(SessionEvent(7, 4, Timestamp.valueOf("2024-01-03 06:00:00")))
    q.processAllAvailable()
    input.addData(SessionEvent(8, 5, Timestamp.valueOf("2024-01-05 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val sess7 = s.sql("select * from sess_ttl where user_id = 7 order by first_event_id")
      .as[SessionOut].collect().toSeq
    // counter was evicted between the two visits: both sessions number 1
    assert(sess7 == Seq(SessionOut(7, 1, 1, 1, 1), SessionOut(7, 1, 1, 4, 4)))
  }

  test("asOfJoinStream equals the batch as-of join on out-of-order input with late rights") {
    import graft.streaming.StreamOps.{AsOfOut, LeftEvent, RightEvent}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def L(u: Long, id: Long, ts: String) = LeftEvent(u, id, Timestamp.valueOf(ts))
    def R(u: Long, id: Long, ts: String) = RightEvent(u, id, Timestamp.valueOf(ts))
    val lefts = Seq(
      L(1, 10, "2024-01-01 01:00:00"), L(1, 11, "2024-01-01 03:00:00"),
      L(1, 12, "2024-01-01 00:10:00"), // before any right → None
      L(2, 20, "2024-01-01 02:00:00"))
    val rights = Seq(
      R(1, 100, "2024-01-01 00:30:00"), R(1, 101, "2024-01-01 02:30:00"),
      R(2, 200, "2024-01-01 05:00:00")) // after the only left-2 → unused
    val lin = MemoryStream[LeftEvent]
    val rin = MemoryStream[RightEvent]
    val out = graft.streaming.StreamOps.asOfJoinStream(
      lin.toDS(), rin.toDS(), watermark = "24 hours")
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    // out-of-order delivery: a left arrives BEFORE the right that should
    // match it, and a late right (00:30) lands after later events
    lin.addData(lefts(0), lefts(1)); q.processAllAvailable()
    rin.addData(rights(1)); q.processAllAvailable()
    lin.addData(lefts(2), lefts(3)); q.processAllAvailable()
    rin.addData(rights(0), rights(2)); q.processAllAvailable()
    // sentinel on both inputs: union watermark is the MIN of the two
    lin.addData(L(99, 999, "2024-01-05 00:00:00"))
    rin.addData(R(99, 998, "2024-01-05 00:00:00"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from asof_stream where user_id < 99")
      .as[AsOfOut].collect()
      .map(o => (o.user_id, o.event_id, o.right_id)).toSet
    val batch = graft.operators.AsOfJoin.asOfJoin(
        lefts.toDS().toDF(), rights.toDS().toDF()
          .withColumnRenamed("right_id", "rid"),
        "user_id", "ts", Seq("event_id"), Seq("rid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(streamed == batch)
    assert(streamed == Set(
      (1L, 10L, Some(100L)), (1L, 11L, Some(101L)),
      (1L, 12L, None), (2L, 20L, None)))
  }

  test("asOfJoinStream breaks right-timestamp ties exactly like the batch operator") {
    import graft.streaming.StreamOps.{AsOfOut, LeftEvent, RightEvent}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // two rights at the IDENTICAL timestamp: the winner must be the
    // batch operator's content-hash pick, not id order
    val lefts = Seq(LeftEvent(1, 10, Timestamp.valueOf("2024-01-01 02:00:00")))
    val rights = Seq(
      RightEvent(1, 5, Timestamp.valueOf("2024-01-01 01:00:00")),
      RightEvent(1, 9, Timestamp.valueOf("2024-01-01 01:00:00")))
    val lin = MemoryStream[LeftEvent]
    val rin = MemoryStream[RightEvent]
    val q = graft.streaming.StreamOps.asOfJoinStream(
        lin.toDS(), rin.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("asof_ties")
      .outputMode("append").start()
    rin.addData(rights: _*); lin.addData(lefts: _*)
    q.processAllAvailable()
    lin.addData(LeftEvent(99, 999, Timestamp.valueOf("2024-01-02 00:00:00")))
    rin.addData(RightEvent(99, 998, Timestamp.valueOf("2024-01-02 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from asof_ties where user_id = 1")
      .as[AsOfOut].collect().map(o => (o.event_id, o.right_id)).toSet
    val batch = graft.operators.AsOfJoin.asOfJoin(
        lefts.toDS().toDF(), rights.toDS().toDF()
          .withColumnRenamed("right_id", "rid"),
        "user_id", "ts", Seq("event_id"), Seq("rid"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(streamed == batch)
    assert(streamed.head._2.nonEmpty) // some right matched
  }

  test("minHashDupPairsStream emits the batch banding+estimate pairs on out-of-order input") {
    import graft.streaming.StreamOps.{DupCandidate, StreamDoc}
    import graft.operators.{Dedup, TextAnalysis}
    import org.apache.spark.sql.graftext.MinHashSignature
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // deterministic scattered event times, unrelated to doc_id order
    def tsOf(id: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (id * 13 % 97) * 60000L)
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => StreamDoc(r.getLong(0), r.getString(1), tsOf(r.getLong(0))))
    // batch oracle: same signature, same banding, signature-agreement est
    val sh = docsDf.select(col("doc_id"),
        TextAnalysis.hashedShingles(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", MinHashSignature(col("shingles"), 64))
    val sigs = sh.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("sig"))).toMap
    val buckets = sh.select(col("doc_id"),
        explode(Dedup.bandBuckets(col("sig"), 32, 2)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket")).collect()
      .groupBy(r => (r.getInt(1), r.getLong(2))).values
    val expected = buckets.flatMap { rs =>
      val ids = rs.map(_.getLong(0)).sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        a = sigs(ids(i)); b = sigs(ids(j))
        est = a.zip(b).count { case (x, y) => x == y } / 64.0
        if est >= 0.5
      } yield (ids(i), ids(j), est)
    }.toSet
    assert(expected.nonEmpty)
    // stream the same corpus in three arbitrary out-of-order chunks
    val input = MemoryStream[StreamDoc]
    val out = graft.streaming.StreamOps.minHashDupPairsStream(
      input.toDS(), watermark = "24 hours")
    val q = out.writeStream.format("memory").queryName("dedup_minhash_stream")
      .outputMode("append").start()
    (0 until 3).foreach { c =>
      input.addData(docs.filter(_.doc_id % 3 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from dedup_minhash_stream")
      .as[DupCandidate].collect()
      .map(d => (d.id_a, d.id_b, d.est_jaccard)).toSet // at-least-once → set
    assert(streamed == expected)
  }

  test("dedupByKey drops replayed keys even with a different timestamp") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamOps.dedupByKey(input.toDF(), Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    val e = Ev(1, Timestamp.valueOf("2024-01-01 00:05:00"), 7, "click", 1.0)
    input.addData(e, e.copy(value = 1.0),
      // replay of key 1 five seconds later must still dedup
      e.copy(ts = Timestamp.valueOf("2024-01-01 00:05:05")),
      Ev(2, Timestamp.valueOf("2024-01-01 00:06:00"), 7, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(s.sql("select count(*) from dedup_stream").first().getLong(0) == 2L)
  }

  test("sessionizeStream: a late within-gap event cannot move the session end backwards") {
    import graft.streaming.StreamOps.{SessionEvent, SessionOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val events = input.toDF()
      .withWatermark("ts", "2 hours").as[SessionEvent]
    val out = StreamOps.sessionizeStream(events, gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    input.addData(SessionEvent(7, 5, Timestamp.valueOf("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // late event (within watermark, earlier than lastTs, within gap)
    input.addData(SessionEvent(7, 6, Timestamp.valueOf("2024-01-01 09:50:00")))
    q.processAllAvailable()
    // close the session via a far-future event for another user
    input.addData(SessionEvent(8, 9, Timestamp.valueOf("2024-01-01 23:00:00")))
    q.processAllAvailable()
    input.addData(SessionEvent(8, 10, Timestamp.valueOf("2024-01-02 23:00:00")))
    q.processAllAvailable()
    q.stop()
    val sess7 = s.sql("select * from sess_late where user_id = 7")
      .as[SessionOut].collect().toSeq
    // one session of both events with batch-consistent min/max ids; the
    // session window itself must not have moved backwards
    assert(sess7 == Seq(SessionOut(7, 1, 2, 5, 6)))
  }

  test("rangeJoinStream equals batch rangeJoin on out-of-order input") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def t(ts: String) = Timestamp.valueOf(ts)
    // (user, id, ts) — lefts are purchases, rights are clicks; window is
    // [lts − 1h, lts]: same shape as the batch harness entry
    val lefts = Seq(
      (7L, 100L, t("2024-01-01 10:00:00")),
      (7L, 101L, t("2024-01-01 12:00:00")),
      (8L, 102L, t("2024-01-01 10:30:00")))
    val rights = Seq(
      (7L, 200L, t("2024-01-01 09:30:00")), // in 100's window
      (7L, 201L, t("2024-01-01 10:00:00")), // boundary: == lts, in
      (7L, 202L, t("2024-01-01 11:30:00")), // in 101's window
      (7L, 203L, t("2024-01-01 08:30:00")), // outside every window
      (8L, 204L, t("2024-01-01 10:29:00")), // in 102's window
      (9L, 205L, t("2024-01-01 10:00:00"))) // key with no lefts
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamOps.rangeJoinStream(
      lIn.toDF().toDF("user_id", "event_id", "ts"),
      rIn.toDF().toDF("user_id", "click_id", "ts"),
      keyCol = "user_id", tsCol = "ts",
      lowerSeconds = 3600, upperSeconds = 0,
      leftCols = Seq("event_id"), rightCols = Seq("click_id"),
      watermark = "24 hours")
    val q = out.writeStream.format("memory").queryName("range_parity")
      .outputMode("append").start()
    // out-of-order interleave: some rights before their lefts, some after
    rIn.addData(rights(2), rights(3)); q.processAllAvailable()
    lIn.addData(lefts(0), lefts(2)); q.processAllAvailable()
    rIn.addData(rights(0), rights(4), rights(5)); q.processAllAvailable()
    lIn.addData(lefts(1)); q.processAllAvailable()
    rIn.addData(rights(1)); q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from range_parity")
      .as[(Long, Timestamp, Long, Long)].collect().toSet
    val batch = graft.operators.RangeJoin.rangeJoin(
        lefts.toDF("user_id", "event_id", "ts"),
        rights.toDF("user_id", "click_id", "ts"),
        keyCol = "user_id", tsCol = "ts",
        lowerSeconds = 3600, upperSeconds = 0,
        leftCols = Seq("event_id"), rightCols = Seq("click_id"))
      .as[(Long, Timestamp, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(r => (r._3, r._4)) ==
      Set((100L, 200L), (100L, 201L), (101L, 202L), (102L, 204L)))
  }

  test("funnelStream equals batch funnel on out-of-order input with stragglers") {
    import graft.streaming.StreamOps.{FunnelEvent, FunnelOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, tpe: String, ts: String) =
      FunnelEvent(u, tpe, Timestamp.valueOf(ts))
    // u1 completes out of order; u2 misses the middle step; u3's FIRST
    // view arrives last (the anchor must move DOWN and re-admit the
    // earlier cart); u4's cart lands outside the 1h window; u5 has a
    // non-step event type (must be ignored, not buffered)
    val batches = Seq(
      Seq(ev(1, "view", "2024-01-01 00:00:00"),
        ev(1, "buy", "2024-01-01 00:30:00"),
        ev(3, "cart", "2024-01-01 02:05:00"),
        ev(5, "view", "2024-01-01 03:00:00")),
      Seq(ev(1, "cart", "2024-01-01 00:10:00"), // straggler completes u1
        ev(2, "view", "2024-01-01 01:00:00"),
        ev(2, "buy", "2024-01-01 01:20:00"),
        ev(3, "view", "2024-01-01 02:30:00"),
        ev(5, "scroll", "2024-01-01 03:10:00")),
      Seq(ev(3, "view", "2024-01-01 02:00:00"), // lowers u3's anchor
        ev(3, "buy", "2024-01-01 02:50:00"),
        ev(4, "view", "2024-01-01 04:00:00"),
        ev(4, "cart", "2024-01-01 05:30:00")))
    val input = MemoryStream[FunnelEvent]
    val events = input.toDF()
      .withWatermark("ts", "24 hours").as[FunnelEvent]
    val out = StreamOps.funnelStream(events,
      steps = Seq("view", "cart", "buy"), windowSeconds = 3600)
    val q = out.writeStream.format("memory").queryName("funnel_parity")
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    // sentinel pushes the watermark past every user's anchor + window
    input.addData(ev(99, "view", "2024-01-03 12:00:00"))
    q.processAllAvailable()
    // a straggler AFTER u1's row went out: the tombstone must swallow it
    input.addData(ev(1, "cart", "2024-01-03 11:00:00"))
    q.processAllAvailable()
    input.addData(ev(99, "view", "2024-01-05 12:00:00"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from funnel_parity where user_id < 99")
      .as[FunnelOut].collect().toSeq
    assert(streamed.size == streamed.map(_.user_id).distinct.size,
      "one row per user, even with post-emission stragglers")
    // batch replay of the SAME in-horizon input (the post-emission
    // straggler is outside u1's window, so it changes nothing there)
    val all = (batches.flatten :+ ev(1, "cart", "2024-01-03 11:00:00")).toDS()
      .select(col("user_id"), col("ts"), col("event_type"))
    val batch = graft.operators.Events.funnel(all,
        Seq("view", "cart", "buy"), windowSeconds = 3600)
      .select(col("user_id"), col("n_steps").cast("int").as("n_steps"),
        col("completed"))
      .as[FunnelOut].collect().toSeq
    assert(streamed.toSet == batch.toSet)
    assert(streamed.toSet == Set(
      FunnelOut(1, 3, true),  // straggler cart completed the chain
      FunnelOut(2, 1, false), // no cart: chain dead at step 2
      FunnelOut(3, 3, true),  // late-arriving earlier view re-anchored
      FunnelOut(4, 1, false), // cart outside the window
      FunnelOut(5, 1, false))) // non-step event ignored
  }

  test("funnelStream without TTL: a stale provisional timer must not evict the tombstone") {
    import graft.streaming.StreamOps.{FunnelEvent, FunnelOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, tpe: String, ts: String) =
      FunnelEvent(u, tpe, Timestamp.valueOf(ts))
    val input = MemoryStream[FunnelEvent]
    val events = input.toDF()
      .withWatermark("ts", "0 seconds").as[FunnelEvent]
    val out = StreamOps.funnelStream(events, Seq("view", "buy"),
      windowSeconds = 3600,
      emittedRetentionSeconds = None) // immortal-tombstone opt-in
    val q = out.writeStream.format("memory").queryName("funnel_stale")
      .outputMode("append").start()
    // b1: provisional anchor for u7, timer set at anchor+window
    input.addData(ev(7, "view", "2024-01-01 00:00:00"))
    q.processAllAvailable()
    // b2: sentinel raises the post-batch watermark past the window close
    input.addData(ev(8, "view", "2024-01-01 02:00:00"))
    q.processAllAvailable()
    // b3: u7 gets DATA in the same batch the watermark is already past —
    // emission rides the data path and the provisional timer goes stale
    input.addData(ev(7, "view", "2024-01-01 02:30:00"))
    q.processAllAvailable()
    // b4: unrelated data lets the stale timer fire on u7's tombstone
    input.addData(ev(8, "view", "2024-01-01 03:00:00"))
    q.processAllAvailable()
    // b5+b6: if the tombstone died, this in-horizon chain would emit a
    // SECOND row for u7
    input.addData(ev(7, "view", "2024-01-01 03:30:00"),
      ev(7, "buy", "2024-01-01 03:40:00"))
    q.processAllAvailable()
    // two more watermark advances: one to pass the would-be second
    // window's close, one more so its timeout can actually fire
    input.addData(ev(8, "view", "2024-01-01 06:00:00"))
    q.processAllAvailable()
    input.addData(ev(8, "view", "2024-01-01 07:00:00"))
    q.processAllAvailable()
    q.stop()
    val u7 = s.sql("select * from funnel_stale where user_id = 7")
      .as[FunnelOut].collect().toSeq
    assert(u7 == Seq(FunnelOut(7, 1, false)),
      s"exactly one row per user ever; got $u7")
  }

  test("funnelStream tombstone TTL: a returning user starts a fresh funnel") {
    import graft.streaming.StreamOps.{FunnelEvent, FunnelOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, tpe: String, ts: String) =
      FunnelEvent(u, tpe, Timestamp.valueOf(ts))
    val input = MemoryStream[FunnelEvent]
    val events = input.toDF()
      .withWatermark("ts", "0 seconds").as[FunnelEvent]
    val out = StreamOps.funnelStream(events, Seq("view", "buy"),
      windowSeconds = 3600, emittedRetentionSeconds = Some(3600))
    val q = out.writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()
    input.addData(ev(7, "view", "2024-01-01 00:00:00"))
    q.processAllAvailable()
    // close the window, then age past the retention horizon
    input.addData(ev(8, "view", "2024-01-01 02:00:00"))
    q.processAllAvailable()
    input.addData(ev(8, "view", "2024-01-02 00:00:00"))
    q.processAllAvailable()
    // user 7 returns after the TTL: new funnel, completed this time
    input.addData(ev(7, "view", "2024-01-02 06:00:00"),
      ev(7, "buy", "2024-01-02 06:10:00"))
    q.processAllAvailable()
    input.addData(ev(8, "view", "2024-01-04 00:00:00"))
    q.processAllAvailable()
    q.stop()
    val u7 = s.sql("select * from funnel_ttl where user_id = 7 order by n_steps")
      .as[FunnelOut].collect().toSeq
    assert(u7 == Seq(FunnelOut(7, 1, false), FunnelOut(7, 2, true)))
  }

  test("dedupPassagesStream equals batch dedupPassages under id-order arrival") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def doc(id: Long, text: String, sec: Int) =
      StreamDoc(id, text, Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"))
    // mirrors the batch spec's fixture: repeated span, full duplicate,
    // short tail, null text
    val ds = Seq(
      doc(1, "a b c d", 1),
      doc(2, "x y c d z w", 2),
      doc(3, "c d a b", 3),
      doc(4, "p q r", 4),
      doc(5, null, 5))
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.dedupPassagesStream(input.toDS(), windowWords = 2,
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("passages_stream")
      .outputMode("append").start()
    // one doc per micro-batch, in id order: streaming first-ARRIVAL
    // equals batch first-(doc_id, position)
    ds.foreach { d => input.addData(d); q.processAllAvailable() }
    // sentinel pushes the watermark past every document's window
    input.addData(StreamDoc(99, "zz", Timestamp.valueOf("2024-01-01 02:00:00")))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
        "select * from passages_stream where doc_id < 99")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val batch = graft.operators.Dedup.dedupPassages(
        ds.toDF().select(col("doc_id"), col("text")),
        "doc_id", "text", windowWords = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed == batch)
    // the fully-duplicated doc 3 must still be present, empty
    assert(streamed(3L) == (("", 0L, 2L)))
  }

  test("decontaminateStream equals batch contaminationFlags on out-of-order input") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val bench = Seq((100L, "a b c d e f g"), (101L, "m n o p q"))
      .toDF("doc_id", "text")
    def doc(id: Long, text: String, ts: String) =
      StreamDoc(id, text, Timestamp.valueOf(ts))
    // doc 1 quotes a 7-word benchmark span (5 shared 3-gram shingles);
    // doc 2 is clean; doc 3 shares only 2 shingles (below minShared);
    // doc 4 quotes the second benchmark doc
    val d1 = doc(1, "x a b c d e f g y", "2024-01-01 00:00:05")
    val d2 = doc(2, "p q r s t u v w z", "2024-01-01 00:00:02")
    val d3 = doc(3, "a b c d h i j", "2024-01-01 00:00:08")
    val d4 = doc(4, "k m n o p q k", "2024-01-01 00:00:01")
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.decontaminateStream(input.toDS(), bench,
      n = 3, minShared = 3, watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    // out-of-order arrival within the horizon
    input.addData(d1); q.processAllAvailable()
    input.addData(d3, d2); q.processAllAvailable()
    input.addData(d4); q.processAllAvailable()
    // sentinel (clean text) pushes the watermark past every window
    input.addData(doc(99, "z z", "2024-01-01 01:00:00"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from decontam")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Curation.contaminationFlags(
        Seq(d1, d2, d3, d4).toDF(), bench, "doc_id", "text",
        n = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(1L, 4L))
  }

  test("streaming decontamination cold-starts on empty corpus and store") {
    import graft.streaming.StreamOps.{StreamDoc, StreamEmb}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // empty embedding corpus: dim probes to 0 — the query must run and
    // emit nothing, not crash the first micro-batch on dim-0 planes
    val emptyCorpus = Seq.empty[(Long, Seq[Double])]
      .toDF("vec_id", "embedding")
    val in1 = MemoryStream[StreamEmb]
    val out1 = StreamOps.embeddingDecontaminateStream(in1.toDS(),
      emptyCorpus, "vec_id", "embedding", threshold = 0.9,
      watermark = "10 seconds")
    val q1 = out1.writeStream.format("memory").queryName("cold_emb")
      .outputMode("append").start()
    in1.addData(StreamEmb(1L, Seq(1.0, 0.0),
      Timestamp.valueOf("2024-01-01 00:00:01")))
    q1.processAllAvailable()
    q1.stop()
    assert(s.sql("select * from cold_emb").count() == 0)
    // signature store written from an empty corpus (meta, no frames):
    // same contract as the batch probe — match nothing
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cold-store").toString
    graft.operators.Dedup.writeBandSignatures(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val in2 = MemoryStream[StreamDoc]
    val out2 = StreamOps.dedupAgainstStoreStream(in2.toDS(), dir,
      threshold = 0.5, watermark = "10 seconds")
    val q2 = out2.writeStream.format("memory").queryName("cold_store")
      .outputMode("append").start()
    in2.addData(StreamDoc(1L, "a b c d",
      Timestamp.valueOf("2024-01-01 00:00:01")))
    q2.processAllAvailable()
    q2.stop()
    assert(s.sql("select * from cold_store").count() == 0)
  }

  test("gopherQualityFlags runs on a stream unchanged (stateless gate)") {
    // the rule gate is a pure projection, so it needs no watermark, no
    // state, and no streaming-specific form — the parity-core property
    // extended to the curation surface
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val good = Seq.fill(60)("the word").mkString(" ")
    val input = MemoryStream[StreamDoc]
    val out = graft.operators.TextAnalysis.gopherQualityFlags(
      input.toDS().toDF(), idCol = "doc_id", minStopwords = 1)
    val q = out.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    input.addData(
      StreamDoc(1L, good, Timestamp.valueOf("2024-01-01 00:00:01")),
      StreamDoc(2L, "too short", Timestamp.valueOf("2024-01-01 00:00:02")))
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select doc_id, keep from gopher_stream")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  test("repetitionGateStream emits the batch gopherRepetitionFlags rows") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // real corpus text (heavy natural n-gram repetition from the small
    // vocabulary) streamed in two out-of-order chunks — stateless, so
    // arrival order must not matter
    val docsDf = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    def tsOf(id: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (id * 13 % 83) * 60000L)
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => StreamDoc(r.getLong(0), r.getString(1), tsOf(r.getLong(0))))
    def asKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), (1 to 13).map(r.getDouble).toList,
        r.getBoolean(14))
    val batch = graft.operators.TextAnalysis
      .gopherRepetitionFlags(docsDf).collect().map(asKey).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.repetitionGateStream(input.toDS())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("rep_stream")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(docs.filter(_.doc_id % 2 == c).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("select * from rep_stream").collect()
      .map(asKey).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // ts passes through for downstream windowing
    val tsRows = s.sql("select doc_id, ts from rep_stream").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(docs.forall(d => tsRows(d.doc_id) == d.ts))
  }

  test("c4CleanStream cleans pages on arrival like the batch operator") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // crafted multi-line pages (the corpus is single-line): one page
    // passing, one failing the sentence floor, one failing a page gate
    val pages = Seq(
      1L -> (1 to 6).map(i => s"Sentence number $i stays here.").mkString("\n"),
      2L -> "Only one good line stays.\nno punct",
      3L -> ("Lorem ipsum dolor sit amet.\n" +
        (1 to 5).map(i => s"Sentence number $i stays here.").mkString("\n")))
    val batchDf = s.createDataFrame(pages.map(p => (p._1, p._2)))
      .toDF("doc_id", "text")
    val batch = graft.operators.TextAnalysis.c4Clean(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.c4CleanStream(input.toDS())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    input.addData(pages.map { case (id, text) =>
      StreamDoc(id, text, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "select doc_id, text_clean, n_lines, n_lines_kept, n_sentences, keep " +
        "from c4_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(streamed == batch)
    assert(streamed.count(_._6) == 1) // only the clean page passes
  }

  test("robotsGateStream gates on arrival like the batch operator") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val robots = Seq(("h.com",
      "User-agent: *\nAllow: /a/b/\nDisallow: /a/\nDisallow: /t\n"))
      .toDF("host", "body")
    val rules = graft.operators.Robots.parseRobots(robots)
    val urls = Seq(
      1L -> "https://h.com/a/x", 2L -> "https://h.com/a/b/x",
      3L -> "https://h.com/ok", 4L -> "https://other.com/t",
      5L -> "junk")
    val batch = graft.operators.Robots.robotsGate(
        s.createDataFrame(urls).toDF("doc_id", "text"), rules, "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("allowed"),
        Option(r.getAs[String]("rule_prefix")))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.robotsGateStream(input.toDF(), rules, "text")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("robots_stream")
      .outputMode("append").start()
    input.addData(urls.map { case (id, u) =>
      StreamDoc(id, u, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "select doc_id, allowed, rule_prefix from robots_stream")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.getString(2)))).toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, false, Some("/a/"))))
    assert(streamed.contains((2L, true, Some("/a/b/"))))
    assert(streamed.contains((5L, true, None)))
  }

  test("canonicalizeUrlsStream canonicalizes on arrival like batch") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val urls = Seq(
      1L -> "HTTPS://WWW.Example.COM:443/a/?b=2&a=1&utm_x=1#f",
      2L -> "nope")
    val batch = graft.operators.UrlOps.canonicalizeUrls(
        s.createDataFrame(urls).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.canonicalizeUrlsStream(input.toDF(),
      urlCol = "text")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("url_stream")
      .outputMode("append").start()
    input.addData(urls.map { case (id, u) =>
      StreamDoc(id, u, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select doc_id, url_canon from url_stream")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(streamed == batch)
    assert(streamed.contains(
      1L -> Some("https://example.com/a?a=1&b=2")))
  }

  test("normalizeTextStream normalizes on arrival like batch") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val texts = Seq(
      1L -> "cafe\u0301 \u00E2\u20AC\u2122ok\u00E2\u20AC\u2122",
      2L -> "plain ascii")
    val batch = graft.operators.Normalize.normalizeText(
        s.createDataFrame(texts).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.normalizeTextStream(input.toDS())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("norm_stream")
      .outputMode("append").start()
    input.addData(texts.map { case (id, text) =>
      StreamDoc(id, text, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "select doc_id, text_norm, changed from norm_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(streamed == batch)
    assert(streamed.exists(t => t._1 == 1L &&
      t._2 == "caf\u00E9 \u2019ok\u2019" && t._3))
  }

  test("extractTextStream extracts main content like the batch operator") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val pages = Seq(
      1L -> ("<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About" +
        " this site</a></nav><p>This is the main paragraph of the page " +
        "and it is long enough to keep.</p></body></html>"),
      2L -> "<p>short</p>",
      3L -> "")
    val batchDf = s.createDataFrame(pages.map(p => (p._1, p._2)))
      .toDF("doc_id", "text")
    val batch = graft.operators.HtmlExtract.extractText(
        batchDf, "doc_id", "text", minStopFrac = 0.05).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.extractTextStream(input.toDS(), minStopFrac = 0.05)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("extract_stream")
      .outputMode("append").start()
    input.addData(pages.map { case (id, text) =>
      StreamDoc(id, text, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "select doc_id, text_main, n_lines, n_lines_kept " +
        "from extract_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
    // the nav died, the content line survived, page 2/3 kept nothing
    val byId = streamed.map(t => t._1 -> t._2).toMap
    assert(byId(1L).startsWith("This is the main paragraph"))
    assert(!byId(1L).contains("Home") && byId(2L) == "" && byId(3L) == "")
  }

  test("splitSentencesStream segments on arrival like batch") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val texts = Seq(
      1L -> "Dr. Smith paid 3.14 today. Was it e.g. fine? Yes!",
      2L -> "")
    val batch = graft.operators.Sentences.splitSentences(
        s.createDataFrame(texts).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.splitSentencesStream(input.toDS())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("sent_stream")
      .outputMode("append").start()
    input.addData(texts.map { case (id, text) =>
      StreamDoc(id, text, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "select doc_id, sent_id, sentence from sent_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, 0, "Dr. Smith paid 3.14 today.")))
    assert(streamed.size == 3) // empty doc fans out to nothing
  }

  test("readabilityScoresStream scores on arrival like batch") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val texts = Seq(1L -> "The cat sat. It purred loudly.", 2L -> "")
    val batch = graft.operators.Sentences.readabilityScores(
        s.createDataFrame(texts).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSet
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.readabilityScoresStream(input.toDS())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("read_stream")
      .outputMode("append").start()
    input.addData(texts.map { case (id, text) =>
      StreamDoc(id, text, Timestamp.valueOf("2024-01-01 00:00:01")) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "select doc_id, n_words, n_sentences, n_syllables, flesch, " +
        "fk_grade from read_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSet
    assert(streamed == batch)
    assert(streamed.exists(t => t._1 == 1L && t._2 == 6L && t._3 == 2L))
  }

  test("parseSitemapsStream and parseWarcStream parse on arrival like batch") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val sm = "<urlset><url><loc>https://h/a&amp;b</loc>" +
      "<priority>0.5</priority></url></urlset>"
    val warcBlob = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 5\r\n\r\nhello"
    val input = MemoryStream[StreamDoc]
    val smOut = StreamOps.parseSitemapsStream(
      input.toDF().select(col("doc_id").cast("string").as("host"),
        col("text").as("xml")))
    assert(smOut.isStreaming)
    val q1 = smOut.writeStream.format("memory").queryName("sm_stream")
      .outputMode("append").start()
    val input2 = MemoryStream[StreamDoc]
    val warcOut = StreamOps.parseWarcStream(
      input2.toDF().select(col("doc_id"), col("text").as("blob")))
    assert(warcOut.isStreaming)
    val q2 = warcOut.writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    input.addData(StreamDoc(7L, sm,
      Timestamp.valueOf("2024-01-01 00:00:01")))
    input2.addData(StreamDoc(8L, warcBlob,
      Timestamp.valueOf("2024-01-01 00:00:01")))
    q1.processAllAvailable(); q1.stop()
    q2.processAllAvailable(); q2.stop()
    val smRows = s.sql("select host, kind, loc, priority from sm_stream")
      .collect()
    assert(smRows.length == 1)
    assert(smRows(0).getString(0) == "7" &&
      smRows(0).getString(1) == "url" &&
      smRows(0).getString(2) == "https://h/a&b" &&
      smRows(0).getDouble(3) == 0.5)
    val wr = s.sql("select doc_id, warc_type, payload from warc_stream")
      .collect()
    assert(wr.length == 1)
    assert(wr(0).getLong(0) == 8L && wr(0).getString(1) == "response" &&
      wr(0).getString(2) == "hello")
  }

  test("parseWarcGzStream: gz members decode + HTTP split + charset " +
       "chain on arrival, matching the batch chain") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def gz(bytes: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(bytes); g.close()
      bos.toByteArray
    }
    val body = Array[Byte]('c', 'a', 'f', 0xE9.toByte) // cp1252 café
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("US-ASCII") ++ body
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(
      "US-ASCII") ++ payload
    val blob = gz(rec) ++ gz(rec)
    val batchRows = graft.sources.Warc.httpResponses(
        graft.sources.Warc.parseWarcGz(
          Seq((9L, blob)).toDF("doc_id", "blob")))
      .select("doc_id", "rec_id", "http_status", "charset", "body")
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[GzDoc]
    val out = StreamOps.parseWarcGzStream(input.toDF())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("warcgz_stream")
      .outputMode("append").start()
    input.addData(GzDoc(9L, blob))
    q.processAllAvailable(); q.stop()
    val streamed = s.sql("select doc_id, rec_id, http_status, charset, " +
        "body from warcgz_stream").collect().map(_.toSeq).toSet
    assert(streamed == batchRows)
    assert(streamed.exists(r => r(3) == "windows-1252" &&
      r(4) == "café"))
  }

  test("sitemapDirectivesStream and rendezvousShardsStream match batch") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val body = "User-agent: *\nSitemap: https://h/s1.xml\n" +
      "sitemap: https://h/s2.xml\nSitemap:\n"
    val input = MemoryStream[StreamDoc]
    val smOut = StreamOps.sitemapDirectivesStream(
      input.toDF().select(col("doc_id").cast("string").as("host"),
        col("text").as("body")))
    assert(smOut.isStreaming)
    val q1 = smOut.writeStream.format("memory").queryName("smd_stream")
      .outputMode("append").start()
    val input2 = MemoryStream[StreamDoc]
    val shOut = StreamOps.rendezvousShardsStream(
      input2.toDF().select(col("doc_id")), Seq("doc_id"), 8)
    assert(shOut.isStreaming)
    val q2 = shOut.writeStream.format("memory").queryName("shard_stream")
      .outputMode("append").start()
    input.addData(StreamDoc(3L, body,
      Timestamp.valueOf("2024-01-01 00:00:01")))
    input2.addData((1L to 50L).map(i => StreamDoc(i, "",
      Timestamp.valueOf("2024-01-01 00:00:01"))): _*)
    q1.processAllAvailable(); q1.stop()
    q2.processAllAvailable(); q2.stop()
    val sm = s.sql("select host, sitemap_url from smd_stream").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sm == Set("3" -> "https://h/s1.xml", "3" -> "https://h/s2.xml"))
    val batchShards = graft.sources.Layout.rendezvousShards(
        (1L to 50L).map(Tuple1(_)).toDF("doc_id"), Seq("doc_id"), 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamedShards = s.sql("select doc_id, shard from shard_stream")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamedShards == batchShards)
  }

  test("seasonalAnomaliesStream scores against the batch-fitted cells " +
       "like the batch scorer") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ts(h: Int, m: Int) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // baseline: 31 obs at hour 0 (mean 10-ish), 5 obs at hour 1
    val hist = ((0 until 30).map(i => (i.toLong, ts(0, i), "x", 10.0)) ++
      Seq((30L, ts(0, 55), "x", 16.0)) ++
      (40 until 45).map(i => (i.toLong, ts(1, i - 40), "x", 10.0)))
      .toDF("event_id", "ts", "event_type", "value")
    // live events: dense-hour outlier, dense-hour normal, sparse-hour
    // outlier (minObs silences), unknown hour (no cell -> dropped)
    val live = Seq(
      (100L, ts(0, 10), "x", 99.0),
      (101L, ts(0, 11), "x", 10.0),
      (102L, ts(1, 10), "x", 99.0),
      (103L, ts(7, 0), "x", 10.0))
    val liveDf = live.toDF("event_id", "ts", "event_type", "value")
    val batch = graft.operators.Events.seasonalScore(liveDf,
        graft.operators.Events.seasonalCells(hist)).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5),
        r.getBoolean(7))).toSet
    import graft.streaming.StreamOps.MetricEvent
    val input = MemoryStream[MetricEvent]
    val out = StreamOps.seasonalAnomaliesStream(input.toDF(), hist)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("seasonal_stream")
      .outputMode("append").start()
    input.addData(live.map(e => MetricEvent(e._1, e._2, e._3, e._4)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select event_id, n_obs, cell_mean, is_anomaly " +
        "from seasonal_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(streamed == batch)
    val flags = streamed.map(t => t._1 -> t._4).toMap
    assert(flags == Map(100L -> true, 101L -> false, 102L -> false))
  }

  test("seasonalAnomaliesStream: null baseline key drops (no \"null#h\" " +
       "literal cell for a string-\"null\" event to hit)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ts(h: Int, m: Int) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // baseline rows with a NULL key plus a real key
    val hist = ((0 until 5).map(i =>
        (i.toLong, ts(0, i), null: String, 10.0)) ++
      (10 until 15).map(i => (i.toLong, ts(0, i - 10), "x", 10.0)))
      .toDF("event_id", "ts", "event_type", "value")
    import graft.streaming.StreamOps.MetricEvent
    val input = MemoryStream[MetricEvent]
    val out = StreamOps.seasonalAnomaliesStream(input.toDF(), hist,
      minObs = 1L)
    val q = out.writeStream.format("memory").queryName("seasonal_nullkey")
      .outputMode("append").start()
    // a live event whose event_type is the STRING "null" must drop
    // (batch inner-join parity: no such baseline key exists)
    input.addData(MetricEvent(200L, ts(0, 1), "null", 99.0),
      MetricEvent(201L, ts(0, 2), "x", 10.0))
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select event_id from seasonal_nullkey").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(201L))
  }

  test("dedupAgainstStoreStream equals the batch store probe " +
       "on out-of-order input") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigstore-stream").toString
    graft.operators.Dedup.writeBandSignatures(corpus, "doc_id", "text", dir)
    // deterministic scramble: stream arrival order is unrelated to id
    // order, timestamps spread inside the watermark horizon
    val rows = batch.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(x => (x._1 * 2654435761L) % 1009)
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.dedupAgainstStoreStream(input.toDS(), dir,
      threshold = 0.5, watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("storededup")
      .outputMode("append").start()
    rows.grouped(40).zipWithIndex.foreach { case (chunk, i) =>
      input.addData(chunk.map { case (id, text) =>
        StreamDoc(id, text, Timestamp.valueOf(f"2024-01-01 00:00:0${i % 9}"))
      }.toSeq)
      q.processAllAvailable()
    }
    // sentinel pushes the watermark past every window; its text must
    // SURVIVE shingling (>= 3 words) because the empty-shingle filter
    // can be pushed below the event-time watermark node — a sub-shingle
    // sentinel would be dropped before advancing the watermark. Its
    // unique token pairs with nothing.
    input.addData(StreamDoc(999999L, "sentinelx sentinelx sentinelx",
      Timestamp.valueOf("2024-01-01 01:00:00")))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from storededup where id_b < 999999")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batchPairs = graft.operators.Dedup
      .minHashLshPairsAgainstStore(batch, dir, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchPairs)
  }

  test("embeddingDecontaminateStream equals batch lshNearDupPairsAgainst " +
       "on out-of-order input") {
    import graft.streaming.StreamOps.StreamEmb
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val corpus = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0)),
      (101L, Seq(0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0)),
      (102L, Seq(0.5, 0.5, 0.5, 0.0, 0.0, 0.5, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    def emb(id: Long, v: Seq[Double], ts: String) =
      StreamEmb(id, v, Timestamp.valueOf(ts))
    // e1 ~ corpus 100, e3 ~ corpus 101, e2 clean, e4 the zero vector
    // (must be excluded, not paired with everything via NaN >= t)
    val e1 = emb(1, Seq(1.0, 0.01, 0.0, 0.0, 0.99, 0.02, 0.0, 1.01),
      "2024-01-01 00:00:05")
    val e2 = emb(2, Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "2024-01-01 00:00:02")
    val e3 = emb(3, Seq(0.01, 0.99, 0.0, 1.0, 0.01, 0.0, 1.02, 0.0),
      "2024-01-01 00:00:08")
    val e4 = emb(4, Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "2024-01-01 00:00:03")
    val input = MemoryStream[StreamEmb]
    val out = StreamOps.embeddingDecontaminateStream(input.toDS(), corpus,
      "vec_id", "embedding", threshold = 0.9, numPlanes = 3, tables = 8,
      watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("embdecontam")
      .outputMode("append").start()
    // out-of-order arrival within the horizon
    input.addData(e1); q.processAllAvailable()
    input.addData(e3, e2); q.processAllAvailable()
    input.addData(e4); q.processAllAvailable()
    // clean sentinel pushes the watermark past every window
    input.addData(emb(99, Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "2024-01-01 01:00:00"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from embdecontam where id_b < 99")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batchSide = Seq(e1, e2, e3, e4).toDF()
      .select(col("vec_id"), col("vec").as("embedding"))
    val batch = graft.operators.Similarity.lshNearDupPairsAgainst(
        batchSide, corpus, "vec_id", "embedding",
        threshold = 0.9, numPlanes = 3, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch)
    assert(streamed.map(_._2) == Set(1L, 3L))
  }

  test("piecesTokenizeStream emits the batch greedy segmentation") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq((1L, "spark sparse park"), (2L, "spark spa"))
      .toDF("doc_id", "text")
    val vocab = graft.operators.TextAnalysis
      .trainPieces(train, "text", topN = 30, maxPieceLen = 4)
      .localCheckpoint(true)
    val docs = Seq(
      StreamDoc(10L, "spark park", Timestamp.valueOf("2024-01-01 00:00:01")),
      StreamDoc(11L, "sparkz", Timestamp.valueOf("2024-01-01 00:00:02")))
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.piecesTokenizeStream(input.toDS(), vocab,
      maxPieceLen = 4)
    val q = out.writeStream.format("memory").queryName("pieces_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from pieces_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val batch = graft.operators.TextAnalysis.piecesTokenize(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", vocab, maxPieceLen = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // the unknown character really went through the [UNK] path
    assert(streamed.exists(t => t._1 == 11L && t._4 == "[UNK]"))
  }

  test("bpeTokenizeStream loads the PERSISTED model at stream start " +
       "and matches the batch encode — trained Monday, gating " +
       "Tuesday's stream") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq((1L, "low lower lowest low low"),
      (2L, "new newer newest new")).toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("graft-bpe-stream").toString + "/m"
    graft.operators.ModelStore.writeBpeModel(
      graft.operators.TextAnalysis.trainBpe(train, "text",
        numMerges = 4), store)
    val docs = Seq(
      StreamDoc(10L, "low new lowly",
        Timestamp.valueOf("2024-01-01 00:00:01")),
      StreamDoc(11L, "newest low",
        Timestamp.valueOf("2024-01-01 00:00:02")))
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.bpeTokenizeStream(input.toDS(), store)
    val q = out.writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from bpe_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val batch = graft.operators.ModelStore.bpeTokenizeFromModel(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), store)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stored-model streaming inference: piecesTokenizeStoredStream " +
       "and scoreLogisticStoredStream match their batch loaders") {
    import graft.streaming.StreamOps.StreamDoc
    import graft.operators.{ModelStore, TextAnalysis, TextClassify}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq((1L, "spark sparse park", "en"),
      (2L, "der schnelle fuchs", "de"),
      (3L, "spark spa quick", "en")).toDF("doc_id", "text", "lang")
    val pStore = java.nio.file.Files
      .createTempDirectory("graft-pcs-stream").toString + "/m"
    ModelStore.writePiecesModel(
      TextAnalysis.trainPieces(train, "text", topN = 30,
        maxPieceLen = 4), pStore, maxPieceLen = 4)
    val lStore = java.nio.file.Files
      .createTempDirectory("graft-lg-stream").toString + "/m"
    ModelStore.writeLogisticModel(
      TextClassify.trainLogisticHashed(
        train.withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en", dim = 8, iters = 2), lStore)
    val docs = Seq(
      StreamDoc(10L, "spark park quick",
        Timestamp.valueOf("2024-01-01 00:00:01")),
      StreamDoc(11L, "schnelle spa",
        Timestamp.valueOf("2024-01-01 00:00:02")))
    val input = MemoryStream[StreamDoc]
    val outP = StreamOps.piecesTokenizeStoredStream(input.toDS(), pStore)
    val outL = StreamOps.scoreLogisticStoredStream(input.toDS(), lStore)
    val qp = outP.writeStream.format("memory").queryName("pcs_stored")
      .outputMode("append").start()
    val ql = outL.writeStream.format("memory").queryName("lg_stored")
      .outputMode("append").start()
    input.addData(docs: _*)
    qp.processAllAvailable(); ql.processAllAvailable()
    qp.stop(); ql.stop()
    val batchDf = docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val gotP = s.sql("select * from pcs_stored").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val wantP = ModelStore.piecesTokenizeFromModel(batchDf, pStore)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(gotP == wantP && gotP.nonEmpty)
    val gotL = s.sql("select doc_id, p from lg_stored").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val wantL = TextClassify.scoreLogisticInline(batchDf,
        ModelStore.logisticFromModel(s, lStore)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(gotL == wantL && gotL.nonEmpty)
  }

  test("knScoreStream: the persisted n-gram stack KN3-scores arriving " +
       "documents exactly like the batch scorer") {
    import graft.streaming.StreamOps.StreamDoc
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq((1L, "a b c d a b c"), (2L, "a b c e x b"),
      (3L, "x b c a b")).toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("graft-kn-stream").toString + "/m"
    graft.operators.ModelStore.writeNgramModel(
      graft.operators.LanguageModel.trainNgrams(train, "doc_id",
        "text", maxN = 3), store, maxN = 3)
    val docs = Seq(
      StreamDoc(10L, "a b c d", Timestamp.valueOf("2024-01-01 00:00:01")),
      StreamDoc(11L, "q b c x", Timestamp.valueOf("2024-01-01 00:00:02")))
    val input = MemoryStream[StreamDoc]
    val out = StreamOps.knScoreStream(input.toDS(), store, order = 3)
    val q = out.writeStream.format("memory").queryName("kn_stream")
      .outputMode("complete").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from kn_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.LanguageModel.scoreByKneserNeyN(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        graft.operators.ModelStore.ngramsFromModel(s, store),
        "doc_id", "text", order = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("phashDedupStream matches the batch cross-corpus image probe") {
    import graft.operators.Multimodal
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // natural-like images (1/f spectrum — see OperatorsSpec's pHash
    // notes): the stored corpus hashes 4 distinct images; the stream
    // ships PNG re-encodes of two of them, one unrelated image, and a
    // corrupt payload, in two out-of-order chunks
    def img(seed: Long): Multimodal.PngImage = {
      val rnd = new scala.util.Random(seed)
      val ph = Array.fill(6, 6)(rnd.nextDouble() * 2 * math.Pi)
      val px = new Array[Byte](48 * 48 * 3)
      for (y <- 0 until 48; x <- 0 until 48) {
        var l = 0.0
        for (i <- 0 until 6; j <- 0 until 6 if i + j > 0)
          l += 120.0 / (1 + i + j) *
            math.cos(math.Pi * i * x / 48.0 + ph(i)(j)) *
            math.cos(math.Pi * j * y / 48.0 + ph(j)(i))
        val base = (y * 48 + x) * 3
        def cl(d: Double) =
          math.max(25, math.min(230, 128 + d * 0.4)).toInt.toByte
        px(base) = cl(l); px(base + 1) = cl(l * 0.9 + 8)
        px(base + 2) = cl(l * 1.1 - 6)
      }
      Multimodal.PngImage(48, 48, 3, px)
    }
    def asAssets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("content"),
        struct(lit("image/png").as("mime"), lit("synth").as("source"),
          octet_length(col("content")).cast("long").as("n_bytes"))
          .as("meta"))
    val corpusAssets = asAssets((1L to 4L).map(i =>
      (i, Multimodal.encodePng(img(i)))).toDF("id", "content"))
    val corpusHashes = Multimodal.perceptualHashes(corpusAssets)
      .localCheckpoint(true)
    val batchRows = Seq(
      (101L, Multimodal.encodePng(img(1L))), // dup of corpus 1
      (103L, Multimodal.encodePng(img(3L))), // dup of corpus 3
      (105L, Multimodal.encodePng(img(55L))), // unrelated
      (106L, Array[Byte](9, 9, 9))) // corrupt: no hash, no pair
    val input = MemoryStream[(Long, Array[Byte])]
    val out = StreamOps.phashDedupStream(
      asAssets(input.toDF().toDF("id", "content")), corpusHashes)
    val q = out.writeStream.format("memory").queryName("phash_stream")
      .outputMode("append").start()
    input.addData(batchRows(2), batchRows(0)) // out of order
    q.processAllAvailable()
    input.addData(batchRows(3), batchRows(1))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from phash_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Multimodal.phashNearDupPairsAgainst(
        Multimodal.perceptualHashes(asAssets(batchRows.toDF("id", "content"))),
        corpusHashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.map(p => (p._1, p._2)) == Set((101L, 1L), (103L, 3L)))
  }

  test("referentialQuarantineStream routes orphan and null-key rows only") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val input = MemoryStream[(Long, java.lang.Long)]
    val out = StreamOps.referentialQuarantineStream(
      input.toDF().toDF("id", "fk"), parent, "fk", "pk", "c->p")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("quarantine")
      .outputMode("append").start()
    input.addData((1L, 10L), (2L, 99L), (3L, null))
    q.processAllAvailable()
    input.addData((4L, 20L), (5L, 77L))
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select * from quarantine").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    // healthy rows 1/4 dropped; orphans 2/5 and null-key 3 quarantined,
    // payload intact, relationship tagged
    assert(got == Set((2L, Some(99L), "c->p"), (3L, None, "c->p"),
      (5L, Some(77L), "c->p")))
    // parity with the batch audit's row accounting: orphan rows +
    // null rows == quarantined rows
    val batch = graft.operators.Stats.referentialOrphans(
      Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None),
        (4L, Some(20L)), (5L, Some(77L)))
        .toDF("id", "fk"), parent, "fk", "pk", "c->p")
      .collect().head
    assert(batch.getLong(2) + batch.getLong(3) == got.size.toLong)
  }

  test("decayedActivityStream matches batch per user under shuffled arrival") {
    import graft.streaming.StreamOps.{AnomEvent, DecayedOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evDf = graft.sources.Sources
      .table(s, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 12)
      .select("event_id", "ts", "user_id", "value")
    val batch = graft.operators.Events.decayedActivity(evDf)
      .collect()
      .map(r => DecayedOut(r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val rows = evDf.collect()
      .map(r => AnomEvent(r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts"), r.getAs[Double]("value")))
    val input = MemoryStream[AnomEvent]
    val out = StreamOps.decayedActivityStream(input.toDS())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("decayed_stream")
      .outputMode("update").start()
    // each user arrives wholly inside one chunk, but the chunk itself
    // is time-SCRAMBLED (hash order): the top-k state must be
    // arrival-order independent, no watermark involved
    rows.groupBy(_.user_id % 3).toSeq.sortBy(_._1).foreach { case (_, chunk) =>
      input.addData(chunk.sortBy(e => e.event_id.## * 2654435761L).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // one emission per (user, chunk) = one per user here
    val streamed = s.sql("select * from decayed_stream").as[DecayedOut]
      .collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("decayedActivityStream: every update equals batch over the seen prefix") {
    import graft.streaming.StreamOps.{AnomEvent, DecayedOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(id: Long, minute: Int, v: Double) =
      AnomEvent(7L, id, Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00"), v)
    // NEWEST arrives first: every later chunk is entirely "late" data
    // landing behind the current window head
    val chunks = Seq(
      Seq(ev(10L, 50, 8.0), ev(9L, 45, 4.0)),
      Seq(ev(8L, 40, 2.0)),
      Seq(ev(7L, 35, 1.0), ev(6L, 30, 16.0)))
    val input = MemoryStream[AnomEvent]
    val out = StreamOps.decayedActivityStream(input.toDS(), maxEvents = 4)
    val q = out.writeStream.format("memory").queryName("decayed_prefix")
      .outputMode("update").start()
    var seen = Seq.empty[AnomEvent]
    val got = Seq.newBuilder[DecayedOut]
    chunks.foreach { c =>
      input.addData(c: _*)
      q.processAllAvailable()
      seen = seen ++ c
      val rows = s.sql("select * from decayed_prefix").as[DecayedOut]
        .collect()
      got.clear(); got ++= rows
      val expect = graft.operators.Events.decayedActivity(
          seen.toDF(), maxEvents = 4)
        .collect()
        .map(r => DecayedOut(r.getLong(0), r.getLong(1), r.getDouble(2)))
        .head
      assert(rows.last == expect, s"after ${seen.size} events")
    }
    q.stop()
    // the window capped at 4: the oldest event (16.0) fell out
    assert(got.result().last.decayed_value ==
      8.0 + 4.0 * 0.5 + 2.0 * 0.25 + 1.0 * 0.125)
  }

  test("decayedActivityStream tolerates non-finite values like batch") {
    import graft.streaming.StreamOps.{AnomEvent, DecayedOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, id: Long, minute: Int, v: Double) =
      AnomEvent(u, id, Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00"), v)
    // user 1: NaN newest + one finite; user 2: nothing but NaN
    val rows = Seq(ev(1L, 2L, 10, Double.NaN), ev(1L, 1L, 5, 4.0),
      ev(2L, 3L, 10, Double.NaN))
    val input = MemoryStream[AnomEvent]
    val out = StreamOps.decayedActivityStream(input.toDS(), maxEvents = 2)
    val q = out.writeStream.format("memory").queryName("decayed_nan")
      .outputMode("update").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select * from decayed_nan").as[DecayedOut]
      .collect().map(r => r.user_id -> r).toMap
    val batch = graft.operators.Events
      .decayedActivity(rows.toDF(), maxEvents = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null
          else java.lang.Double.valueOf(r.getDouble(2))))).toMap
    // NaN term skipped, finite one keeps its rank-1 weight
    assert(batch(1L) == ((2L, java.lang.Double.valueOf(2.0))))
    assert(got(1L).n_recent == 2L && got(1L).decayed_value == 2.0)
    // all-non-finite user: null score both sides, row still emitted
    assert(batch(2L) == ((1L, null)))
    assert(got(2L).n_recent == 1L && got(2L).decayed_value == null)
  }

  test("topPathsStream finalizes the batch path-instance multiset") {
    import graft.streaming.StreamOps.{PathOut, Scd2Event}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evDf = graft.sources.Sources
      .table(s, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 12)
      .select("event_id", "ts", "user_id", "event_type")
    // batch counts WITHOUT the top-N cut: the stream emits instances
    val batch = graft.operators.Events.topPaths(evDf, k = 3,
        topN = Int.MaxValue).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = evDf.collect()
      .map(r => Scd2Event(r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
        r.getAs[String]("event_type")))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Scd2Event]
    val out = StreamOps.topPathsStream(
      input.toDF().withWatermark("ts", "0 seconds").as[Scd2Event], k = 3)
    val q = out.writeStream.format("memory").queryName("paths_stream")
      .outputMode("append").start()
    val third = (rows.length + 2) / 3
    rows.grouped(third).foreach { chunk =>
      input.addData(chunk.reverse.toSeq: _*)
      q.processAllAvailable()
    }
    input.addData(Scd2Event(999999L, 999999L,
      Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from paths_stream").as[PathOut]
      .collect().groupBy(_.path)
      .map { case (k2, v) => k2 -> v.length.toLong }
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("attributeConversionsStream credits equal the batch rollup " +
       "for both models") {
    import graft.streaming.StreamOps.{CreditOut, Scd2Event}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evDf = graft.sources.Sources
      .table(s, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 40)
      .select("event_id", "ts", "user_id", "event_type")
    val rows = evDf.collect()
      .map(r => Scd2Event(r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
        r.getAs[String]("event_type")))
      .sortBy(e => (e.ts.getTime, e.event_id))
    Seq("linear", "last_touch").foreach { model =>
      val batch = graft.operators.Events.attributeConversions(
          evDf, "purchase", 21600L, model).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n_conversions"), r.getAs[Double]("credit")))
        .toMap
      val input = MemoryStream[Scd2Event]
      val out = StreamOps.attributeConversionsStream(
        input.toDF().withWatermark("ts", "0 seconds").as[Scd2Event],
        "purchase", 21600L, model)
      val name = s"attr_stream_$model"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val third = (rows.length + 2) / 3
      rows.grouped(third).foreach { chunk =>
        input.addData(chunk.reverse.toSeq: _*)
        q.processAllAvailable()
      }
      input.addData(Scd2Event(999999L, 999999L,
        Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      q.stop()
      // roll the per-conversion rows up exactly as batch does:
      // count distinct conversions, exact decimal credit sum
      val streamed = s.sql(s"select * from $name").as[CreditOut]
        .collect().groupBy(_.touch_type)
        .map { case (t, cs) =>
          t -> (cs.map(_.conversion_id).distinct.length.toLong,
            cs.map(c => BigDecimal(c.credit)).sum
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      assert(streamed == batch && streamed.nonEmpty, s"model=$model")
    }
  }

  test("transitionPairsStream finalizes the batch pair multiset") {
    import graft.streaming.StreamOps.{Scd2Event, TransitionPair}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evDf = graft.sources.Sources
      .table(s, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 12)
      .select("event_id", "ts", "user_id", "event_type")
    val batch = graft.operators.Events.transitionMatrix(evDf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = evDf.collect()
      .map(r => Scd2Event(r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type")))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Scd2Event]
    val out = StreamOps.transitionPairsStream(
      input.toDF().withWatermark("ts", "0 seconds").as[Scd2Event])
    val q = out.writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    // time-ordered chunks, each internally REVERSED: sequencing must
    // come from the buffer, not arrival
    val third = (rows.length + 2) / 3
    rows.grouped(third).foreach { chunk =>
      input.addData(chunk.reverse.toSeq: _*)
      q.processAllAvailable()
    }
    input.addData(Scd2Event(999999L, 999999L,
      Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("select * from trans_stream").as[TransitionPair]
      .collect()
      .groupBy(p => (p.src_type, p.dst_type))
      .map { case (k, v) => k -> v.length.toLong }
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("readStream.format(\"warcgz\"): Structured Streaming file " +
       "discovery ingests a shard dropped in AFTER the stream " +
       "starts — the continuously-landing-crawl entry point") {
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warcgz-stream").toFile
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def rec(body: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body")
        .getBytes("US-ASCII")
    def drop(name: String, bodies: String*): Unit = {
      val f = new java.io.FileOutputStream(
        new java.io.File(dir, name))
      bodies.foreach(b => f.write(gz(rec(b))))
      f.close()
    }
    drop("a.warc.gz", "early-1", "early-2")
    val stream = s.readStream
      .schema(org.apache.spark.sql.graftext.WarcGzFileFormat.schema)
      .format("warcgz").load(dir.getAbsolutePath)
    val out = graft.sources.Warc.parseRecordRows(stream)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    def bodies() = s.sql("select * from warc_stream").collect()
      .map(r => new String(r.getAs[Array[Byte]]("payload"),
        "US-ASCII")).toSet
    assert(bodies() == Set("early-1", "early-2"))
    // a shard landing AFTER the stream started is discovered and
    // ingested incrementally — no restart, no re-read of a.warc.gz
    drop("b.warc.gz", "late-1")
    q.processAllAvailable()
    q.stop()
    assert(bodies() == Set("early-1", "early-2", "late-1"))
  }

  test("read_stream_avro: newly-landing avro containers ingest " +
       "incrementally through a full streaming job config") {
    import graft.operators.Pipeline
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-avro-stream")
    val srcDir = java.nio.file.Files
      .createDirectory(base.resolve("in"))
    // land one container atomically: write via the batch format into
    // scratch, move the part file in (the standard landing pattern)
    def land(ids: Seq[Long], tag: String): Unit = {
      val tmp = base.resolve("w" + tag).toString
      ids.toDF("id")
        .select(col("id"), concat(lit("v"), col("id")).as("s"))
        .coalesce(1).write.format("graftavro").mode("overwrite")
        .save(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      java.nio.file.Files.move(part.toPath,
        srcDir.resolve(tag + ".avro"))
    }
    land(1L to 5L, "a")
    val q = Pipeline.startStreamJson(s,
      s"""[
         |  {"op": "read_stream_avro",
         |   "params": {"path": "$srcDir",
         |              "schema": "id BIGINT, s STRING"}},
         |  {"op": "filter", "params": {"condition": "id % 2 = 1"}},
         |  {"op": "write_stream_memory",
         |   "params": {"name": "avro_stream"}}
         |]""".stripMargin)
    q.processAllAvailable()
    def got() = s.sql("select id, s from avro_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got() == Set((1L, "v1"), (3L, "v3"), (5L, "v5")))
    // a shard landing AFTER start is discovered and ingested
    land(6L to 9L, "b")
    q.processAllAvailable()
    q.stop()
    assert(got() == Set((1L, "v1"), (3L, "v3"), (5L, "v5"),
      (7L, "v7"), (9L, "v9")))
  }

  test("startStreamJson: a COMPLETE streaming job from pure JSON — " +
       "warcgz file discovery -> parse -> gate -> memory sink — " +
       "ingests shards landing after start; malformed configs " +
       "reject before the source is touched") {
    import graft.operators.Pipeline
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-job").toFile
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def rec(body: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body")
        .getBytes("US-ASCII")
    def drop(name: String, bodies: String*): Unit = {
      val f = new java.io.FileOutputStream(new java.io.File(dir, name))
      bodies.foreach(b => f.write(gz(rec(b))))
      f.close()
    }
    drop("a.warc.gz", "keep me please", "no")
    val cfg =
      s"""[
         |  {"op": "read_stream_warcgz",
         |   "params": {"path": "${dir.getAbsolutePath}"}},
         |  {"op": "parse_warc_records"},
         |  {"op": "with_column",
         |   "params": {"name": "body",
         |              "expr": "decode(payload, 'UTF-8')"}},
         |  {"op": "filter", "params": {"condition": "length(body) > 5"}},
         |  {"op": "select", "params": {"cols": ["rec_id", "body"]}},
         |  {"op": "write_stream_memory", "params": {"name": "cfg_job"}}
         |]""".stripMargin
    val q = Pipeline.startStreamJson(s, cfg)
    q.processAllAvailable()
    def bodies() = s.sql("select body from cfg_job").collect()
      .map(_.getString(0)).toSet
    assert(bodies() == Set("keep me please"))
    drop("b.warc.gz", "late but long enough", "tiny")
    q.processAllAvailable()
    q.stop()
    assert(bodies() == Set("keep me please", "late but long enough"))
    // config errors surface BEFORE any stream starts, naming the
    // whitelists: bad source, bad sink, non-streamable transform
    val badSrc = intercept[IllegalArgumentException] {
      Pipeline.startStreamJson(s,
        """[{"op": "read_parquet", "params": {"path": "/tmp/x"}},
          |  {"op": "write_stream_memory", "params": {"name": "z"}}]"""
          .stripMargin)
    }
    assert(badSrc.getMessage.contains("streaming source") &&
      badSrc.getMessage.contains("read_stream_warcgz"))
    val badSink = intercept[IllegalArgumentException] {
      Pipeline.startStreamJson(s,
        s"""[{"op": "read_stream_warcgz",
           |  "params": {"path": "${dir.getAbsolutePath}"}},
           |  {"op": "write_parquet", "params": {"path": "/tmp/x"}}]"""
          .stripMargin)
    }
    assert(badSink.getMessage.contains("streaming sink") &&
      badSink.getMessage.contains("write_stream_parquet"))
    val badStep = intercept[IllegalArgumentException] {
      Pipeline.startStreamJson(s,
        s"""[{"op": "read_stream_warcgz",
           |  "params": {"path": "${dir.getAbsolutePath}"}},
           |  {"op": "drop_exact_duplicates"},
           |  {"op": "write_stream_memory", "params": {"name": "z"}}]"""
          .stripMargin)
    }
    assert(badStep.getMessage.contains("not streamable"))
  }

  test("fromJsonStreaming: a config-run ingest gate (token gate + " +
       "dup gate + stored logistic scorer) on a stream equals the " +
       "batch pipeline on the same rows; non-streamable steps are " +
       "rejected eagerly by name") {
    import graft.operators.{ModelStore, Pipeline, TextClassify}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docsDf = s.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80).select("doc_id", "lang", "text")
    val modelPath = java.nio.file.Files
      .createTempDirectory("graft-pipe-stream").toString + "/logreg"
    ModelStore.writeLogisticModel(
      TextClassify.trainLogisticHashed(
        docsDf.withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en", dim = 8, iters = 2), modelPath)
    val cfg =
      s"""[
         |  {"op": "token_count"},
         |  {"op": "dup_ngram_fraction",
         |   "params": {"n": 2, "out_col": "dup2"}},
         |  {"op": "filter",
         |   "params": {"condition": "n_tokens >= 20 AND dup2 <= 0.2"}},
         |  {"op": "score_logistic_stored",
         |   "params": {"model_path": "$modelPath"}}
         |]""".stripMargin
    val batch = Pipeline.fromJson(cfg)(docsDf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val input = MemoryStream[LangDoc]
    val out = Pipeline.fromJsonStreaming(cfg)(input.toDF())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("pipe_stream")
      .outputMode("append").start()
    val rows = docsDf.collect().map(r =>
      LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    input.addData(rows.take(40).toSeq: _*)
    q.processAllAvailable()
    input.addData(rows.drop(40).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select * from pipe_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == batch && got.nonEmpty)
    // non-streamable steps reject at compile time, naming themselves
    // AND the streamable whitelist
    val e = intercept[IllegalArgumentException] {
      Pipeline.fromJsonStreaming(
        """[{"op": "drop_exact_duplicates"}, {"op": "token_count"},
          |  {"op": "bm25_from_index",
          |   "params": {"index_path": "/tmp/x", "k": 5}}]"""
          .stripMargin)
    }
    assert(e.getMessage.contains("not streamable") &&
      e.getMessage.contains("drop_exact_duplicates") &&
      e.getMessage.contains("bm25_from_index") &&
      e.getMessage.contains("token_count")) // listed as AVAILABLE
    // extra entries must be DECLARED stream-safe to pass the gate
    val tag = Pipeline.OpSpec(Set(), Set(),
      _ => df => df.withColumn("tagged", lit(1)))
    assertThrows[IllegalArgumentException] {
      Pipeline.fromStepsStreaming(Seq(Pipeline.Step("tag")),
        extra = Map("tag" -> tag))
    }
    val gated = Pipeline.fromStepsStreaming(Seq(Pipeline.Step("tag")),
      extra = Map("tag" -> tag), extraStreamable = Set("tag"))
    assert(gated(input.toDF()).isStreaming)
  }

  test("expect_condition gates a RUNNING stream: the PlanAnchor " +
       "wrapper is stream-legal, satisfied rows flow, a violating " +
       "micro-batch fails the query with the gate name") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = Pipeline.fromStepsStreaming(Seq(Pipeline.Step(
      "expect_condition",
      Map("condition" -> "v > 0", "name" -> "v_pos_stream"))))(
      input.toDS().toDF("k", "v"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    input.addData((1L, 5L), (2L, 7L))
    q.processAllAvailable()
    assert(s.sql("select * from gate_stream").count() == 2)
    input.addData((3L, -1L))
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.processAllAvailable() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + msgs(t.getCause)
    assert(msgs(e).contains("v_pos_stream"))
    q.stop()
  }

  test("fromJsonStreamingGated: expect_condition store-failures mode " +
       "on a stream — survivors equal the batch twin, each gate's " +
       "violations (incl. NULL conditions, sequenced after earlier " +
       "gates) land per-batch under gate=<name>, replays overwrite " +
       "their own batch") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-quar-stream")
    val qBatch = base.resolve("batch").toString
    val qStream = base.resolve("stream").toString
    def cfg(qdir: String): String =
      s"""[
         |  {"op": "with_column",
         |   "params": {"name": "v2", "expr": "v * 2"}},
         |  {"op": "expect_condition",
         |   "params": {"condition": "v > 0", "name": "v_pos",
         |              "quarantine_path": "$qdir"}},
         |  {"op": "expect_condition",
         |   "params": {"condition": "v2 < 100", "name": "v2_cap",
         |              "quarantine_path": "$qdir"}},
         |  {"op": "filter", "params": {"condition": "k % 2 = 0"}}
         |]""".stripMargin
    // NULL v: a violation of gate v_pos in quarantine mode too
    val rows = Seq((2L, Some(5L)), (4L, Some(-1L)), (6L, Some(60L)),
      (3L, Some(7L)), (8L, None), (10L, Some(-3L)), (12L, Some(8L)))
    val batchDf = rows.toDF("k", "v")
    val batchKept = Pipeline.fromJson(cfg(qBatch))(batchDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def gateRows(root: String, gate: String): Set[(Long, Long)] =
      s.read.parquet(s"$root/gate=$gate").select("k", "v")
        .na.fill(Map("v" -> -999L))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // streaming: gated compile + one violation writer per gate
    val (xform, gates) = Pipeline.fromJsonStreamingGated(cfg(qStream))
    assert(gates.map(_.name) == Seq("v_pos", "v2_cap"))
    val input = MemoryStream[(Long, Option[Long])]
    val src = input.toDS().toDF("k", "v")
    val out = xform(src)
    assert(out.isStreaming)
    val main = out.writeStream.format("memory")
      .queryName("quar_gated").outputMode("append").start()
    val writers = gates.map(g => StreamOps.quarantineGateStream(
      src, g, base.resolve(s"ckpt-${g.name}").toString))
    def drainAll(): Unit = {
      writers.foreach(_.processAllAvailable())
      main.processAllAvailable()
    }
    input.addData(rows.take(4): _*)
    drainAll()
    input.addData(rows.drop(4): _*)
    drainAll()
    main.stop(); writers.foreach(_.stop())
    // survivors match the batch twin exactly
    val got = s.sql("select k, v from quar_gated").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batchKept && got.nonEmpty)
    // per-gate violations match the batch twin's gate tables —
    // v_pos holds v<=0 AND the NULL row; v2_cap only v_pos SURVIVORS
    // (sequenced), so the v=-1 row appears once, under v_pos
    assert(gateRows(qStream, "v_pos") == gateRows(qBatch, "v_pos"))
    assert(gateRows(qStream, "v2_cap") == gateRows(qBatch, "v2_cap"))
    assert(gateRows(qStream, "v_pos") ==
      Set((4L, -1L), (8L, -999L), (10L, -3L)))
    assert(gateRows(qStream, "v2_cap") == Set((6L, 60L)))
    // the layout is per-micro-batch: batch=<id> partition dirs
    val vPosDirs = new java.io.File(s"$qStream/gate=v_pos")
      .listFiles().map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(vPosDirs.size >= 2)
    // replaying a batch id OVERWRITES its own table — no double rows
    val replayDir = base.resolve("replay").toString
    val d = Seq((1L, 2L)).toDF("k", "v")
    StreamOps.writeQuarantineBatch(d, replayDir, 7L)
    StreamOps.writeQuarantineBatch(d, replayDir, 7L)
    assert(s.read.parquet(replayDir).count() == 1)
  }

  test("applyChangesStream maintains a parquet snapshot from a CDC " +
       "stream: micro-batch merges, stale changes ignored via the " +
       "snapshot's seq column, swap leaves no half-written state") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-cdc-stream")
    val snapPath = base.resolve("snap").toString
    val ckpt = base.resolve("ckpt").toString
    // initial snapshot CARRIES seq — the stale-guard contract
    Seq((1L, "a", 10, 0L), (2L, "b", 20, 0L), (3L, "c", 30, 0L))
      .toDF("id", "s", "v", "seq")
      .coalesce(1).write.parquet(snapPath)
    val input = MemoryStream[CdcChg]
    val q = StreamOps.applyChangesStream(input.toDF(), snapPath,
      Seq("id"), ckpt)
    def snap() = s.read.parquet(snapPath).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("s"), r.getAs[Int]("v"),
          r.getAs[Long]("seq")))).toMap
    input.addData(
      CdcChg(2, 2, "upsert", "b2", 21),  // update
      CdcChg(5, 1, "upsert", "e", 50),   // insert
      CdcChg(3, 2, "delete", null, 0))   // delete
    q.processAllAvailable()
    assert(snap() == Map(
      1L -> (("a", 10, 0L)), 2L -> (("b2", 21, 2L)),
      5L -> (("e", 50, 1L))))
    input.addData(
      CdcChg(2, 1, "upsert", "STALE", 99), // seq 1 <= applied 2: ignored
      CdcChg(1, 5, "upsert", "a2", 11))
    q.processAllAvailable()
    q.stop()
    assert(snap() == Map(
      1L -> (("a2", 11, 5L)), 2L -> (("b2", 21, 2L)),
      5L -> (("e", 50, 1L))))
    // no merge debris next to the snapshot after the swaps
    val leftovers = new java.io.File(base.toString).list().toSet
    assert(leftovers == Set("snap", "ckpt"), leftovers.toString)
  }

  test("applyChangesStream bucketed mode: per-batch rewrites touch " +
       "only the changed keys' buckets, stale replays skip the " +
       "rewrite, untouched bucket files stay bit-stable") {
    import graft.sources.Layout
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-cdc-bstream")
    val snapPath = base.resolve("snap").toString
    val nBuckets = 16
    // a wide initial snapshot (seq INCLUDED — the stale-guard
    // contract), so most buckets stay untouched by the tiny deltas
    val init = (0L until 400L).map(i => (i, s"v$i", i.toInt, 0L))
      .toDF("id", "s", "v", "seq")
    Layout.writeBucketedSnapshot(init, snapPath, Seq("id"), nBuckets)
    def files(): Map[String, Set[(String, Long, Long)]] =
      new java.io.File(snapPath).listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().filter(_.isFile)
          .map(f => (f.getName, f.length, f.lastModified)).toSet)
        .toMap
    val before = files()
    val input = MemoryStream[CdcChg]
    val q = StreamOps.applyChangesStream(input.toDF(), snapPath,
      Seq("id"), base.resolve("ck").toString,
      nBuckets = Some(nBuckets))
    input.addData(
      CdcChg(7, 1, "upsert", "seven", 77),
      CdcChg(401, 1, "upsert", "new", 1),
      CdcChg(9, 1, "delete", null, 0))
    q.processAllAvailable()
    val afterB1 = files()
    // a fully-stale replay batch: nothing rewritten at all
    input.addData(CdcChg(7, 1, "upsert", "STALE", 0))
    q.processAllAvailable()
    q.stop()
    assert(files() == afterB1, "stale batch rewrote something")
    // untouched directories from before batch 1 are bit-stable
    val changedDirs = afterB1.keySet.filter(d =>
      before.get(d) != afterB1.get(d))
    assert(changedDirs.nonEmpty && changedDirs.size <= 3,
      changedDirs.toString)
    for ((d, fs) <- before if !changedDirs.contains(d))
      assert(afterB1(d) == fs, s"untouched $d was rewritten")
    // content: update applied once, stale ignored, delete dropped,
    // insert present
    val got = s.read.parquet(snapPath).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("s"), r.getAs[Long]("seq")))).toMap
    assert(got(7L) == (("seven", 1L)))
    assert(got(401L) == (("new", 1L)))
    assert(!got.contains(9L) && got.size == 400)
  }

  test("merge_stream_snapshot: the CDC sink runs from a pure-JSON " +
       "streaming job config") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-cdc-cfg")
    val snapPath = base.resolve("snap").toString
    val srcDir = base.resolve("in").toString
    Seq((1L, "a", 10, 0L), (2L, "b", 20, 0L))
      .toDF("id", "s", "v", "seq")
      .coalesce(1).write.parquet(snapPath)
    // a parquet-file change stream: drop one change file in
    Seq(CdcChg(2, 3, "upsert", "b2", 22), CdcChg(4, 1, "upsert", "d", 40))
      .toDF().coalesce(1).write.parquet(srcDir)
    val q = Pipeline.startStreamJson(s,
      s"""[
         |  {"op": "read_stream_parquet",
         |   "params": {"path": "$srcDir", "schema":
         |     "id BIGINT, seq BIGINT, op STRING, s STRING, v INT"}},
         |  {"op": "merge_stream_snapshot",
         |   "params": {"snapshot_path": "$snapPath",
         |              "checkpoint": "${base.resolve("ck")}",
         |              "key_cols": ["id"]}}
         |]""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val got = s.read.parquet(snapPath).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("s")).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 4L -> "d"))
  }

  test("appendIvfIndexStream grows the persisted vector store: " +
       "exact-regime probes equal brute force over the full corpus; " +
       "re-sent ids are no-ops") {
    import graft.operators.Similarity
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val emb = s.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").limit(120).cache()
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-stream")
    val idx = base.resolve("idx").toString
    val centroids = Similarity.buildIvfIndex(
      emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      idx, nlist = 4, lloydIters = 1)
    val rest = emb.filter(col("vec_id") % 3 =!= 0).collect().map(r =>
      VecRow(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[VecRow]
    val q = StreamOps.appendIvfIndexStream(input.toDF(), idx,
      centroids, base.resolve("ck").toString)
    input.addData(rest.take(40).toSeq: _*)
    q.processAllAvailable()
    input.addData(rest.drop(40).toSeq: _*)
    q.processAllAvailable()
    input.addData(rest.take(10).toSeq: _*) // replay: must not duplicate
    q.processAllAvailable()
    q.stop()
    val queries = emb.filter(col("vec_id") % 17 === 0)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"),
        math.round(r.getAs[Double]("cosine") * 1e6))).toSet
    // nprobe = nlist is the exact regime: the grown index must agree
    // with brute force over ALL 120 vectors
    val viaIndex = norm(Similarity.ivfTopKIndexed(idx, centroids,
      queries, "vec_id", "embedding", k = 5, nprobe = 4))
    val brute = norm(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    assert(viaIndex == brute && viaIndex.nonEmpty)
    // no duplicate neighbor rows from the replayed batch
    val n = s.read.parquet(idx).count()
    val distinctIds = s.read.parquet(idx)
      .select("neighbor_id").distinct().count()
    assert(n == distinctIds)
  }

  test("appendSignaturesStream grows the LSH store duplicate-free " +
       "through replays and heals the orphan-shingle crash window; " +
       "probes equal a directly-built store") {
    import graft.operators.Dedup
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = s.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(90).cache()
    val base = java.nio.file.Files
      .createTempDirectory("graft-sig-stream")
    val store = base.resolve("store").toString
    val direct = base.resolve("direct").toString
    Dedup.writeBandSignatures(docs, "doc_id", "text", direct,
      n = 3, numHashes = 64, bands = 32)
    Dedup.writeBandSignatures(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", store, n = 3, numHashes = 64, bands = 32)
    val restDf = docs.filter(col("doc_id") % 3 =!= 0)
    val rest = restDf.collect().map(r =>
      LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    // simulate the mid-append crash: one incoming doc already has its
    // shingle row (copied from the sound direct store) but no bands
    val orphanId = rest.head.doc_id
    val orphanRow = s.read.parquet(s"$direct/shingles")
      .filter(col("id") === orphanId)
    assert(orphanRow.count() == 1)
    orphanRow.write.mode("append").parquet(s"$store/shingles")
    val input = MemoryStream[LangDoc]
    val q = StreamOps.appendSignaturesStream(input.toDF(), store,
      base.resolve("ck").toString)
    input.addData(rest.take(30).toSeq: _*)
    q.processAllAvailable()
    input.addData(rest.drop(30).toSeq: _*)
    q.processAllAvailable()
    input.addData(rest.take(10).toSeq: _*) // replay: no duplicates
    q.processAllAvailable()
    q.stop()
    // duplicate-free and complete: every doc exactly one shingle row,
    // bands ids == shingles ids == the full corpus (orphan healed)
    val shingleIds = s.read.parquet(s"$store/shingles")
      .groupBy("id").count().collect()
    assert(shingleIds.forall(_.getLong(1) == 1))
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shingleIds.map(_.getLong(0)).toSet == allIds)
    assert(s.read.parquet(s"$store/bands").select("id").distinct()
      .collect().map(_.getLong(0)).toSet == allIds)
    // probes against the grown store == against the directly-built one
    val probe = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id") + 1000000L as "doc_id",
        concat(col("text"), lit(" tail")).as("text"))
    def pairs(p: String) = Dedup
      .minHashLshPairsAgainstStore(probe, p, "doc_id", "text", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(pairs(store) == pairs(direct) && pairs(store).nonEmpty)
  }

  test("profileShardsStream: per-micro-batch mergeable shards — the " +
       "merged profile equals one batch pass over all ingested rows") {
    import graft.operators.Stats
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-prof-stream")
    val shards = base.resolve("shards").toString
    val docs = s.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(80)
    val rows = docs.collect().map(r =>
      LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[LangDoc]
    val q = StreamOps.profileShardsStream(input.toDF(), shards,
      base.resolve("ck").toString, Seq("doc_id"), Seq("lang"))
    input.addData(rows.take(30).toSeq: _*)
    q.processAllAvailable()
    input.addData(rows.drop(30).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    def prof(path: String) = Stats
      .profileFromShards(s, path, Seq("doc_id")).collect()
      .map(r => r.toSeq.map(String.valueOf).mkString("|")).toSet
    val direct = base.resolve("direct").toString
    Stats.writeProfileShards(docs, direct, Seq("doc_id"), Seq("lang"))
    assert(prof(shards) == prof(direct) && prof(shards).nonEmpty)
  }

  test("cardinalityShardsStream: per-micro-batch register shards — " +
       "values RE-SEEN across batches collapse by max-merge, so the " +
       "merged estimate equals one batch pass over the distinct rows") {
    import graft.operators.Stats
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-card-stream")
    val shards = base.resolve("shards").toString
    val docs = s.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(80)
    val rows = docs.collect().map(r =>
      LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[LangDoc]
    val q = StreamOps.cardinalityShardsStream(input.toDF(), shards,
      base.resolve("ck").toString, Seq("doc_id", "lang"), Seq("lang"))
    // 20 docs arrive in BOTH micro-batches: a per-batch
    // count(DISTINCT) sum would double-count them
    input.addData(rows.take(50).toSeq: _*)
    q.processAllAvailable()
    input.addData(rows.drop(30).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    def card(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val merged = card(Stats.cardinalityFromShards(s, shards,
      Seq("doc_id", "lang")))
    val direct = card(Stats.approxDistinct(docs, Seq("doc_id", "lang")))
    assert(merged == direct && merged.size == 2)
  }

  test("host_graph_windowed: the live host-graph config step — " +
       "closed windows carry the batch run of the same body (counts " +
       "exact, page distincts the same deterministic sketch)") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def row(id: Long, sN: Int, dN: Int, ts: String) =
      (id, s"https://site$sN.example.com/p$id",
        s"https://Dst$dN.example.org:443/x#frag",
        Timestamp.valueOf(ts))
    val w0 = Seq(row(1, 1, 1, "2024-01-01 00:05:00"),
      row(2, 1, 1, "2024-01-01 00:40:00"),
      row(2, 1, 2, "2024-01-01 00:45:00"),
      (9L, "notaurl", "https://d.example.org/",
        Timestamp.valueOf("2024-01-01 00:50:00"))) // drops: bad src
    val w1 = Seq(row(3, 2, 1, "2024-01-01 01:10:00"))
    val cfg =
      """[{"op": "host_graph_windowed",
        |  "params": {"watermark_delay": "30 minutes",
        |             "src_col": "src_url",
        |             "dst_url_col": "href_abs"}}]""".stripMargin
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val out = Pipeline.fromJsonStreaming(cfg)(
      input.toDF().toDF("doc_id", "src_url", "href_abs", "ts"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cfg_hg")
      .outputMode("append").start()
    input.addData(w0: _*); q.processAllAvailable()
    input.addData(w1: _*); q.processAllAvailable()
    input.addData(row(8, 6, 6, "2024-01-01 12:00:00"))
    q.processAllAvailable()
    input.addData(row(8, 6, 6, "2024-01-01 13:00:00"))
    q.processAllAvailable()
    q.stop()
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getString(2), r.getLong(3), r.getLong(4))).toSet
    val got = shape(s.sql("select * from cfg_hg where window_start " +
      "< timestamp '2024-01-01 02:00:00'"))
    // the batch run of the SAME config body over the closed windows'
    // rows (withWatermark is a no-op on a batch frame)
    val batch = shape(Pipeline.fromJson(cfg)(
      (w0 ++ w1).toDF("doc_id", "src_url", "href_abs", "ts"))
      .filter(col("window_start") <
        lit(Timestamp.valueOf("2024-01-01 02:00:00"))))
    assert(got == batch && got.nonEmpty)
    // the hostOf grammar did its work: port + fragment stripped,
    // lowercased; the bad-src edge dropped
    assert(got.map(_._2).subsetOf(
      Set("site1.example.com", "site2.example.com")))
    assert(got.map(_._3).subsetOf(
      Set("dst1.example.org", "dst2.example.org")))
    // window-0 site1 -> dst1 has two links from two pages
    assert(got.exists(r => r._2 == "site1.example.com" &&
      r._3 == "dst1.example.org" && r._4 == 2L))
  }

  test("quantileShardsStream: per-micro-batch GK shards — merged " +
       "percentiles equal one batch pass over all ingested rows") {
    import graft.operators.Stats
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-quant-stream")
    val shards = base.resolve("shards").toString
    val docs = s.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text").limit(80)
    val rows = docs.collect().map(r =>
      LangDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[LangDoc]
    val q = StreamOps.quantileShardsStream(
      input.toDF().withColumn("score", col("doc_id") % 97),
      shards, base.resolve("ck").toString, "score", Seq("lang"))
    input.addData(rows.take(30).toSeq: _*)
    q.processAllAvailable()
    input.addData(rows.drop(30).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val qs = Seq(0.1, 0.5, 0.9)
    def quant(path: String) = Stats.quantilesFromShards(s, path, qs)
      .collect().map(r => r.toSeq.map(String.valueOf).mkString("|"))
      .toSet
    val direct = base.resolve("direct").toString
    Stats.writeQuantileShards(
      docs.withColumn("score", col("doc_id") % 97), direct,
      "score", Seq("lang"))
    assert(quant(shards) == quant(direct) && quant(shards).nonEmpty)
  }

  test("mergeSearchIndexStream folds a document stream into the " +
       "persisted BM25 index: probes equal a directly-built index " +
       "over the union; re-sent ids are no-ops") {
    import graft.operators.TextSearch
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = s.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(60).cache()
    val base = java.nio.file.Files
      .createTempDirectory("graft-idx-stream")
    val idx = base.resolve("idx").toString
    val initial = docs.filter(col("doc_id") % 3 === 0)
    TextSearch.writeSearchIndex(initial, idx)
    val input = MemoryStream[LangDoc]
    val q = StreamOps.mergeSearchIndexStream(
      input.toDF().select(col("doc_id"), col("text")), idx,
      base.resolve("ck").toString)
    val rows = docs.collect().map(r =>
      LangDoc(r.getLong(0), "en", r.getString(1)))
    val batch1 = rows.filter(_.doc_id % 3 == 1)
    val batch2 = rows.filter(_.doc_id % 3 == 2)
    input.addData(batch1.toSeq: _*)
    q.processAllAvailable()
    input.addData(batch2.toSeq: _*)
    q.processAllAvailable()
    // replay: same ids again — must be a no-op, not a corrupt merge
    input.addData(batch1.take(5).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val queries = Seq((0L, "spark join fast"), (1L, "customer order"))
      .toDF("query_id", "qtext")
    val direct = base.resolve("direct").toString
    TextSearch.writeSearchIndex(docs, direct)
    def top(path: String) = TextSearch
      .bm25FromIndex(s, path, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).toSet
    assert(top(idx) == top(direct) && top(idx).nonEmpty)
    val leftovers = new java.io.File(base.toString).list().toSet
    assert(leftovers == Set("idx", "ck", "direct"), leftovers.toString)
  }

  test("windowed_stats_watermarked: a STATEFUL step from pure config " +
       "— append-mode finalized windows == batch windowed_stats on " +
       "the same rows; missing watermark stays non-streamable") {
    import graft.operators.{Events, Pipeline}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val cfg =
      """[{"op": "windowed_stats_watermarked",
        |  "params": {"watermark_delay": "30 minutes",
        |             "window_length": "1 hour"}}]""".stripMargin
    val input = MemoryStream[Ev]
    val out = Pipeline.fromJsonStreaming(cfg)(input.toDF())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cfg_win")
      .outputMode("append").start()
    val early = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 00:05:00"), 7, "click", 1.5),
      Ev(2, Timestamp.valueOf("2024-01-01 00:55:00"), 7, "click", 2.0),
      Ev(3, Timestamp.valueOf("2024-01-01 01:05:00"), 8, "view", 3.0))
    input.addData(early: _*)
    q.processAllAvailable()
    // push the watermark past hour-0 and hour-1: both finalize
    val late = Seq(
      Ev(4, Timestamp.valueOf("2024-01-01 05:00:00"), 9, "view", 4.0))
    input.addData(late: _*)
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select window_start, event_type, n_events, " +
        "sum_value from cfg_win").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    // the batch run of the SAME config body over the finalized rows
    val batchDf = (early).toDF()
    val batch = Pipeline.fromJson(cfg)(batchDf).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch && got.nonEmpty)
    // and the config body IS Events.windowedStats on a batch frame
    // (withWatermark is a no-op in batch)
    val direct = Events.windowedStats(batchDf, "ts", "1 hour")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(batch == direct)
    // the UNwatermarked aggregate stays rejected by name
    val e = intercept[IllegalArgumentException] {
      Pipeline.fromJsonStreaming(
        """[{"op": "windowed_stats"}]""")
    }
    assert(e.getMessage.contains("not streamable") &&
      e.getMessage.contains("windowed_stats_watermarked"))
  }

  test("fromStepsStreaming rejects non-deterministic SQL in filter/" +
       "with_column eagerly (micro-batch retries would emit " +
       "divergent rows); deterministic expressions still compile") {
    import graft.operators.Pipeline
    val nd = intercept[IllegalArgumentException] {
      Pipeline.fromStepsStreaming(Seq(
        Pipeline.Step("with_column",
          Map("name" -> "r", "expr" -> "rand(42)"))))
    }
    assert(nd.getMessage.contains("non-deterministic") &&
      nd.getMessage.contains("rand"))
    val ndFilter = intercept[IllegalArgumentException] {
      Pipeline.fromStepsStreaming(Seq(
        Pipeline.Step("filter",
          Map("condition" -> "uuid() > 'a' OR length(text) > 3"))))
    }
    assert(ndFilter.getMessage.contains("uuid"))
    // nested inside a deterministic wrapper is still caught
    val nested = intercept[IllegalArgumentException] {
      Pipeline.fromStepsStreaming(Seq(
        Pipeline.Step("with_column",
          Map("name" -> "b", "expr" -> "abs(randn() * 2)"))))
    }
    assert(nested.getMessage.contains("randn"))
    // deterministic expressions (incl. hash-derived sampling, the
    // recommended substitute) compile fine
    Pipeline.fromStepsStreaming(Seq(
      Pipeline.Step("with_column",
        Map("name" -> "h", "expr" -> "abs(hash(text)) % 100")),
      Pipeline.Step("filter",
        Map("condition" -> "h < 50 AND upper(lang) = 'EN'"))))
    // batch compile is untouched: rand() is legal in fromSteps
    Pipeline.fromSteps(Seq(
      Pipeline.Step("with_column",
        Map("name" -> "r", "expr" -> "rand(42)"))))
  }

  test("windowed_quantiles_watermarked: the second STATEFUL config " +
       "step — closed windows from pure JSON carry the exact batch " +
       "quantiles") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ev = graft.sources.Sources.events(s, "/root/testdata/sf0.001")
      .limit(200).select("event_id", "event_type", "ts", "value")
    val rows = ev.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), r.getDouble(3)))
    val qs = Seq(0.5, 0.99)
    val batch = graft.operators.Stats.quantileStats(
        ev.withColumn("w", window(col("ts"), "6 hours"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("value")),
        "value", qs, groupCols = Seq("window_start", "event_type"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getDouble(2)) -> r.getDouble(3)).toMap
    val cfg =
      """[{"op": "windowed_quantiles_watermarked",
        |  "params": {"watermark_delay": "30 days",
        |             "qs": [0.5, 0.99],
        |             "window_length": "6 hours",
        |             "group_cols": ["event_type"]}}]""".stripMargin
    val input = MemoryStream[(Long, String, Timestamp, Double)]
    val out = Pipeline.fromJsonStreaming(cfg)(
      input.toDF().toDF("event_id", "event_type", "ts", "value"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cfg_wq")
      .outputMode("append").start()
    (0 until 2).foreach { c =>
      input.addData(rows.filter(_._1 % 2 == c.toLong).toSeq: _*)
      q.processAllAvailable()
    }
    input.addData((900L, "zz",
      Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
    q.processAllAvailable()
    input.addData((901L, "zz",
      Timestamp.valueOf("2030-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
        "select * from cfg_wq where event_type <> 'zz'").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(streamed == batch && streamed.nonEmpty)
    // the unwatermarked quantile aggregate has no config spelling at
    // all: the registry only admits the watermarked form
    val e = intercept[IllegalArgumentException] {
      Pipeline.fromJsonStreaming(
        """[{"op": "windowed_quantiles"}]""")
    }
    assert(e.getMessage.contains("unknown op") ||
      e.getMessage.contains("not streamable"))
  }

  test("trending_tokens_watermarked: the third STATEFUL config step " +
       "— per-window top-k from pure JSON equals the direct " +
       "operator's exact-regime ranking") {
    import graft.operators.Pipeline
    import graft.streaming.StreamOps.{StreamDoc, TrendOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def d(id: Long, ts: String, text: String) =
      StreamDoc(id, text, Timestamp.valueOf(ts))
    val w0 = Seq(d(1, "2024-01-01 00:05:00", "alpha alpha beta"),
      d(2, "2024-01-01 00:40:00", "alpha gamma beta"))
    val w1 = Seq(d(3, "2024-01-01 01:10:00", "burst burst burst alpha"),
      d(4, "2024-01-01 01:50:00", "burst delta"))
    val cfg =
      """[{"op": "trending_tokens_watermarked",
        |  "params": {"watermark_delay": "30 minutes",
        |             "window_seconds": 3600, "top_k": 3}}]""".stripMargin
    val input = MemoryStream[StreamDoc]
    val out = Pipeline.fromJsonStreaming(cfg)(input.toDF())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cfg_trend")
      .outputMode("append").start()
    input.addData(w0: _*); q.processAllAvailable()
    input.addData(w1: _*); q.processAllAvailable()
    input.addData(d(9, "2024-01-01 12:00:00", "x"))
    q.processAllAvailable()
    input.addData(d(9, "2024-01-01 13:00:00", "x"))
    q.processAllAvailable()
    q.stop()
    val got = s.sql("select * from cfg_trend where window_start < " +
        "timestamp '2024-01-01 02:00:00'")
      .as[TrendOut].collect()
      .groupBy(_.window_start.toString)
      .map { case (k, v) => k -> v.sortBy(_.rank)
        .map(o => (o.rank, o.token, o.cnt)).toSeq }
    assert(got("2024-01-01 00:00:00.0") ==
      Seq((1, "alpha", 3L), (2, "beta", 2L), (3, "gamma", 1L)))
    assert(got("2024-01-01 01:00:00.0") ==
      Seq((1, "burst", 4L), (2, "alpha", 1L), (3, "delta", 1L)))
    assert(got.size == 2)
  }

  test("sessionize_watermarked: the stateful sessionization config " +
       "step equals the direct sessionizeStream on the same feed") {
    import graft.operators.Pipeline
    import graft.streaming.StreamOps.{SessionEvent, SessionOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, id: Long, ts: String) =
      SessionEvent(u, id, Timestamp.valueOf(ts))
    val feed = Seq(
      Seq(ev(7, 1, "2024-01-01 00:00:00"), ev(7, 2, "2024-01-01 00:10:00")),
      Seq(ev(7, 3, "2024-01-01 02:00:00"), ev(8, 4, "2024-01-01 02:05:00")),
      Seq(ev(9, 9, "2024-01-01 20:00:00")),
      Seq(ev(9, 10, "2024-01-02 09:00:00")))
    def run(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame, name: String) = {
      val input = MemoryStream[SessionEvent]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      feed.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.sql(s"select * from $name").as[SessionOut].collect().toSet
    }
    val cfg = Pipeline.fromJsonStreaming(
      """[{"op": "sessionize_watermarked",
        |  "params": {"watermark_delay": "0 seconds",
        |             "gap_seconds": 1800}}]""".stripMargin)
    val viaCfg = run(cfg, "cfg_sess")
    val direct = run(df => graft.streaming.StreamOps.sessionizeStream(
      df.withWatermark("ts", "0 seconds").as[SessionEvent],
      1800L).toDF(), "direct_sess")
    assert(viaCfg == direct && viaCfg.nonEmpty)
    // batch-parity anchor: user 7's closed first session is right
    assert(viaCfg.exists(o => o.user_id == 7 && o.n_events == 2))
  }

  test("first_seen_flags_watermarked + drop_duplicates_watermarked: " +
       "streaming dedup by key — deterministic first-seen flags " +
       "(arrival order, in-batch tiebreak), state expiry at " +
       "watermark + retention, batch twin = row_number order, and " +
       "composition with the gated contract quarantines duplicates") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(id: Long, u: Long, ts: String) =
      Ev(id, Timestamp.valueOf(ts), u, "t", 0.0)
    // u=1 duplicated within batch 1 (tiebreak by (ts, event_id)) AND
    // again in batch 2 — the 2 s watermark delay keeps u=1's state
    // alive across the batch boundary (with delay 0 the watermark
    // passes its newest occurrence immediately and the batch-2 copy
    // would legitimately count as first again); u=2 once; u=3
    // arrives in batch 2, then its state EXPIRES (batch 3 advances
    // the watermark hours past its ts + retention 0) and a
    // re-arrival in batch 5 is first again
    val batches = Seq(
      Seq(ev(11, 1, "2024-01-01 00:00:02"),
        ev(10, 1, "2024-01-01 00:00:01"),
        ev(20, 2, "2024-01-01 00:00:03")),
      Seq(ev(12, 1, "2024-01-01 00:00:04"),
        ev(30, 3, "2024-01-01 00:00:05")),
      Seq(ev(40, 4, "2024-01-01 09:00:00")), // advances the watermark
      Seq(ev(41, 4, "2024-01-01 09:00:02")), // u=3 timer fires here
      Seq(ev(31, 3, "2024-01-01 09:00:03"))) // u=3 re-arrival
    def runFlags(name: String): Map[Long, Boolean] = {
      val input = MemoryStream[Ev]
      val chain = Pipeline.fromJsonStreaming(
        """[{"op": "first_seen_flags_watermarked",
          |  "params": {"keys": ["user_id"],
          |             "watermark_delay": "2 seconds",
          |             "order_cols": ["ts", "event_id"]}}]"""
          .stripMargin)
      val q = chain(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.sql(s"select event_id, is_first from $name").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    val flags = runFlags("fsf_stream")
    assert(flags == Map(10L -> true, 11L -> false, 20L -> true,
      12L -> false, 30L -> true, 40L -> true, 41L -> false,
      31L -> true)) // state expired: first again
    // batch twin on batches 1+2 (no expiry in range): global
    // (ts, event_id) order first-per-key — equals the stream's flags
    // on the in-order feed
    val batchTwin = Pipeline.fromJson(
      """[{"op": "first_seen_flags_watermarked",
        |  "params": {"keys": ["user_id"],
        |             "watermark_delay": "2 seconds",
        |             "order_cols": ["ts", "event_id"]}}]"""
        .stripMargin)(batches.take(2).flatten.toDF())
      .select("event_id", "is_first").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batchTwin ==
      flags.view.filterKeys(Set(10L, 11L, 12L, 20L, 30L)).toMap)
    // drop_duplicates_watermarked keeps exactly one row per LIVE key
    // (delay 1 hour: no state evicts inside the two batches — a 0 s
    // delay would evict each key as soon as the watermark passes it)
    val input2 = MemoryStream[Ev]
    val dd = Pipeline.fromJsonStreaming(
      """[{"op": "drop_duplicates_watermarked",
        |  "params": {"keys": ["user_id"],
        |             "watermark_delay": "1 hour"}}]""".stripMargin)(
      input2.toDF())
    val q2 = dd.writeStream.format("memory").queryName("ddw_stream")
      .outputMode("append").start()
    batches.take(2).foreach { b =>
      input2.addData(b: _*); q2.processAllAvailable()
    }
    q2.stop()
    assert(s.sql("select user_id from ddw_stream").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // composition: first-seen flags + gated expect_condition =
    // duplicates QUARANTINED instead of silently dropped. The
    // TWO-QUERY gated compile must REJECT this shape: the per-gate
    // violation writer is an independent query that batches the
    // source differently, so the stateful flags could diverge
    // between the main chain and the quarantine writer (a row
    // silently lost or kept AND quarantined)
    val quar = java.nio.file.Files
      .createTempDirectory("graft-fsf-quar").toString
    val gatedCfg =
      s"""[{"op": "first_seen_flags_watermarked",
         |  "params": {"keys": ["user_id"],
         |             "watermark_delay": "2 seconds",
         |             "order_cols": ["ts", "event_id"]}},
         | {"op": "expect_condition",
         |  "params": {"condition": "is_first", "name": "unique_user",
         |             "quarantine_path": "$quar"}}]""".stripMargin
    val rejected = intercept[IllegalArgumentException] {
      Pipeline.fromJsonStreamingGated(gatedCfg)
    }
    assert(rejected.getMessage.contains("startGatedUnified") &&
      rejected.getMessage.contains("first_seen_flags_watermarked"))
    // ...and the UNIFIED runner handles it: ONE query, gate store
    // and survivors sink both fed from the same materialized batch
    val input3 = MemoryStream[Ev]
    val survivors = java.nio.file.Files
      .createTempDirectory("graft-fsf-out").toString
    val q3 = Pipeline.startGatedUnifiedJson(input3.toDF(), gatedCfg,
      survivors, java.nio.file.Files
        .createTempDirectory("graft-fsf-ck").toString)
    batches.take(2).foreach { b =>
      input3.addData(b: _*); q3.processAllAvailable()
    }
    q3.stop()
    assert(s.read.parquet(survivors).select("user_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(s.read.parquet(s"$quar/gate=unique_user")
      .select("event_id").collect().map(_.getLong(0)).toSet ==
      Set(11L, 12L))
    // survivors land per-micro-batch (batch=<id> partition dirs),
    // the replay-idempotent layout shared with the gate store
    assert(new java.io.File(survivors).listFiles()
      .map(_.getName).count(_.startsWith("batch=")) >= 2)
    // typo'd params on a GATED step throw at config time — the gate
    // bypasses compileStep but runs the same param-set validation
    val typo = intercept[IllegalArgumentException] {
      Pipeline.fromJsonStreamingGated(
        s"""[{"op": "expect_condition",
           |  "params": {"condition": "true", "name": "g",
           |             "quarantine_path": "$quar",
           |             "qurantine_pth": "oops"}}]""".stripMargin)
    }
    assert(typo.getMessage.contains("unknown params") &&
      typo.getMessage.contains("qurantine_pth"))
    // a colliding flag_col is rejected on BOTH faces (batch
    // withColumn would replace, stream schema.add would duplicate —
    // the two faces must agree, so neither is allowed)
    val collide = intercept[IllegalArgumentException] {
      Pipeline.fromJsonStreaming(
        """[{"op": "first_seen_flags_watermarked",
          |  "params": {"keys": ["user_id"],
          |             "watermark_delay": "2 seconds",
          |             "order_cols": ["ts", "event_id"],
          |             "flag_col": "user_id"}}]""".stripMargin)(
        batches.head.toDF())
    }
    assert(collide.getMessage.contains("already exists"))
  }

  test("startStreamStepsGatedUnified: a COMPLETE job config — file " +
       "stream source, stateful first-seen prefix, quarantine gate, " +
       "parquet survivors sink — runs as ONE query; survivors + " +
       "quarantined partition the input; non-parquet sinks reject") {
    import graft.operators.Pipeline
    val s = spark
    val base = java.nio.file.Files
      .createTempDirectory("graft-unified-cfg")
    // stage the real sf0.001 events shard as the stream directory
    val srcDir = java.nio.file.Files
      .createDirectory(base.resolve("src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      srcDir.resolve("events.parquet"))
    val quar = base.resolve("quar").toString
    val out = base.resolve("out").toString
    def cfg(sinkOp: String): String =
      s"""[{"op": "read_stream_parquet",
         |  "params": {"path": "$srcDir",
         |             "schema": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"}},
         | {"op": "first_seen_flags_watermarked",
         |  "params": {"keys": ["user_id"],
         |             "watermark_delay": "10 minutes",
         |             "order_cols": ["ts", "event_id"]}},
         | {"op": "expect_condition",
         |  "params": {"condition": "is_first", "name": "first_only",
         |             "quarantine_path": "$quar"}},
         | {"op": "select",
         |  "params": {"cols": ["event_id", "user_id"]}},
         | {"op": "$sinkOp",
         |  "params": ${
           if (sinkOp == "write_stream_parquet")
             s"""{"path": "$out", "checkpoint": "$base/ckpt"}"""
           else """{"name": "nope"}"""}}
         |]""".stripMargin
    // the runner owns the survivors write: only the parquet sink
    val badSink = intercept[IllegalArgumentException] {
      Pipeline.startStreamJsonGatedUnified(s, cfg("write_stream_memory"))
    }
    assert(badSink.getMessage.contains("write_stream_parquet"))
    val q = Pipeline.startStreamJsonGatedUnified(s,
      cfg("write_stream_parquet"))
    try q.processAllAvailable() finally q.stop()
    val surv = s.read.parquet(out)
    val dups = s.read.parquet(s"$quar/gate=first_only")
    val total = s.read.parquet(srcDir.toString)
    val nUsers = total.select("user_id").distinct().count()
    // one micro-batch over one shard ⇒ the flag is global
    // (ts, event_id)-order first-per-key: one survivor per user, and
    // survivors + quarantined partition the input exactly
    assert(surv.count() == nUsers)
    assert(surv.count() + dups.count() == total.count())
    assert(dups.filter("is_first").count() == 0)
    // survivors carry the post-gate SELECT's shape; quarantine holds
    // the at-gate row (flag column included)
    assert(surv.columns.toSet == Set("event_id", "user_id", "batch"))
    assert(dups.columns.contains("is_first"))
  }

  test("scd2_watermarked: the stateful SCD2 config step equals the " +
       "direct scd2Stream on the same out-of-order feed, with " +
       "arbitrary column names mapped into the event shape") {
    import graft.operators.Pipeline
    import graft.streaming.StreamOps.{Scd2Event, Scd2Out}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, id: Long, ts: String, v: String) =
      Scd2Event(u, id, Timestamp.valueOf(ts), v)
    val batches = Seq(
      Seq(ev(1, 3, "2024-01-01 02:00:00", "b"),
        ev(2, 20, "2024-01-01 01:00:00", "x")),
      Seq(ev(1, 1, "2024-01-01 00:00:00", "a"),
        ev(1, 5, "2024-01-01 04:00:00", "a"),
        ev(2, 22, "2024-01-01 05:00:00", "y")),
      Seq(ev(99, 999, "2024-01-05 00:00:00", "z")),
      Seq(ev(99, 998, "2024-01-06 00:00:00", "z")))
    def run(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame, name: String) = {
      val input = MemoryStream[Scd2Event]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.sql(s"select * from $name where user_id < 99")
        .as[Scd2Out].collect().toSet
    }
    // the config maps renamed columns back into the event shape
    val cfg = Pipeline.fromJsonStreaming(
      """[{"op": "scd2_watermarked",
        |  "params": {"watermark_delay": "24 hours",
        |             "key_col": "uid", "attr_col": "state",
        |             "ts_col": "ts", "tie_col": "eid"}}]""".stripMargin)
    val viaCfg = run(df => cfg(df.select(col("user_id").as("uid"),
      col("event_id").as("eid"), col("ts"),
      col("value").as("state"))), "cfg_scd2")
    val direct = run(df => graft.streaming.StreamOps.scd2Stream(
      df.withWatermark("ts", "24 hours").as[Scd2Event]).toDF(),
      "direct_scd2")
    assert(viaCfg == direct && viaCfg.nonEmpty)
  }

  test("stateful streaming tranche 4: funnel / gap_fill / " +
       "rolling_anomalies / decayed_activity / top_paths / " +
       "transition_pairs config steps equal their direct stream " +
       "operators on the same feeds") {
    import graft.operators.Pipeline
    import graft.streaming.StreamOps
    import StreamOps.{AnomEvent, FunnelEvent, Scd2Event}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    var n = 0
    def run[T <: Product : org.apache.spark.sql.Encoder](
        feed: Seq[Seq[T]],
        mk: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame,
        mode: String): Set[Seq[Any]] = {
      n += 1
      val name = s"t4_$n"
      val input = MemoryStream[T]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode(mode).start()
      feed.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.sql(s"select * from $name").collect().map(_.toSeq.map {
        case null => null
        case v => v
      }).toSet
    }
    def ts(t: String) = Timestamp.valueOf(t)
    def both[T <: Product : org.apache.spark.sql.Encoder](
        feed: Seq[Seq[T]], cfgJson: String,
        direct: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame,
        mode: String = "append"): Unit = {
      val viaCfg = run(feed, Pipeline.fromJsonStreaming(cfgJson), mode)
      val viaDirect = run(feed, direct, mode)
      assert(viaCfg == viaDirect && viaCfg.nonEmpty, cfgJson)
    }
    // funnel: signup -> purchase within the hour, plus sentinels
    val funnelFeed = Seq(
      Seq(FunnelEvent(1, "signup", ts("2024-01-01 00:00:00")),
        FunnelEvent(1, "purchase", ts("2024-01-01 00:30:00")),
        FunnelEvent(2, "signup", ts("2024-01-01 00:10:00"))),
      Seq(FunnelEvent(9, "signup", ts("2024-01-03 00:00:00"))),
      Seq(FunnelEvent(9, "signup", ts("2024-01-05 00:00:00"))))
    both(funnelFeed,
      """[{"op": "funnel_watermarked",
        |  "params": {"watermark_delay": "30 minutes",
        |             "steps": ["signup", "purchase"],
        |             "window_seconds": 3600}}]""".stripMargin,
      df => StreamOps.funnelStream(
        df.withWatermark("ts", "30 minutes").as[FunnelEvent],
        Seq("signup", "purchase"), 3600L).toDF())
    // the (user, id, ts, value) feed serves gap_fill / anomalies /
    // decayed activity
    val valFeed = Seq(
      Seq(AnomEvent(7, 1, ts("2024-01-01 00:00:00"), 10.0),
        AnomEvent(7, 2, ts("2024-01-01 06:30:00"), 16.0),
        AnomEvent(7, 3, ts("2024-01-01 13:00:00"), 100.0)),
      Seq(AnomEvent(9, 9, ts("2024-01-04 00:00:00"), 1.0)),
      Seq(AnomEvent(9, 10, ts("2024-01-08 00:00:00"), 1.0)))
    both(valFeed,
      """[{"op": "gap_fill_watermarked",
        |  "params": {"watermark_delay": "1 hour",
        |             "period_seconds": 21600}}]""".stripMargin,
      df => StreamOps.gapFillStream(
        df.withWatermark("ts", "1 hour").as[StreamOps.GapEvent],
        21600L).toDF())
    both(valFeed,
      """[{"op": "rolling_anomalies_watermarked",
        |  "params": {"watermark_delay": "1 hour",
        |             "n_prior": 2, "min_prior": 2,
        |             "z_threshold": 1.0}}]""".stripMargin,
      df => StreamOps.rollingAnomaliesStream(
        df.withWatermark("ts", "1 hour").as[AnomEvent],
        2, 2, 1.0).toDF())
    both(valFeed,
      """[{"op": "decayed_activity_watermarked",
        |  "params": {"watermark_delay": "1 hour",
        |             "max_events": 4}}]""".stripMargin,
      df => StreamOps.decayedActivityStream(
        df.withWatermark("ts", "1 hour").as[AnomEvent],
        4).toDF(),
      mode = "update") // the operator REFRESHES per-user scores
    // the typed (user, id, ts, value) path feed serves top_paths /
    // transition_pairs; the config maps event_type into the shape
    val pathFeed = Seq(
      Seq(Scd2Event(1, 1, ts("2024-01-01 00:00:00"), "view"),
        Scd2Event(1, 2, ts("2024-01-01 00:05:00"), "click"),
        Scd2Event(1, 3, ts("2024-01-01 00:10:00"), "purchase"),
        Scd2Event(1, 4, ts("2024-01-01 00:15:00"), "view")),
      Seq(Scd2Event(9, 9, ts("2024-01-04 00:00:00"), "view")),
      Seq(Scd2Event(9, 10, ts("2024-01-08 00:00:00"), "view")))
    val pathCfgIn: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame =
      df => df.select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("event_type"))
    both(pathFeed,
      """[{"op": "top_paths_watermarked",
        |  "params": {"watermark_delay": "1 hour", "k": 3,
        |             "type_col": "value"}}]""".stripMargin,
      df => StreamOps.topPathsStream(
        df.withWatermark("ts", "1 hour").as[Scd2Event], 3).toDF())
    both(pathFeed,
      """[{"op": "transition_pairs_watermarked",
        |  "params": {"watermark_delay": "1 hour",
        |             "type_col": "value"}}]""".stripMargin,
      df => StreamOps.transitionPairsStream(
        df.withWatermark("ts", "1 hour").as[Scd2Event]).toDF())
  }

  test("kl_drift_watermarked: the stateful drift config step scores " +
       "closed windows against the persisted reference exactly like " +
       "the direct klDriftStream") {
    import graft.operators.Pipeline
    import graft.streaming.StreamOps.{DriftEvent, DriftOut}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val refPath = java.nio.file.Files
      .createTempDirectory("graft-cfg-kl").toString + "/ref"
    s.sql("""select * from values ('en'), ('en'), ('en'), ('de'),
            |  ('fr') as t(category)""".stripMargin)
      .write.parquet(refPath)
    def ev(ts: String, c: String) = DriftEvent(Timestamp.valueOf(ts), c)
    val feed = Seq(
      Seq(ev("2024-01-01 00:05:00", "en"), ev("2024-01-01 00:20:00", "de"),
        ev("2024-01-01 00:50:00", "en"), ev("2024-01-01 00:10:00", "fr")),
      Seq(ev("2024-01-01 01:30:00", "de"), ev("2024-01-01 01:05:00", "de"),
        ev("2024-01-01 01:55:00", "zz")),
      Seq(ev("2024-01-01 12:00:00", "en")),
      Seq(ev("2024-01-01 13:00:00", "en")))
    def run(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame, name: String) = {
      val input = MemoryStream[DriftEvent]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      feed.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.sql(s"select * from $name where window_start < " +
          "timestamp '2024-01-01 02:00:00'")
        .as[DriftOut].collect().toSet
    }
    val cfg = Pipeline.fromJsonStreaming(
      s"""[{"op": "kl_drift_watermarked",
         |  "params": {"watermark_delay": "30 minutes",
         |             "reference_path": "$refPath",
         |             "window_seconds": 3600}}]""".stripMargin)
    val viaCfg = run(cfg, "cfg_kl")
    val direct = run(df => graft.streaming.StreamOps.klDriftStream(
      df.withWatermark("ts", "30 minutes").as[DriftEvent],
      s.read.parquet(refPath), windowSeconds = 3600L).toDF(),
      "direct_kl")
    assert(viaCfg == direct && viaCfg.size == 2)
  }

  test("stateful streaming tranche 5: asof_join_watermarked / " +
       "range_join_watermarked split ONE stream by condition and " +
       "equal their direct operators on the same out-of-order feed") {
    import graft.operators.Pipeline
    import graft.streaming.StreamOps.{LeftEvent, RightEvent}
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def t(ts: String) = Timestamp.valueOf(ts)
    // one interleaved feed: rights land before AND after their lefts
    val feed: Seq[Seq[(Long, Long, Timestamp, String)]] = Seq(
      Seq((1L, 10L, t("2024-01-01 01:00:00"), "purchase"),
        (1L, 100L, t("2024-01-01 00:30:00"), "click")),
      Seq((1L, 11L, t("2024-01-01 03:00:00"), "purchase"),
        (2L, 20L, t("2024-01-01 02:00:00"), "purchase")),
      Seq((1L, 101L, t("2024-01-01 02:30:00"), "click"),
        (2L, 200L, t("2024-01-01 01:45:00"), "click")),
      Seq((99L, 999L, t("2024-01-05 00:00:00"), "purchase"),
        (99L, 998L, t("2024-01-05 00:00:00"), "click")))
    def run(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame, name: String): Set[String] = {
      val in = MemoryStream[(Long, Long, Timestamp, String)]
      val q = mk(in.toDF()
          .toDF("user_id", "event_id", "ts", "event_type"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      feed.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.sql(s"select * from $name where user_id < 99")
        .collect().map(_.mkString("|")).toSet
    }

    val asofCfg = Pipeline.fromJsonStreaming(
      """[{"op": "asof_join_watermarked",
        |  "params": {"left_condition": "event_type = 'purchase'",
        |             "right_condition": "event_type = 'click'",
        |             "watermark_delay": "24 hours"}}]""".stripMargin)
    val asofDirect = (df: org.apache.spark.sql.DataFrame) => {
      val l = df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
        .as[LeftEvent]
      val r = df.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("right_id"),
          col("ts"))
        .as[RightEvent]
      StreamOps.asOfJoinStream(l, r, "24 hours").toDF()
    }
    val a1 = run(asofCfg, "cfg_asof_join")
    val a2 = run(asofDirect, "direct_asof_join")
    assert(a1 == a2 && a1.nonEmpty)

    val rangeCfg = Pipeline.fromJsonStreaming(
      """[{"op": "range_join_watermarked",
        |  "params": {"left_condition": "event_type = 'purchase'",
        |             "right_condition": "event_type = 'click'",
        |             "lower_seconds": 3600, "upper_seconds": 0,
        |             "watermark_delay": "24 hours"}}]""".stripMargin)
    val rangeDirect = (df: org.apache.spark.sql.DataFrame) =>
      StreamOps.rangeJoinStream(
        df.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        df.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("right_id")),
        "user_id", "ts", 3600, 0,
        Seq("event_id"), Seq("right_id"), "24 hours")
    val r1 = run(rangeCfg, "cfg_range_join")
    val r2 = run(rangeDirect, "direct_range_join")
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("stream-static enrichment through the config registry: " +
       "join_table (broadcast dim) + bloom_join equal the batch twin " +
       "on the union of all micro-batches") {
    import graft.operators.Pipeline
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_dim").toString + "/dim.parquet"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "label")
      .write.mode("overwrite").parquet(dimPath)
    val json =
      s"""[{"op": "join_table",
         |  "params": {"path": "$dimPath", "on": ["k"],
         |             "broadcast": true}},
         | {"op": "bloom_join",
         |  "params": {"path": "$dimPath",
         |             "right_filter": "label != 'c'",
         |             "right_renames": [["k", "k2"],
         |                               ["label", "label2"]],
         |             "fact_key": "k", "dim_key": "k2"}},
         | {"op": "select",
         |  "params": {"cols": ["k", "v", "label", "label2"]}}
         |]""".stripMargin
    val rows =
      Seq((1L, 0.5), (2L, 1.5), (3L, 2.5), (9L, 9.9), (1L, 3.5))
    val cfg = Pipeline.fromJsonStreaming(json)
    val in = MemoryStream[(Long, Double)]
    val q = cfg(in.toDF().toDF("k", "v")).writeStream
      .format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    in.addData(rows.take(4): _*); q.processAllAvailable()
    in.addData(rows.drop(4): _*); q.processAllAvailable()
    q.stop()
    val got = s.sql("select * from ss_enrich")
      .collect().map(_.mkString("|")).toSet
    val batch = Pipeline.fromJson(json)(rows.toDF("k", "v"))
      .collect().map(_.mkString("|")).toSet
    assert(got == batch && got.nonEmpty)
    // k=9 never matched the dim; k=3 fell to the blooms' dim filter
    assert(!got.exists(_.startsWith("9|")) &&
      !got.exists(_.startsWith("3|")))
  }
}
