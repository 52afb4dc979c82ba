package graft

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Structured Streaming behavior: the parity engine is a stateless
  * projection and runs unchanged on streams; stateful ops are watermarked. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                        event_type: String, value: Double)

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

  test("dedupByKey drops late duplicates within the watermark horizon") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamOps.dedupByKey(input.toDF(), Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    val e = Ev(1, Timestamp.valueOf("2024-01-01 00:05:00"), 7, "click", 1.0)
    input.addData(e, e.copy(value = 1.0),
      Ev(2, Timestamp.valueOf("2024-01-01 00:06:00"), 7, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(s.sql("select count(*) from dedup_stream").first().getLong(0) == 2L)
  }
}
