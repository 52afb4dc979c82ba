package graft

import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("events reader handles ns timestamps and restores the session conf") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    assert(spark.conf.getOption(key).forall(_ == "false"))
    val events = graft.sources.Sources.events(spark, "/root/testdata/sf0.001")
    // conf restored immediately after read()
    assert(spark.conf.getOption(key).forall(_ == "false"))
    // the plan still executes correctly after the restore
    assert(events.count() == 1000L)
    assert(events.schema("ts").dataType.typeName == "timestamp")
    val first = events.orderBy("event_id").select("ts").first().getTimestamp(0)
    assert(first.toString.startsWith("2024-01-01 00:09:58"))
  }
}
