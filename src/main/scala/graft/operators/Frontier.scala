package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — turning a gated URL inventory (the
  * output of [[Robots.robotsGate]] over [[UrlOps]]-canonical keys and
  * [[Sitemaps]] discoveries) into per-host fetch slots: a polite
  * crawler fetches ONE url per host per crawl-delay, so the frontier
  * is a per-host priority queue, and at cluster scale that queue is
  * exactly a key-partitioned window.
  *
  * Semantics (the contract):
  *   - URLs rank per host by (priority DESC NULLS LAST, url ASC) —
  *     the url tie-break makes the schedule deterministic under any
  *     partitioning; null priority sorts last (undeclared pages fetch
  *     after declared ones).
  *   - `rank` is 1-based fetch order within the host;
  *     `fetch_offset_ms = (rank - 1) * delay_ms` is the politeness
  *     dispatch time relative to the host's first fetch (per-host
  *     crawl-delay column — robots.txt Crawl-delay — with a default
  *     for hosts that declare none).
  *   - `maxPerHost` truncates each host's queue: a crawl round has a
  *     per-host budget, and an adversarial host with 10M URLs must
  *     not own the round.
  *
  * 100 TB posture: ONE hash-partition-by-host exchange; the rank
  * filter plans as WindowGroupLimit, so each map task truncates its
  * hosts to the budget BEFORE the shuffle — the exchange carries at
  * most maxPerHost rows per (host, partition), and a skew-host's
  * surplus never crosses the wire. No global sort anywhere: the
  * schedule is per-host, and per-host order is what politeness needs. */
object Frontier {

  def schedule(urls: DataFrame, hostCol: String = "host",
               urlCol: String = "url",
               priorityCol: Option[String] = None,
               delayMsCol: Option[String] = None,
               defaultDelayMs: Long = 1000L,
               maxPerHost: Int = 1000): DataFrame = {
    require(maxPerHost >= 1, "maxPerHost must be >= 1")
    require(defaultDelayMs >= 0, "defaultDelayMs must be >= 0")
    val prio = priorityCol.map(col).getOrElse(lit(null).cast("double"))
    val delay = delayMsCol
      .map(c => coalesce(col(c).cast("long"), lit(defaultDelayMs)))
      .getOrElse(lit(defaultDelayMs))
    val w = Window.partitionBy(col(hostCol))
      .orderBy(prio.desc_nulls_last, col(urlCol).asc)
    urls
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxPerHost)
      .select(col(hostCol).as("host"), col(urlCol).as("url"),
        col("rank"),
        ((col("rank") - 1).cast("long") * delay).as("fetch_offset_ms"))
  }
}
