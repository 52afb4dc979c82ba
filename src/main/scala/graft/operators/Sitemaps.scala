package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org XML) — the third leg of the frontier
  * kit next to [[UrlOps]] (canonical keys) and [[Robots]] (fetch
  * gating): sitemaps are how hosts DECLARE their URL inventory, so a
  * crawl that reads them discovers pages without link-walking and gets
  * freshness hints (`lastmod`/`changefreq`) to prioritize re-fetches.
  *
  * Regex-based field extraction, not an XML parser, on purpose:
  *   - sitemap files are machine-generated with a fixed tag set, so
  *     the `(?s)<url>(.*?)</url>` block walk is reliable in practice;
  *   - the exact same steps replicate in external SQL under RE2
  *     (q_url_sitemap runs under a full DuckDB oracle) — a DOM parser
  *     would not;
  *   - one codegen'd projection + one Generate per input row — zero
  *     shuffle at any scale (the 50k-URL-per-file spec cap keeps a
  *     single row's explode bounded).
  *
  * Contract:
  *   - A body containing `<sitemapindex` is an INDEX: each
  *     `<sitemap>` block emits kind='sitemap' with (loc, lastmod) —
  *     the caller feeds those locs back into the fetch frontier.
  *   - Otherwise each `<url>` block emits kind='url' with
  *     (loc, lastmod, changefreq, priority).
  *   - Per field: strip one optional CDATA wrapper, trim, decode the
  *     five XML entities (sitemap locs are entity-escaped per spec —
  *     `&amp;` in query strings is the norm, and a loc that skips
  *     decode will never join the crawl log), empty -> null.
  *   - `changefreq` lowercases; `priority` casts to double (null when
  *     absent or non-numeric); tags match case-sensitively lowercase
  *     as the spec writes them.
  *   - `pos` is the block's 0-based position in the file — document
  *     order is meaningful (spec: list by priority) and makes the
  *     output deterministic without a sort.
  *   - A body with no blocks emits no rows (count them upstream: a
  *     fetched-but-empty sitemap is a crawl signal, not data).
  */
object Sitemaps {

  /** The five predefined XML entities, decode order: `&amp;` LAST so
    * double-escaped text ("&amp;lt;") decodes one level only — the
    * standard single-pass unescape. */
  val XmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&apos;" -> "'", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    XmlEntities.foldLeft(c) { case (x, (pat, rep)) =>
      replace(x, lit(pat), lit(rep))
    }

  /** One tag's text content out of a block: CDATA strip, trim, entity
    * decode, empty -> null. */
  private def field(block: Column, tag: String): Column = {
    val raw = regexp_extract(block, s"(?s)<$tag>(.*?)</$tag>", 1)
    val noCdata = regexp_replace(raw,
      "(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*$", "$1")
    val v = decodeEntities(trim(noCdata))
    when(v =!= "", v)
  }

  /** changefreq -> refetch period in seconds (sitemaps.org values).
    * `never` maps to null (do not refetch unless forced); unknown /
    * absent values take the caller's default. */
  val ChangefreqPeriods: Seq[(String, Long)] = Seq(
    "always" -> 300L, "hourly" -> 3600L, "daily" -> 86400L,
    "weekly" -> 604800L, "monthly" -> 2592000L, "yearly" -> 31536000L)

  /** Recrawl scheduling from sitemap freshness hints — what the hints
    * are FOR: a host that declares (lastmod, changefreq) is telling
    * the crawler when a refetch stops being wasted work. Consumes
    * [[parseSitemaps]]' kind='url' rows and emits per-URL
    * (host, loc, priority, period_s, next_due_epoch, due):
    *
    *   - `period_s` from [[ChangefreqPeriods]]; unknown/absent
    *     changefreq -> `defaultPeriodS`; `never` -> null.
    *   - `lastmod` is read at DAY granularity (its first 10 chars as
    *     a date — the W3C datetime's date part): crawl scheduling is
    *     day-granular at best, and date-only parsing is the form every
    *     engine agrees on byte-for-byte. `next_due_epoch` =
    *     lastmod-days · 86400 + period.
    *   - `due` = the URL should be fetched at `nowEpoch`: declared
    *     never-refetch -> false; no/unparseable lastmod -> true (a
    *     freshness hint we cannot date is no hint); else
    *     next_due_epoch <= nowEpoch.
    *
    * Pure projection (zero shuffle); compose with
    * [[graft.operators.Frontier.schedule]] — `due` filters the round's
    * candidates, `priority` feeds its priorityCol. */
  def recrawlSchedule(entries: DataFrame, nowEpoch: Long,
                      defaultPeriodS: Long = 604800L): DataFrame = {
    val period = ChangefreqPeriods.foldLeft(
      when(col("changefreq") === "never", lit(null).cast("long"))
        .otherwise(lit(defaultPeriodS))) { case (acc, (k, v)) =>
      when(col("changefreq") === k, lit(v)).otherwise(acc)
    }
    // format-guarded + try-parsed: ANSI mode (Spark 4 default) makes
    // to_date('2026-02-31') THROW, and a regex can't rule out
    // calendar-invalid dates — try_to_timestamp nulls them instead,
    // which the due-rule treats as "no datable hint" (fetch)
    val day = substring(col("lastmod"), 1, 10)
    val lastmodDays = when(day.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
      datediff(to_date(try_to_timestamp(day, lit("yyyy-MM-dd"))),
        to_date(lit("1970-01-01"))))
    entries.filter(col("kind") === "url")
      .select(col("host"), col("loc"), col("priority"),
        period.as("period_s"),
        (lastmodDays.cast("long") * 86400L + period)
          .as("next_due_epoch"))
      .withColumn("due",
        when(col("period_s").isNull, lit(false))
          .otherwise(col("next_due_epoch").isNull ||
            col("next_due_epoch") <= nowEpoch))
  }

  /** Strict-decimal guard before the double cast: ANSI mode (Spark 4
    * default) makes cast('junk' AS double) THROW, and a whole 100 TB
    * stage dying on one malformed priority is the wrong trade. The
    * regex gate is also exactly replicable in the oracle, where
    * TRY_CAST's accepted grammar would not be. */
  private def numeric(v: Column): Column =
    when(v.rlike("^[0-9]+(\\.[0-9]+)?$"), v.cast("double"))

  /** Parse one sitemap body per input row into per-entry rows:
    * (host, kind, pos, loc, lastmod, changefreq, priority). */
  def parseSitemaps(df: DataFrame, hostCol: String = "host",
                    xmlCol: String = "xml"): DataFrame = {
    val xml = col(xmlCol)
    val isIndex = contains(xml, lit("<sitemapindex"))
    val blocks = when(isIndex,
        regexp_extract_all(xml, lit("(?s)<sitemap>(.*?)</sitemap>"),
          lit(1)))
      .otherwise(
        regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)))
    df.select(col(hostCol).as("host"),
        when(isIndex, lit("sitemap")).otherwise(lit("url")).as("kind"),
        posexplode(blocks))
      .select(col("host"), col("kind"),
        col("pos"),
        field(col("col"), "loc").as("loc"),
        field(col("col"), "lastmod").as("lastmod"),
        lower(field(col("col"), "changefreq")).as("changefreq"),
        numeric(field(col("col"), "priority")).as("priority"))
  }
}
