package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the identity function of web-scale dedup:
  * every crawl carries the same page under dozens of byte-distinct
  * URLs (case-shifted hosts, tracking parameters, fragments, default
  * ports, parameter order), and URL-level dedup/frontier logic is only
  * as good as the canonical form it keys on. One codegen'd per-row
  * projection (regexp + array ops — zero shuffle at any scale), built
  * on regex parsing rather than `parse_url` so the exact same steps
  * replicate in external SQL (q_url_canon runs under a full DuckDB
  * oracle).
  *
  * Canonicalization steps, in order (the contract):
  *   1. trim; drop the fragment (`#…` — client-side only).
  *   2. lowercase the scheme and host; strip userinfo (`user@`);
  *      strip the scheme's default port (`:80` http, `:443` https).
  *   3. strip one leading `www.` label (the standard alias).
  *   4. empty path becomes `/`; a trailing slash on a non-root path
  *      drops (`/a/b/` == `/a/b` by crawl convention).
  *   5. query: split on `&`, drop empty pairs and tracking parameters
  *      (`utm_*` plus the fixed id list below), SORT the survivors
  *      (parameter order never changes the resource on sane servers —
  *      and byte-stable keys need one order), rejoin; an emptied query
  *      drops its `?`.
  *
  * `registeredDomain` approximates eTLD+1 with a compact multi-label
  * public-suffix subset (the common `co.uk`-class suffixes) —
  * explicitly an approximation of the full Mozilla PSL, which is a
  * data file, not an algorithm; swap in the full list for production
  * use. Documented divergence, spec-pinned.
  *
  * Emits (id, url, url_canon, host, domain) + `passthroughCols`. Rows
  * whose value does not parse as an absolute http(s) URL pass through
  * with url_canon = null (count them — a high unparseable rate is an
  * upstream-extraction bug, not data). */
object UrlOps {

  /** Tracking parameters dropped by canonicalization: the `utm_*`
    * family by prefix plus the common click/campaign ids. */
  val TrackingParams: Seq[String] = Seq(
    "gclid", "fbclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src", "cmpid", "spm", "yclid", "_ga", "s_kwcid")

  /** Multi-label public suffixes recognized by [[registeredDomain]] —
    * a deliberately compact subset of the PSL's ~9k entries. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr", "com.sg",
    "co.in", "co.kr", "co.za", "com.hk", "com.tw")

  /** The trimmed, fragment-stripped working form every parse rule
    * reads from. Exposed (package-private) so multi-rule operators
    * can materialize it ONCE behind a select boundary — inlined, the
    * gate + extraction pair below would re-evaluate this regex chain
    * per reference. */
  private[graft] def workingForm(url: Column): Column =
    regexp_replace(trim(url), "#.*$", "")

  /** The scheme-lowercased, fragment-stripped working form, or null if
    * not an absolute http(s) URL. */
  private def parsed(url: Column): Column = {
    val t = workingForm(url)
    when(t.rlike("^(?i)https?://[^/?#]+"), t)
  }

  /** The authority (userinfo@host:port) of an http(s) working form,
    * '' when the URL does not parse. The separate http(s) rlike gate
    * is subsumed by the `+` group: this extract matches iff the gate
    * would have passed, so [[hostFromAuth]]'s ''-to-null mapping
    * reproduces the gate exactly with one regex instead of two. */
  private[graft] def hostAuthority(t: Column): Column =
    regexp_extract(t, "^(?i)https?://([^/?#]+)", 1)

  /** Finish host extraction from a materialized authority COLUMN:
    * userinfo/port strips pay their regex only when a cheap
    * contains() says the character is present at all. Callers must
    * pass a plain column reference — an expression here would be
    * re-evaluated per conditional branch (conditionals defeat
    * codegen subexpression elimination; measured live on the
    * host-graph contraction). */
  private[graft] def hostFromAuth(auth: Column): Column = {
    val noUser = when(auth.contains("@"),
      regexp_replace(auth, "^[^@]*@", "")).otherwise(auth)
    val noPort = when(noUser.contains(":"),
      regexp_replace(noUser, ":[0-9]*$", "")).otherwise(noUser)
    when(auth =!= "", lower(noPort))
  }

  /** [[hostOf]] over an already-materialized [[workingForm]] column. */
  private[graft] def hostOfWorking(t: Column): Column = {
    val auth = hostAuthority(t)
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    when(auth =!= "", lower(regexp_replace(noUser, ":[0-9]*$", "")))
  }

  /** Lowercased host with userinfo and port stripped, null when the
    * URL does not parse. */
  def hostOf(url: Column): Column = hostOfWorking(workingForm(url))

  /** Approximate eTLD+1 of a lowercased host: one extra label in
    * front of a recognized multi-label suffix, else the last two
    * labels; a host with < 2 labels (or an IP-ish all-digit tail)
    * returns itself. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    // the isNotNull gate matters: concat_ws SKIPS nulls, so a null
    // host would otherwise fall through the when chain to last2 = ""
    // instead of staying null
    when(host.isNotNull,
      when(n <= 2 || element_at(labels, -1).rlike("^[0-9]+$"), host)
        .otherwise(when(
          array_contains(typedlit(MultiLabelSuffixes), last2) && n >= 3,
          last3).otherwise(last2)))
  }

  /** eTLD+1 under a FULL public-suffix list (the production
    * companion to [[registeredDomain]]'s compact subset): pass a
    * compiled [[org.apache.spark.sql.graftext.PslRules]] table —
    * `PslRules.load(spark, path)` for a publicsuffix.org-format file
    * (wildcards, exceptions, and private-domain entries like
    * `github.io` all honored) or `PslRules.parse(lines)` for an
    * inline list. One hash-walk per row, codegen'd; unmatched-host
    * edge behavior (single label, all-digit tail, no rule → last
    * two labels) matches the compact subset exactly, so swapping
    * lists only moves hosts a listed suffix actually governs. */
  def registeredDomainPsl(host: Column,
      rules: org.apache.spark.sql.graftext.PslRules): Column =
    org.apache.spark.sql.graftext.PslDomain(host, rules)

  /** The canonical form as a Column (null for unparseable values) —
    * the registry-friendly shape, like `Normalize.normalizeColumn`. */
  def canonicalColumn(url: Column, stripWww: Boolean = true): Column = {
    val t = parsed(url)
    val scheme = lower(regexp_extract(t, "^([A-Za-z]+)://", 1))
    val hostRaw = hostOf(url)
    val host =
      if (stripWww) regexp_replace(hostRaw, "^www\\.", "") else hostRaw
    val port = regexp_extract(t, "^(?i)https?://[^/?#]*(:[0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === ":80") &&
      !(scheme === "https" && port === ":443")
    val pathRaw = regexp_extract(t, "^(?i)https?://[^/?#]*([^?#]*)", 1)
    val path = when(pathRaw === "", lit("/"))
      .otherwise(when(pathRaw =!= "/", regexp_replace(pathRaw, "/$", ""))
        .otherwise(pathRaw))
    val queryRaw = regexp_extract(t, "\\?([^#]*)", 1)
    val tracked = typedlit(TrackingParams)
    val pairs = filter(split(queryRaw, "&"), p => {
      val k = lower(regexp_extract(p, "^([^=]*)", 1))
      p =!= "" && !k.startsWith("utm_") && !array_contains(tracked, k)
    })
    val query = array_join(array_sort(pairs), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, port).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  def canonicalizeUrls(df: DataFrame, idCol: String = "doc_id",
                       urlCol: String = "url",
                       stripWww: Boolean = true,
                       passthroughCols: Seq[String] = Nil): DataFrame = {
    val host = when(hostOf(col(urlCol)) =!= "", hostOf(col(urlCol)))
    df.select(Seq(col(idCol), col(urlCol).as("url"),
      canonicalColumn(col(urlCol), stripWww).as("url_canon"),
      host.as("host"),
      registeredDomain(host).as("domain")) ++
      passthroughCols.map(col): _*)
  }
}
