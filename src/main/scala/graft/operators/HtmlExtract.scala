package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-content text extraction — the step BEFORE every text
  * operator in a real crawl pipeline ([[TextAnalysis.c4Clean]],
  * `gopherQualityFlags`, the tokenizers, every dedup form all assume
  * clean text in; raw CommonCrawl-style input is markup).
  *
  * The shape is the trafilatura/jusText class of heuristic extractors
  * (Pomikálek 2011, "Removing boilerplate and duplicate content from
  * web corpora"): strip non-content subtrees, convert block boundaries
  * to line breaks, then keep/drop each LINE on link density, length,
  * and stopword density. Implemented as ONE codegen'd per-row
  * projection (regexp chain + higher-order array ops — the
  * [[TextAnalysis.c4Clean]] plan shape): zero shuffle at any scale,
  * and the line rules replicate in external SQL (q_text_extract runs
  * under a full DuckDB oracle).
  *
  * Pipeline, in order (order matters and is part of the contract):
  *   1. `<script>`/`<style>`/`<noscript>` subtrees and `<!-- -->`
  *      comments drop whole (content AND markup).
  *   2. Anchor tags become U+0001 (open) / U+0002 (close) markers so
  *      per-line link density survives tag stripping. Input text is
  *      assumed free of those two control characters.
  *   3. Block-level tags (p, div, br, li, headings, table rows, nav,
  *      header, footer, …) become line breaks; all remaining tags
  *      become spaces (inline tags must not glue words together).
  *   4. The common named entities decode (&amp; LAST, so
  *      double-encoded text can't re-introduce entities — and decoded
  *      `&lt;tag&gt;` text can never be re-parsed as markup because
  *      decoding runs after tag stripping).
  *   5. Per line: whitespace collapses, markers lift out the linked
  *      character count, then the keep rules:
  *        - visible length ≥ `minChars` (short fragments are chrome:
  *          headings, buttons, timestamps),
  *        - linked chars ≤ `maxLinkDensity` × visible chars (nav bars
  *          and footers are link-dense — THE jusText signal),
  *        - stopword tokens ≥ `minStopFrac` × tokens (running prose
  *          has function words; keyword lists and code don't —
  *          jusText's second signal; 0.0 disables).
  *
  * Emits (id, text_main [kept lines joined with \n], n_lines,
  * n_lines_kept) + `passthroughCols` unchanged (streaming form rides
  * on them). A page with nothing kept emits text_main = "". */
object HtmlExtract {

  /** Compact function-word list for the stopword-density rule. Coverage
    * matters less than stability: the rule asks "does this line contain
    * ANY running-prose glue", not "which language is it" (that's
    * [[TextClassify]]). */
  val DefaultStopwords: Seq[String] = Seq(
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "as", "was", "with", "be", "by", "on", "not", "this", "are", "or",
    "from", "at", "an", "have", "had", "they", "you", "were", "their",
    "one", "all", "we", "can", "has", "there", "been", "if", "more",
    "when", "will", "would", "who", "so", "no", "my", "than", "its")

  private[graft] val BlockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|nav|header|" +
      "footer|section|article|aside|blockquote|form|hr|dl|dt|dd|pre|" +
      "figure|figcaption|main"

  /** The markup→lines half of the pipeline as a Column, exposed for
    * reuse/registry: drops script/style/noscript/comments, marks
    * anchors, breaks blocks to \n, strips tags, decodes entities. */
  def htmlToMarkedText(html: Column): Column = {
    val noSubtrees = Seq("script", "style", "noscript")
      .foldLeft(html)((c, tag) =>
        regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>", " "))
    val noComments = regexp_replace(noSubtrees, "(?s)<!--.*?-->", " ")
    val marked = regexp_replace(
      regexp_replace(noComments, "(?is)<a\\b[^>]*>", "\u0001"),
      "(?is)</a\\s*>", "\u0002")
    val blocksToNl = regexp_replace(marked,
      s"(?is)</?($BlockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocksToNl, "(?s)<[^>]*>", " ")
    decodeEntities(noTags)
  }

  /** The named-entity decode chain shared by [[htmlToMarkedText]] and
    * the link extractor (&amp; last — see the pipeline contract). */
  private[operators] def decodeEntities(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (x, (ent, ch)) => replace(x, lit(ent), lit(ch)) }

  /** Hyperlink extraction — the web-graph edge producer: every
    * `<a href=…>anchor</a>` of a page as one row, with the href
    * resolved against the page URL and the anchor text flattened.
    * Composes into the rest of the engine: resolved hrefs key through
    * [[UrlOps.canonicalizeUrls]], (page, href) edges feed the Graph
    * operators (PageRank over the link graph), and [[anchorTexts]]
    * aggregates the classic anchor-text relevance signal per target.
    * One codegen'd projection + posexplode — shuffle-free, output ∝
    * links.
    *
    * Resolution handles the common grammar: absolute (`scheme://…`)
    * kept; protocol-relative (`//host/…`) takes the base scheme;
    * root-relative (`/path`) takes the base origin; other relative
    * paths resolve against the base DIRECTORY, then dot-segments
    * squash through a bounded 4-deep `/x/../` pass (documented bound —
    * deeper towers survive un-normalized; RFC 3986's full algorithm is
    * iterative). `javascript:`/`mailto:`/`tel:`/`data:` and
    * fragment-only hrefs drop. Anchor text: inner markup strips to
    * spaces, entities decode, whitespace collapses.
    *
    * Emits (id, link_pos, href, href_abs, anchor). */
  def extractLinks(docs: DataFrame, idCol: String = "doc_id",
                   htmlCol: String = "html",
                   baseUrlCol: Option[String] = None): DataFrame = {
    val frags = regexp_extract_all(col(htmlCol),
      lit("(?is)<a\\b[^>]*>.*?</a\\s*>"), lit(0))
    val exploded = docs.select(
      Seq(col(idCol), posexplode(frags).as(Seq("link_pos", "frag"))) ++
        baseUrlCol.map(col): _*)
    val frag = col("frag")
    val h1 = regexp_extract(frag, "(?is)\\bhref\\s*=\\s*\"([^\"]*)\"", 1)
    val h2 = regexp_extract(frag, "(?is)\\bhref\\s*=\\s*'([^']*)'", 1)
    val h3 = regexp_extract(frag,
      "(?is)\\bhref\\s*=\\s*([^\\s\"'>]+)", 1)
    val hrefRaw = when(h1 =!= "", h1)
      .otherwise(when(h2 =!= "", h2).otherwise(h3))
    val inner = regexp_extract(frag, "(?is)<a\\b[^>]*>(.*)</a\\s*>", 1)
    val anchor = trim(regexp_replace(
      decodeEntities(regexp_replace(inner, "(?s)<[^>]*>", " ")),
      "\\s+", " "))
    val keep = hrefRaw =!= "" &&
      !lower(hrefRaw).rlike("^(javascript|mailto|tel|data):") &&
      !hrefRaw.startsWith("#")
    val resolved = baseUrlCol match {
      case None => hrefRaw
      case Some(b) =>
        val base = col(b)
        val scheme = regexp_extract(base, "^([A-Za-z]+):", 1)
        val origin = regexp_extract(base,
          "^([A-Za-z]+://[^/?#]*)", 1)
        // base directory: origin + path up to the last slash
        val dir = regexp_extract(base,
          "^([A-Za-z]+://[^/?#]*(?:[^?#]*/)?)", 1)
        val joined = when(hrefRaw.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
            hrefRaw)
          .otherwise(when(hrefRaw.startsWith("//"),
            concat(scheme, lit(":"), hrefRaw))
          .otherwise(when(hrefRaw.startsWith("/"),
            concat(origin, hrefRaw))
          .otherwise(concat(dir, hrefRaw))))
        // bounded dot-segment squash: ./ then up to 4 /x/../ levels
        val noDot = regexp_replace(joined, "/\\./", "/")
        (1 to 4).foldLeft(noDot)((c, _) =>
          regexp_replace(c, "/[^/.][^/]*/\\.\\./", "/"))
    }
    exploded.filter(keep)
      .select(col(idCol), col("link_pos"), hrefRaw.as("href"),
        resolved.as("href_abs"), anchor.as("anchor"))
  }

  /** Anchor-text aggregation — the relevance signal web search built
    * on: per link TARGET, how many pages link to it and with what
    * dominant text. Input is [[extractLinks]] output (href_abs,
    * anchor, id); targets should be canonicalized first
    * ([[UrlOps.canonicalColumn]]) so byte-variant URLs pool.
    *
    * Scale shape: one (target, anchor) count aggregate (partial
    * map-side combine), then the per-target argmax rides a second
    * target-keyed aggregate via max(struct) — two bounded keyed
    * shuffles, no windows, no collect. Deterministic: dominant anchor
    * ties break (count desc, anchor asc). Emits (href_abs, n_links,
    * n_sources, top_anchor, top_anchor_n). */
  def anchorTexts(links: DataFrame, targetCol: String = "href_abs",
                  anchorCol: String = "anchor",
                  sourceCol: String = "doc_id"): DataFrame = {
    val perAnchor = links
      .groupBy(col(targetCol).as("href_abs"), col(anchorCol).as("a"))
      .agg(count(lit(1)).as("n"))
    // min(struct(-n, anchor)): smallest -n = largest count, and the
    // struct ordering's second field breaks ties toward the SMALLEST
    // anchor string — (count desc, anchor asc) in one partial-
    // aggregatable min. n_sources is a per-TARGET distinct (a source
    // linking with two different anchor texts must count once), so it
    // runs in its own aggregate and joins back on the same key — the
    // join rides the aggregation's hash partitioning.
    val top = perAnchor
      .groupBy(col("href_abs"))
      .agg(sum(col("n")).as("n_links"),
        min(struct((-col("n")).as("negc"), col("a"))).as("w"))
      .select(col("href_abs"), col("n_links"),
        col("w.a").as("top_anchor"), (-col("w.negc")).as("top_anchor_n"))
    val sources = links
      .groupBy(col(targetCol).as("href_abs"))
      .agg(count_distinct(col(sourceCol)).as("n_sources"))
    top.join(sources, Seq("href_abs"))
      .select(col("href_abs"), col("n_links"), col("n_sources"),
        col("top_anchor"), col("top_anchor_n"))
  }

  def extractText(docs: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html",
                  minChars: Int = 25, maxLinkDensity: Double = 0.33,
                  minStopFrac: Double = 0.0,
                  stopwords: Seq[String] = DefaultStopwords,
                  passthroughCols: Seq[String] = Nil): DataFrame = {
    require(minChars >= 1, "minChars must be >= 1")
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      "maxLinkDensity must be in [0, 1]")
    require(minStopFrac >= 0.0 && minStopFrac <= 1.0,
      "minStopFrac must be in [0, 1]")
    val stopLit = typedlit(stopwords.map(_.toLowerCase))
    val lines = split(htmlToMarkedText(col(htmlCol)), "\n")
    val enriched = transform(lines, l => {
      val collapsed = trim(regexp_replace(l, "\\s+", " "))
      val linked = length(array_join(
        regexp_extract_all(collapsed,
          lit("\u0001([^\u0001\u0002]*)\u0002"), lit(1)), ""))
      val vis = trim(regexp_replace(collapsed, "[\u0001\u0002]", ""))
      val toks = split(vis, " ")
      struct(vis.as("v"), linked.as("lk"),
        size(filter(toks, tk =>
          array_contains(stopLit, lower(tk)))).as("st"),
        size(toks).as("nt"))
    })
    // comparisons stay multiplication-form (no division): exact IEEE
    // doubles, so the rule replicates verbatim in external SQL
    val kept = filter(enriched, e =>
      length(e.getField("v")) >= minChars &&
        e.getField("lk").cast("double") <=
          lit(maxLinkDensity) * length(e.getField("v")).cast("double") &&
        e.getField("st").cast("double") >=
          lit(minStopFrac) * e.getField("nt").cast("double"))
    docs.select(Seq(col(idCol),
      array_join(transform(kept, _.getField("v")), "\n").as("text_main"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept")) ++
      passthroughCols.map(col): _*)
  }
}
