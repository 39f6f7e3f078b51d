package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the first stage of every web-scrape
  * corpus (CommonCrawl WET-style): drop script/style payloads, strip
  * tags, decode the common entities, and measure the boilerplate signals
  * (tag count, link count, link-text density) the downstream quality
  * gates key on (link-heavy pages are navigation, not prose — the Gopher
  * link-ratio rule's input).
  *
  * All columns are codegen'd regex/string projections — no UDFs, no
  * shuffle; at 100 TB this is a map-only pass over the raw scrape.
  * Deliberately regex-grade, not an HTML5 parser: malformed markup
  * degrades to extra whitespace, never an error (the lenient posture a
  * trillion-page scrape needs). Patterns stay inside RE2's subset (no
  * backreferences) so the DuckDB oracle runs them verbatim.
  */
object Html {

  /** The entity subset worth decoding at corpus scale, most-specific
    * first; `&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;`,
    * not `<`. */
  private val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Decode [[entities]] in order (chained `replace` — codegen'd). */
  def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  /** Remove script/style elements INCLUDING their payload (their inner
    * text is code, not prose — tag-stripping alone would leak it). Two
    * separate non-greedy dotall passes: RE2 has no backreferences, so
    * `<(script|style)>.*?</\1>` is off the table for the oracle. */
  def dropCodeBlocks(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
  }

  /** Collapse runs of whitespace to single spaces and trim. */
  def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Visible text: drop code blocks, strip every tag to a space, decode
    * entities, collapse whitespace. */
  def visibleText(html: Column): Column =
    collapseWs(decodeEntities(
      regexp_replace(dropCodeBlocks(html), "<[^>]*>", " ")))

  /** `<title>` inner text, entity-decoded and collapsed ("" when the
    * page has none). */
  def title(html: Column): Column =
    collapseWs(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Anchor inner texts (raw, tags included — the density measure below
    * defines length on the raw inner text so both engines agree without
    * a nested-strip pass). */
  def anchorTexts(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1))

  /** Anchor href targets (double-quoted form) — the edge extractor for
    * link-graph analytics over a scrape. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("(?i)<a\\b[^>]*href=\"([^\"]*)\""), lit(1))

  /** Opening-tag count (a markup-density signal). */
  def tagCount(html: Column): Column =
    size(regexp_extract_all(html, lit("<[a-zA-Z][^>]*>"), lit(0)))

  /** Anchor-text chars / visible-text chars (0 when no visible text) —
    * the link-density boilerplate signal, 6dp. */
  def linkDensity(html: Column): Column = {
    val linkChars = aggregate(anchorTexts(html), lit(0),
      (acc, t) => acc + length(t))
    val textChars = length(visibleText(html))
    round(when(textChars === 0, lit(0.0))
      .otherwise(linkChars.cast("double") / textChars), 6)
  }
}
