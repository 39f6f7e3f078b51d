package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Markdown-aware section splitter — the structure-respecting chunker
    * RAG/pretraining pipelines want instead of blind fixed-width windows
    * ([[TextAnalysis.chunkDocs]]): one row per ATX-heading section
    * (`#`–`######`), body = the lines under the heading up to the next
    * heading, preamble (lines before any heading) emitted as section 0
    * with level 0 and a null title.
    *
    * Scale posture: one split + posexplode (lines carry doc_id + pos,
    * never the whole doc), a cumulative-count window and the final
    * per-section aggregate share ONE shuffle keyed by doc_id; the body
    * is assembled with the sort-INSIDE-the-aggregate discipline
    * (collect_list arrival order is partition-dependent). */
  def markdownSections(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    df.select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
      .withColumn("_h", col("line").rlike("^#{1,6} "))
      .withColumn("_lvl",
        when(col("_h"), length(regexp_extract(col("line"), "^(#{1,6}) ", 1)))
          .otherwise(lit(0)))
      .withColumn("sec",
        sum(col("_h").cast("long")).over(w))
      .groupBy(col(idCol), col("sec"))
      .agg(
        max(when(col("_h"), col("_lvl"))).as("_hl"),
        max(when(col("_h"),
          regexp_replace(col("line"), "^#{1,6} ", ""))).as("title"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("_h"), struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("body"),
        sum(when(!col("_h"), 1L).otherwise(0L)).as("n_lines"))
      .select(col(idCol), col("sec"),
        coalesce(col("_hl"), lit(0)).cast("int").as("level"),
        col("title"), col("body"), col("n_lines"),
        length(col("body")).cast("long").as("n_chars"))
  }
}
