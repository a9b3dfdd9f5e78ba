package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first stage of every crawl-derived
  * training corpus (CCNet, RefinedWeb, FineWeb all begin by stripping
  * markup before any quality gate or dedup can run; the reference's feed
  * is already-clean CSV, so this is an extension for the crawl-ingest
  * path that [[Compressed]]'s WET-shard splitting feeds).
  *
  * Deliberately a TAG-LEVEL extractor, not a DOM parser: script/style
  * subtrees and comments are removed, remaining tags become whitespace,
  * the five ubiquitous entities decode, and whitespace collapses. That is
  * exactly the "lynx-dump" fidelity CCNet's pipeline uses before language
  * ID — malformed markup (unclosed tags, bare `<`) degrades to extra
  * whitespace instead of failing, which is what you want at 100 TB where
  * a DOM parser would reject a double-digit percentage of real pages.
  *
  * Regex discipline (the [[TextAnalysis.EmailRe]] rule): every pattern is
  * written in the common subset of Java regex and RE2 so the DuckDB
  * oracle replays extraction byte-for-byte — negated character classes,
  * `(?is)` flags, and lazy `.*?` (shortest-match semantics are identical
  * in Java and RE2's Perl mode; the leftmost-FIRST/leftmost-LONGEST split
  * only bites alternations, which these patterns avoid). Entity decoding
  * uses LITERAL `replace`, no regex at all, with `&amp;` decoded LAST —
  * single-pass semantics, so `&amp;lt;` reads as the four characters
  * `&lt;` and never double-decodes. Whitespace is always the EXPLICIT
  * class `[ \t\n\x0B\f\r]` — shorthand `\s` is NOT common-subset
  * (Java's includes vertical tab, RE2's does not, and real crawl text
  * contains \x0B).
  *
  * 100 TB shape: everything here is a per-row projection — codegen'd
  * string expressions, no shuffle, no UDF. The profile is one map pass;
  * filters over it push into the scan. */
object Html {

  /** `<!-- ... -->`, dot-all so comments spanning lines vanish. */
  val CommentRe = "(?s)<!--.*?-->"
  /** Whole script subtree including its content (case-insensitive). */
  val ScriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  /** Whole style subtree including its content. */
  val StyleRe = "(?is)<style\\b[^>]*>.*?</style>"
  /** Any remaining tag — replaced by a space so `a</p><p>b` keeps a word
    * boundary (the collapse pass squeezes runs afterwards). */
  val TagRe = "<[^>]*>"
  /** Title content (group 1), lazy so the first title wins. */
  val TitleRe = "(?is)<title[^>]*>(.*?)</title>"
  /** Anchor openers carrying an href — the link-density numerator. */
  val LinkRe = "(?i)<a[ \\t\\n\\x0B\\f\\r][^>]*href"
  /** Paragraph openers — the structure signal quality gates use. */
  val ParaRe = "(?i)<p[ \\t\\n\\x0B\\f\\r>]"

  private def rep(c: Column, from: String, to: String): Column =
    call_function("replace", c, lit(from), lit(to))

  /** Decode the five entities that dominate real pages: `&lt; &gt; &quot;
    * &#39; &nbsp;` first, `&amp;` LAST (see the header's single-pass
    * note). Literal replaces — byte-identical in any engine. */
  def decodeEntities(c: Column): Column =
    rep(rep(rep(rep(rep(rep(c,
      "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")

  /** Markup with script/style/comment subtrees and all tags removed —
    * the intermediate the text and the tag counts both derive from. */
  private def stripped(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, CommentRe, " "),
          ScriptRe, " "),
        StyleRe, " "),
      TagRe, " ")

  /** The extracted text: strip → decode entities → collapse whitespace →
    * trim. Empty string (never NULL) for a markup-only page. */
  def extractText(html: Column): Column =
    trim(regexp_replace(decodeEntities(stripped(html)),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** The (first) title, entity-decoded; empty string when absent. */
  def title(html: Column): Column =
    decodeEntities(regexp_extract(html, TitleRe, 1))

  /** Per-document extraction profile: the text itself plus the structural
    * counts a crawl quality gate filters on (a page whose text_ratio is
    * tiny is navigation chrome; one whose link count dwarfs its paragraph
    * count is a link farm — the RefinedWeb/Gopher-style document-level
    * signals, here computed from markup before extraction discards it).
    *
    * Returns (doc_id, title, text, html_chars, text_chars, text_ppm,
    * n_tags, n_links, n_paragraphs). */
  def htmlProfile(docs: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    docs.select(col(idCol).as("doc_id"), h)
      .withColumn("title", title(h))
      .withColumn("text", extractText(h))
      .withColumn("html_chars", length(h).cast("long"))
      .withColumn("text_chars", length(col("text")).cast("long"))
      // integer parts-per-million, not a rounded double: p/q quotients sit
      // on 6-dp round boundaries often enough that the engines' different
      // rounding paths (BigDecimal-on-binary vs multiply-then-round) could
      // disagree on the last digit — floor division cannot
      .withColumn("text_ppm",
        expr("(text_chars * 1000000L) div html_chars"))
      .withColumn("n_tags",
        size(regexp_extract_all(h, lit(TagRe), lit(0))).cast("long"))
      .withColumn("n_links",
        size(regexp_extract_all(h, lit(LinkRe), lit(0))).cast("long"))
      .withColumn("n_paragraphs",
        size(regexp_extract_all(h, lit(ParaRe), lit(0))).cast("long"))
      .drop(htmlCol)
  }

  /** Deterministic HTML fixture over a text corpus (the
    * [[Compressed.synthGzipDocs]] pattern): each document is wrapped in a
    * page with a title, an inline script (containing a bare `<` — the
    * classic tag-stripper trap), a style block, a comment, entity-encoded
    * headings, and a link on every third doc. Pure concat arithmetic on
    * (doc_id, text), so the oracle rebuilds the identical bytes in SQL. */
  def synthHtmlDocs(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val id = col(idCol).cast("string")
    val txt = col(textCol)
    // spread BEFORE the concat: downstream extraction regexes are the
    // real cost and inherit this stage's partitioning — see Spread
    Spread.toCores(docs).filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), id,
      lit(" &amp; friends</title><script type=\"text/javascript\">var n = "),
      id, lit(" < 99; // inline</script><style>.c"),
      (col(idCol) % 7).cast("string"),
      lit(" { color: #333; }</style></head><body><!-- shard "),
      (col(idCol) % 5).cast("string"),
      lit(" --><h1>Doc &lt;"), id, lit("&gt;</h1><p>"),
      substring(txt, 1, 40), lit("</p>"),
      when(col(idCol) % 3 === 0,
        concat(lit("<a href=\"http://example.org/d"), id, lit("\">ref</a>")))
        .otherwise(lit("")),
      lit("<p>"), substring(txt, 41, 1 << 30),
      lit(" &quot;quoted&quot;&nbsp;tail</p></body></html>")).as("html"))
  }
}
