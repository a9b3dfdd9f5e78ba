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

  /** Anchor href VALUES (capture group 1): the double-quoted href inside
    * an `<a>` opener. Double-quoted only, deliberately: HTML5 also allows
    * single-quoted and unquoted attribute values, but an alternation over
    * the three quoting forms leaves the Java/RE2 common subset (the
    * leftmost-first vs leftmost-longest split bites exactly there), and a
    * crawl-grade producer pipeline normalizes quoting upstream. The
    * fixture carries a single-quoted anchor precisely to pin this
    * contract: both engines skip it identically. */
  val HrefRe = "(?i)<a[ \\t\\n\\x0B\\f\\r][^>]*href[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*\"([^\"]*)\""

  /** All href values in document order, entity-decoded (hrefs legally
    * carry `&amp;` between query params — a raw-bytes join key would
    * split one URL into two graph nodes). Array column, per-row. */
  def hrefsOf(html: Column): Column =
    transform(regexp_extract_all(html, lit(HrefRe), lit(1)), decodeEntities(_))

  /** Host a link points at, given the href and the page's own host:
    * protocol-relative `//host/...` keeps its explicit host, any other
    * root-relative `/...` stays on the page's host, an absolute http(s)
    * URL parses through [[Urls.host]], and everything else (mailto:,
    * ftp:, fragments, relative-without-slash) is NULL — a host GRAPH
    * keys on fetchable web hosts only. Lowercased like [[Urls.host]]. */
  def linkHostOf(href: Column, srcHost: Column): Column =
    when(href.startsWith("//"),
      lower(nullif(regexp_extract(href, "^//([^/?#:]+)", 1), lit(""))))
      .when(href.startsWith("/"), lower(srcHost))
      .when(Urls.scheme(href).isin("http", "https"), Urls.host(href))
      .otherwise(lit(null).cast("string"))

  /** Host-level web-graph edges — the structure every crawl pipeline
    * derives before computing domain centrality ([[Dedup.pageRank]] runs
    * unchanged over these edges as (src, dst) pairs) or link-based
    * quality priors: extract hrefs, resolve each to a destination host
    * ([[linkHostOf]]), key BOTH ends by registrable domain (eTLD+1 — the
    * unit crawl politeness and quality priors act on; `news.x.co.uk` and
    * `blog.x.co.uk` are one node), and aggregate.
    *
    * Returns (src_domain, dst_domain, n_links, n_docs): total anchors and
    * distinct linking documents per directed domain pair. Self-edges
    * (intra-domain navigation) are kept — they are the denominator of
    * external-link-ratio gates.
    *
    * 100 TB shape: extraction and host resolution are per-row codegen'd
    * projections; the aggregation is the two-level fold (per-doc slice,
    * then the domain pair — the SAME two exchanges the old
    * countDistinct's rewrite planned), and output cardinality is the
    * edge count of the domain graph — sparse in practice (bounded by
    * links actually present, never |domains|²). Skewed hub domains
    * partial-aggregate before each exchange. */
  def linkEdges(docs: DataFrame, idCol: String = "doc_id",
                srcHostCol: String = "src_host",
                htmlCol: String = "html"): DataFrame =
    linkEdgesByDoc(docs, idCol, srcHostCol, htmlCol)
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(sum(col("n_links")).as("n_links"),
        count(lit(1)).as("n_docs"))

  /** Per-DOCUMENT edge contributions — (src_domain, dst_domain, doc_id,
    * n_links), the unit [[linkEdges]] folds and the natural idempotency
    * key for incremental maintenance: a document's contribution is a
    * deterministic function of its bytes, so a streaming twin merging on
    * this key absorbs replays, fresh-checkpoint re-deliveries, and
    * re-crawls of the same doc without a batch-id watermark
    * ([[graft.streaming.StreamingLinkGraph]]). */
  def linkEdgesByDoc(docs: DataFrame, idCol: String = "doc_id",
                     srcHostCol: String = "src_host",
                     htmlCol: String = "html"): DataFrame = {
    val links = docs.select(col(idCol).as("doc_id"), col(srcHostCol),
      explode(hrefsOf(col(htmlCol))).as("href"))
    // stage the two host columns as real attributes (the urlProfile
    // staging lesson): inlining linkHostOf's regex CASE at each
    // reference would re-run the href regexes per reference.
    // The eTLD+1 walks are the native Etld1 expression (one static
    // call per end) — the r14 label-array staging is gone because the
    // unrolled CASE chain it served is gone: fused into the aggregate
    // below, TWO unrolled walks blew janino's method limit and the
    // whole stage silently lost codegen (reproduced on q261 execution,
    // r15); the static call is immune to fusion
    val hosts = links.select(col("doc_id"),
      lower(col(srcHostCol)).as("src_host_l"),
      linkHostOf(col("href"), col(srcHostCol)).as("dst_host"))
    hosts.select(col("doc_id"),
        Urls.etld1Of(col("src_host_l")).as("src_domain"),
        Urls.etld1Of(col("dst_host")).as("dst_domain"))
      // BOTH ends must resolve: a NULL src_host (an unparseable crawl
      // record) would otherwise mint NULL-domain edges that the degree
      // stitch reports as a phantom hub while pageRankDirected's
      // src =!= dst filter silently drops them — the two readouts of one
      // edge list would disagree
      .filter(col("src_domain").isNotNull && col("dst_domain").isNotNull)
      .groupBy(col("src_domain"), col("dst_domain"), col("doc_id"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** Combined anchor match: group 1 = the href (the [[HrefRe]]
    * double-quote contract), group 2 = the inner markup. Unlike
    * [[HrefRe]] this requires a CLOSING `</a>` — an unterminated anchor
    * contributes a link to the graph but has no delimited text to
    * collect (the documented difference from [[linkEdges]]' counts).
    * The inner match is TEMPERED — it may not cross a new `<a`
    * opening (the HTML tokenizer's rule: a start tag auto-closes an
    * open anchor) — so an unterminated anchor can never swallow the
    * next well-formed anchor's text and attribute it to the wrong
    * destination (the r16 ADVICE finding); the unterminated one simply
    * never matches, and the following anchor emits its own row. */
  val AnchorPairRe: String =
    "(?is)<a[ \\t\\n\\x0B\\f\\r][^>]*href[ \\t\\n\\x0B\\f\\r]*=" +
      "[ \\t\\n\\x0B\\f\\r]*\"([^\"]*)\"[^>]*>" +
      "((?:(?!<a[ \\t\\n\\x0B\\f\\r>]).)*?)</a[ \\t\\n\\x0B\\f\\r]*>"

  /** Anchor-text corpus — what the web SAYS about each destination: the
    * per-target aggregation of link anchor texts, the classic relevance
    * / description signal (anchor text approximates queries and
    * document titles; used as pretraining data and as a ranking feature
    * since the earliest web search literature). Per anchor with BOTH a
    * fetchable destination ([[linkHostOf]] semantics, both ends eTLD+1)
    * and NON-EMPTY visible text ([[extractText]] of the inner markup —
    * inline tags stripped, entities decoded, whitespace collapsed):
    * fold to (dst_domain, anchor_text, n_anchors, n_src_domains).
    * Self-links are kept (site navigation describes the site too);
    * `n_src_domains` is the independence signal — text repeated by many
    * unrelated domains is a stronger description than one domain's
    * boilerplate.
    *
    * 100 TB shape: one codegen'd regex Generate per doc (anchors), two
    * per-row extractions over the staged anchor column, then ONE
    * (dst_domain, anchor_text)-keyed aggregate with partial map-side
    * combine — output cardinality is the distinct description set,
    * bounded by real anchor diversity, never corpus size. */
  def anchorTexts(docs: DataFrame, idCol: String = "doc_id",
                  srcHostCol: String = "src_host",
                  htmlCol: String = "html"): DataFrame =
    anchorTextsByDoc(docs, idCol, srcHostCol, htmlCol)
      .groupBy(col("dst_domain"), col("anchor_text"))
      .agg(sum(col("n_anchors")).as("n_anchors"),
        countDistinct(col("src_domain")).as("n_src_domains"))

  /** Per-DOCUMENT anchor contributions — (doc_id, src_domain,
    * dst_domain, anchor_text, n_anchors), the unit [[anchorTexts]]
    * folds and the idempotency key for incremental maintenance (a
    * document's contribution is a deterministic function of its bytes
    * — the [[linkEdgesByDoc]] convention, reused by
    * [[graft.streaming.StreamingAnchorCorpus]]). */
  def anchorTextsByDoc(docs: DataFrame, idCol: String = "doc_id",
                       srcHostCol: String = "src_host",
                       htmlCol: String = "html"): DataFrame = {
    val anchors = Spread.toCores(docs) // Generate leg: never pin to 1 core
      .select(col(idCol).as("doc_id"), col(srcHostCol).as("_src"),
        explode(regexp_extract_all(col(htmlCol), lit(AnchorPairRe),
          lit(0))).as("_a"))
    // staged extractions (the urlProfile lesson: never inline a regex
    // CASE at each reference)
    val parts = anchors.select(col("doc_id"), col("_src"),
      decodeEntities(regexp_extract(col("_a"), AnchorPairRe, 1)).as("href"),
      extractText(regexp_extract(col("_a"), AnchorPairRe, 2)).as("anchor_text"))
    parts
      .select(col("doc_id"),
        Urls.etld1Of(lower(col("_src"))).as("src_domain"),
        Urls.etld1Of(linkHostOf(col("href"), col("_src"))).as("dst_domain"),
        col("anchor_text"))
      .filter(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("anchor_text") =!= "")
      .groupBy(col("doc_id"), col("src_domain"), col("dst_domain"),
        col("anchor_text"))
      .agg(count(lit(1)).as("n_anchors"))
  }

  /** Anchor-corpus fixture: per doc (src host rotates over four s-side
    * domains), a cross-domain anchor with an entity in its text, a
    * root-relative anchor with inline markup, a protocol-relative CDN
    * anchor, a mailto and a bare (href-less) anchor that must both
    * drop, and on even ids a shared-label anchor whose doubled interior
    * whitespace must collapse — every count closed-form by id
    * arithmetic. */
  def synthAnchorDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    Spread.toCores(docs).select(id.as("doc_id"),
      concat(lit("www.s"), m(4), lit(".com")).as("src_host"),
      concat(
        lit("<html><body><a href=\"https://www.t"), m(3),
        lit(".org/p\">Visit T"), m(3), lit(" &amp; Friends</a>\n"),
        lit("<a href=\"/local\">Home <b>Page</b></a>\n"),
        lit("<a href=\"//cdn.t"), m(3), lit(".org/x\">CDN</a>\n"),
        lit("<a href=\"mailto:x@example.net\">mail me</a>\n"),
        lit("<a>bare</a>\n"),
        when(id % 2 === 0,
          lit("<a href=\"https://www.u.net/q\">Shared  Label</a>\n"))
          .otherwise(lit("")),
        lit("</body></html>")).as("html"))
  }

  /** Per-domain degree profile over [[linkEdges]] output: out/in degree
    * (distinct peer domains, self included) and total out/in anchors —
    * the hub/authority readout link-farm gates and frontier prioritizers
    * key on. Input is the ALREADY-AGGREGATED edge list (cardinality =
    * domain-graph edges, orders of magnitude below the corpus), so the
    * two degree aggregations and the full-outer stitch are cheap by
    * construction at any corpus size. */
  def hostGraphDegrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src_domain").as("domain"))
      .agg(countDistinct(col("dst_domain")).as("out_degree"),
        sum(col("n_links")).as("n_out_links"))
    val in = edges.groupBy(col("dst_domain").as("domain"))
      .agg(countDistinct(col("src_domain")).as("in_degree"),
        sum(col("n_links")).as("n_in_links"))
    out.join(in, Seq("domain"), "full_outer")
      .select(col("domain"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("n_out_links"), lit(0L)).as("n_out_links"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("n_in_links"), lit(0L)).as("n_in_links"))
  }

  /** Block-level boundary tags — the structural cuts the main-content
    * extractor segments on (the jusText/trafilatura block model: a
    * block is text between block-level tag boundaries; inline tags
    * stay inside their block). */
  val BlockBoundaryRe: String =
    "(?i)</?(?:p|div|td|th|li|ul|ol|dl|dt|dd|table|tr|h[1-6]|section|article" +
      "|header|footer|nav|aside|blockquote|pre|form|br)(?:[ \\t\\n\\x0B\\f\\r][^>]*)?>"
  /** Anchor inner content (group 1) — the double-quote-free contract of
    * [[HrefRe]] does not apply here; the INNER text is what link-density
    * measures. Unlike [[HrefRe]] (which NEEDS the attribute), the
    * attribute run is OPTIONAL: a nav built of bare `<a>Home</a>`
    * anchors still renders as pure links and must count as link text,
    * or link lists evade the density drop (the r15 review finding). */
  val AnchorTextRe: String =
    "(?is)<a(?:[ \\t\\n\\x0B\\f\\r][^>]*)?>(.*?)</a[ \\t\\n\\x0B\\f\\r]*>"

  /** Main-content extraction by block link density — the
    * boilerplate-REMOVAL step (jusText, Pomikálek 2011; trafilatura,
    * Barbaresi 2021) every web-corpus pipeline runs between crawl and
    * training, distinct from [[graft.operators.Dedup.boilerplateStats]]
    * (which measures cross-document repetition, not within-page
    * structure): navigation bars, footers and link lists are text made
    * mostly OF links, while prose merely contains a few — so a block is
    * kept iff its text clears `minChars` AND its link-text share stays
    * at or under `maxLinkPct` (the comparison is the division-free
    * integer cross-multiply `link_chars·100 ≤ maxLinkPct·n_chars`, the
    * corrVerdict convention).
    *
    * Mechanics: strip comment/script/style subtrees, split on
    * [[BlockBoundaryRe]] (inline tags stay inside blocks), per block
    * extract the visible text ([[extractText]] semantics) and the
    * concatenated anchor-inner text, classify, and reassemble the kept
    * blocks IN DOCUMENT ORDER into `main_text`. Returns one row per doc
    * — EVERY doc: a markup-only page surfaces as (0 blocks, 0 kept, "")
    * rather than silently vanishing from the corpus (the
    * perplexityBuckets membership rule). Empty-string main_text, never
    * NULL; blocks counted only when they carry visible text.
    *
    * 100 TB shape: one Generate (posexplode of the split), codegen'd
    * per-block regex work, ONE doc-keyed aggregate for the reassembly —
    * the same single-shuffle law as paragraph dedup. */
  def mainContent(docs: DataFrame, minChars: Int = 25, maxLinkPct: Int = 33,
                  idCol: String = "doc_id", htmlCol: String = "html"): DataFrame = {
    require(minChars >= 1, "minChars must be positive")
    require(maxLinkPct >= 0 && maxLinkPct <= 100, "maxLinkPct is a percentage")
    val cleaned = regexp_replace(regexp_replace(regexp_replace(
      col(htmlCol), CommentRe, " "), ScriptRe, " "), StyleRe, " ")
    val blocks = Spread.toCores(docs) // Generate leg: never pin to 1 core
      .select(col(idCol).as("doc_id"),
        posexplode(split(cleaned, BlockBoundaryRe)).as(Seq("block_ix", "_raw")))
    val scored = blocks
      .select(col("doc_id"), col("block_ix"),
        extractText(col("_raw")).as("text"),
        extractText(array_join(
          regexp_extract_all(col("_raw"), lit(AnchorTextRe), lit(1)), " "))
          .as("_ltext"))
      .filter(col("text") =!= "")
      .select(col("doc_id"), col("block_ix"), col("text"),
        length(col("text")).cast("long").as("n_chars"),
        length(col("_ltext")).cast("long").as("link_chars"))
      .withColumn("kept",
        (col("n_chars") >= minChars &&
          col("link_chars") * 100 <= lit(maxLinkPct) * col("n_chars"))
          .cast("long"))
    val agged = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("kept")).as("n_kept"),
        array_join(expr(
          "transform(array_sort(filter(collect_list(" +
            "struct(block_ix, kept, text)), x -> x.kept = 1)), x -> x.text)"),
          " ").as("main_text"))
    docs.select(col(idCol).as("doc_id")).join(agged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        length(coalesce(col("main_text"), lit(""))).cast("long")
          .as("main_chars"),
        coalesce(col("main_text"), lit("")).as("main_text"))
  }

  /** Main-content fixture: a nav bar LONG enough to clear the char
    * floor but pure links (dropped by DENSITY — the rule the floor
    * can't reach), a prose paragraph (kept), a too-short block
    * (dropped by the floor), a long paragraph with ONE inline link
    * (kept — low density), a link-pair footer (dropped), and on every
    * third doc two extra link-list items (dropped). Texts are pure id
    * arithmetic, so the oracle rebuilds the exact block strings,
    * replays the density law with len() math, and reassembles the
    * identical main_text byte-for-byte. */
  def synthBlockDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    Spread.toCores(docs).select(id.as("doc_id"), concat(
      lit("<html><body>\n<div class=\"nav\">" +
        "<a href=\"/a\">Homepage Navigation</a> " +
        "<a href=\"/b\">About The Company</a> " +
        "<a href=\"/c\">Contact Information</a></div>\n"),
      lit("<p>Quality document "), m(7),
      lit(" carries enough prose to clear the floor threshold easily.</p>\n"),
      lit("<p>Tiny.</p>\n"),
      lit("<div>A longer body mentioning the <a href=\"/x\">glossary "), m(5),
      lit("</a> once among many plain words.</div>\n"),
      when(id % 3 === 0,
        lit("<ul><li><a href=\"/1\">One</a></li><li><a href=\"/2\">Two</a>" +
          "</li></ul>\n")).otherwise(lit("")),
      lit("<footer><a href=\"/p\">Privacy</a> | <a href=\"/t\">Terms</a>" +
        "</footer>\n"),
      // bare (attribute-less) anchors: long enough to clear the floor,
      // pure link text — the density law must still drop it
      lit("<div><a>Home</a> <a>Products</a> <a>Support Pages</a></div>\n" +
        "</body></html>")).as("html"))
  }

  /** The (first) `<meta name="robots">` tag — the in-page twin of
    * robots.txt ([[Robots]]): robots.txt gates FETCHING, this gates
    * INDEXING (noindex) and link FOLLOWING (nofollow), and a polite
    * corpus pipeline honors both. Attribute order is free (`content`
    * before `name` matches), quoting is the double-quote contract
    * ([[HrefRe]]), first robots meta wins (the [[TitleRe]] convention). */
  val MetaRobotsTagRe =
    "(?i)<meta[ \\t\\n\\x0B\\f\\r][^>]*name[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*\"robots\"[^>]*>"
  /** The content attribute's value (group 1) within a matched meta tag. */
  val ContentAttrRe =
    "(?i)content[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*\"([^\"]*)\""

  /** Raw robots-meta content (empty string when the page has none). */
  def metaRobotsContent(html: Column): Column =
    regexp_extract(regexp_extract(html, MetaRobotsTagRe, 0), ContentAttrRe, 1)

  /** Per-document robots-meta gate: (doc_id, robots_content, noindex,
    * nofollow) with the flags as 0/1 BIGINTs (the [[Robots.robotsGate]]
    * readout convention). Directives are comma-separated, surrounding
    * whitespace and case insignificant per the de-facto REP-meta rules;
    * `none` = noindex + nofollow; absent meta = index,follow (all zeros).
    * One codegen'd map pass, no shuffle. */
  def metaRobotsGate(docs: DataFrame, idCol: String = "doc_id",
                     htmlCol: String = "html"): DataFrame = {
    val dirs = transform(split(metaRobotsContent(col(htmlCol)), ","),
      d => lower(trim(d)))
    docs.select(col(idCol).as("doc_id"), col(htmlCol))
      .withColumn("_dirs", dirs)
      .select(col("doc_id"),
        array_join(col("_dirs"), ",").as("robots_content"),
        (array_contains(col("_dirs"), "noindex") ||
          array_contains(col("_dirs"), "none")).cast("long").as("noindex"),
        (array_contains(col("_dirs"), "nofollow") ||
          array_contains(col("_dirs"), "none")).cast("long").as("nofollow"))
  }

  /** Robots-meta fixture: no meta at all, a plain noindex, a spaced
    * "noindex, nofollow", an uppercase NONE, reversed attribute order, an
    * unrelated description meta that must NOT trigger, and an uppercase
    * META/NAME/CONTENT spelling. Pure concat arithmetic on doc_id. */
  def synthMetaDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    Spread.toCores(docs).select(id.as("doc_id"), concat(
      lit("<html><head>"),
      when(id % 7 === 1, lit("<meta name=\"robots\" content=\"noindex\">"))
        .when(id % 7 === 2, lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .when(id % 7 === 3, lit("<meta name=\"robots\" content=\"NONE\">"))
        .when(id % 7 === 4, lit("<meta content=\"nofollow\" name=\"robots\">"))
        .when(id % 7 === 5, lit("<meta name=\"description\" content=\"noindex is a word here\">"))
        .when(id % 7 === 6, lit("<META NAME=\"robots\" CONTENT=\"NOFOLLOW\">"))
        .otherwise(lit("")),
      lit("</head><body><p>doc "), id.cast("string"),
      lit("</p></body></html>")).as("html"))
  }

  /** Deterministic linked-page fixture over a corpus: each doc gets a
    * source host (co.uk / plain-org registrable domains by id arithmetic)
    * and a body carrying every link shape [[linkEdges]] must classify —
    * an always-present absolute cross-domain anchor, an uppercase `<A
    * HREF` variant, a root-relative path, a protocol-relative CDN link,
    * an entity-encoded href (`&amp;` between params), a mailto: and an
    * ftp: to drop, and a single-quoted anchor that the double-quote
    * contract skips. Pure concat arithmetic on doc_id, so the oracle
    * rebuilds identical bytes in SQL. */
  def synthLinkedDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    val srcHost = when(id % 4 === 0,
        concat(lit("news.dom"), m(13), lit(".co.uk")))
      .otherwise(concat(lit("www.site"), m(13), lit(".org")))
    // spread BEFORE the concat: the downstream extraction regexes are the
    // real cost and inherit this stage's partitioning — see Spread
    Spread.toCores(docs).select(id.as("doc_id"), srcHost.as("src_host"),
      concat(
        lit("<html><body><p>doc "), id.cast("string"), lit("</p>"),
        lit("<a href=\"http://www.site"), ((id * 3 + 1) % 13).cast("string"),
        lit(".org/p"), m(7), lit("\">x</a>"),
        when(id % 9 === 0, concat(lit("<A HREF=\"https://up.dom"),
          ((id + 2) % 13).cast("string"), lit(".co.uk/u\">U</A>")))
          .otherwise(lit("")),
        when(id % 3 === 0, concat(lit("<a class=\"nav\" href=\"/local/p"),
          m(5), lit("\">y</a>"))).otherwise(lit("")),
        when(id % 6 === 0, concat(lit("<a href=\"//cdn.site"), m(13),
          lit(".org/lib.js\">c</a>"))).otherwise(lit("")),
        when(id % 5 === 0, concat(lit("<a href=\"https://t"), m(3),
          lit(".dom"), ((id + 1) % 13).cast("string"),
          lit(".co.uk/?a=1&amp;b="), m(4), lit("\">z</a>")))
          .otherwise(lit("")),
        when(id % 7 === 0, concat(lit("<a href=\"mailto:u"), id.cast("string"),
          lit("@x.org\">m</a>"))).otherwise(lit("")),
        when(id % 11 === 0, lit("<a href=\"ftp://files.site0.org/f\">f</a>"))
          .otherwise(lit("")),
        // ext*.net never appears as a SOURCE host: these are the graph's
        // dangling nodes (in-degree only) — they exercise the degree
        // stitch's zero-coalesce and directed PageRank's dangling mass
        when(id % 17 === 0, concat(lit("<a href=\"https://peer.ext"), m(3),
          lit(".net/e\">p</a>"))).otherwise(lit("")),
        when(id % 13 === 0, lit("<a href='/single-quoted'>s</a>"))
          .otherwise(lit("")),
        lit("</body></html>")).as("html"))
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
