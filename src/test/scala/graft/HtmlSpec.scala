package graft

import org.apache.spark.sql.functions._
import graft.operators.Html

/** HTML → text extraction: tag-level semantics, entity single-pass rule,
  * and the profile counts — plus the malformed-markup degradation the
  * operator promises (garbage in → extra whitespace out, never a throw). */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .collect().head.getString(0)

  test("script/style/comment subtrees vanish wholesale, tags become spaces") {
    val t = extract(
      """<html><head><STYLE>body { color: red }</STYLE>
        |<script>if (1 < 2) { document.write("<p>injected</p>"); }</script>
        |</head><body><!-- hidden
        |multiline comment --><h1>Head</h1><p>one</p><p>two</p></body></html>"""
        .stripMargin)
    assert(t === "Head one two",
      s"script content, style rules and comments must not leak: '$t'")
  }

  test("entity decoding is single-pass with &amp; last") {
    assert(extract("<p>&amp;lt; stays literal</p>") === "&lt; stays literal")
    assert(extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; f</p>")
      === "a <b> \"c\" 'd' e & f")
  }

  test("malformed markup degrades to whitespace, never throws") {
    assert(extract("a < b and c > d") === "a d",
      "a bare '<' opens a pseudo-tag swallowed at the next '>' — " +
        "documented tag-level fidelity, not an error")
    assert(extract("<p>unclosed") === "unclosed")
    assert(extract("") === "")
    assert(extract("<div><span></span></div>") === "", "markup-only page → empty text")
  }

  test("title: first wins, entities decode, absent → empty string") {
    val df = Seq(
      "<title>A &amp; B</title><title>second</title>",
      "<TITLE lang=\"en\">upper</TITLE>",
      "no title here").toDF("h")
    val got = df.select(Html.title(col("h"))).collect().map(_.getString(0)).toSeq
    assert(got === Seq("A & B", "upper", ""))
  }

  test("profile counts and integer ppm ratio") {
    val html = "<html><body><p>ten chars!</p>" +
      "<a href=\"http://x\">l</a><a class=\"y\" href=\"z\">m</a></body></html>"
    val r = Html.htmlProfile(Seq((1L, html)).toDF("doc_id", "html")).collect().head
    assert(r.getAs[Long]("n_links") === 2L)
    assert(r.getAs[Long]("n_paragraphs") === 1L)
    assert(r.getAs[Long]("n_tags") === 10L)
    assert(r.getAs[String]("text") === "ten chars! l m")
    assert(r.getAs[Long]("text_ppm") ===
      r.getAs[Long]("text_chars") * 1000000L / r.getAs[Long]("html_chars"))
  }

  test("synthHtmlDocs round-trips the source text through extraction") {
    val docs = Seq((0L, "alpha beta gamma"), (3L, "one two"), (7L, ""))
      .toDF("doc_id", "text")
    val out = Html.htmlProfile(Html.synthHtmlDocs(docs))
      .orderBy("doc_id").collect()
    // doc 0: id % 3 == 0 → carries the link; text wraps the original words
    assert(out(0).getAs[Long]("n_links") === 1L)
    // the title's text is CONTENT (it survives tag stripping, like lynx -dump)
    assert(out(0).getAs[String]("text") ===
      "Doc 0 & friends Doc <0> alpha beta gamma ref \"quoted\" tail")
    assert(out(1).getAs[Long]("n_links") === 1L) // 3 % 3 == 0
    assert(out(2).getAs[Long]("n_links") === 0L)
    assert(out(2).getAs[String]("title") === "Doc 7 & friends")
    // the extraction is map-only: no KEYED exchange anywhere in the plan
    // (the round-robin partition-spread guard is allowed — see Spread)
    val plan = Html.htmlProfile(Html.synthHtmlDocs(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
        l.contains("Exchange") && !l.contains("RoundRobinPartitioning")),
      s"profile must stay free of keyed shuffles:\n$plan")
  }

  test("hrefsOf: double-quoted only, entity-decoded, case/whitespace-insensitive") {
    val html =
      """<body><a href="http://A.example.org/x?a=1&amp;b=2">x</a>
        |<A HREF="/rel">r</A><a href='/single-quoted'>s</a>
        |<a class="k" href = "//cdn.net/l">c</a><a name="no-href">n</a></body>"""
        .stripMargin
    val hrefs = Seq(html).toDF("h").select(Html.hrefsOf(col("h")).as("u"))
      .collect().head.getSeq[String](0)
    assert(hrefs === Seq("http://A.example.org/x?a=1&b=2", "/rel", "//cdn.net/l"),
      "single-quoted skipped (documented contract), no-href anchor skipped, " +
        "&amp; decoded, spaced '=' and uppercase HREF accepted")
  }

  test("linkEdges: domain-keyed directed edges; unfetchable schemes drop") {
    val docs = Seq(
      (1L, "news.a.co.uk",
        "<a href=\"http://www.b.org/1\">x</a><a href=\"/nav\">n</a>" +
          "<a href=\"mailto:z@b.org\">m</a>"),
      (2L, "www.a.co.uk",
        "<a href=\"http://www.b.org/2\">y</a><a href=\"ftp://f.b.org/f\">f</a>"),
      (3L, "www.b.org", "<a href=\"//cdn.a.co.uk/l.js\">c</a>"),
      // NULL src_host (unparseable record): its links must not mint
      // NULL-domain edges
      (4L, null.asInstanceOf[String], "<a href=\"http://www.b.org/x\">n</a>"))
      .toDF("doc_id", "src_host", "html")
    val edges = Html.linkEdges(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_docs"))).toMap
    assert(edges.size === 3, s"mailto/ftp must not mint edges: $edges")
    assert(edges(("a.co.uk", "b.org")) === ((2L, 2L)),
      "news./www. subdomains collapse onto one registrable-domain node")
    assert(edges(("a.co.uk", "a.co.uk")) === ((1L, 1L)),
      "root-relative link → self-edge on the page's own domain")
    assert(edges(("b.org", "a.co.uk")) === ((1L, 1L)),
      "protocol-relative link keeps its explicit host")
  }

  test("metaRobotsGate: directives case/space-free, attr order free, first-wins") {
    val docs = Seq(
      (1L, "<head><meta name=\"robots\" content=\"noindex, NOFOLLOW\"></head>"),
      (2L, "<head><meta content=\"none\" name=\"robots\"></head>"),
      (3L, "<head><meta name=\"description\" content=\"noindex here\"></head>"),
      (4L, "<head></head>"),
      (5L, "<head><META NAME=\"robots\" CONTENT=\"nofollow\">" +
        "<meta name=\"robots\" content=\"noindex\"></head>"))
      .toDF("doc_id", "html")
    val out = graft.operators.Html.metaRobotsGate(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("noindex"), r.getAs[Long]("nofollow"))).toMap
    assert(out(1L) === ((1L, 1L)), "comma+space directives, mixed case")
    assert(out(2L) === ((1L, 1L)), "none = noindex+nofollow, reversed attrs")
    assert(out(3L) === ((0L, 0L)), "a description meta must not trigger")
    assert(out(4L) === ((0L, 0L)), "absent meta = index,follow")
    assert(out(5L) === ((0L, 1L)), "first robots meta wins (the title rule)")
  }

  test("hostGraphDegrees: out/in stitch with zeros for one-sided nodes") {
    val edges = Seq(
      ("a.co.uk", "b.org", 2L, 2L),
      ("a.co.uk", "a.co.uk", 1L, 1L),
      ("b.org", "a.co.uk", 1L, 1L),
      ("c.net", "a.co.uk", 5L, 3L)) // c.net has no inbound edges
      .toDF("src_domain", "dst_domain", "n_links", "n_docs")
    val deg = Html.hostGraphDegrees(edges).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("out_degree"), r.getAs[Long]("n_out_links"),
          r.getAs[Long]("in_degree"), r.getAs[Long]("n_in_links"))).toMap
    assert(deg("a.co.uk") === ((2L, 3L, 3L, 7L)))
    assert(deg("b.org") === ((1L, 1L, 1L, 2L)))
    assert(deg("c.net") === ((1L, 5L, 0L, 0L)), "no inbound → zero, not NULL")
  }

  test("mainContent: density law, floor, entities, script stripping, empty page") {
    import spark.implicits._
    val prose = "Plain prose long enough to clear the twenty-five char floor."
    val docs = Seq(
      // inline <b> stays in-block; anchor entity decodes into link text
      (1L, s"<p>$prose</p><div><b>Bold</b> intro with " +
        "<a href=\"/x\">R&amp;D team</a> details padded to pass the floor.</div>"),
      // a script INSIDE a block must not count as text or links
      (2L, "<p><script>var a = '<a href=\"/no\">fake</a>';</script>" +
        s"$prose</p>"),
      // all boilerplate: long link-only block + short block → nothing kept
      (3L, "<div><a href=\"/a\">First Navigation Entry Here</a> " +
        "<a href=\"/b\">Second Navigation Entry Too</a></div><p>Tiny.</p>"),
      // markup-only page: zero visible blocks
      (4L, "<html><body><div></div></body></html>"),
      // bare (attribute-less) anchors: still pure link text — must not
      // evade the density drop (r15 review finding)
      (5L, "<div><a>First Bare Entry</a> <a>Second Bare Entry</a></div>" +
        s"<p>$prose</p>")
    ).toDF("doc_id", "html")
    val out = Html.mainContent(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_kept"), r.getAs[String]("main_text")))).toMap
    assert(out(1L)._2 === 2L)
    assert(out(1L)._3 ===
      s"$prose Bold intro with R&D team details padded to pass the floor.",
      "entity decoded, inline tags stripped, document order preserved")
    assert(out(2L) === ((1L, 1L, prose)),
      "script content is neither text nor a link")
    assert(out(3L) === ((2L, 0L, "")),
      "density drops the long link block, the floor drops the short one; " +
        "empty main_text is a string, never NULL")
    assert(out(4L) === ((0L, 0L, "")),
      "a markup-only page stays a corpus member: zeros, not a vanished row")
    assert(out(5L) === ((2L, 1L, prose)),
      "bare <a>...</a> anchors count as link text: the attribute-less " +
        "nav is density-dropped, not kept")
  }

  test("anchorTexts: an unterminated anchor never swallows the next well-formed one") {
    // the r16 ADVICE finding: with a lazy .*? inner match, the
    // unterminated first anchor absorbed everything through the SECOND
    // anchor's </a> — good.org's row vanished and its text was
    // attributed to bad.org. The tempered inner match makes a new <a
    // opening terminate the candidate instead.
    val docs = Seq((1L, "www.s.com",
      """<body><a href="https://www.bad.org/u">orphan text
        |<a href="https://www.good.org/v">Good Text</a></body>""".stripMargin))
      .toDF("doc_id", "src_host", "html")
    val rows = Html.anchorTextsByDoc(docs).collect()
      .map(r => (r.getAs[String]("dst_domain"), r.getAs[String]("anchor_text"),
        r.getAs[Long]("n_anchors")))
    assert(rows.toSeq === Seq(("good.org", "Good Text", 1L)),
      "the unterminated anchor contributes no text row; the well-formed " +
        "anchor keeps its own text under its own destination")
  }
}
