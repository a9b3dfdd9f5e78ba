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
}
