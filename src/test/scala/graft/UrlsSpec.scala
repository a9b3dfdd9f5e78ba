package graft

import org.apache.spark.sql.functions._
import graft.operators.Urls

/** URL parsing + eTLD+1: field extraction on well-formed, hostile, and
  * suffix-listed inputs; malformed rows must surface, never throw. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(url: String) =
    Urls.urlProfile(Seq((1L, url)).toDF("event_id", "url")).collect().head

  test("full URL splits into every field") {
    val r = profile("https://Sub.Example.CO.UK:8443/a//b/c?x=1&y=2&z#frag")
    assert(r.getAs[String]("scheme") === "https")
    assert(r.getAs[String]("host") === "sub.example.co.uk", "host case-folds")
    assert(r.getAs[Long]("port") === 8443L)
    assert(r.getAs[String]("path") === "/a//b/c")
    assert(r.getAs[String]("query_string") === "x=1&y=2&z")
    assert(r.getAs[Long]("path_depth") === 3L, "empty segments don't count")
    assert(r.getAs[Long]("n_params") === 3L)
    assert(r.getAs[String]("etld1") === "example.co.uk",
      "two-label public suffix keeps three labels")
  }

  test("minimal and degenerate shapes") {
    val bare = profile("http://example.org")
    assert(bare.getAs[String]("path") === "" && bare.isNullAt(bare.fieldIndex("port")))
    assert(bare.getAs[Long]("path_depth") === 0L && bare.getAs[Long]("n_params") === 0L)
    assert(bare.getAs[String]("etld1") === "example.org")
    val q = profile("http://a.net/?")
    assert(q.isNullAt(q.fieldIndex("query_string")), "bare '?' is an empty query → NULL")
    assert(q.getAs[Long]("n_params") === 0L)
  }

  test("eTLD+1: IP literals, single labels, naive-rule divergence") {
    val rows = Seq(
      "http://192.168.0.1/x" -> "192.168.0.1",
      "http://localhost:80/" -> "localhost",
      "http://deep.sub.blog.example.com.au/p" -> "example.com.au",
      "http://www.plain.org/p" -> "plain.org",
      // the host IS a public suffix: nothing registrable above it
      "http://co.uk/" -> "co.uk")
    rows.foreach { case (u, want) =>
      assert(profile(u).getAs[String]("etld1") === want, s"etld1($u)")
    }
  }

  test("publicsuffix.org algorithm: wildcard, exception, longest-match, default") {
    def e1(h: String): String = {
      import org.apache.spark.sql.functions.{col, lit}
      spark.range(1).select(Urls.etld1Of(lit(h)).as("e"))
        .collect().head.getAs[String]("e")
    }
    // wildcard *.ck: any single label under ck is a public suffix
    assert(e1("shop.ck") === "shop.ck", "host IS the wildcard suffix")
    assert(e1("a.shop.ck") === "a.shop.ck", "one label above the wildcard suffix")
    assert(e1("x.a.shop.ck") === "a.shop.ck", "deep subdomain under wildcard")
    // exception !www.ck overrides the wildcard: suffix is bare 'ck'
    assert(e1("www.ck") === "www.ck")
    assert(e1("mail.www.ck") === "www.ck", "exception beats wildcard for subdomains too")
    // 2-label wildcard parents (*.kawasaki.jp) + their !city exceptions
    assert(e1("blog.kawasaki.jp") === "blog.kawasaki.jp")
    assert(e1("x.blog.kawasaki.jp") === "x.blog.kawasaki.jp")
    assert(e1("city.kawasaki.jp") === "city.kawasaki.jp")
    assert(e1("sub.city.kawasaki.jp") === "city.kawasaki.jp")
    // longest match: co.uk (2 labels) beats the implicit '*'
    assert(e1("a.b.example.co.uk") === "example.co.uk")
    // default rule
    assert(e1("deep.sub.example.org") === "example.org")
    assert(e1("ck") === "ck", "bare TLD: wildcard needs a label to match")
  }

  test("canonicalUrl: authority case, default ports, slash runs, param sort/strip") {
    import org.apache.spark.sql.functions.lit
    def canon(u: String): String =
      spark.range(1).select(Urls.canonicalUrl(lit(u)).as("c"))
        .collect().head.getAs[String]("c")
    assert(canon("http://Host.COM.:80//a///b?b=2&utm_source=x&a=1") ===
      "http://host.com/a/b?a=1&b=2")
    assert(canon("HTTP://Host.com:80/a//b?b=2&a=1&utm_x=9") ===
      "http://host.com/a/b?a=1&b=2",
      "scheme letters are case-insensitive per RFC 3986 — the uppercase " +
        "spelling must collapse to the same canonical key")
    assert(canon("https://h.org:443/") === "https://h.org/")
    assert(canon("https://h.org:8080") === "https://h.org:8080/",
      "non-default port kept; empty path becomes /")
    assert(canon("http://h.org/p?gclid=1&fbclid=2&ref=x") === "http://h.org/p",
      "an all-tracking query disappears entirely")
    assert(canon("http://h.org/p?z=1&&a=2") === "http://h.org/p?a=2&z=1",
      "empty tokens dropped, survivors byte-sorted")
    assert(canon("http://h.org/P?") === "http://h.org/P",
      "path case preserved; bare '?' is no query")
    val nullRow = spark.range(1)
      .select(Urls.canonicalUrl(lit("not a url")).as("c")).collect().head
    assert(nullRow.isNullAt(0), "malformed URL canonicalizes to NULL")
  }

  test("normalizePercent: RFC 3986 §6.2.2.2 decode/case-fold/verbatim") {
    import org.apache.spark.sql.functions.lit
    def norm(s: String): String =
      spark.range(1).select(Urls.normalizePercent(lit(s)).as("n"))
        .collect().head.getAs[String]("n")
    assert(norm("/%7euser") === "/~user", "lowercase hex, unreserved ~ decodes")
    assert(norm("/%7Euser") === "/~user")
    assert(norm("/%41%7a%2D%2e%5F") === "/Az-._",
      "every unreserved class: ALPHA upper+lower, '-', '.', '_'")
    assert(norm("/a%2fb") === "/a%2Fb",
      "reserved '/' must NOT decode — only the hex case-folds")
    assert(norm("?a=%3d%26") === "?a=%3D%26",
      "reserved '=' and '&' stay encoded — decoding would move param splits")
    assert(norm("%C3%A9") === "%C3%A9",
      "non-ASCII octets stay encoded (already uppercase: unchanged)")
    assert(norm("%") === "%", "bare trailing % is not an encoding")
    assert(norm("%g1x") === "%g1x", "non-hex stays verbatim")
    assert(norm("%3") === "%3", "one hex digit is not an encoding")
    assert(norm("plain/path") === "plain/path")
    assert(norm("") === "")
    val r = spark.range(1)
      .select(Urls.normalizePercent(lit(null).cast("string")).as("n"))
      .collect().head
    assert(r.isNullAt(0), "NULL propagates")
    // composed into the canonical key (the q268 contract)
    def canon(u: String): String =
      spark.range(1).select(Urls.canonicalUrl(lit(u)).as("c"))
        .collect().head.getAs[String]("c")
    assert(canon("https://h.org/%7Eu?x=%31") === canon("https://h.org/~u?x=1"),
      "percent spellings collapse to one frontier key")
    assert(canon("https://h.org/p?%75tm_source=1&a=2") === "https://h.org/p?a=2",
      "an encoded utm param is recognized after normalization and dropped")
  }

  test("decode-then-resolve: %2E dot segments collapse to one frontier key") {
    import org.apache.spark.sql.functions.lit
    // the q267 composition order (RFC 3986 §6.2.2: decode before
    // remove_dot_segments) — '/a/%2E%2E/b' and '/a/../b' are ONE resource
    def frontierPath(p: String): String =
      spark.range(1).select(
        Urls.resolveDotSegments(Urls.normalizePercent(lit(p))).as("r"))
        .collect().head.getAs[String]("r")
    assert(frontierPath("/a/%2E%2E/b") === "/b")
    assert(frontierPath("/a/../b") === "/b")
    assert(frontierPath("/%2e/x") === "/x", "a '%2e' single-dot segment too")
    assert(frontierPath("/a%2Fb/../c") === "/c",
      "reserved %2F stays one segment — it never becomes a path cut")
    // idempotence: canonicalOf's internal normalization re-applies safely
    def norm2(s: String): String =
      spark.range(1).select(
        Urls.normalizePercent(Urls.normalizePercent(lit(s))).as("n"))
        .collect().head.getAs[String]("n")
    assert(norm2("/%7e%2f%zz%") === "/~%2F%zz%", "normalize ∘ normalize = normalize")
  }

  test("idnAscii: punycode folding, ACE passthrough, rejects, canonical collapse") {
    import org.apache.spark.sql.functions.lit
    def fold(s: String): Option[String] =
      Option(spark.range(1)
        .select(graft.functions.IdnAscii.idnAscii(lit(s)).as("h"))
        .collect().head.getAs[String]("h"))
    assert(fold("bücher.example") === Some("xn--bcher-kva.example"))
    assert(fold("BÜCHER.example") === Some("xn--bcher-kva.example"),
      "unicode case folds before encoding")
    assert(fold("xn--bcher-kva.example") === Some("xn--bcher-kva.example"),
      "already-encoded ACE passes through")
    assert(fold("münchen.de") === Some("xn--mnchen-3ya.de"))
    assert(fold("example.org") === Some("example.org"), "ASCII short-circuits")
    assert(fold("EXAMPLE.org") === Some("example.org"))
    assert(fold("a" * 64 + ".example") === None,
      "a label over 63 chars cannot exist on the wire: NULL, not passthrough")
    // composed into the canonical key: three spellings, one frontier key
    def canon(u: String): Option[String] =
      Option(spark.range(1).select(Urls.canonicalUrl(lit(u)).as("c"))
        .collect().head.getAs[String]("c"))
    val expect = Some("https://xn--bcher-kva.example/x")
    assert(canon("https://bücher.example/x") === expect)
    assert(canon("https://BÜCHER.example/x") === expect)
    assert(canon("https://xn--bcher-kva.example/x") === expect)
    assert(canon("https://" + "a" * 64 + ".example/x") === None)
    // SQL registration
    assert(spark.sql("SELECT idn_ascii('bücher.example')").collect()
      .head.getString(0) === "xn--bcher-kva.example")
  }

  test("PslRules.parse: comments, case, blanks, rule classification") {
    val psl = Urls.PslRules.parse(Seq(
      "// comment", "", "COM", "co.uk", "*.CK", "!www.ck", "*.kawasaki.jp"))
    assert(psl.plainByLen(1) === Seq("com"))
    assert(psl.plainByLen(2) === Seq("co.uk"))
    assert(psl.wildcardParentsByLen(1) === Seq("ck"))
    assert(psl.wildcardParentsByLen(2) === Seq("kawasaki.jp"))
    assert(psl.exceptionsByLen(2) === Seq("www.ck"))
    assert(psl.maxRuleLen === 3)
  }

  test("malformed URLs surface with NULL host, never throw") {
    val r = profile("not a url at all")
    assert(r.isNullAt(r.fieldIndex("scheme")) && r.isNullAt(r.fieldIndex("host")))
    assert(r.isNullAt(r.fieldIndex("etld1")))
    assert(r.getAs[Long]("path_depth") === 0L)
    // scheme must start with a letter — '3ttp' is not a scheme
    val n = profile("3ttp://x.org/")
    assert(n.isNullAt(n.fieldIndex("host")))
  }

  test("profile is map-only (no shuffle) and the fixture parses clean") {
    val df = Urls.urlProfile(Urls.synthUrls(
      spark.range(0, 500).select(col("id").as("event_id"))))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = df.collect()
    val malformed = rows.count(r => r.isNullAt(r.fieldIndex("host")))
    assert(malformed === rows.count(r => r.getAs[Long]("event_id") % 97 == 0),
      "exactly the 97th-event rows are malformed")
    assert(rows.filter(!_.isNullAt(2)).forall(_.getAs[String]("scheme").startsWith("http")))
  }
}
