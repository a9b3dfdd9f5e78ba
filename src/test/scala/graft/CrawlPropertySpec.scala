package graft

import org.apache.spark.sql.functions._
import graft.operators.{Robots, Urls}

/** Property tests for the round-14 crawl operators: the codegen'd column
  * math is checked against INDEPENDENT plain-Scala reference
  * implementations on randomized inputs — the equivalence style that
  * caught the Feistel seed collision and the Adam7 grid offsets. */
class CrawlPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference publicsuffix.org walk, coded straight from the spec text
    * (no column math shared with the implementation under test). */
  private def refEtld1(host: String, psl: Urls.PslRules): String = {
    if (host == null) return null
    if (host.matches("^[0-9.]+$")) return host
    val labels = host.split("\\.", -1).toSeq
    val n = labels.length
    def lastK(k: Int) = labels.takeRight(k).mkString(".")
    // exception rules first (longest wins among them)
    val exc = psl.exceptionsByLen.toSeq.sortBy(-_._1).collectFirst {
      case (e, rules) if n >= e && rules.contains(lastK(e)) => e - 1
    }
    val suffixLen = exc.getOrElse {
      // longest plain/wildcard match, default '*' = 1
      (psl.maxRuleLen to 1 by -1).collectFirst {
        case k if n >= k &&
          (psl.plainByLen.getOrElse(k, Nil).contains(lastK(k)) ||
            (k >= 2 && psl.wildcardParentsByLen.getOrElse(k - 1, Nil)
              .contains(lastK(k - 1)))) => k
      }.getOrElse(1)
    }
    if (n <= suffixLen) host else lastK(suffixLen + 1)
  }

  test("etld1OfPsl == the spec-text reference on randomized hosts") {
    val rnd = new scala.util.Random(421)
    val atoms = Seq("a", "bb", "www", "city", "shop", "kawasaki", "ck", "np",
      "jp", "uk", "co", "com", "org", "example", "x0", "sendai", "yokohama")
    val hosts = Seq.tabulate(600) { _ =>
      val n = 1 + rnd.nextInt(5)
      Seq.fill(n)(atoms(rnd.nextInt(atoms.length))).mkString(".")
    } ++ Seq("10.0.0.7", "ck", "www.ck", "city.kawasaki.jp", "a.b.c.d.e.co.uk",
      // a newline-bearing "IP" host: Java '$' would have classified it as
      // an IP literal, the reference's whole-string matches() never did
      "10.0.0.7\n")
    val got = hosts.toDF("host")
      .select(col("host"), Urls.etld1Of(col("host")).as("e"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.distinct.foreach { h =>
      assert(got(h) === refEtld1(h, Urls.TrimmedPsl), s"etld1($h)")
    }
  }

  /** Reference robots rule matcher: translate per RFC (escape, * -> any
    * run, trailing $ anchors) using Java's own quoting — a DIFFERENT
    * escape mechanism than the replace chain under test. */
  private def refMatches(path: String, rule: String): Boolean = {
    val anchored = rule.endsWith("$")
    val core = if (anchored) rule.dropRight(1) else rule
    // ^Q(part)E.*Q(part)E...(+$) — prefix-anchored like the chain, but
    // quoting via \Q..\E, a different escape mechanism than replace()
    val full = core.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*")
    // \z like the implementation: '$' in Java also fires before a final
    // newline, which is NOT RFC 9309 end-of-path
    val rx = ("^" + full + (if (anchored) "\\z" else "")).r
    rx.findFirstIn(path).isDefined
  }

  test("robots rule matching == Pattern.quote reference on randomized paths/rules") {
    val rnd = new scala.util.Random(1009)
    val segs = Seq("a", "bb", "data", "x.json", "ok", "tmp", "p+q", "(v)", "b[1]",
      "x.json\n") // a path ending in \n must NOT satisfy a $-anchored rule
    def randPath() = "/" + Seq.fill(1 + rnd.nextInt(3))(segs(rnd.nextInt(segs.length))).mkString("/")
    val rules = Seq("/a", "/a/*", "/tmp/*.json$", "/data", "/p+q", "/(v)", "/b[1]",
      "/*ok$", "/", "/a*b")
    val paths = Seq.fill(300)(randPath())
    val df = paths.zipWithIndex.map { case (p, i) => (i.toLong, "h.org", p) }
      .toDF("event_id", "host", "path")
    val ruleRows = rules.map(r => Robots.RobotsRule("h.org", 0L, "*", "disallow", r))
      .toDF()
    // run every (path, rule) pair through the gate machinery one rule at
    // a time so each decision is the raw matcher, not the tie-break
    rules.foreach { r =>
      val one = ruleRows.filter(col("rule_path") === r)
      val got = Robots.robotsGate(df, one, "anybot")
        .collect().map(x => x.getAs[Long]("event_id") ->
          (x.getAs[Long]("allowed") == 0L)).toMap
      paths.zipWithIndex.foreach { case (p, i) =>
        assert(got(i.toLong) === refMatches(p, r),
          s"path=$p rule=$r (blocked means matched)")
      }
    }
  }

  /** Reference RFC 3986 §5.2.4 remove_dot_segments — the spec's literal
    * BUFFER walk over the raw string, a different mechanism than the
    * split-segment stack column under test. (java.net.URI.normalize is
    * NOT a valid reference: it preserves a root-escaping "/../" that the
    * RFC absorbs.) */
  private def refRemoveDotSegments(in0: String): String = {
    var in = in0
    val out = new StringBuilder
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        out.setLength(math.max(out.lastIndexOf("/"), 0))
      } else if (in == "/..") {
        in = "/"
        out.setLength(math.max(out.lastIndexOf("/"), 0))
      } else if (in == "." || in == "..") in = ""
      else {
        val j = in.indexOf('/', 1)
        val seg = if (j == -1) in else in.substring(0, j)
        out.append(seg)
        in = if (j == -1) "" else in.substring(j)
      }
    }
    out.toString
  }

  test("resolveDotSegments == the RFC buffer walk on randomized paths") {
    val rnd = new scala.util.Random(733)
    val atoms = Seq("a", "bb", ".", "..", "x.y", "..z", "z..", "...", "",
      "..\n", "a\n") // "..\n" is an ORDINARY segment — '$' would dot-treat it at path end
    val paths = Seq.tabulate(600) { _ =>
      val n = rnd.nextInt(6)
      "/" + Seq.fill(n)(atoms(rnd.nextInt(atoms.length))).mkString("/")
    }.distinct ++ Seq("/", "/..", "/.", "/a/b/../c", "/a/../../b", "//", "/..//")
    val got = paths.toDF("path")
      .select(col("path"), Urls.resolveDotSegments(col("path")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    paths.distinct.foreach { p =>
      assert(got(p) === refRemoveDotSegments(p), s"resolveDotSegments($p)")
    }
  }
  test("charset transcode round-trips randomized bodies under every declared encoding") {
    import graft.operators.Charsets
    import java.nio.charset.{Charset, StandardCharsets}
    val rnd = new scala.util.Random(1216)
    // windows-1252-safe codepoints: ASCII printable + the 1252 extras we
    // can name portably + latin-1 accents (all also ISO-8859-1-safe
    // except the 1252-only trio)
    val ascii = (0x20 to 0x7e).map(_.toChar)
    val latin1 = Seq('\u00e9', '\u00c4', '\u00f1', '\u00fc', '\u00bf')
    val w1252only = Seq('\u20ac', '\u201c', '\u201d', '\u2013')
    val cs1252 = Charset.forName("windows-1252")
    (1 to 200).foreach { i =>
      val pool = ascii ++ latin1 ++ (if (i % 2 == 0) w1252only else Nil)
      val text = Seq.fill(1 + rnd.nextInt(60))(pool(rnd.nextInt(pool.size))).mkString
      val (cs, name) =
        if (i % 3 == 0) (StandardCharsets.UTF_8, "utf-8")
        else if (i % 2 == 0) (cs1252, "windows-1252")
        else (StandardCharsets.ISO_8859_1, "iso-8859-1")
      val t = Charsets.transcode(text.getBytes(cs), Some(s"text/plain; charset=$name"))
      assert(t.decodeOk === 1L && t.text === text,
        s"round $i ($name): '$text' -> $t")
      assert(t.source === "header" && t.charset === cs.name)
    }
    // and the BOM path: UTF-8 BOM + body must strip exactly the BOM
    (1 to 50).foreach { i =>
      val text = Seq.fill(1 + rnd.nextInt(40))(
        (ascii ++ latin1 ++ w1252only)(rnd.nextInt(ascii.size + 9))).mkString
      val b = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
        text.getBytes(StandardCharsets.UTF_8)
      val t = Charsets.transcode(b, None)
      assert(t === Charsets.Transcoded("UTF-8", "bom", 1L, text), s"round $i")
    }
  }
}
