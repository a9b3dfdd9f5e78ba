package graft

import org.apache.spark.sql.functions._
import graft.operators.Robots

/** robots.txt: parser taxonomy (groups, comments, case, empty values),
  * RFC 9309 longest-match evaluation, group exclusivity, wildcard/anchor
  * rules, and the default-allow paths. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parseRobots: groups, shared UA runs, comments, case, empty values") {
    val body =
      """# policy
        |User-Agent: alpha
        |user-agent: BETA
        |Disallow: /a  # trailing comment
        |Allow: /a/ok
        |
        |User-agent: gamma
        |Disallow:
        |Disallow: /g
        |Sitemap: https://x.org/s.xml
        |broken line without colon
        |Crawl-delay: 10
        |""".stripMargin
    val all = Robots.parseRobots("x.org", body)
    val sentinels = all.filter(_.rule_path == "")
    // path rules only — crawl-delay/sitemap are captured as their own
    // directives now (crawlPolicy's surface), asserted separately below
    val rules = all.filterNot(_.rule_path == "")
      .filter(r => r.directive == "allow" || r.directive == "disallow")
    assert(all.filter(_.directive == "sitemap")
      .map(r => (r.group_ix, r.user_agent, r.rule_path)) ===
      Seq((-1L, "", "https://x.org/s.xml")),
      "sitemap is host-scoped: no group, no UA")
    assert(all.filter(_.directive == "crawl-delay")
      .map(r => (r.group_ix, r.user_agent, r.rule_path)) ===
      Seq((1L, "gamma", "10")),
      "crawl-delay is group-scoped like a rule")
    // every declared (group, ua) has exactly one zero-length sentinel
    assert(sentinels.map(r => (r.group_ix, r.user_agent)).sorted ===
      Seq((0L, "alpha"), (0L, "beta"), (1L, "gamma")))
    assert(sentinels.forall(_.directive == "allow"))
    // the alpha/beta UA run shares group 0; both get both rules
    assert(rules.count(_.group_ix == 0L) === 4)
    assert(rules.filter(_.user_agent == "alpha").map(r => (r.directive, r.rule_path)).toSet
      === Set(("disallow", "/a"), ("allow", "/a/ok")))
    assert(rules.filter(_.user_agent == "beta").size === 2, "UA tokens lowercase")
    // gamma: the EMPTY Disallow emits nothing; /g lands in group 1
    val gamma = rules.filter(_.user_agent == "gamma")
    assert(gamma.map(r => (r.group_ix, r.directive, r.rule_path)) === Seq((1L, "disallow", "/g")))
    assert(Robots.parseRobots("x.org", null).isEmpty)
    // rules before any User-agent line belong to no group: dropped
    assert(Robots.parseRobots("x.org", "Disallow: /orphan\nUser-agent: *\nAllow: /a\n")
      .filterNot(_.rule_path == "").map(_.rule_path) === Seq("/a"))
  }

  test("ignorable lines do NOT end a User-agent run (RFC 9309)") {
    val rules = Robots.parseRobots("x.org",
      "User-agent: a\nSitemap: https://x.org/s.xml\nUser-agent: b\nDisallow: /x\n")
      .filterNot(_.rule_path == "")
      .filter(r => r.directive == "allow" || r.directive == "disallow")
    // a and b share ONE group; /x applies to both
    assert(rules.map(r => (r.group_ix, r.user_agent, r.rule_path)).toSet ===
      Set((0L, "a", "/x"), (0L, "b", "/x")))
  }

  test("an EMPTY named group still shadows * (the whitelist idiom)") {
    val rules = Robots.robotsRules(Seq(("w.org",
      "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"))
      .toDF("host", "body")).localCheckpoint(true)
    val verdicts = Robots.robotsGate(
      Seq((1L, "w.org", "/anything"), (2L, "w.org", "/")).toDF("event_id", "host", "path"),
      rules, "graftbot/1.0").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("allowed")).toMap
    assert(verdicts === Map(1L -> 1L, 2L -> 1L),
      "the whitelisted bot's empty group must hide Disallow: /")
    // any other crawler still hits the * group
    val other = Robots.robotsGate(
      Seq((1L, "w.org", "/anything")).toDF("event_id", "host", "path"),
      rules, "otherbot").collect().head
    assert(other.getAs[Long]("allowed") === 0L)
  }

  test("robotsGate: longest match, Allow tie-break, wildcard/$ rules, defaults") {
    val rules = Robots.robotsRules(Robots.synthRobots(spark)).localCheckpoint(true)
    def gate(ua: String, rows: (Long, String, String)*) =
      Robots.robotsGate(rows.toSeq.toDF("event_id", "host", "path"), rules, ua)
        .collect().map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Long]("allowed"), Option(r.getAs[String]("matched_rule")))).toMap
    val g = gate("somebot/2.0",
      (1L, "h1.org", "/private/doc"),       // prefix disallow
      (2L, "h1.org", "/private/ok/doc"),    // longer Allow carve-out wins
      (3L, "h1.org", "/tmp/a.json"),        // wildcard+anchor disallow
      (4L, "h1.org", "/tmp/a.jsonx"),       // anchor near-miss -> allowed
      (5L, "h1.org", "/public/x"),          // no match -> default allow
      (6L, "h6.org", "/anything"),          // Disallow: / blocks all
      (7L, "nowhere.org", "/x"))            // no robots -> allowed
    assert(g(1L) === (0L, Some("/private")))
    assert(g(2L) === (1L, Some("/private/ok")))
    assert(g(3L) === (0L, Some("/tmp/*.json$")))
    assert(g(4L) === (1L, None))
    assert(g(5L) === (1L, None))
    assert(g(6L) === (0L, Some("/")))
    assert(g(7L) === (1L, None))
    // group exclusivity: graftbot's group HIDES h0's * rules entirely
    val b = gate("graftbot/1.0",
      (1L, "h0.org", "/private/doc"),      // * rule invisible -> allowed
      (2L, "h0.org", "/bot-only/page"),    // bot group disallow
      (3L, "h0.org", "/bot-only/ok"),      // anchored Allow, exact end
      (4L, "h0.org", "/bot-only/okx"),     // anchor misses -> the Disallow wins
      (5L, "h6.org", "/anything"))         // graftbot group hides Disallow: /
    assert(b(1L) === (1L, None))
    assert(b(2L) === (0L, Some("/bot-only")))
    assert(b(3L) === (1L, Some("/bot-only/ok$")))
    assert(b(4L) === (0L, Some("/bot-only")))
    assert(b(5L) === (1L, None))
  }

  test("crawlPolicy: group-chosen delay, lenient parse, sitemap inventory") {
    import spark.implicits._
    val rules = Robots.robotsRules(Robots.synthRobotsPolicy(spark))
    val pol = Robots.crawlPolicy(rules, "graftbot/1.0")
      .collect().map(r => r.getAs[String]("host") ->
        ((Option(r.getAs[java.lang.Double]("crawl_delay")).map(_.toDouble),
          r.getAs[Long]("n_sitemaps"),
          Option(r.getAs[String]("sitemaps_str"))))).toMap
    assert(pol("p0.org") === ((Some(2.5), 0L, None)),
      "named group's 2.5 shadows the * group's 10")
    assert(pol("p1.org") === ((Some(7.0), 1L, Some("https://p1.org/s1.xml"))),
      "repeated delays take the min; mid-run sitemap captured")
    assert(pol("p2.org")._1 === None, "unparseable and negative delays ignored")
    assert(pol("p6.org")._3 === Some("https://p6.org/a.xml,https://p6.org/b.xml"),
      "sitemaps byte-sorted")
    assert(pol("p7.org")._2 === 1L, "duplicate sitemap URLs collapse")
    assert(pol("p8.org")._1 === Some(3.5),
      "a Sitemap between two User-agent lines must not split their group")
    // a different UA sees the * group's delays everywhere
    val star = Robots.crawlPolicy(rules, "otherbot/9")
      .collect().map(r => r.getAs[String]("host") ->
        Option(r.getAs[java.lang.Double]("crawl_delay")).map(_.toDouble)).toMap
    assert(star("p0.org") === Some(10.0))
    // p8: only non-rule lines separate the *, graftbot and extra UA
    // lines, so per RFC grouping they are ONE group — the 3.5 delay
    // belongs to '*' too and otherbot inherits it
    assert(star("p8.org") === Some(3.5),
      "RFC grouping: UA lines separated only by non-rule lines share a group")
  }

  test("crawl-delay never ends a UA run — the gate must not get more permissive") {
    import spark.implicits._
    // the r15 review scenario: if Crawl-delay closed a's group, UA 'a'
    // would lose the Disallow and the gate would wrongly ALLOW /x
    val body = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
    val rules = Robots.robotsRules(Seq(("h.org", body)).toDF("host", "body"))
    val urls = Seq((1L, "h.org", "/x/page")).toDF("event_id", "host", "path")
    Seq("a", "b").foreach { ua =>
      val g = Robots.robotsGate(urls, rules, ua).collect().head
      assert(g.getAs[Long]("allowed") === 0L,
        s"UA '$ua' must still be gated by the shared group's Disallow")
      val pol = Robots.crawlPolicy(rules, ua).collect().head
      assert(pol.getAs[Double]("crawl_delay") === 1.0,
        s"the mid-run delay reaches UA '$ua' after the run settles")
    }
  }

  test("robotsGate never path-matches crawl-delay or sitemap rows") {
    import spark.implicits._
    // a crawl-delay value and a sitemap URL that WOULD match the probed
    // paths if the gate wrongly treated them as rules
    val body = "User-agent: *\nCrawl-delay: /x\nSitemap: /x/deep\nDisallow: /y\n"
    val rules = Robots.robotsRules(Seq(("h.org", body)).toDF("host", "body"))
    val urls = Seq((1L, "h.org", "/x/deep/page"), (2L, "h.org", "/y/page"))
      .toDF("event_id", "host", "path")
    val g = Robots.robotsGate(urls, rules, "anybot")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("allowed")).toMap
    assert(g(1L) === 1L, "policy rows are not path rules")
    assert(g(2L) === 0L, "real Disallow still gates")
  }
}
