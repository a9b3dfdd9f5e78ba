package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** robots.txt parsing and evaluation (RFC 9309, the Robots Exclusion
  * Protocol) — the fetch-permission gate every polite crawler runs before
  * a URL enters the frontier. Pairs with [[Urls]]: canonicalize → group
  * by host → join the host's parsed rules → longest-match verdict.
  *
  * Semantics implemented (the RFC + the de-facto Google extensions):
  *   - groups = consecutive `User-agent:` lines followed by rule lines;
  *     a `User-agent:` after a rule line STARTS A NEW group, several in a
  *     row share one group;
  *   - `#` comments stripped, field names case-insensitive, values
  *     trimmed; empty Allow/Disallow values are no-ops (an empty
  *     Disallow means "allow everything", which is exactly what emitting
  *     no rule yields);
  *   - group selection: a non-`*` token matches if it is a
  *     case-insensitive substring of the crawler's user-agent; the
  *     longest matching token's group(s) apply, else the `*` group(s) —
  *     the chosen group is EXCLUSIVE (rules never merge across groups);
  *   - rule matching: `*` matches any char run, a TRAILING `$` anchors
  *     at end-of-path (a mid-rule `$` is outside the supported subset —
  *     documented, not silently misread); the rule with the MOST OCTETS
  *     wins, Allow beats Disallow on ties; no matching rule = allowed;
  *     no robots.txt for the host = allowed.
  *
  * The pattern translate is a FIXED chain of literal `replace` steps
  * (escape regex metas, then `*` → `.*`, then re-anchor the trailing
  * `$`), identical string algebra to the oracle's SQL chain — both
  * engines must build byte-identical regexes or longest-match decisions
  * drift.
  *
  * 100 TB shape: parse is one flatMap over robots bodies (one per host —
  * tiny next to the corpus); evaluation is one host equi-join and a
  * per-URL window. The per-row regex match compiles per (rule, url) pair
  * with Spark's last-pattern cache — rules per host are few by
  * construction. */
object Robots {

  final case class RobotsRule(host: String, group_ix: Long, user_agent: String,
                              directive: String, rule_path: String)

  /** Parse ONE robots.txt body into typed rules. Total: unparseable
    * lines are skipped (the RFC's "ignore what you don't understand"),
    * never thrown on. Rules before any User-agent line are ignored (they
    * belong to no group, per the RFC). Ignorable lines (Sitemap, unknown
    * fields, comments, blanks) do NOT end a User-agent run — per RFC 9309
    * they must be skipped entirely, so `User-agent: a / Sitemap: … /
    * User-agent: b / Disallow: /x` keeps a and b in ONE group.
    *
    * Two polite-scheduler surfaces are CAPTURED rather than dropped
    * (the r14 VERDICT gap):
    *   - `Crawl-delay:` — the de-facto (Bing/Yandex) per-group pacing
    *     extension: emitted as directive `crawl-delay` with the raw
    *     value in rule_path, group-scoped exactly like Allow/Disallow —
    *     but it does NOT end a User-agent run (RFC 9309: non-rule lines
    *     must not interfere with grouping; ending the run would make
    *     the GATE more permissive — `User-agent: a / Crawl-delay: 1 /
    *     User-agent: b / Disallow: /x` must keep /x gating BOTH a and
    *     b, the r15 review finding). A delay seen mid-run is DEFERRED
    *     and emitted for every UA the finished run declares, so it
    *     reaches b as well as a;
    *   - `Sitemap:` — per sitemaps.org the line is host-scoped,
    *     independent of any group: emitted as directive `sitemap`,
    *     group_ix −1, user_agent "" (no group), and it does NOT end a
    *     User-agent run. A `#` in the URL reads as a comment start and
    *     is stripped with the rest of the line — fragments don't
    *     belong in sitemap URLs.
    * [[robotsGate]] matches on allow/disallow only; [[crawlPolicy]]
    * reads the two new directives.
    *
    * Every declared (group, ua) also emits a zero-length SENTINEL row
    * (directive `allow`, rule_path "") so an EMPTY group still EXISTS:
    * the common whitelist idiom `User-agent: bot / Disallow:` followed
    * by `User-agent: * / Disallow: /` must let the named group shadow
    * `*` even though it carries no rules — without the sentinel, group
    * selection falls through to `*` and blocks the whitelisted bot.
    * [[robotsGate]] uses sentinels for group CHOICE only, never for
    * matching. */
  def parseRobots(host: String, body: String): Seq[RobotsRule] = {
    if (body == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var groupIx = -1L
    var uas = List.empty[String]
    var inUaRun = false // true while consuming consecutive User-agent lines
    // delays seen WHILE a UA run is still open: the run may yet declare
    // more UAs (it must stay open — RFC grouping), so emission defers
    // until the run's membership is final
    var pendingDelays = List.empty[String]
    def flushDelays(): Unit = {
      pendingDelays.reverse.foreach(v =>
        uas.reverse.foreach(ua =>
          out += RobotsRule(host, groupIx, ua, "crawl-delay", v)))
      pendingDelays = Nil
    }
    def declareGroup(): Unit = {
      flushDelays()
      if (uas.nonEmpty)
        uas.reverse.foreach(ua => out += RobotsRule(host, groupIx, ua, "allow", ""))
    }
    body.split("\r?\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" if value.nonEmpty =>
            if (!inUaRun) { declareGroup(); groupIx += 1; uas = Nil; inUaRun = true }
            uas = value.toLowerCase :: uas
          case "allow" | "disallow" =>
            if (inUaRun) { inUaRun = false; flushDelays() }
            if (value.nonEmpty && uas.nonEmpty)
              uas.reverse.foreach(ua => out += RobotsRule(host, groupIx, ua, field, value))
          case "crawl-delay" =>
            // group-scoped for EMISSION, ignorable for GROUPING: the UA
            // run stays open (doc header). Mid-run values defer; after
            // the run they emit for the settled membership immediately
            if (value.nonEmpty && uas.nonEmpty) {
              if (inUaRun) pendingDelays = value :: pendingDelays
              else uas.reverse.foreach(ua =>
                out += RobotsRule(host, groupIx, ua, field, value))
            }
          case "sitemap" =>
            // host-scoped, outside any group; the UA run stays intact
            if (value.nonEmpty) out += RobotsRule(host, -1L, "", field, value)
          case _ => () // unknown fields: IGNORED, run intact
        }
      }
    }
    declareGroup()
    out.toSeq
  }

  /** (host, body) rows → one row per parsed rule. */
  def robotsRules(robots: DataFrame, hostCol: String = "host",
                  bodyCol: String = "body"): DataFrame = {
    val enc = Encoders.product[RobotsRule]
    Spread.toCores(robots)
      .select(col(hostCol).cast("string"), col(bodyCol).cast("string"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .flatMap { case (h, b) => parseRobots(h, b) }(enc)
      .toDF()
  }

  /** Rule-path match: translate to an anchored regex via a FIXED chain of
    * literal `replace` steps (backslash first, each meta escaped, `*` →
    * `.*` last; a trailing `$` split off BEFORE the escape and
    * re-appended as the end anchor) and test the path against it. The
    * oracle replays the identical chain — both engines must build
    * byte-identical patterns. */
  private def matchedCol(path: Column, rule: Column): Column = {
    val anchored = rule.endsWith("$")
    val core = when(anchored, rule.substr(lit(1), length(rule) - 1)).otherwise(rule)
    // fixed escape chain — identical order in the oracle SQL
    val metas = Seq("\\" -> "\\\\", "." -> "\\.", "+" -> "\\+", "?" -> "\\?",
      "(" -> "\\(", ")" -> "\\)", "[" -> "\\[", "]" -> "\\]",
      "{" -> "\\{", "}" -> "\\}", "|" -> "\\|", "^" -> "\\^", "$" -> "\\$")
    val escaped = metas.foldLeft(core) { case (acc, (m, r)) =>
      call_function("replace", acc, lit(m), lit(r))
    }
    val starred = call_function("replace", escaped, lit("*"), lit(".*"))
    // the end anchor is \z, not $: Java's '$' also matches before a final
    // newline (a path CAN end in \n — UrlRe's path class admits it), RE2's
    // does not; \z means end-of-text in both, so the byte-identical
    // pattern contract with the oracle holds with identical semantics
    val pattern = concat(lit("^"), starred, when(anchored, lit("\\z")).otherwise(lit("")))
    regexp_like(path, pattern)
  }

  /** Per-URL fetch verdicts for one crawler user-agent.
    *
    * `urls`: (idCol, hostCol, pathCol); `rules`: [[robotsRules]] output.
    * Returns one row per url: (idCol, host, path, allowed 1/0,
    * matched_rule, matched_directive) — NULL rule/directive when the
    * verdict came from the no-match (or no-robots) default-allow. */
  def robotsGate(urls: DataFrame, rules: DataFrame, userAgent: String,
                 idCol: String = "event_id", hostCol: String = "host",
                 pathCol: String = "path"): DataFrame = {
    val uaLc = userAgent.toLowerCase
    // group selection per host: longest matching non-* token wins, else '*'.
    // Only allow/disallow rows participate in the GATE — crawl-delay rows
    // are pacing, sitemap rows are host-scoped discovery ([[crawlPolicy]]);
    // group existence is carried by the zero-length sentinels either way
    val cand = rules
      .filter(col("directive").isin("allow", "disallow"))
      .filter(col("user_agent") === "*" ||
        lit(uaLc).contains(lower(col("user_agent"))))
      .withColumn("_ua_pri",
        when(col("user_agent") === "*", lit(0)).otherwise(length(col("user_agent"))))
    val wHost = Window.partitionBy(col("host"))
    val chosen = cand
      .withColumn("_best", max(col("_ua_pri")).over(wHost))
      .filter(col("_ua_pri") === col("_best"))
      // sentinels (rule_path "") exist so empty groups can WIN the group
      // choice above; they never participate in matching — an empty group
      // then yields no matching rule = default allow, the RFC verdict
      .filter(col("rule_path") =!= "")
      .select(col("host").as("_rh"), col("directive"), col("rule_path"))
    val u = urls.select(col(idCol), col(hostCol).as("host"), col(pathCol).as("path"))
    val joined = u.join(chosen, col("host") === col("_rh"), "left")
      .withColumn("_m", matchedCol(col("path"), col("rule_path")))
    // winner per url among MATCHED rules: most octets, Allow over
    // Disallow on ties, rule text as the final deterministic tie-break
    val wUrl = Window.partitionBy(col(idCol))
      .orderBy(length(col("rule_path")).desc, col("directive").asc,
        col("rule_path").asc)
    val winners = joined.filter(col("_m"))
      .withColumn("_rnk", row_number().over(wUrl)).filter(col("_rnk") === 1)
      .select(col(idCol), col("directive").as("matched_directive"),
        col("rule_path").as("matched_rule"))
    u.join(winners, Seq(idCol), "left")
      .select(col(idCol), col("host"), col("path"),
        when(col("matched_directive") === "disallow", 0L).otherwise(1L)
          .as("allowed"),
        col("matched_rule"), col("matched_directive"))
  }

  /** Per-host polite-scheduler policy for one crawler user-agent: the
    * chosen group's `Crawl-delay` plus the host's `Sitemap` inventory —
    * the two surfaces a fetch scheduler consumes beside the
    * [[robotsGate]] verdict.
    *
    * Group choice replays [[robotsGate]]'s exactly (longest matching
    * non-`*` token, else `*` — sentinels make empty groups choosable),
    * over ALL group-scoped rows so a delay-only named group still
    * shadows `*`. Within the chosen group(s): `crawl_delay` = the MINIMUM
    * parseable non-negative value (the conservative pick when a host
    * repeats the field; unparseable or negative values are ignored per
    * the RFC's lenience, NULL when none survive). Sitemaps are
    * host-scoped: `n_sitemaps` distinct URLs, `sitemaps_str` the
    * byte-sorted comma join (a string, never an array — the driver's
    * comparator contract). One row per host seen in `rules`.
    *
    * 100 TB shape: rules are per-HOST (tiny next to the corpus); two
    * host-keyed aggregates and two broadcastable joins. */
  def crawlPolicy(rules: DataFrame, userAgent: String): DataFrame = {
    val uaLc = userAgent.toLowerCase
    val grouped = rules
      .filter(col("user_agent") =!= "") // group-scoped rows only
      .filter(col("user_agent") === "*" ||
        lit(uaLc).contains(lower(col("user_agent"))))
      .withColumn("_ua_pri",
        when(col("user_agent") === "*", lit(0)).otherwise(length(col("user_agent"))))
    val wHost = Window.partitionBy(col("host"))
    val delays = grouped
      .withColumn("_best", max(col("_ua_pri")).over(wHost))
      .filter(col("_ua_pri") === col("_best"))
      .filter(col("directive") === "crawl-delay")
      .withColumn("_d", col("rule_path").try_cast("double"))
      .filter(col("_d").isNotNull && col("_d") >= 0)
      .groupBy(col("host")).agg(min(col("_d")).as("crawl_delay"))
    val maps = rules.filter(col("directive") === "sitemap")
      .groupBy(col("host"))
      .agg(countDistinct(col("rule_path")).as("n_sitemaps"),
        array_join(array_sort(collect_set(col("rule_path"))), ",").as("sitemaps_str"))
    rules.select(col("host")).distinct()
      .join(delays, Seq("host"), "left")
      .join(maps, Seq("host"), "left")
      .select(col("host"), col("crawl_delay"),
        coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"),
        col("sitemaps_str"))
  }

  /** Per-domain polite fetch schedule — the composition of a frontier
    * with [[crawlPolicy]] that turns "these URLs are worth fetching"
    * into "fetch them WHEN": within each domain, URLs are ranked by
    * (priority desc, url asc — deterministic ties) and the k-th fetch
    * is offset (k−1)·delay_ms from the domain's first slot, where
    * delay_ms is the chosen group's crawl_delay (seconds → ms) or
    * `defaultDelayMs` when the host declares none. Offsets, not
    * absolute times: the caller anchors the epoch (wall clocks don't
    * belong in a deterministic plan).
    *
    * `frontier`: (domainCol, urlCol, priorityCol); `policy`:
    * [[crawlPolicy]] output (or any (host, crawl_delay) frame) keyed by
    * the SAME domain granularity the frontier uses — per-host robots
    * against an eTLD+1 frontier is the caller's mapping decision.
    *
    * 100 TB shape: one domain-keyed window over the frontier (the
    * per-domain fetch queue IS the unit of politeness — partitions are
    * domains, never global) and one broadcastable policy join
    * (host-cardinality). Returns (domain, url, priority, fetch_seq,
    * delay_ms, fetch_offset_ms). */
  def fetchSchedule(frontier: DataFrame, policy: DataFrame,
                    defaultDelayMs: Long = 1000L,
                    domainCol: String = "domain", urlCol: String = "url",
                    priorityCol: String = "priority"): DataFrame = {
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("priority").desc_nulls_last, col("url").asc)
    val pol = policy.select(col("host").as("domain"),
      // ms in exact integers: crawl_delay carries at most the parse's
      // decimal precision, so round(·×1000) is the declared value
      round(col("crawl_delay") * 1000).cast("long").as("_dms"))
    frontier
      .select(col(domainCol).as("domain"), col(urlCol).as("url"),
        col(priorityCol).as("priority"))
      .join(broadcast(pol), Seq("domain"), "left")
      .withColumn("fetch_seq", row_number().over(w).cast("long"))
      .withColumn("delay_ms", coalesce(col("_dms"), lit(defaultDelayMs)))
      .select(col("domain"), col("url"), col("priority"), col("fetch_seq"),
        col("delay_ms"),
        ((col("fetch_seq") - 1) * col("delay_ms")).as("fetch_offset_ms"))
  }

  /** Policy fixture: hosts p0..p8.org rotating every [[crawlPolicy]]
    * decision — a named-group fractional delay shadowing the `*` group's
    * (with a Sitemap line BETWEEN the two User-agent lines, so the run
    * must survive it), a `*`-only integer delay, unparseable ("fast")
    * and negative delays that must be ignored, repeated delays taking
    * the min, and 0/1/2/duplicate sitemap rotations. The oracle rebuilds
    * the rule rows the parse must produce and replays the same group
    * choice + aggregation in SQL. */
  def synthRobotsPolicy(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 9).map { i =>
      val host = s"p$i.org"
      val sb = new StringBuilder
      sb ++= "# policy fixture\n"
      sb ++= "User-Agent: *\n"
      if (i % 4 == 1) sb ++= "Sitemap: https://" + host + "/s1.xml\n" // mid-run: intact
      i % 3 match {
        case 0 =>
          sb ++= "Crawl-Delay: 10\n"
          sb ++= "Disallow: /private\n"
          sb ++= "User-agent: graftbot\n"
          sb ++= "Crawl-delay: 2.5\n"
        case 1 =>
          sb ++= "Crawl-delay: 10\n"
          sb ++= "Crawl-delay: 7\n" // repeated: min wins
        case _ =>
          sb ++= "Crawl-delay: fast\n" // unparseable: ignored
          sb ++= "Crawl-delay: -1\n" // negative: ignored
      }
      i % 4 match {
        case 2 =>
          sb ++= "Sitemap: https://" + host + "/b.xml\n"
          sb ++= "Sitemap: https://" + host + "/a.xml\n" // out of order: sort
        case 3 =>
          sb ++= "Sitemap: https://" + host + "/s.xml\n"
          sb ++= "Sitemap: https://" + host + "/s.xml\n" // duplicate: distinct
        case _ => ()
      }
      if (i == 8) {
        // a Sitemap BETWEEN two User-agent lines: the run must survive,
        // so graftbot and extra share ONE group whose delay shadows the
        // (unparseable) `*` delays above — p8 reads 3.5, not NULL
        sb ++= "User-agent: graftbot\n"
        sb ++= "Sitemap: https://" + host + "/mid.xml\n"
        sb ++= "User-agent: extra\n"
        sb ++= "Crawl-delay: 3.5\n"
      }
      (host, sb.toString)
    }.toDF("host", "body")
  }

  /** robots.txt fixture: hosts h0..h6 with REAL body text — a `*` group
    * (prefix rule, an Allow carve-out, a wildcard+anchor rule), a
    * `graftbot` group on every third host (group EXCLUSIVITY: choosing
    * it must hide the `*` rules), a block-everything host, and comments/
    * blank lines/mixed case throughout so the parser is exercised, not
    * just the matcher. */
  def synthRobots(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 7).map { i =>
      val host = s"h$i.org"
      val sb = new StringBuilder
      sb ++= "# graft crawl policy\n\n"
      sb ++= "User-Agent: *\n"
      if (i == 6) sb ++= "Disallow: /\n"
      else {
        sb ++= "Disallow: /private\n"
        sb ++= "Allow: /private/ok\n"
        sb ++= "Disallow: /tmp/*.json$\n"
        sb ++= "Disallow:\n" // empty value: allow-everything no-op
      }
      if (i % 3 == 0) {
        sb ++= "\nuser-agent: graftbot\n"
        sb ++= "Disallow: /bot-only\n"
        sb ++= "Allow: /bot-only/ok$\n"
      }
      sb ++= "\nSitemap: https://" + host + "/sitemap.xml\n"
      (host, sb.toString)
    }.toDF("host", "body")
  }

  /** Crawl-URL fixture over events: host h(id%7).org, path shape by
    * id%6 — covering the carve-out, the wildcard anchor (match and
    * near-miss), the bot-only prefix, and a plain public path. */
  def synthCrawlUrls(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    Spread.toCores(events).select(id.as("event_id"),
      concat(lit("h"), (id % 7).cast("string"), lit(".org")).as("host"),
      when(id % 6 === 0, concat(lit("/private/doc"), m(9)))
        .when(id % 6 === 1, concat(lit("/private/ok/doc"), m(9)))
        .when(id % 6 === 2, concat(lit("/tmp/data"), m(9), lit(".json")))
        .when(id % 6 === 3, concat(lit("/tmp/data"), m(9), lit(".jsonx")))
        .when(id % 6 === 4, concat(lit("/bot-only/page"), m(9)))
        .otherwise(concat(lit("/public/page"), m(9))).as("path"))
  }
}
