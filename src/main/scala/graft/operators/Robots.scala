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
    * belong to no group, per the RFC). Ignorable lines (Sitemap,
    * Crawl-delay, unknown fields, comments, blanks) do NOT end a
    * User-agent run — per RFC 9309 they must be skipped entirely, so
    * `User-agent: a / Sitemap: … / User-agent: b / Disallow: /x` keeps
    * a and b in ONE group.
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
    def declareGroup(): Unit =
      if (uas.nonEmpty)
        uas.reverse.foreach(ua => out += RobotsRule(host, groupIx, ua, "allow", ""))
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
            inUaRun = false
            if (value.nonEmpty && uas.nonEmpty)
              uas.reverse.foreach(ua => out += RobotsRule(host, groupIx, ua, field, value))
          case _ => () // sitemap, crawl-delay, unknown: IGNORED, run intact
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
    // group selection per host: longest matching non-* token wins, else '*'
    val cand = rules
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
