package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing — the consumption half of the discovery
  * [[Robots.crawlPolicy]] surfaces (`Sitemap:` lines point at these
  * files): `<urlset>` documents list fetchable pages with optional
  * freshness hints, `<sitemapindex>` documents list MORE sitemaps — a
  * crawler walks the index tree, then feeds `<url>` entries into the
  * frontier beside the link-graph candidates (q267).
  *
  * Parsing is the [[Html]] convention: set-oriented regex extraction
  * (blocks via `regexp_extract_all` → explode → per-field
  * `regexp_extract`), case-insensitive on tag names (real-world feeds
  * mix case even though XML is case-sensitive — lenience over rejection,
  * like every parser here), entity-decoded locs ([[Html.decodeEntities]]
  * — sitemap URLs legally carry `&amp;`), unparseable fields NULL and
  * entries with no usable `<loc>` skipped (the RFC-lenience rule). No
  * XML library, no DOM allocation: the whole parse is codegen'd column
  * work, map-only, zero shuffles.
  *
  * 100 TB shape: sitemap files are per-HOST control-plane data (like
  * robots bodies) — tiny next to the corpus; per-row regex cost is
  * bounded by body size, and entries explode to at most the declared
  * URL count (the spec caps a file at 50k entries / 50 MB). */
object Sitemaps {

  /** A whole `<url>…</url>` entry (whitespace/attrs tolerated on the
    * opening tag; `[^>]*` cannot cross into `<urlset>` because the
    * char after `url` must be space or `>`). */
  val UrlBlockRe = "(?is)<url(?:[ \\t\\n\\x0B\\f\\r][^>]*)?>.*?</url[ \\t\\n\\x0B\\f\\r]*>"
  /** A whole `<sitemap>…</sitemap>` entry of an index document (the
    * same opening-tag contract keeps `<sitemapindex>` unmatched). */
  val SitemapBlockRe = "(?is)<sitemap(?:[ \\t\\n\\x0B\\f\\r][^>]*)?>.*?</sitemap[ \\t\\n\\x0B\\f\\r]*>"
  val LocRe = "(?is)<loc[^>]*>(.*?)</loc"
  val LastmodRe = "(?is)<lastmod[^>]*>(.*?)</lastmod"
  val ChangefreqRe = "(?is)<changefreq[^>]*>(.*?)</changefreq"
  val PriorityRe = "(?is)<priority[^>]*>(.*?)</priority"

  private def field(block: Column, re: String): Column =
    nullif(trim(regexp_extract(block, re, 1)), lit(""))

  /** One row per `<url>` (kind `url`) or `<sitemap>` (kind `sitemap`)
    * entry across all bodies: (host, kind, loc, lastmod DATE,
    * changefreq, priority DOUBLE). `lastmod` accepts the W3C datetime
    * profile by its date prefix (both `2024-03-05` and
    * `2024-03-05T10:20:30+00:00` parse; garbage → NULL); `priority`
    * try_casts (garbage → NULL; the spec's 0.5 default is the READER's
    * business — absent stays NULL so downstream can tell declared from
    * defaulted); `changefreq` lowercased. Entries without a usable loc
    * are skipped. */
  def sitemapEntries(bodies: DataFrame, hostCol: String = "host",
                     bodyCol: String = "body"): DataFrame = {
    val b = Spread.toCores(bodies)
      .select(col(hostCol).as("host"), col(bodyCol).as("_body"))
    val tagged = b.select(col("host"), explode(concat(
        transform(regexp_extract_all(col("_body"), lit(UrlBlockRe), lit(0)),
          x => struct(lit("url").as("kind"), x.as("block"))),
        transform(regexp_extract_all(col("_body"), lit(SitemapBlockRe), lit(0)),
          x => struct(lit("sitemap").as("kind"), x.as("block"))))).as("_e"))
      .select(col("host"), col("_e.kind").as("kind"), col("_e.block").as("_b"))
    tagged
      .select(col("host"), col("kind"),
        Html.decodeEntities(field(col("_b"), LocRe)).as("loc"),
        // try_to_timestamp, not to_date: ANSI mode throws on garbage
        // (the Cleanse P4 convention) and "yesterday" must read as NULL
        try_to_timestamp(substring(field(col("_b"), LastmodRe), 1, 10),
          lit("yyyy-MM-dd")).cast("date").as("lastmod"),
        lower(field(col("_b"), ChangefreqRe)).as("changefreq"),
        field(col("_b"), PriorityRe).try_cast("double").as("priority"))
      .filter(col("loc").isNotNull)
  }

  /** Freshness-aware revisit scheduling — the composition that closes
    * the crawl-scheduling loop the [[sitemapEntries]] (q272) and
    * [[Robots.fetchSchedule]] (q273) halves opened: the sitemap's
    * declared freshness hints (`lastmod`, `changefreq`) against the
    * crawler's own fetch log decide WHICH urls are due for a revisit,
    * and the per-domain polite offsets decide WHEN each due url may be
    * fetched (the Cho & Garcia-Molina revisit-policy family, composed
    * with RFC 9309 Crawl-delay politeness).
    *
    * Inputs: `entries` = [[sitemapEntries]] output (rows with kind
    * `url`; one row per (host, loc) — callers merging overlapping
    * sitemap files dedupe first); `fetchLog` = (url, last_fetch DATE) —
    * urls absent from the log were never fetched; `policy` =
    * [[Robots.crawlPolicy]] output (host, crawl_delay); `asOf` = the
    * evaluation date (explicit, never wall-clock — schedules must
    * replay).
    *
    * Cadence from `changefreq` in integer HOURS (sitemaps.org values):
    * always→0, hourly→1, daily→24, weekly→168, monthly→720,
    * yearly→8760, never→NULL (no cadence — an archive url), absent or
    * unrecognized → `defaultCadenceHours`. Verdicts, in rank order:
    *
    *   - `changed` — `lastmod > last_fetch`: the publisher declared
    *     newer content than our copy. Due, ranked first.
    *   - `new` — no fetch-log row: never fetched. Due, second.
    *   - `stale` — `age_h ≥ cadence_h`: the declared cadence says the
    *     copy has expired. Due, ranked by overdue hours descending.
    *   - `archived` — cadence `never` and not changed: not due.
    *   - `fresh` — inside cadence: not due.
    *
    * All arithmetic is integer hours/ms (the [[Robots.fetchSchedule]]
    * convention — no floats in a schedule): `age_h = ⌊Δepoch_s/3600⌋`
    * from TIMESTAMP-typed `last_fetch` — a timestamp-typed fetch log
    * makes sub-day cadences bite (an `hourly` url fetched this morning
    * reads its true hour age, the r16 ADVICE finding), while a
    * date-typed log degrades to exactly the old `days·24` (midnight −
    * midnight); `overdue_h = age_h − cadence_h` (NULL when either side
    * is undefined). Due rows get `fetch_seq` 1..k per host (rank order
    * above, then priority desc, then url — deterministic) and
    * `fetch_offset_ms = (fetch_seq−1)·delay_ms` with the host's chosen
    * Crawl-delay (or `defaultDelayMs`); non-due rows carry NULL
    * seq/offset but stay visible (the never-vanish membership rule —
    * a dashboard reads the fresh/archived rows too).
    *
    * 100 TB shape: one broadcast policy join + ONE domain-keyed window
    * — the politeness unit is the domain, exactly [[Robots
    * .fetchSchedule]]'s shape; the fetch-log join is url-keyed
    * (shuffle on the natural key). */
  def revisitSchedule(entries: DataFrame, fetchLog: DataFrame,
                      policy: DataFrame, asOf: String,
                      defaultCadenceHours: Long = 168L,
                      defaultDelayMs: Long = 1000L): DataFrame = {
    val cadence = when(col("changefreq") === "always", lit(0L))
      .when(col("changefreq") === "hourly", lit(1L))
      .when(col("changefreq") === "daily", lit(24L))
      .when(col("changefreq") === "weekly", lit(168L))
      .when(col("changefreq") === "monthly", lit(720L))
      .when(col("changefreq") === "yearly", lit(8760L))
      .when(col("changefreq") === "never", lit(null).cast("long"))
      .otherwise(lit(defaultCadenceHours))
    val urls = entries.filter(col("kind") === "url")
      .select(col("host"), col("loc").as("url"), col("lastmod"),
        lower(col("changefreq")).as("changefreq"), col("priority"))
      .withColumn("cadence_h", cadence)
    val logd = fetchLog.select(col("url"),
      col("last_fetch").cast("timestamp").as("last_fetch"))
    val reasoned = urls.join(logd, Seq("url"), "left")
      // epoch-second hours, not datediff·24: a timestamp-typed log
      // keeps sub-day resolution; a date-typed one (midnight) degrades
      // to the identical days·24 (see scaladoc)
      .withColumn("age_h",
        floor((unix_timestamp(lit(asOf).cast("timestamp")) -
          unix_timestamp(col("last_fetch"))).cast("double") / 3600d)
          .cast("long"))
      .withColumn("reason",
        when(col("last_fetch").isNull, lit("new"))
          .when(col("lastmod").isNotNull && col("lastmod") > col("last_fetch"),
            lit("changed"))
          .when(col("cadence_h").isNull, lit("archived"))
          .when(col("age_h") >= col("cadence_h"), lit("stale"))
          .otherwise(lit("fresh")))
      .withColumn("due",
        col("reason").isin("changed", "new", "stale").cast("long"))
      .withColumn("overdue_h",
        when(col("cadence_h").isNotNull && col("last_fetch").isNotNull,
          col("age_h") - col("cadence_h")))
    val rankKey = when(col("reason") === "changed", lit(0))
      .when(col("reason") === "new", lit(1)).otherwise(lit(2))
    val w = Window.partitionBy(col("host"))
      .orderBy(col("due").desc, rankKey.asc,
        col("overdue_h").desc_nulls_last,
        col("priority").desc_nulls_last, col("url").asc)
    val pol = policy.select(col("host"),
      round(col("crawl_delay") * 1000).cast("long").as("_dms"))
    reasoned.join(broadcast(pol), Seq("host"), "left")
      .withColumn("_seq", row_number().over(w).cast("long"))
      .withColumn("fetch_seq", when(col("due") === 1, col("_seq")))
      .withColumn("delay_ms", coalesce(col("_dms"), lit(defaultDelayMs)))
      .select(col("host"), col("url"), col("reason"), col("due"),
        col("cadence_h"), col("overdue_h"), col("priority"),
        col("fetch_seq"), col("delay_ms"),
        when(col("due") === 1,
          (col("fetch_seq") - 1) * col("delay_ms")).as("fetch_offset_ms"))
  }

  /** Fetch-log fixture for [[revisitSchedule]], deterministic by loc
    * length: urls with `len % 5 = 0` are absent (never fetched); the
    * rest were last fetched `2024-02-27 + (len % 8)` days — spread so
    * the q272 fixture's urls land on every verdict (changed, new,
    * stale, fresh). */
  def synthFetchLog(entries: DataFrame): DataFrame =
    entries.filter(col("kind") === "url")
      .select(col("loc").as("url"))
      .filter(pmod(length(col("url")), lit(5)) =!= 0)
      .select(col("url"),
        date_add(lit("2024-02-27").cast("date"),
          pmod(length(col("url")), lit(8)).cast("int")).as("last_fetch"))

  // ---------------------------------------------------------------------
  // RSS 2.0 / Atom feeds — the OTHER freshness-discovery channel beside
  // sitemaps.org (the r16 verdict's #2 item): a feed declares per-entry
  // publication times, so a crawler reads it exactly like a sitemap's
  // lastmod hints — a second `changed` signal source for
  // [[revisitSchedule]]. Same parsing convention as [[sitemapEntries]]:
  // set-oriented regex blocks, case-insensitive tags, entity-decoded
  // urls, unparseable fields NULL, entries without a usable link
  // skipped. Map-only, zero shuffle; feeds are per-host control-plane
  // data like sitemap files.
  // ---------------------------------------------------------------------

  /** A whole RSS `<item>…</item>` block. */
  val ItemBlockRe = "(?is)<item(?:[ \\t\\n\\x0B\\f\\r][^>]*)?>.*?</item[ \\t\\n\\x0B\\f\\r]*>"
  /** A whole Atom `<entry>…</entry>` block. */
  val EntryBlockRe = "(?is)<entry(?:[ \\t\\n\\x0B\\f\\r][^>]*)?>.*?</entry[ \\t\\n\\x0B\\f\\r]*>"
  /** RSS element-content link: `<link>url</link>`. */
  val RssLinkRe = "(?is)<link[^>]*>(.*?)</link"
  val FeedTitleRe = "(?is)<title[^>]*>(.*?)</title"
  val PubDateRe = "(?is)<pubdate[^>]*>(.*?)</pubdate"
  /** Atom attribute link: `<link href="url"/>` (first link of the
    * entry — the leniency convention; rel discrimination is a caller
    * refinement). */
  val AtomLinkHrefRe =
    "(?is)<link[ \\t\\n\\x0B\\f\\r][^>]*?href[ \\t]*=[ \\t]*[\"']([^\"']*)[\"']"
  val UpdatedRe = "(?is)<updated[^>]*>(.*?)</updated"

  /** RFC 822/1123 date (the RSS `pubDate` format): optional weekday,
    * 1-2 digit day, English month name, 4-digit year, HH:MM[:SS],
    * optional zone — `GMT`/`UT`/`UTC`/`Z` or a numeric `±HHMM`. Named
    * zones beyond those are out of scope (→ NULL, the leniency rule). */
  val Rfc822Re = "(?i)^[ \\t]*(?:[A-Za-z]{3}[ \\t]*,[ \\t]*)?(\\d{1,2})[ \\t]+" +
    "([A-Za-z]{3})[ \\t]+(\\d{4})[ \\t]+(\\d{1,2}):(\\d{2})(?::(\\d{2}))?" +
    "[ \\t]*(GMT|UTC?|Z|[+-]\\d{4})?[ \\t]*$"

  /** RFC 3339 timestamp (the Atom `updated` format): date `T` time,
    * optional fractional seconds (ignored), `Z` or `±HH:MM` offset. */
  val Rfc3339Re = "^[ \\t]*(\\d{4})-(\\d{2})-(\\d{2})[Tt]" +
    "(\\d{2}):(\\d{2}):(\\d{2})(?:\\.\\d+)?[ \\t]*([Zz]|[+-]\\d{2}:\\d{2})?[ \\t]*$"

  private def monthNum(m: Column): Column = {
    val ml = lower(m)
    when(ml === "jan", 1).when(ml === "feb", 2).when(ml === "mar", 3)
      .when(ml === "apr", 4).when(ml === "may", 5).when(ml === "jun", 6)
      .when(ml === "jul", 7).when(ml === "aug", 8).when(ml === "sep", 9)
      .when(ml === "oct", 10).when(ml === "nov", 11).when(ml === "dec", 12)
      .otherwise(lit(null).cast("int"))
  }

  /** Assemble UTC from calendar fields + an offset in seconds:
    * try_to_timestamp validates the calendar (a day-45 RSS date reads
    * NULL, never an ANSI throw — the Cleanse P4 convention), then
    * epoch-second arithmetic applies the zone. NULL anywhere → NULL. */
  private def utcFromParts(y: Column, mo: Column, d: Column, hh: Column,
                           mi: Column, ss: Column, offSec: Column): Column = {
    val assembled = concat(y, lit("-"), lpad(mo.cast("string"), 2, "0"),
      lit("-"), lpad(d, 2, "0"), lit(" "), lpad(hh, 2, "0"),
      lit(":"), mi, lit(":"), ss)
    timestamp_seconds(
      unix_timestamp(try_to_timestamp(assembled, lit("yyyy-MM-dd HH:mm:ss")))
        - offSec)
  }

  private def g(s: Column, re: String, i: Int): Column =
    nullif(regexp_extract(s, re, i), lit(""))

  /** `pubDate` string → UTC timestamp (NULL on anything the scope
    * doesn't cover). */
  def rfc822Utc(s: Column): Column = {
    val zone = upper(g(s, Rfc822Re, 7))
    val off = when(zone.isNull || zone.isin("GMT", "UT", "UTC", "Z"), lit(0L))
      .otherwise(
        when(substring(zone, 1, 1) === "-", lit(-1L)).otherwise(lit(1L)) *
          (substring(zone, 2, 2).cast("long") * 3600L +
            substring(zone, 4, 2).cast("long") * 60L))
    utcFromParts(g(s, Rfc822Re, 3), monthNum(g(s, Rfc822Re, 2)),
      g(s, Rfc822Re, 1), g(s, Rfc822Re, 4), g(s, Rfc822Re, 5),
      coalesce(g(s, Rfc822Re, 6), lit("00")), off)
  }

  /** `updated` string → UTC timestamp (NULL outside the scope). */
  def rfc3339Utc(s: Column): Column = {
    val zone = upper(g(s, Rfc3339Re, 7))
    val off = when(zone.isNull || zone === "Z", lit(0L))
      .otherwise(
        when(substring(zone, 1, 1) === "-", lit(-1L)).otherwise(lit(1L)) *
          (substring(zone, 2, 2).cast("long") * 3600L +
            substring(zone, 5, 2).cast("long") * 60L))
    utcFromParts(g(s, Rfc3339Re, 1), g(s, Rfc3339Re, 2), g(s, Rfc3339Re, 3),
      g(s, Rfc3339Re, 4), g(s, Rfc3339Re, 5), g(s, Rfc3339Re, 6), off)
  }

  /** One row per RSS `<item>` (dialect `rss`) or Atom `<entry>`
    * (dialect `atom`) across all bodies: (host, dialect, url, title,
    * published TIMESTAMP, UTC). Links entity-decode ([[Html
    * .decodeEntities]]); entries without a usable link are skipped;
    * dates outside the RFC 822 / RFC 3339 scope read NULL. The date
    * strings are STAGED as real columns before the per-field regex
    * group extractions (the urlProfile lesson — seven group pulls over
    * one staged string, not seven re-runs of the block regex). */
  def feedEntries(bodies: DataFrame, hostCol: String = "host",
                  bodyCol: String = "body"): DataFrame = {
    val b = Spread.toCores(bodies)
      .select(col(hostCol).as("host"), col(bodyCol).as("_body"))
    val tagged = b.select(col("host"), explode(concat(
        transform(regexp_extract_all(col("_body"), lit(ItemBlockRe), lit(0)),
          x => struct(lit("rss").as("dialect"), x.as("block"))),
        transform(regexp_extract_all(col("_body"), lit(EntryBlockRe), lit(0)),
          x => struct(lit("atom").as("dialect"), x.as("block"))))).as("_e"))
      .select(col("host"), col("_e.dialect").as("dialect"),
        col("_e.block").as("_b"))
    val staged = tagged.select(col("host"), col("dialect"),
      Html.decodeEntities(
        when(col("dialect") === "rss", field(col("_b"), RssLinkRe))
          .otherwise(field(col("_b"), AtomLinkHrefRe))).as("url"),
      Html.decodeEntities(field(col("_b"), FeedTitleRe)).as("title"),
      when(col("dialect") === "rss", field(col("_b"), PubDateRe))
        .otherwise(field(col("_b"), UpdatedRe)).as("_date"))
    staged
      .select(col("host"), col("dialect"), col("url"), col("title"),
        when(col("dialect") === "rss", rfc822Utc(col("_date")))
          .otherwise(rfc3339Utc(col("_date"))).as("published"))
      .filter(col("url").isNotNull)
  }

  /** Feed entries reshaped into the [[sitemapEntries]] row contract, so
    * [[revisitSchedule]] consumes both discovery channels through ONE
    * union: the entry's published time becomes `lastmod` (the `changed`
    * signal — a publish newer than our fetch), cadence and priority
    * stay undeclared (the default cadence applies; feeds declare
    * freshness per-entry, not per-url cadence). */
  def feedAsRevisitEntries(feeds: DataFrame): DataFrame =
    feeds.select(col("host"), lit("url").as("kind"), col("url").as("loc"),
      col("published").cast("date").as("lastmod"),
      lit(null).cast("string").as("changefreq"),
      lit(null).cast("double").as("priority"))

  /** Feed fixture: hosts f0..f7.org rotating both dialects and every
    * parse decision —
    *
    *   - i%4=0: RSS 2.0 — a full item (entitied title, weekday + GMT
    *     pubDate) and a second with a 1-digit day and `+0530` offset
    *   - i%4=1: RSS leniency — entity-encoded link needing a trim, an
    *     unparseable pubDate (NULL), a link-less item and an
    *     empty-link item (both skipped)
    *   - i%4=2: Atom — href-attribute links, `Z` and `+02:00` updated
    *     stamps, one rel="alternate"
    *   - i%4=3: Atom uppercase tags, single-quoted HREF, `-01:30`
    *     offset, no title (NULL), and an href-less entry (skipped)
    *
    * All urls/titles closed-form by host index; all timestamps mode
    * constants — the oracle pins both (see q289). */
  def synthFeeds(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 8).map { i =>
      val host = s"f$i.org"
      val base = s"https://$host"
      val body = (i % 4) match {
        case 0 =>
          s"""<?xml version="1.0"?>
             |<rss version="2.0"><channel><title>Feed f$i</title>
             |<item><title>First &amp; Best $i</title>
             |<link>$base/rss-a$i</link>
             |<pubDate>Tue, 05 Mar 2024 10:20:30 GMT</pubDate></item>
             |<item><title>Offset $i</title>
             |<link>$base/rss-b$i</link>
             |<pubDate>5 Mar 2024 23:45:00 +0530</pubDate></item>
             |</channel></rss>""".stripMargin
        case 1 =>
          s"""<rss><channel>
             |<item><link> $base/ent$i?a=1&amp;b=2 </link>
             |<pubDate>not a date</pubDate></item>
             |<item><title>No Link</title></item>
             |<item><link></link></item>
             |</channel></rss>""".stripMargin
        case 2 =>
          s"""<feed xmlns="http://www.w3.org/2005/Atom">
             |<title>Atom f$i</title>
             |<entry><title>Zulu $i</title>
             |<link href="$base/atom-a$i"/>
             |<updated>2024-03-05T10:20:30Z</updated></entry>
             |<entry><title>Plus2 $i</title>
             |<link rel="alternate" href="$base/atom-b$i"/>
             |<updated>2024-03-06T01:30:00+02:00</updated></entry>
             |</feed>""".stripMargin
        case _ =>
          s"""<FEED><ENTRY><LINK HREF='$base/up-a$i'/>
             |<UPDATED>2024-03-04T00:00:00-01:30</UPDATED></ENTRY>
             |<ENTRY><TITLE>nohref</TITLE></ENTRY></FEED>""".stripMargin
      }
      (host, body)
    }.toDF("host", "body")
  }

  /** Sitemap-XML fixture: hosts s0..s7.org rotating every parse
    * decision — a plain urlset (one fully-hinted url, one bare), an
    * entity-encoded loc (`&amp;` in a query string), a namespaced
    * urlset whose entries span newlines, a `<sitemapindex>` with two
    * child sitemaps, an uppercase-tag document (leniency), an empty
    * `<loc></loc>` that must be skipped, an invalid priority and an
    * unparseable lastmod (both NULL), and a full W3C datetime lastmod
    * parsed by its date prefix. Oracle = the pinned expected rows. */
  def synthSitemaps(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 8).map { i =>
      val host = s"s$i.org"
      val base = s"https://$host"
      val body = (i % 4) match {
        case 0 =>
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
             |<url><loc>$base/a$i</loc><lastmod>2024-03-0${i % 3 + 1}</lastmod>
             |<changefreq>Daily</changefreq><priority>0.8</priority></url>
             |<url><loc>$base/b$i</loc></url>
             |</urlset>""".stripMargin
        case 1 =>
          s"""<urlset>
             |<url><loc> $base/q$i?x=1&amp;y=2 </loc>
             |<lastmod>2024-03-05T10:20:30+00:00</lastmod></url>
             |<url><loc></loc><priority>0.9</priority></url>
             |<url><loc>$base/bad$i</loc><lastmod>yesterday</lastmod>
             |<priority>high</priority></url>
             |</urlset>""".stripMargin
        case 2 =>
          s"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
             |<sitemap><loc>$base/sitemap-a.xml</loc>
             |<lastmod>2024-0${i % 2 + 1}-15</lastmod></sitemap>
             |<sitemap><loc>$base/sitemap-b.xml</loc></sitemap>
             |</sitemapindex>""".stripMargin
        case _ =>
          s"""<URLSET><URL><LOC>$base/up$i</LOC>
             |<PRIORITY>0.5</PRIORITY></URL></URLSET>""".stripMargin
      }
      (host, body)
    }.toDF("host", "body")
  }
}
