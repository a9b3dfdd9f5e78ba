package graft

import graft.operators.Sitemaps

/** Sitemaps.revisitSchedule: the cadence values the q276 oracle fixture
  * does not reach (never → archived, always → 0h, monthly) plus the
  * rank order within one host (changed ≻ new ≻ stale-by-overdue) and
  * the politeness offsets over it. */
class RevisitSpec extends SparkSpec {
  import spark.implicits._

  private def entriesDF(rows: Seq[(String, String, String, Option[String], Option[String])]) =
    rows.toDF("host", "kind", "loc", "lastmod_s", "changefreq")
      .selectExpr("host", "kind", "loc",
        "CAST(lastmod_s AS DATE) AS lastmod", "changefreq",
        "CAST(NULL AS DOUBLE) AS priority")

  test("cadence table: never → archived (not due), always → due at any age, monthly") {
    val entries = entriesDF(Seq(
      ("h.org", "url", "https://h.org/never", Some("2024-01-01"), Some("never")),
      ("h.org", "url", "https://h.org/always", None, Some("always")),
      ("h.org", "url", "https://h.org/monthly-in", None, Some("monthly")),
      ("h.org", "url", "https://h.org/monthly-out", None, Some("monthly")),
      ("h.org", "sitemap", "https://h.org/s.xml", None, None)))
    val log = Seq(
      ("https://h.org/never", "2024-03-01"),
      ("https://h.org/always", "2024-03-06"),
      ("https://h.org/monthly-in", "2024-02-20"),   // 16d < 30d
      ("https://h.org/monthly-out", "2024-01-20")   // 47d >= 30d
    ).toDF("url", "last_fetch_s").selectExpr("url",
      "CAST(last_fetch_s AS DATE) AS last_fetch")
    val policy = Seq.empty[(String, Double)].toDF("host", "crawl_delay")
    val out = Sitemaps.revisitSchedule(entries, log, policy, asOf = "2024-03-07")
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    assert(out.size === 4, "sitemap-kind entries are not fetchable urls")
    def f(u: String, c: String) = out(s"https://h.org/$u").getAs[Any](c)
    assert(f("never", "reason") === "archived" && f("never", "due") === 0L)
    assert(f("never", "cadence_h") === null && f("never", "overdue_h") === null)
    assert(f("always", "reason") === "stale" && f("always", "cadence_h") === 0L,
      "always = cadence 0: due the moment a day passes")
    assert(f("monthly-in", "reason") === "fresh" && f("monthly-in", "due") === 0L)
    assert(f("monthly-in", "overdue_h") === 16L * 24 - 720L)
    assert(f("monthly-out", "reason") === "stale" &&
      f("monthly-out", "overdue_h") === 47L * 24 - 720L)
    assert(f("monthly-in", "fetch_seq") === null &&
      f("monthly-in", "fetch_offset_ms") === null,
      "non-due rows stay visible with NULL schedule slots")
  }

  test("rank order within a host: changed, then new, then stale by overdue; offsets spaced by delay") {
    val entries = entriesDF(Seq(
      ("h.org", "url", "https://h.org/stale-small", None, Some("daily")),
      ("h.org", "url", "https://h.org/stale-big", None, Some("daily")),
      ("h.org", "url", "https://h.org/new", None, None),
      ("h.org", "url", "https://h.org/changed", Some("2024-03-05"), Some("weekly"))))
    val log = Seq(
      ("https://h.org/stale-small", "2024-03-05"), // 2d vs daily: overdue 24h
      ("https://h.org/stale-big", "2024-03-01"),   // 6d vs daily: overdue 120h
      ("https://h.org/changed", "2024-03-04")      // lastmod 03-05 > fetch 03-04
    ).toDF("url", "last_fetch_s").selectExpr("url",
      "CAST(last_fetch_s AS DATE) AS last_fetch")
    val policy = Seq(("h.org", 2.5)).toDF("host", "crawl_delay")
    val out = Sitemaps.revisitSchedule(entries, log, policy, asOf = "2024-03-07")
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("reason"), r.getAs[Long]("fetch_seq"),
          r.getAs[Long]("delay_ms"), r.getAs[Long]("fetch_offset_ms")))).toMap
    assert(out("https://h.org/changed") === (("changed", 1L, 2500L, 0L)))
    assert(out("https://h.org/new") === (("new", 2L, 2500L, 2500L)))
    assert(out("https://h.org/stale-big") === (("stale", 3L, 2500L, 5000L)),
      "more-overdue stale ranks before less-overdue")
    assert(out("https://h.org/stale-small") === (("stale", 4L, 2500L, 7500L)))
  }

  test("timestamp-typed fetch log: sub-day ages make hourly cadences bite (r16 ADVICE)") {
    val entries = entriesDF(Seq(
      ("h.org", "url", "https://h.org/hourly-due", None, Some("hourly")),
      ("h.org", "url", "https://h.org/hourly-fresh", None, Some("hourly"))))
    val log = Seq(
      ("https://h.org/hourly-due", "2024-03-06 20:30:00"),  // 3.5h before asOf
      ("https://h.org/hourly-fresh", "2024-03-06 23:40:00") // 20min before
    ).toDF("url", "last_fetch_s").selectExpr("url",
      "CAST(last_fetch_s AS TIMESTAMP) AS last_fetch")
    val policy = Seq.empty[(String, Double)].toDF("host", "crawl_delay")
    // asOf casts to midnight 2024-03-07 00:00
    val out = Sitemaps.revisitSchedule(entries, log, policy, asOf = "2024-03-07")
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    def f(u: String, c: String) = out(s"https://h.org/$u").getAs[Any](c)
    assert(f("hourly-due", "reason") === "stale" &&
      f("hourly-due", "overdue_h") === 2L,
      "epoch-hour arithmetic: 3h30m floors to age 3h >= cadence 1h, overdue 2h")
    assert(f("hourly-fresh", "reason") === "fresh" &&
      f("hourly-fresh", "overdue_h") === -1L,
      "20 minutes floors to age 0h < 1h: same-day fetches are no longer " +
        "all day-age 0, only genuinely-recent ones read fresh")
  }
}
