package graft

import org.apache.spark.sql.functions._
import graft.operators.Sitemaps

/** Sitemaps.feedEntries: the RFC 822 / RFC 3339 date corners the q289
  * fixture does not reach, plus the sitemapEntries-shape reshaping. */
class FeedSpec extends SparkSpec {
  import spark.implicits._

  private def ts822(s: String): Any =
    Seq(s).toDF("d").select(Sitemaps.rfc822Utc(col("d")).cast("string"))
      .collect().head.get(0)
  private def ts3339(s: String): Any =
    Seq(s).toDF("d").select(Sitemaps.rfc3339Utc(col("d")).cast("string"))
      .collect().head.get(0)

  test("RFC 822: zone token variants, optional seconds, calendar validation") {
    assert(ts822("Mon, 04 Mar 2024 10:00:00 GMT") === "2024-03-04 10:00:00")
    assert(ts822("04 Mar 2024 10:00 UT") === "2024-03-04 10:00:00",
      "weekday and seconds optional; UT accepted")
    assert(ts822("04 Mar 2024 10:00:00 UTC") === "2024-03-04 10:00:00")
    assert(ts822("04 Mar 2024 10:00:00") === "2024-03-04 10:00:00",
      "missing zone reads as UTC")
    assert(ts822("04 Mar 2024 10:00:00 -0700") === "2024-03-04 17:00:00")
    assert(ts822("Tue, 05 Mar 2024 10:20:30 gmt") === "2024-03-05 10:20:30",
      "zone token is case-insensitive like the month names (r17 review)")
    assert(ts822("45 Mar 2024 10:00:00 GMT") === null,
      "try_to_timestamp validates the calendar: day 45 is NULL, not a throw")
    assert(ts822("04 Foo 2024 10:00:00 GMT") === null, "unknown month")
    assert(ts822("04 Mar 2024 10:00:00 EST") === null,
      "named zones beyond GMT/UT/UTC/Z are out of scope")
  }

  test("RFC 3339: lowercase t/z, fractional seconds, negative offsets") {
    assert(ts3339("2024-03-05T10:20:30Z") === "2024-03-05 10:20:30")
    assert(ts3339("2024-03-05t10:20:30.123z") === "2024-03-05 10:20:30",
      "lowercase markers accepted, fraction truncated")
    assert(ts3339("2024-03-05T00:10:00-01:30") === "2024-03-05 01:40:00")
    assert(ts3339("2024-03-05T10:20:30+05:30") === "2024-03-05 04:50:30")
    assert(ts3339("2024-13-05T10:20:30Z") === null, "month 13 is NULL")
    assert(ts3339("2024-03-05 10:20:30") === null, "space separator is not 3339")
  }

  test("feedAsRevisitEntries reshapes into the sitemapEntries contract") {
    val feeds = Sitemaps.feedEntries(Sitemaps.synthFeeds(spark))
    val reshaped = Sitemaps.feedAsRevisitEntries(feeds)
    assert(reshaped.columns.toSeq ===
      Seq("host", "kind", "loc", "lastmod", "changefreq", "priority"))
    val r = reshaped.filter(col("loc") === "https://f0.org/rss-b0")
      .collect().head
    assert(r.getAs[java.sql.Date]("lastmod").toString === "2024-03-05",
      "+0530 pubDate lands on its UTC calendar day")
    assert(r.getAs[String]("kind") === "url")
    // union with the sitemap half composes without a schema clash
    val entries = Sitemaps.sitemapEntries(Sitemaps.synthSitemaps(spark))
    val union = entries.unionByName(reshaped)
    assert(union.count() === entries.count() + reshaped.count())
  }
}
