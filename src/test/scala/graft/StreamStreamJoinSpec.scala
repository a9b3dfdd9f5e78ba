package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamStreamJoin

/** Stream×stream interval join through real micro-batches: in-horizon
  * matches, horizon cutoff, and the left-outer null emission that only
  * happens AFTER the global watermark seals the impression's fate. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("attribute: in-horizon click matches, out-of-horizon doesn't, outer seals late") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamStreamJoin.attribute(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      horizon = "30 minutes", watermarkDelay = "10 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // ad 1 clicks inside the horizon; ad 2's click is 90 min late
      imps.addData((1L, ts(10, 0)), (2L, ts(10, 0)))
      clks.addData((1L, ts(10, 15)), (2L, ts(11, 30)))
      q.processAllAvailable()
      val matched = spark.table("ssj_out").collect()
      assert(matched.map(_.getLong(0)).toSet === Set(1L),
        "only the in-horizon click matches")
      assert(matched.head.getTimestamp(2) === ts(10, 15))

      // advance BOTH watermarks past 10:00 + 30m horizon (+10m delay):
      // batch N learns the new max event time, batch N+1 applies it
      imps.addData((99L, ts(13, 0)))
      clks.addData((98L, ts(13, 0)))
      q.processAllAvailable()
      imps.addData((97L, ts(13, 30)))
      clks.addData((96L, ts(13, 30)))
      q.processAllAvailable()

      val all = spark.table("ssj_out").collect()
      val sealedNoMatch = all.filter(r => r.getLong(0) == 2L)
      assert(sealedNoMatch.length === 1, "ad 2 emits exactly once, unmatched")
      assert(sealedNoMatch.head.isNullAt(2),
        "the out-of-horizon click never attaches — click_ts is NULL")
      // the not-yet-sealed tail impressions (13:00/13:30) must NOT emit yet
      assert(!all.exists(r => r.getLong(0) >= 96L),
        "unsealed impressions don't emit in left_outer append mode")
    } finally q.stop()
  }

  test("attribute: inner mode simply drops the unmatched impression") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamStreamJoin.attribute(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      horizon = "30 minutes", watermarkDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(9, 0)), (2L, ts(9, 0)))
      clks.addData((1L, ts(9, 29)), (1L, ts(9, 31)), (2L, ts(8, 59)))
      q.processAllAvailable()
      val rows = spark.table("ssj_inner").collect()
      // ad 1: only the 9:29 click is inside [9:00, 9:30]; ad 2's click
      // PRECEDES the impression — the interval is one-sided by design
      assert(rows.length === 1 && rows.head.getLong(0) === 1L)
      assert(rows.head.getTimestamp(2) === ts(9, 29))
    } finally q.stop()
  }

  test("attribute right_outer: never-attributed click emits with NULL left once sealed") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamStreamJoin.attribute(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      horizon = "30 minutes", watermarkDelay = "10 minutes",
      joinType = "right_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_right")
      .outputMode("append").start()
    try {
      // ad 1 attributes; ad 3's click has NO impression at all
      imps.addData((1L, ts(10, 0)))
      clks.addData((1L, ts(10, 15)), (3L, ts(10, 20)))
      q.processAllAvailable()
      // advance both watermarks far past the click (learn, then apply)
      imps.addData((99L, ts(13, 0))); clks.addData((98L, ts(13, 0)))
      q.processAllAvailable()
      imps.addData((97L, ts(13, 30))); clks.addData((96L, ts(13, 30)))
      q.processAllAvailable()
      val all = spark.table("ssj_right").collect()
      val matched = all.filter(_.getLong(0) == 1L)
      assert(matched.length === 1 && matched.head.getTimestamp(1) === ts(10, 0))
      val orphan = all.filter(_.getLong(0) == 3L)
      assert(orphan.length === 1, "orphan click emits exactly once")
      assert(orphan.head.isNullAt(1),
        "no impression ever matched — imp_ts is NULL")
      assert(orphan.head.getTimestamp(2) === ts(10, 20),
        "the click's own fields survive the NULL left side")
      // state eviction is AUDITED, not hoped: the join operator must have
      // removed buffered rows once the watermark passed their bounds
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "watermark must evict sealed join state")
    } finally q.stop()
  }

  test("attribute full_outer: both sealed-null shapes emit; state drains") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamStreamJoin.attribute(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      horizon = "30 minutes", watermarkDelay = "10 minutes",
      joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_full")
      .outputMode("append").start()
    try {
      // ad 1 attributes; ad 2's impression never converts; ad 3's click
      // never attributes
      imps.addData((1L, ts(10, 0)), (2L, ts(10, 0)))
      clks.addData((1L, ts(10, 15)), (3L, ts(10, 20)))
      q.processAllAvailable()
      imps.addData((99L, ts(13, 0))); clks.addData((98L, ts(13, 0)))
      q.processAllAvailable()
      imps.addData((97L, ts(13, 30))); clks.addData((96L, ts(13, 30)))
      q.processAllAvailable()
      val all = spark.table("ssj_full").collect()
        .filter(_.getLong(0) <= 3L)
      assert(all.count(r => r.getLong(0) == 1L && !r.isNullAt(1) &&
        !r.isNullAt(2)) === 1, "the match emits fully populated")
      val neverConverted = all.filter(_.getLong(0) == 2L)
      assert(neverConverted.length === 1 && neverConverted.head.isNullAt(2),
        "unconverted impression emits (l, NULL)")
      val neverAttributed = all.filter(_.getLong(0) == 3L)
      assert(neverAttributed.length === 1 && neverAttributed.head.isNullAt(1),
        "orphan click emits (NULL, r)")
      // full_outer's eviction doesn't surface in numRowsRemoved (the
      // metric stays 0 even as rows seal) — audit the state TOTALS
      // instead: the buffered count must shrink once the watermark
      // passes the first batch's bounds
      val totals = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal)
      assert(totals.nonEmpty && totals.max > totals.last,
        s"watermark must evict sealed join state: $totals")
    } finally q.stop()
  }

  test("attribute rejects shared non-key columns and bad join types") {
    val l = Seq((1L, ts(1, 0))).toDF("k", "ts")
    val r = Seq((1L, ts(1, 0))).toDF("k", "ts")
    assertThrows[IllegalArgumentException] {
      StreamStreamJoin.attribute(l, r, "k", "ts", "ts")
    }
    val r2 = Seq((1L, ts(1, 0))).toDF("k", "ts2")
    assertThrows[IllegalArgumentException] {
      StreamStreamJoin.attribute(l, r2, "k", "ts", "ts2", joinType = "left_semi")
    }
  }
}
