package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventAggregates
import graft.streaming.EventAggregates.{UserEvent, UserSummary}

/** Structured-Streaming semantics driven through real micro-batch
  * execution (MemoryStream source → memory sink): watermark finalization
  * for windowed aggs, and keyed state across triggers for
  * mapGroupsWithState. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("StreamingAudit: per-batch contract verdicts merge exactly-once and SUM to the batch audit") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Expectations.Rule
    import org.apache.spark.sql.functions.col
    val store = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-stream-audit").toString,
      nBuckets = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sa-ckpt").toString
    val in = MemoryStream[(Long, Double)]
    val stream = in.toDF().toDF("id", "v")
    val rules = Seq(Rule("v_nonneg", col("v") >= 0))
    val keys = Seq("pk" -> Seq("id"))
    def drain(c: String = ckpt): Unit = {
      val q = graft.streaming.StreamingAudit.start(
        stream, rules, keys, store, "verdicts", c)
      q.awaitTermination()
    }
    val b0 = Seq((1L, 1.0), (2L, -1.0), (2L, 3.0)) // 1 range violation, 1 dup pair
    val b1 = Seq((4L, -2.0), (5L, -3.0))           // 2 range violations
    in.addData(b0: _*); drain()
    in.addData(b1: _*); drain()
    def verdicts() = store.read("verdicts")
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("rule")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass")))
      .toMap
    val v = verdicts()
    assert(v((0L, "v_nonneg")) === ((3L, 1L, false)))
    assert(v((0L, "pk")) === ((3L, 2L, false)), "both rows of the dup key count")
    assert(v((1L, "v_nonneg")) === ((2L, 2L, false)))
    assert(v((1L, "pk")) === ((2L, 0L, true)))
    // row-rule counts ADD across batches = the batch audit of all data
    val whole = graft.operators.Expectations.audit(
        (b0 ++ b1).toDF("id", "v"), rules, Nil)
      .collect().head
    val streamedTotal = v.collect { case ((_, "v_nonneg"), (_, viol, _)) => viol }.sum
    assert(whole.getLong(2) === streamedTotal,
      "per-batch verdicts sum to the whole-data audit for row rules")
    // replay the last micro-batch from a fresh checkpoint: keyed MERGE
    // on (batch_id, rule) absorbs it — verdicts unchanged
    val in2 = MemoryStream[(Long, Double)]
    in2.addData(b1: _*)
    val q2 = graft.streaming.StreamingAudit.start(
      in2.toDF().toDF("id", "v"), rules, keys, store, "verdicts",
      java.nio.file.Files.createTempDirectory("graft-sa-ckpt2").toString)
    q2.awaitTermination()
    // the replay lands as batch_id 0 of the new checkpoint: it overwrites
    // batch 0's verdicts with b1's numbers — the keyed-merge contract is
    // "same (batch, rule) key never duplicates", proven by row count
    assert(store.read("verdicts").count() === 6L,
      "replays merge by key — no verdict-row duplication")
  }

  test("StreamingDrift: per-batch PSI is bit-identical to Stats.psi inside the reference span") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val store = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-drift").toString, nBuckets = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString
    // reference holds both extremes, so the frozen span = the union span
    val refRows = Seq(0.0, 1.0, 2.0, 3.0, 10.0, 10.0, 9.0, 8.0)
    val ref = refRows.map(Tuple1(_)).toDF("v")
    val in = MemoryStream[Double]
    val stream = in.toDF().toDF("v")
    def drain(): Unit = {
      val q = graft.streaming.StreamingDrift.start(stream, ref, "v",
        bins = 4, threshold = 0.1, store = store,
        verdictTable = "drift", checkpointDir = ckpt)
      q.awaitTermination()
    }
    val b0 = Seq(0.5, 1.5, 9.5, 10.0) // balanced like the reference
    val b1 = Seq(0.1, 0.2, 0.3, 0.4, 0.5) // all low bins: drifted
    in.addData(b0: _*); drain()
    in.addData(b1: _*); drain()
    val v = store.read("drift").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Double]("psi"), r.getAs[Boolean]("drifted"))).toMap
    // bit-identity with the batch operator on the tagged union frame
    def batchPsi(cur: Seq[Double]): Double = {
      val union = refRows.map(x => ("ref", x)) ++ cur.map(x => ("cur", x))
      graft.operators.Stats.psi(union.toDF("grp", "v"), "grp", "v", bins = 4)
        .filter(col("grp_a") === "cur").collect().head.getDouble(2)
    }
    assert(v(0L)._1 === batchPsi(b0), s"batch 0: ${v(0L)._1} vs ${batchPsi(b0)}")
    assert(v(1L)._1 === batchPsi(b1), s"batch 1: ${v(1L)._1} vs ${batchPsi(b1)}")
    assert(!v(0L)._2 && v(1L)._2, s"only the shifted batch drifts: $v")
    // out-of-span values clamp into edge bins instead of vanishing
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-drift-ck2").toString
    val in2 = MemoryStream[Double]
    in2.addData(Seq(-5.0, 50.0, 50.0, 50.0): _*)
    // small counts + add-one smoothing damp the score: threshold low here
    val q2 = graft.streaming.StreamingDrift.start(in2.toDF().toDF("v"), ref, "v",
      bins = 4, threshold = 0.05, store = store,
      verdictTable = "drift2", checkpointDir = ckpt2)
    q2.awaitTermination()
    val d2 = store.read("drift2").collect().head
    assert(d2.getAs[Long]("n_rows") === 4L && d2.getAs[Boolean]("drifted"),
      "outliers beyond the frozen span count in the edge bins and flag drift")
  }

  test("StreamingConformal: per-batch coverage equals the batch operator; breach fires on shift; replay merges") {
    implicit val sqlCtx = spark.sqlContext
    val store = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-conf").toString, nBuckets = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-conf-ckpt").toString
    // calibration: group "g", 19 scores 1..19 — α = 1/10 → k = 18, qhat = 18.0
    val calRows = (1 to 19).map(i => ("g", i.toDouble))
    val cal = calRows.toDF("grp", "s")
    val in = MemoryStream[(String, Double)]
    val stream = in.toDF().toDF("grp", "s")
    def drain(): Unit = {
      val q = graft.streaming.StreamingConformal.start(stream, cal, "grp", "s",
        alphaNum = 1L, alphaDen = 10L, minCovNum = 85L, minCovDen = 100L,
        store = store, verdictTable = "conf", checkpointDir = ckpt)
      q.awaitTermination()
    }
    val b0 = (1 to 10).map(i => ("g", i.toDouble))          // all ≤ 18: covered
    val b1 = (1 to 10).map(i => ("g", 17.0 + i))            // shift: 18..27, 1/10 covered
    in.addData(b0: _*); drain()
    in.addData(b1: _*); drain()
    val v = store.read("conf").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_covered"), r.getAs[Double]("coverage"),
          r.getAs[Boolean]("breached")))).toMap
    assert(v(0L) === ((10L, 1.0, false)))
    assert(v(1L) === ((1L, 0.1, true)), "shifted batch must breach")
    // equivalence with the batch operator on the same calibration + batch
    def batchCoverage(batch: Seq[(String, Double)]): (Long, Double) = {
      val df = calRows.map { case (g, s) => (g, s, true) }
        .++(batch.map { case (g, s) => (g, s, false) })
        .toDF("grp", "s", "is_cal")
      val r = graft.operators.Eval.conformalCalibration(
        df, "grp", "s", "is_cal", 1L, 10L).collect().head
      (r.getAs[Long]("n_covered"), r.getAs[Double]("coverage"))
    }
    assert(batchCoverage(b0) === ((v(0L)._1, v(0L)._2)))
    assert(batchCoverage(b1) === ((v(1L)._1, v(1L)._2)))
    // replay from a fresh checkpoint: keyed MERGE absorbs the duplicate
    val in2 = MemoryStream[(String, Double)]
    in2.addData(b1: _*)
    val q2 = graft.streaming.StreamingConformal.start(
      in2.toDF().toDF("grp", "s"), cal, "grp", "s", 1L, 10L, 85L, 100L,
      store, "conf", java.nio.file.Files.createTempDirectory("graft-conf-ck2").toString)
    q2.awaitTermination()
    assert(store.read("conf").count() === 2L,
      "replays merge by (batch_id, group) — no verdict duplication")
    // a too-small calibration group (k > n) covers everything honestly
    val store2 = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-conf2").toString, nBuckets = 4)
    val in3 = MemoryStream[(String, Double)]
    in3.addData(("t", 1e9))
    val q3 = graft.streaming.StreamingConformal.start(
      in3.toDF().toDF("grp", "s"),
      Seq(("t", 1.0), ("t", 2.0)).toDF("grp", "s"), "grp", "s", 1L, 10L,
      85L, 100L, store2, "conf",
      java.nio.file.Files.createTempDirectory("graft-conf-ck3").toString)
    q3.awaitTermination()
    val inf = store2.read("conf").collect().head
    assert(inf.getAs[Long]("n_covered") === 1L && !inf.getAs[Boolean]("breached"),
      "k > n means an infinite threshold: everything covered, no breach")
    // a group ABSENT from calibration surfaces as unscored + breached
    val store3 = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-conf3").toString, nBuckets = 4)
    val in4 = MemoryStream[(String, Double)]
    in4.addData(("known", 1.0), ("NEW", 5.0), ("NEW", 6.0))
    val q4 = graft.streaming.StreamingConformal.start(
      in4.toDF().toDF("grp", "s"), cal.withColumn("grp", lit("known")),
      "grp", "s", 1L, 10L, 85L, 100L, store3, "conf",
      java.nio.file.Files.createTempDirectory("graft-conf-ck4").toString)
    q4.awaitTermination()
    val byGrp = store3.read("conf").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val nw = byGrp("NEW")
    assert(nw.getAs[Long]("n_rows") === 2L &&
      nw.isNullAt(nw.fieldIndex("coverage")) && nw.getAs[Boolean]("breached"),
      "an uncalibrated group must alarm, not vanish")
    // NULL scores must surface, not silently shrink the denominator: an
    // all-NULL group alarms as unscored; a partial-NULL batch shows the
    // exclusion (n_rows > n_scored) with coverage over the scored rows
    val store4 = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-conf4").toString, nBuckets = 4)
    val in5 = MemoryStream[(String, java.lang.Double)]
    in5.addData(("g", null), ("g", null),
      ("g", java.lang.Double.valueOf(5.0)),
      ("h", null))   // h: calibrated but ALL scores NULL this batch
    val q5 = graft.streaming.StreamingConformal.start(
      in5.toDF().toDF("grp", "s"),
      cal.unionByName(cal.withColumn("grp", lit("h"))),
      "grp", "s", 1L, 10L, 85L, 100L, store4, "conf",
      java.nio.file.Files.createTempDirectory("graft-conf-ck5").toString)
    q5.awaitTermination()
    val nulls = store4.read("conf").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val g = nulls("g")
    assert(g.getAs[Long]("n_rows") === 3L && g.getAs[Long]("n_scored") === 1L &&
      g.getAs[Long]("n_covered") === 1L && g.getAs[Double]("coverage") === 1.0,
      "partial NULLs: coverage over the scored remainder, exclusion visible")
    val h = nulls("h")
    assert(h.getAs[Long]("n_scored") === 0L &&
      h.isNullAt(h.fieldIndex("coverage")) && h.getAs[Boolean]("breached"),
      "an all-NULL-score group must alarm as unscored, never go silent")
    assert(!byGrp("known").getAs[Boolean]("breached"))
  }

  test("watermarked tumbling windows finalize once the watermark passes (T4)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = EventAggregates.windowedCounts(events, "6 hours", "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    try {
      // two events in window [00:00, 06:00), one far later that advances
      // the watermark beyond 06:00 + 1h, finalizing the first window
      in.addData((1L, ts(1), 10L, 5.0), (2L, ts(2), 11L, 7.0))
      q.processAllAvailable()
      in.addData((3L, ts(20), 10L, 1.0))
      q.processAllAvailable()
      in.addData((4L, ts(23), 12L, 2.0)) // one more trigger to emit finalized
      q.processAllAvailable()

      val out = spark.table("win_out").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[Long]("n"), r.getAs[Double]("total_value")))
      assert(out.contains(("2024-01-01 00:00:00.0", 2L, 12.0)),
        s"first window must finalize with both events, got ${out.mkString(";")}")
      // the late-hours window is NOT final yet (watermark hasn't passed it)
      assert(!out.exists(_._1 == "2024-01-01 18:00:00.0"))
    } finally q.stop()
  }

  test("HLL sketch aggregate runs under streaming state (windowed approx distinct users)") {
    // TypedImperativeAggregates must serialize through the streaming state
    // store; a windowed hllApproxCountDistinct proves the sketch family
    // works in Structured Streaming, not just batch
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long)]
    val events = in.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "1 hour")
    val agg = events
      .groupBy(org.apache.spark.sql.functions.window($"ts", "6 hours"))
      .agg(graft.functions.Sketches.hllApproxCountDistinct($"user_id").as("approx_users"))
      .select($"window.start".as("window_start"), $"approx_users")
    val q = agg.writeStream.format("memory").queryName("hll_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // 40 distinct users across two micro-batches in the first window —
      // the sketch must MERGE across batches through the state store
      in.addData((1L to 20L).map(i => (i, ts(1), i)): _*)
      q.processAllAvailable()
      in.addData((21L to 40L).map(i => (i, ts(2), i)): _*)
      q.processAllAvailable()
      in.addData((99L, ts(20), 99L)) // advance watermark, finalize window 1
      q.processAllAvailable()
      in.addData((100L, ts(23), 100L))
      q.processAllAvailable()
      val out = spark.table("hll_out").collect()
        .map(r => r.getAs[Timestamp]("window_start").toString -> r.getAs[Double]("approx_users"))
        .toMap
      val est = out("2024-01-01 00:00:00.0")
      // precision-9 HLL on 40 distincts: comfortably within ±20%
      assert(est >= 32 && est <= 48,
        s"cross-batch merged estimate must be ~40, got $est")
    } finally q.stop()
  }

  test("continuous ProcessingTime trigger ingests files fed WHILE running (T1 parity)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-serve-feed").toString
    val root = Files.createTempDirectory("graft-serve-tables").toString
    val ckpt = Files.createTempDirectory("graft-serve-ckpt").toString
    def writeMsgs(file: String, ids: Range, tag: String): Unit = {
      val pw = new java.io.PrintWriter(s"$dir/$file")
      ids.foreach { i =>
        pw.println(s"""{"id":"$i","sale_customer_id":"$i","customer_first_name":"F$i","customer_last_name":"L${i}_$tag","store_name":"S${i % 3}","sale_date":"3/14/2021","sale_quantity":"1","sale_total_price":"2.50"}""")
      }
      pw.close()
    }
    writeMsgs("m0.jsonl", 1 to 20, "t0")
    val store = new graft.plans.BucketedMergeWriter(spark, root, nBuckets = 4)
    val q = graft.streaming.StreamToStar.serveFromJsonFiles(
      spark, s"$dir/*.jsonl", store, ckpt, "200 milliseconds")
    try {
      def factCount: Long =
        if (store.exists("fact_sales")) store.read("fact_sales").count() else 0L
      def waitFor(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 90000
        while (factCount != n && System.currentTimeMillis() < deadline) Thread.sleep(250)
        assert(factCount === n)
      }
      waitFor(20)
      // unlike AvailableNow, the query is still live after draining —
      // run-until-cancelled, the reference's service mode
      assert(q.isActive, "ProcessingTime query must keep running after drain")
      writeMsgs("m1.jsonl", 11 to 30, "t1") // fed while the query runs
      waitFor(30)
      // last-write-wins picked the newer file for the overlapping ids
      val names = store.read("dim_customer")
        .select(col("source_customer_id"), col("customer_name")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(names(15L).endsWith("_t1") && names(5L).endsWith("_t0"))
      assert(q.isActive)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses replayed events in-flight") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val events = in.toDF().toDF("event_id", "ts", "value")
    val q = graft.streaming.EventAggregates
      .dedupWithinWatermark(events, Seq("event_id"), watermark = "2 hours")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((1L, ts(1), 5.0), (2L, ts(2), 7.0), (1L, ts(1), 5.0)) // in-batch dup
      q.processAllAvailable()
      in.addData((1L, ts(1), 5.0), (3L, ts(3), 9.0)) // cross-batch replay of id 1
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L),
        s"each event id must survive exactly once, got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = graft.streaming.EventAggregates.intervalJoin(
      clicks.toDF().toDF("user_id", "cts", "page"),
      buys.toDF().toDF("user_id", "bts", "amount"),
      key = "user_id", leftTs = "cts", rightTs = "bts", maxLag = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: click at 01:00, buys at 01:10 (within lag) and 02:30 (too
      // late); user 2 buys with no click; user 3 clicks, never buys
      clicks.addData((1L, ts(1), "/shoes"), (3L, ts(1, 30), "/hats"))
      buys.addData((1L, ts(1, 10), 99.0), (2L, ts(1, 20), 5.0))
      q.processAllAvailable()
      buys.addData((1L, ts(2, 30), 42.0))
      q.processAllAvailable()
      // advance both watermarks so earlier results finalize
      clicks.addData((9L, ts(6), "/x")); buys.addData((9L, ts(6, 1), 1.0))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("page"),
          r.getAs[Double]("amount"))).toSet
      assert(rows.contains((1L, "/shoes", 99.0)), s"in-window pair must join: $rows")
      assert(!rows.exists(t => t._1 == 1L && t._3 == 42.0),
        s"purchase past maxLag must NOT attribute: $rows")
      assert(!rows.exists(_._1 == 2L), "clickless purchase must drop (inner join)")
      assert(!rows.exists(_._1 == 3L), "buyless click must drop (inner join)")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-user running totals across triggers (T5)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = EventAggregates.userRunningTotals(in.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()

    try {
      in.addData(UserEvent(1L, ts(1), 10.0), UserEvent(1L, ts(2), 5.0),
        UserEvent(2L, ts(1), 1.0))
      q.processAllAvailable()
      in.addData(UserEvent(1L, ts(3), 2.0))
      q.processAllAvailable()

      val rows = spark.table("state_out").as[UserSummary].collect()
      // latest emission per user reflects accumulated state
      val latest = rows.groupBy(_.user_id).map { case (u, rs) =>
        u -> rs.maxBy(_.n_events)
      }
      assert(latest(1L).n_events === 3L)
      assert(latest(1L).total_value === 17.0)
      assert(latest(1L).last_ts === ts(3))
      assert(latest(2L).n_events === 1L)
    } finally q.stop()
  }

  test("streaming sessionization finalizes on the watermark; late events re-slot (T5)") {
    import graft.streaming.EventAggregates.{SessEvent, Session}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val q = EventAggregates.sessionizeStream(in.toDS(), gapMinutes = 30,
      watermark = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def rows() = spark.table("sess_out").as[Session].collect()
    try {
      // user 1: two events 10 min apart, then a 12:00 event 110 min later.
      // The first session must NOT emit before the watermark seals it —
      // an on-time event could still arrive inside it.
      in.addData(SessEvent(1L, ts(10, 0)), SessEvent(1L, ts(10, 10)))
      q.processAllAvailable()
      assert(rows().isEmpty, "nothing can finalize while the watermark is behind")
      in.addData(SessEvent(1L, ts(12, 0)))
      q.processAllAvailable() // watermark -> 11:55 ≥ 10:40: session 1 seals
      q.processAllAvailable()
      assert(rows().exists(s =>
        s.user_id == 1L && s.session_start == ts(10, 0) &&
          s.session_end == ts(10, 10) && s.n_events == 2L && s.duration_sec == 600L),
        s"watermark-sealed session missing: ${rows().mkString(";")}")

      // a LATE but on-time event (11:58 > watermark 11:55) lands before
      // user 1's open 12:00 event: it must join that session and lower its
      // start — the case eager gap-emission would get wrong
      in.addData(SessEvent(1L, ts(11, 58)), SessEvent(2L, ts(12, 5)))
      q.processAllAvailable()
      in.addData(SessEvent(9L, ts(20, 0))) // watermark -> 19:55: all sealed
      q.processAllAvailable()
      q.processAllAvailable()
      val all = rows()
      assert(all.exists(s => s.user_id == 1L && s.session_start == ts(11, 58) &&
        s.session_end == ts(12, 0) && s.n_events == 2L && s.duration_sec == 120L),
        s"late event must extend the open session backward: ${all.mkString(";")}")
      assert(!all.exists(s => s.user_id == 1L && s.session_start == ts(12, 0)),
        s"the 12:00 event must not form its own session: ${all.mkString(";")}")
      assert(all.exists(s => s.user_id == 2L && s.n_events == 1L &&
        s.session_start == ts(12, 5)), s"u2's lone session missing: ${all.mkString(";")}")
      assert(all.groupBy(s => (s.user_id, s.session_start)).forall(_._2.length == 1),
        s"duplicate session emission: ${all.mkString(";")}")
    } finally q.stop()
  }

  test("StreamingQuantiles: cumulative sketch equals the batch operator bit-for-bit; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-sq-store").toString,
      nBuckets = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sq-ckpt").toString
    val in = MemoryStream[(Long, Double)]
    val stream = in.toDF().toDF("id", "v")
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    def drain(c: String = ckpt, src: MemoryStream[(Long, Double)] = in): Unit = {
      val q = graft.streaming.StreamingQuantiles.start(
        stream = src.toDF().toDF("id", "v"), valueCol = "v", idCols = Seq("id"),
        qs = qs, store = store, stateTable = "q_state", verdictTable = "q_verdicts",
        checkpointDir = c, k = 64)
      q.awaitTermination()
    }
    // heavy-ish tail, unique ids, three arbitrary batch cuts
    val all = (1 to 500).map(i => (i.toLong, math.exp((i * 7919 % 500) / 80.0)))
    val (b0, rest) = all.splitAt(137); val (b1, b2) = rest.splitAt(211)
    in.addData(b0: _*); drain()
    in.addData(b1: _*); drain()
    in.addData(b2: _*); drain()
    val verdicts = store.read("q_verdicts")
      .collect().map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n_sample"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))
      .toMap
    assert(verdicts.keySet === Set(0L, 1L, 2L))
    assert(verdicts(0L)._1 === 64L, "sample saturates at k")
    // the final verdict must BIT-match the batch operator over ALL data:
    // same hash, same k, same readout expressions
    val batchDf = spark.createDataFrame(all).toDF("id", "v")
      .withColumn("g", org.apache.spark.sql.functions.lit(1))
    val expected = graft.operators.ApproxQuantile
      .sampledQuantiles(batchDf, "g", "v", Seq("id"), qs, k = 64)
      .collect().head
    assert(verdicts(2L)._2 === expected.getAs[Double]("p50"),
      s"streamed p50 ${verdicts(2L)._2} != batch ${expected.getAs[Double]("p50")}")
    assert(verdicts(2L)._3 === expected.getAs[Double]("p90"))
    // replaying the last batch from a fresh checkpoint: same rows -> same
    // pairs -> set-dedup absorbs them; state rows unchanged, verdict count
    // unchanged (the replay's batch 0 overwrites by key)
    val stateBefore = store.read("q_state")
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Double]("v"))).toSet
    val in2 = MemoryStream[(Long, Double)]
    in2.addData(b2: _*)
    drain(java.nio.file.Files.createTempDirectory("graft-sq-ckpt2").toString, in2)
    val stateAfter = store.read("q_state")
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Double]("v"))).toSet
    assert(stateAfter === stateBefore, "replayed rows must be absorbed by the set state")
    assert(store.read("q_verdicts").count() === 3L)
  }

  test("StreamingHeavyHitters: bounds contain exact counts, heavy items never missed, watermark absorbs replays") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-shh-store").toString,
      nBuckets = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shh-ckpt").toString
    val in = MemoryStream[String]
    def drain(c: String = ckpt, src: MemoryStream[String] = in): Unit = {
      val q = graft.streaming.StreamingHeavyHitters.start(
        src.toDF().toDF("item"), "item", k = 10, store = store,
        stateTable = "hh_state", verdictTable = "hh_verdicts",
        checkpointDir = c, cap = 64, topM = 10)
      q.awaitTermination()
    }
    // skewed stream: two global heavies + a long singleton tail; h2 is
    // deliberately spread so it is NOT heavy in every single batch
    val b0 = Seq.fill(60)("h1") ++ Seq.fill(25)("h2") ++ (1 to 100).map(i => s"t0_$i")
    val b1 = Seq.fill(50)("h1") ++ Seq.fill(30)("h2") ++ (1 to 120).map(i => s"t1_$i")
    val b2 = Seq.fill(40)("h1") ++ Seq.fill(35)("h2") ++ (1 to 110).map(i => s"t2_$i")
    in.addData(b0: _*); drain()
    in.addData(b1: _*); drain()
    in.addData(b2: _*); drain()
    val all = b0 ++ b1 ++ b2
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val st = store.read("hh_state").collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("aerr"))).toMap
    val meta = store.read("hh_state").head()
    val errAll = meta.getAs[Long]("err_all")
    val floorErr = meta.getAs[Long]("floor_err")
    // invariant 1: cnt <= true <= cnt + aerr for every tracked item
    st.foreach { case (item, (cnt, aerr)) =>
      val t = exact.getOrElse(item, 0L)
      assert(cnt <= t && t <= cnt + aerr,
        s"$item: true $t outside [${cnt}, ${cnt + aerr}]")
    }
    // invariant 2: every item with true count > err_all + floor_err is
    // tracked (err_all alone is NOT a valid absence bound once pruning
    // has engaged: a pruned item re-accrues on top of its pruned bound)
    exact.foreach { case (item, t) =>
      if (t > errAll + floorErr)
        assert(st.contains(item), s"heavy $item (count $t) lost")
    }
    assert(st.contains("h1") && st.contains("h2"), "both heavies tracked")
    // the final verdict ranks h1 first with n_seen = the full stream
    val v2 = store.read("hh_verdicts").filter(col("batch_id") === 2).collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("cnt_lo"), r.getAs[Long]("cnt_hi"), r.getAs[Long]("n_seen")))
      .toMap
    assert(v2("h1")._3 === all.size.toLong)
    assert(v2("h1")._1 <= 150L && 150L <= v2("h1")._2)
    // the verdict rows expose BOTH absence-bound scalars
    val vRow = store.read("hh_verdicts").filter(col("batch_id") === 2).head()
    assert(vRow.getAs[Long]("err_all") === errAll)
    assert(vRow.getAs[Long]("floor_err") === floorErr)
    // replay the last batch from a fresh checkpoint: batchId 0 <= upto 2,
    // the watermark skips the merge — counters unchanged
    val in2 = MemoryStream[String]
    in2.addData(b2: _*)
    drain(java.nio.file.Files.createTempDirectory("graft-shh-ckpt2").toString, in2)
    val stAfter = store.read("hh_state").collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("aerr"))).toMap
    assert(stAfter === st, "watermark must absorb the replayed batch")
  }

  test("StreamingPacker: incremental layout == batch nextFitPack; watermark absorbs replays") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new graft.plans.BucketedMergeWriter(spark,
      java.nio.file.Files.createTempDirectory("graft-sp-store").toString,
      nBuckets = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sp-ckpt").toString
    // ids ascending per range across batches (append-only ingest); range
    // width 20 puts 1..5 and 21..25 in different ranges; capacity 10
    val b0 = Seq((1L, "a a a a"), (2L, "b b b b b"), (21L, "f f f f f f f"))
    val b1 = Seq((3L, "c c c"), (4L, "d d d d d d d d d d"), (22L, "g g g g g g"))
    val b2 = Seq((5L, "e e"), (6L, "   "))
    val in = MemoryStream[(Long, String)]
    def drain(c: String = ckpt, src: MemoryStream[(Long, String)] = in): Unit = {
      val q = graft.streaming.StreamingPacker.start(
        src.toDF().toDF("doc_id", "text"), store,
        stateTable = "pk_state", assignTable = "pk_assign",
        checkpointDir = c, capacity = 10L, rangeWidth = 20L)
      q.awaitTermination()
    }
    in.addData(b0: _*); drain()
    in.addData(b1: _*); drain()
    in.addData(b2: _*); drain()
    // equivalence with the all-at-once batch operator (same per-range
    // local bins; global ids via the same prefix-sum readout)
    val batchOut = graft.operators.Packing.nextFitPack(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
      capacity = 10, rangeWidth = 20L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val streamOut = graft.streaming.StreamingPacker.globalBins(
      store.read("pk_assign"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamOut === batchOut,
      s"incremental layout diverged: $streamOut vs $batchOut")
    assert(!streamOut.contains(6L), "blank doc occupies no bin")
    // replayed batch against the committed watermark: nothing changes
    val stateBefore = store.read("pk_state").collect()
      .map(r => (r.getAs[Long]("rng"), r.getAs[Long]("lbin"),
        r.getAs[Long]("fill"))).toSet
    graft.streaming.StreamingPacker.processBatch(
      b2.toDF("doc_id", "text"), batchId = 2L, store = store,
      stateTable = "pk_state", assignTable = "pk_assign",
      capacity = 10L, rangeWidth = 20L)
    val stateAfter = store.read("pk_state").collect()
      .map(r => (r.getAs[Long]("rng"), r.getAs[Long]("lbin"),
        r.getAs[Long]("fill"))).toSet
    assert(stateAfter === stateBefore, "watermark must absorb the replay")
    assert(store.read("pk_assign").count() === 7L)
    // crash INSIDE the commit window: batch 3's assignments merged but
    // the state commit lost — simulate by snapshotting the pre-batch
    // state, running the batch, restoring the snapshot (fills AND
    // watermark rewound), then replaying. The replay walks the UNCHANGED
    // state, re-derives byte-identical assignments, and lands the state
    // commit that crashed.
    val b3 = Seq((7L, "h h h"))
    val preState = store.read("pk_state").collect()
    graft.streaming.StreamingPacker.processBatch(
      b3.toDF("doc_id", "text"), 3L, store, "pk_state", "pk_assign", 10L, 20L)
    val assign1 = store.read("pk_assign").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rng"),
        r.getAs[Long]("lbin"), r.getAs[Long]("fill_before"))).toSet
    val postState = store.read("pk_state").collect()
      .map(r => (r.getAs[Long]("rng"), r.getAs[Long]("lbin"),
        r.getAs[Long]("fill"), r.getAs[Long]("upto"))).toSet
    store.replaceTable("pk_state", // the crash: state never committed
      spark.createDataFrame(spark.sparkContext.parallelize(preState.toSeq),
        store.read("pk_state").schema), Seq("rng"))
    graft.streaming.StreamingPacker.processBatch(
      b3.toDF("doc_id", "text"), 3L, store, "pk_state", "pk_assign", 10L, 20L)
    val assign2 = store.read("pk_assign").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rng"),
        r.getAs[Long]("lbin"), r.getAs[Long]("fill_before"))).toSet
    assert(assign2 === assign1, "replay against unchanged state must be byte-identical")
    val replayedState = store.read("pk_state").collect()
      .map(r => (r.getAs[Long]("rng"), r.getAs[Long]("lbin"),
        r.getAs[Long]("fill"), r.getAs[Long]("upto"))).toSet
    assert(replayedState === postState, "replay must land the lost state commit")
  }
}
