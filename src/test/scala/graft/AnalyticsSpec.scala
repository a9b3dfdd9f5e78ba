package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Baskets, Events, Eval, Expectations, Skyline, Survival}

/** Invariants for the r11 analytics operators: association rules,
  * Markov transitions, Kaplan-Meier, the A/B verdict, the 2-D skyline,
  * and the FD audit — each against a hand-computable fixture plus the
  * property that pins its exact fold (cap behavior, tie-breaks,
  * censoring, zero-sign, brute-force cross-check, partition
  * independence).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ---- associationRules --------------------------------------------------

  test("associationRules: exact pair counts, confidence, lift, basket cap") {
    val rows = Seq(
      ("b1", 1L), ("b1", 2L), ("b1", 3L),
      ("b2", 1L), ("b2", 2L), ("b2", 2L), // duplicate (basket,item) collapses
      ("b3", 2L), ("b3", 3L),
      ("b4", 1L), ("b4", 2L),
      ("b5", 9L),
      ("b6", 5L), ("b6", 6L), ("b6", 7L), ("b6", 8L) // over the cap: dropped
    ).toDF("bk", "it")
    val out = Baskets.associationRules(rows, "bk", "it",
        minPairCount = 2L, maxBasketItems = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getBoolean(7))).toMap
    assert(out.keySet === Set((1L, 2L), (2L, 3L)))
    // (1,2): pair 3 of cnt_a 3 -> confidence 1.0; lift 3·5 > 3·4
    assert(out((1L, 2L)) === ((3L, 3L, 4L, 5L, 1.0, true)))
    // (2,3): pair 2, cnts 4/2, N 5: conf 0.5; lift 10 > 8
    assert(out((2L, 3L)) === ((2L, 4L, 2L, 5L, 0.5, true)))
  }

  test("associationRules: negative-lift pair is reported false") {
    // 10 baskets; a in 5, b in 5, together only once (indep. would be 2.5)
    val rows = (Seq(("c0", "a"), ("c0", "b")) ++
      (1 to 4).map(i => (s"a$i", "a")) ++
      (1 to 4).map(i => (s"b$i", "b")) ++
      (1 to 1).map(i => (s"x$i", "x"))).toDF("bk", "it")
    val out = Baskets.associationRules(rows, "bk", "it", minPairCount = 1L)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((1L, 5L, 5L, 10L)))
    assert(!r.getBoolean(7)) // 1·10 < 5·5
  }

  // ---- markovTransitions -------------------------------------------------

  private def ts(day: Int, micro: Long = 0L): Timestamp =
    new Timestamp(day * 86400000L + micro / 1000L)

  test("markovTransitions: counts, probabilities, same-ts id tie-break") {
    val rows = Seq(
      (1L, ts(0), 10L, "A"), (1L, ts(1), 11L, "B"), (1L, ts(2), 12L, "A"),
      (2L, ts(0), 20L, "A"), // single event: no transition
      (3L, ts(5), 31L, "X"), (3L, ts(5), 32L, "Y") // same ts: id order
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.markovTransitions(rows)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out === Map(
      ("A", "B") -> ((1L, 1L, 1.0)),
      ("B", "A") -> ((1L, 1L, 1.0)),
      ("X", "Y") -> ((1L, 1L, 1.0))))
    // partition independence of the lead window
    val re = Events.markovTransitions(rows.repartition(7))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(re === out.keySet)
  }

  test("frequentPaths: overlapping k-grams, unit reach, support gate, tie-break") {
    val rows = Seq(
      (1L, ts(0), 10L, "A"), (1L, ts(1), 11L, "B"), (1L, ts(2), 12L, "C"),
      (1L, ts(3), 13L, "A"), (1L, ts(4), 14L, "B"), (1L, ts(5), 15L, "C"),
      (2L, ts(0), 20L, "A"), (2L, ts(1), 21L, "B"), (2L, ts(2), 22L, "C"),
      // same ts: id order decides the path A>B (30 before 31)
      (3L, ts(7), 30L, "A"), (3L, ts(7), 31L, "B"),
      (4L, ts(0), 40L, "Z")) // single event: no path
      .toDF("user_id", "ts", "event_id", "event_type")
    val k3 = Events.frequentPaths(rows, k = 3, minSupport = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // user 1 contributes A>B>C twice (overlapping windows also yield
    // B>C>A and C>A>B once each); user 2 once more
    assert(k3("A>B>C") === ((3L, 2L)), s"got $k3")
    assert(k3("B>C>A") === ((1L, 1L)) && k3("C>A>B") === ((1L, 1L)))
    assert(!k3.contains("Z"), "k-gram needs k events")
    // the support gate prunes singleton paths
    val gated = Events.frequentPaths(rows, k = 3, minSupport = 2L)
      .collect().map(_.getString(0)).toSet
    assert(gated === Set("A>B>C"))
    // k=2 equals the transition pair set (sanity vs markovTransitions)
    val pairs = Events.frequentPaths(rows, k = 2, minSupport = 1L)
      .collect().map(_.getString(0)).toSet
    assert(pairs.contains("A>B") && !pairs.contains("B>A"),
      "same-ts tie must follow event_id order")
    // partition independence
    assert(Events.frequentPaths(rows.repartition(5), 3, 1L).count() === 3L)
  }

  // ---- kaplanMeier -------------------------------------------------------

  test("kaplanMeier: hand-computed life table with end-censoring") {
    // spans (days): u4 2 (event), u1 3 (event), u3 5 (event),
    // u2 10 (last at as-of: censored under censorDays=2)
    val rows = Seq(
      (1L, ts(0)), (1L, ts(3)),
      (2L, ts(0)), (2L, ts(10)),
      (3L, ts(0)), (3L, ts(5)),
      (4L, ts(2)), (4L, ts(4))
    ).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(rows, censorDays = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val t2 = r6(math.log(3.0 / 4))
    val t3 = r6(math.log(2.0 / 3))
    val t5 = r6(math.log(1.0 / 2))
    assert(out(2L) === ((4L, 1L, 0L, 0.25, t2)))
    assert(out(3L) === ((3L, 1L, 0L, r6(1.0 / 3), t2 + t3)))
    assert(out(5L) === ((2L, 1L, 0L, 0.5, t2 + t3 + t5)))
    assert(out(10L) === ((1L, 0L, 1L, 0.0, t2 + t3 + t5)))
  }

  test("kaplanMeier: curve-to-zero gets the finite ln floor, not NULL") {
    // the max-DURATION unit events (its last day is well before as-of,
    // which belongs to a short-span late unit), so the final life-table
    // row has n_risk == n_event and the curve hits exact zero
    val rows = Seq(
      (1L, ts(0)), (1L, ts(5)),   // dur 5, event
      (2L, ts(0)), (2L, ts(1)),   // dur 1, event
      (9L, ts(29)), (9L, ts(30))  // dur 1, last == as-of: censored
    ).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(rows, censorDays = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    val t1 = math.rint(math.log(2.0 / 3) * 1e6) / 1e6
    assert(out(1L) === ((3L, 1L, 1L, t1)))
    // d=5: n_risk 1, n_event 1 -> the documented finite floor, not -Inf
    assert(out(5L)._1 === 1L && out(5L)._2 === 1L)
    assert(out(5L)._4 === t1 - 13.815511)
  }

  // ---- twoProportionTest -------------------------------------------------

  test("twoProportionTest: verdict matches the float z-test; exact zero effect") {
    // metric "hot": all 10 odd units convert, 1 even unit does;
    // metric "flat": 5 and 5 -> effect exactly 0.0 (positive zero bits)
    val rows =
      ((0 until 20).map(u => (u.toLong, "exposure")) ++
        (0 until 20).filter(_ % 2 == 1).map(u => (u.toLong, "hot")) ++
        Seq((0L, "hot")) ++
        (0 until 10).map(u => (u.toLong, "flat"))).toDF("user_id", "metric")
    val out = Eval.twoProportionTest(rows, "user_id", "metric",
        pmod(col("user_id"), lit(2)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6))).toMap
    val (n1, x1, n0, x0, eff, sig) = out("hot")
    assert((n1, x1, n0, x0) === ((10L, 10L, 10L, 1L)))
    assert(eff === 0.9 && sig)
    // float cross-check: z = (p1-p0)/sqrt(phat(1-phat)(1/n1+1/n0))
    val phat = (x1 + x0).toDouble / (n1 + n0)
    val z = (x1.toDouble / n1 - x0.toDouble / n0) /
      math.sqrt(phat * (1 - phat) * (1.0 / n1 + 1.0 / n0))
    assert((math.abs(z) > 1.96) === sig)
    val flat = out("flat")
    assert(flat._5 === 0.0 && !flat._6)
    assert(java.lang.Double.doubleToRawLongBits(flat._5) === 0L) // +0.0
    // "exposure" metric: every unit converts in both arms -> no signal
    assert(!out("exposure")._6)
  }

  // ---- paretoFront2d -----------------------------------------------------

  test("paretoFront2d matches the O(n²) dominance definition") {
    // deterministic pseudo-random points (hash spread), with collisions
    val pts = (0 until 400).map { i =>
      val h = (i * 2654435761L) & 0xffffL
      ((h % 97L).toDouble, (h / 97L % 53L))
    }
    val df = pts.toDF("price", "qual")
    val got = Skyline.paretoFront2d(df, "price", "qual", buckets = 8)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: reduce to per-point counts, drop dominated
    val grouped = pts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val brute = grouped.filter { case ((p, q), _) =>
      !grouped.keys.exists { case (p2, q2) =>
        (p2 <= p && q2 >= q) && (p2 < p || q2 > q) }
    }.map { case ((p, q), n) => (p, q, n) }.toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("paretoFront2d: worst-case anti-chain (whole input IS the front) stays exact") {
    // strictly increasing v_max with increasing v_min: nothing dominates
    // anything — the case that used to serialize the survivors-only
    // global window into one task; the bucket prefix-max merge must keep
    // every point.
    val df = (0 until 500).map(i => (i.toDouble, i.toLong)).toDF("c", "q")
    val out = Skyline.paretoFront2d(df, "c", "q", buckets = 16).collect()
    assert(out.length === 500)
    assert(out.map(_.getLong(2)).forall(_ == 1L))
  }

  test("paretoFront2d: degenerate single v_min value") {
    val df = Seq((5.0, 1L), (5.0, 9L), (5.0, 9L)).toDF("a", "b")
    val out = Skyline.paretoFront2d(df, "a", "b").collect()
    assert(out.length === 1)
    assert((out.head.getDouble(0), out.head.getLong(1),
      out.head.getLong(2)) === ((5.0, 9L, 2L)))
  }

  // ---- fdAudit -----------------------------------------------------------

  test("fdAudit: violating and key dependencies") {
    val df = Seq(
      (1L, "id1", "a"), (1L, "id2", "b"), (1L, "id3", "a"),
      (2L, "id4", "c"), (2L, "id5", "c"),
      (3L, "id6", null)
    ).toDF("k", "id", "v")
    val out = Expectations.fdAudit(df,
        Seq((Seq("k"), "v"), (Seq("id"), "v")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // k=1 maps to {a,b}: 1 violating group of 3 rows; the NULL row is out
    assert(out("k->v") === ((2L, 1L, 3L, 2L)))
    assert(out("id->v") === ((5L, 0L, 0L, 1L)))
  }
}
