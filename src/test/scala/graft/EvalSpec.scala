package graft

import org.apache.spark.sql.functions._
import graft.operators.{Eval, Similarity, TimeSeries}

/** Evaluation-operator invariants: each metric checked against a
  * hand-computable fixture plus the properties that pin the exact
  * integer/decimal folds (tie handling, partition-independence,
  * degenerate-group NULLs, closed-form-vs-recurrence equivalence).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---- rocAuc ------------------------------------------------------------

  test("rocAuc: perfect, inverted, random and tied rankers; degenerate NULL") {
    // group a: perfect separation -> 1.0; group b: inverted -> 0.0;
    // group c: all scores tied -> 0.5 exactly (the tie-aware identity);
    // group d: one class only -> NULL
    val rows = Seq(
      ("a", 0.1, 0), ("a", 0.2, 0), ("a", 0.8, 1), ("a", 0.9, 1),
      ("b", 0.1, 1), ("b", 0.2, 1), ("b", 0.8, 0), ("b", 0.9, 0),
      ("c", 0.5, 0), ("c", 0.5, 1), ("c", 0.5, 0), ("c", 0.5, 1),
      ("d", 0.3, 1), ("d", 0.7, 1)
    ).toDF("g", "score", "pos")
    val out = Eval.rocAuc(rows, "g", "score", "pos")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) null else Double.box(r.getDouble(3)))).toMap
    assert(out("a") === 1.0)
    assert(out("b") === 0.0)
    assert(out("c") === 0.5)
    assert(out("d") === null)
  }

  test("rocAuc equals the O(n²) pair definition on a mixed-tie fixture") {
    val scores = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0, 6.0, 6.0)
    val pos = Seq(0, 1, 0, 1, 0, 1, 1, 0, 1, 1)
    val df = scores.zip(pos).map { case (s, p) => ("g", s, p) }
      .toDF("g", "score", "pos")
    val got = Eval.rocAuc(df, "g", "score", "pos").collect().head.getDouble(3)
    // brute force: AUC = mean over (pos, neg) pairs of [s_p > s_n] + ½[s_p = s_n]
    val ps = scores.zip(pos).filter(_._2 == 1).map(_._1)
    val ns = scores.zip(pos).filter(_._2 == 0).map(_._1)
    val brute = (for { p <- ps; n <- ns }
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (ps.size * ns.size)
    assert(got === math.rint(brute * 1e6) / 1e6)
    // partition-independence of the window fold
    val re = Eval.rocAuc(df.repartition(7), "g", "score", "pos")
      .collect().head.getDouble(3)
    assert(re === got)
  }

  test("rocAucSharded is bit-identical to rocAuc: ties, skew, degenerates, any bucket count") {
    // hash-spread scores with heavy ties (mod 13) so tie blocks straddle
    // bucket boundaries at every bucket count; one giant group + small
    // groups + a degenerate all-positive group
    val rows = (0 until 600).map { i =>
      val h = (i * 2654435761L) & 0xffffL
      val g = if (i % 10 == 0) "small" else "big"
      (g, (h % 13L).toDouble, (h % 3 == 0).compare(false))
    } ++ Seq(("onecls", 1.0, 1), ("onecls", 2.0, 1))
    val df = rows.toDF("g", "score", "pos")
    val plain = Eval.rocAuc(df, "g", "score", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else Double.box(r.getDouble(3)))).toSet
    for (b <- Seq(1, 3, 64, 1024)) {
      val sharded = Eval.rocAucSharded(df.repartition(7), "g", "score", "pos", b)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else Double.box(r.getDouble(3)))).toSet
      assert(sharded === plain, s"buckets=$b")
    }
  }

  // ---- calibrationBins ---------------------------------------------------

  test("calibrationBins: exact bin means, gap sign, ECE identity") {
    // two bins, exact rationals: bin 0 has conf .1/.2 with 1 pos of 2;
    // bin 9 has conf .95/.95 both pos
    val df = Seq(
      (new java.math.BigDecimal("0.100"), 1),
      (new java.math.BigDecimal("0.200"), 0),
      (new java.math.BigDecimal("0.950"), 1),
      (new java.math.BigDecimal("0.950"), 1)
    ).toDF("conf", "pos")
    val out = Eval.calibrationBins(df, "conf", "pos", bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    val b0 = out(1L) // conf .1/.2 both land in bin 1? floor(.1*10)=1, floor(.2*10)=2
    // recompute expectation honestly: .100->bin 1, .200->bin 2, .950->bin 9
    assert(out.keySet === Set(1L, 2L, 9L))
    assert(out(1L).getAs[Double]("conf_mean") === 0.1)
    assert(out(1L).getAs[Double]("acc") === 1.0)
    assert(out(1L).getAs[Double]("gap") === 0.9)
    assert(out(9L).getAs[Double]("acc") === 1.0)
    assert(out(9L).getAs[Double]("gap") === 0.05)
    // ECE = (|0.1-1| + |0.2-0| + |1.9-2|)/4 = (0.9+0.2+0.1)/4 = 0.3
    assert(out(1L).getAs[Double]("ece") === 0.3)
    assert(out(2L).getAs[Double]("ece") === 0.3)
    assert(b0 != null)
  }

  test("calibrationBins: conf = 1.0 lands in the top bin, never bins") {
    val df = Seq((new java.math.BigDecimal("1.000"), 1)).toDF("conf", "pos")
    val out = Eval.calibrationBins(df, "conf", "pos", bins = 10).collect()
    assert(out.length === 1 && out.head.getLong(0) === 9L)
  }

  // ---- cohenKappa --------------------------------------------------------

  test("cohenKappa: perfect agreement 1, independence ~0, degenerate NULL") {
    val perfect = (1 to 40).map(i => ("p", i % 2 == 0, i % 2 == 0))
      .toDF("g", "a", "b")
    val kp = Eval.cohenKappa(perfect, "g", col("a"), col("b")).collect().head
    assert(kp.getAs[Double]("kappa") === 1.0 && kp.getAs[Double]("po") === 1.0)
    // independent raters on a balanced 2x2 grid: agree = 2, n = 4,
    // pe_num = 1*1+... construct the exact 2x2: (T,T),(T,F),(F,T),(F,F)
    val indep = Seq(("i", true, true), ("i", true, false),
      ("i", false, true), ("i", false, false)).toDF("g", "a", "b")
    val ki = Eval.cohenKappa(indep, "g", col("a"), col("b")).collect().head
    assert(ki.getAs[Double]("kappa") === 0.0)
    // all rows in one cell: pe_num = n², kappa NULL
    val degen = Seq(("d", true, true), ("d", true, true)).toDF("g", "a", "b")
    val kd = Eval.cohenKappa(degen, "g", col("a"), col("b")).collect().head
    assert(kd.isNullAt(kd.fieldIndex("kappa")))
  }

  test("cohenKappa matches the textbook formula on an asymmetric fixture") {
    // n=10, a1=6, b1=4, agree=6 -> po=.6, pe=(24+24)/100=.48, k=(.6-.48)/.52
    val rows = Seq.fill(3)(("g", true, true)) ++ Seq.fill(3)(("g", true, false)) ++
      Seq.fill(1)(("g", false, true)) ++ Seq.fill(3)(("g", false, false))
    val k = Eval.cohenKappa(rows.toDF("g", "a", "b"), "g", col("a"), col("b"))
      .collect().head.getAs[Double]("kappa")
    assert(k === math.rint((0.6 - 0.48) / 0.52 * 1e6) / 1e6)
  }

  // ---- kAnonymity --------------------------------------------------------

  test("kAnonymity: min class, l-diversity, rows at risk") {
    val df = Seq(
      (1, "x", "s1"), (1, "x", "s2"), (1, "x", "s1"), // class (1,x): n=3, l=2
      (2, "y", "s1"),                                 // class (2,y): n=1, l=1
      (3, "z", "s1"), (3, "z", "s1")                  // class (3,z): n=2, l=1
    ).toDF("q1", "q2", "sens")
    val r = Eval.kAnonymity(df, Seq("q1", "q2"), "sens", k = 3).collect().head
    assert(r.getAs[Long]("k_anonymity") === 1L)
    assert(r.getAs[Long]("l_diversity") === 1L)
    assert(r.getAs[Long]("n_classes") === 3L)
    assert(r.getAs[Long]("n_small_classes") === 2L)
    assert(r.getAs[Long]("rows_at_risk") === 3L)
  }

  // ---- copelandRanking ---------------------------------------------------

  test("copelandRanking: condorcet winner tops, scores bounded, ties counted") {
    // 3 voters, 3 items; item A beats everything for 2 of 3 voters
    val rows = Seq(
      (1L, "A", 3.0), (1L, "B", 2.0), (1L, "C", 1.0),
      (2L, "A", 3.0), (2L, "B", 1.0), (2L, "C", 2.0),
      (3L, "A", 1.0), (3L, "B", 3.0), (3L, "C", 2.0)
    ).toDF("voter", "item", "score")
    val out = Eval.copelandRanking(rows, "voter", "item", "score")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("copeland2")).toMap
    assert(out("A") === 4L, "A beats B and C pairwise -> +2 each")
    assert(out("B") === 2L, "B beats C 2:1 (v1 2>1, v3 3>2)")
    assert(out("C") === 0L)
    // total pairwise points are conserved: each unordered pair hands out 2
    assert(out.values.sum === 3 * 2)
  }

  test("copelandRanking: a drawn duel scores +1 to both") {
    val rows = Seq(
      (1L, "A", 2.0), (1L, "B", 1.0),
      (2L, "A", 1.0), (2L, "B", 2.0)
    ).toDF("voter", "item", "score")
    val out = Eval.copelandRanking(rows, "voter", "item", "score")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("pair_ties"), r.getAs[Long]("copeland2"))).toMap
    assert(out("A") === ((1L, 1L)) && out("B") === ((1L, 1L)))
  }

  // ---- ndcgAtK -----------------------------------------------------------

  test("ndcgAtK: ideal ranking scores 1.0; no relevant -> NULL") {
    // 1 query (id 0, label 1); corpus: two label-1 vectors closest, then noise
    val mk = (id: Long, v: Array[Float], l: Int) => (id, v, l)
    val data = Seq(
      mk(0L, Array(1f, 0f), 1),
      mk(1L, Array(0.99f, 0.1f), 1),  // rank 1, relevant
      mk(2L, Array(0.98f, 0.15f), 1), // rank 2, relevant
      mk(3L, Array(0f, 1f), 2),       // rank 3, not relevant
      mk(4L, Array(-1f, 0f), 3)       // rank 4, not relevant
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.ndcgAtK(data.filter(col("vec_id") === 0), data, k = 10)
      .collect().head
    // both relevant docs at the top -> DCG = IDCG -> exactly 1.0
    assert(out.getAs[Long]("n_relevant") === 2L)
    assert(out.getAs[Double]("ndcg_at_10") === 1.0)
    // a query whose label matches nothing -> NULL
    val lonely = Seq(mk(9L, Array(0.5f, 0.5f), 42)).toDF("vec_id", "embedding", "label")
    val out2 = Similarity.ndcgAtK(lonely, data.union(lonely), k = 10).collect().head
    assert(out2.isNullAt(out2.fieldIndex("ndcg_at_10")))
  }

  test("ndcgAtK: worst placement of one relevant doc gets weight w_k ratio") {
    // one relevant doc at rank 4 of 4 -> ndcg = w4 / w1 = 0.430677
    val mk = (id: Long, v: Array[Float], l: Int) => (id, v, l)
    val data = Seq(
      mk(0L, Array(1f, 0f), 1),
      mk(1L, Array(0.9f, 0.1f), 2),
      mk(2L, Array(0.8f, 0.2f), 3),
      mk(3L, Array(0.7f, 0.3f), 4),
      mk(4L, Array(-1f, 0.5f), 1)  // the only relevant, most dissimilar
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.ndcgAtK(data.filter(col("vec_id") === 0), data, k = 10)
      .collect().head
    assert(out.getAs[Double]("ndcg_at_10") === 0.430677)
  }

  // ---- cusumChangepoints -------------------------------------------------

  test("cusum closed form equals the max(0, S+x-mu) recurrence; level shift alarms") {
    // series: 10 quiet days then 5 loud days — a level shift the hi-side
    // CUSUM must accumulate on; timestamps synthesized per day
    val counts = Seq.fill(10)(2) ++ Seq.fill(5)(10)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => ("s", java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:01")))
    }
    val df = rows.toDF("event_type", "ts")
    val out = TimeSeries.cusumChangepoints(df, "event_type", "ts",
        threshNum = 1L, threshDen = 2L)
      .orderBy(col("day")).collect()
    // replay the recurrence in doubles (D-scaled ints / D = exact here)
    val dCount = counts.size.toDouble
    val mean = counts.sum / dCount
    var st = 0.0
    val expect = counts.map { x => st = math.max(0.0, st + x - mean); st }
    out.zip(expect).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("cusum_hi") - e) < 1e-6,
        s"day ${r.getAs[java.sql.Date]("day")}") }
    // the shift fires the hi alarm on the loud tail and never before it
    val alarms = out.map(_.getAs[Boolean]("alarm_hi")).toSeq
    assert(!alarms.take(10).exists(identity), "no alarm during the quiet run")
    assert(alarms.drop(10).exists(identity), "level shift must alarm")
    // partition-independence (windows are keyed, input order free)
    val re = TimeSeries.cusumChangepoints(df.repartition(7), "event_type", "ts",
        threshNum = 1L, threshDen = 2L)
      .orderBy(col("day")).collect().map(_.getAs[Double]("cusum_hi")).toSeq
    assert(re === out.map(_.getAs[Double]("cusum_hi")).toSeq)
  }

  // ---- reciprocalRankAtK ---------------------------------------------------

  test("reciprocalRankAtK: first hit rank exact; no-hit is NULL, not zero") {
    // 1 query vector (id 0, label 1); corpus engineered so the nearest
    // same-label neighbor lands at rank 3 (two closer different-label
    // vectors), plus a query whose label never appears in the top k
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 1),    // query A
      (1L, Array(0.99f, 0.1f), 2),   // rank 1, wrong label
      (2L, Array(0.98f, 0.12f), 2),  // rank 2, wrong label
      (3L, Array(0.9f, 0.2f), 1),    // rank 3, HIT
      (10L, Array(0.0f, 1.0f), 9),   // query B: label 9 unique
      (11L, Array(0.1f, 1.0f), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.reciprocalRankAtK(
        df.filter(col("vec_id") === 0L || col("vec_id") === 10L), df, k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = out(0L)
    assert(a.getAs[Long]("first_rel_rank") === 3L)
    assert(a.getAs[Double]("rr_at_10") === 0.333333)
    val b = out(10L)
    assert(b.isNullAt(b.fieldIndex("first_rel_rank")))
    assert(b.isNullAt(b.fieldIndex("rr_at_10")), "no hit must be NULL, not 0")
  }

  // ---- isotonicCalibration -------------------------------------------------

  test("isotonicCalibration: equals the in-memory PAV; monotone; partition-free") {
    // reference PAV on (x, y) pairs with exact rational pool comparisons
    def refPav(pts: Seq[(Double, Long, Long)]): Map[Double, Double] = {
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, List[Double])]
      pts.sortBy(_._1).foreach { case (x, sy, n) =>
        stack += ((sy, n, List(x)))
        while (stack.length >= 2 &&
            stack.last._1 * stack(stack.length - 2)._2 <=
            stack(stack.length - 2)._1 * stack.last._2) {
          val t = stack.remove(stack.length - 1)
          val p = stack.remove(stack.length - 1)
          stack += ((p._1 + t._1, p._2 + t._2, p._3 ++ t._3))
        }
      }
      stack.flatMap { case (sy, n, xs) =>
        val f = BigDecimal(sy.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        xs.map(_ -> f)
      }.toMap
    }
    val rnd = new scala.util.Random(4)
    val raw = for {
      g <- Seq("a", "b"); _ <- 0 until 120
    } yield (g, rnd.nextInt(40).toDouble / 3.0, // ties across rows
             if (rnd.nextDouble() < 0.4) 1 else 0)
    val out = Eval.isotonicCalibration(
        raw.toDF("grp", "s", "y").repartition(7), "grp", "s", "y")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    Seq("a", "b").foreach { g =>
      val pts = raw.filter(_._1 == g).groupBy(_._2).toSeq
        .map { case (x, rows) => (x, rows.map(_._3.toLong).sum, rows.size.toLong) }
      val want = refPav(pts)
      pts.foreach { case (x, sy, n) =>
        val (gn, gsy, fitted) = out((g, x))
        assert(gn === n && gsy === sy, s"$g point stats at x=$x")
        assert(fitted === want(x), s"$g fitted at x=$x")
      }
      // the defining property: fitted is nondecreasing in score
      val sorted = pts.map(_._1).sorted.map(x => out((g, x))._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        s"$g fit must be monotone")
    }
  }

  test("isotonicCalibration: already-monotone data is untouched; constant pools pool") {
    val df = Seq(("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 1), ("g", 4.0, 1))
      .toDF("grp", "s", "y")
    val out = Eval.isotonicCalibration(df, "grp", "s", "y")
      .collect().map(r => r.getDouble(1) -> r.getDouble(4)).toMap
    assert(out === Map(1.0 -> 0.0, 2.0 -> 0.0, 3.0 -> 1.0, 4.0 -> 1.0),
      "a perfect step function is its own isotonic fit")
    // strictly decreasing outcomes collapse to one pool = the global mean
    val dec = Seq(("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 0), ("g", 4.0, 0))
      .toDF("grp", "s", "y")
    val o2 = Eval.isotonicCalibration(dec, "grp", "s", "y")
      .collect().map(_.getDouble(4)).distinct
    assert(o2 === Array(0.5), "anti-monotone data pools to the mean")
  }

  // ---- conformalCalibration ----------------------------------------------

  test("conformalCalibration: qhat equals the sorted-order pick; coverage exact") {
    // two groups with known scores; α = 1/4 → k = ⌈(n+1)·3/4⌉
    val rnd = new scala.util.Random(9)
    val rows = for {
      g <- Seq("a", "b"); i <- 0 until 40
    } yield (g, rnd.nextInt(1000).toDouble / 7.0, i % 2 == 0)
    val df = rows.toDF("grp", "s", "is_cal")
    val out = Eval.conformalCalibration(df, "grp", "s", "is_cal", 1L, 4L)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { g =>
      val cal = rows.filter(r => r._1 == g && r._3).map(_._2).sorted
      val test = rows.filter(r => r._1 == g && !r._3).map(_._2)
      val k = ((cal.length + 1) * 3 + 3) / 4
      val qhat = cal(k - 1)
      val r = out(g)
      assert(r.getAs[Long]("n_cal") === cal.length.toLong)
      assert(r.getAs[Long]("k_rank") === k.toLong)
      assert(r.getAs[Double]("qhat") === qhat)
      val cov = test.count(_ <= qhat)
      assert(r.getAs[Long]("n_covered") === cov.toLong)
      assert(r.getAs[Long]("n_test") === test.length.toLong)
    }
  }

  test("conformalCalibration: k > n gives infinite threshold (NULL, all covered); " +
       "flat group picks the constant; partition-independent") {
    // tiny calibration set at a strict level: n = 2, α = 1/10 → k = 3 > 2
    val df = Seq(
      ("tiny", 1.0, true), ("tiny", 2.0, true),
      ("tiny", 99.0, false), ("tiny", -5.0, false),
      ("flat", 7.0, true), ("flat", 7.0, true), ("flat", 7.0, true),
      ("flat", 7.0, true), ("flat", 7.0, true), ("flat", 7.0, true),
      ("flat", 7.0, true), ("flat", 7.0, true), ("flat", 7.0, true),
      ("flat", 6.5, false), ("flat", 7.5, false))
      .toDF("grp", "s", "is_cal")
    val out = Eval.conformalCalibration(df, "grp", "s", "is_cal", 1L, 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    val tiny = out("tiny")
    assert(tiny.isNullAt(tiny.fieldIndex("qhat")), "k>n must report +inf as NULL")
    assert(tiny.getAs[Long]("n_covered") === 2L, "infinite threshold covers all")
    val flat = out("flat")
    assert(flat.getAs[Double]("qhat") === 7.0)
    assert(flat.getAs[Long]("n_covered") === 1L, "6.5 covered, 7.5 not")
    // partition-independence: selection must not depend on row order
    val re = Eval.conformalCalibration(
      Seq.fill(3)(Seq(("tiny", 1.0, true), ("tiny", 2.0, true))).flatten
        .toDF("grp", "s", "is_cal")
        .unionAll(df).repartition(13), "grp", "s", "is_cal", 1L, 10L)
    assert(re.count() === 2L)
  }

  test("conformalCalibration: a test-only group surfaces UNSCORED (n_cal=0, " +
       "NULL qhat/coverage) — parity with StreamingConformal's unknown-group verdict") {
    val df = Seq(
      ("a", 1.0, true), ("a", 2.0, true), ("a", 3.0, true), ("a", 2.5, false),
      ("b", 9.0, false), ("b", 1.0, false)) // group b: test rows, no calibration
      .toDF("grp", "s", "is_cal")
    val out = Eval.conformalCalibration(df, "grp", "s", "is_cal", 1L, 4L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("a", "b"), "calibration-less group must not vanish")
    val b = out("b")
    assert(b.getAs[Long]("n_cal") === 0L, "n_cal = 0 marks the unscored row")
    assert(b.isNullAt(b.fieldIndex("k_rank")) && b.isNullAt(b.fieldIndex("qhat")))
    assert(b.getAs[Long]("n_test") === 2L)
    assert(b.isNullAt(b.fieldIndex("n_covered")) && b.isNullAt(b.fieldIndex("coverage")),
      "no threshold means coverage is unknowable, not zero")
    // distinguishable from the k>n +inf case: that row keeps n_cal > 0
    val a = out("a")
    assert(a.getAs[Long]("n_cal") === 3L && a.getAs[Long]("n_test") === 1L)
  }
}
