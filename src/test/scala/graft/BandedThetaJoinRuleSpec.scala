package graft

import org.apache.spark.sql.functions._

/** The banded-theta-join optimizer rule: a plain-SQL inequality join that
  * Spark would execute as a nested-loop plan comes out as an equi-join on
  * time buckets — with results identical to the naive plan. */
class BandedThetaJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def naiveResult(n: Int): Set[(Long, Long)] = {
    // ground truth computed without any join at all
    val as = (0 until n).map(i => (i.toLong, (i.toLong * 37) % 1000))
    val bs = (0 until n).map(i => (i.toLong + 10000, (i.toLong * 91) % 1000))
    (for {
      (ai, at) <- as; (bi, bt) <- bs
      if math.abs(at - bt) <= 13
    } yield (ai, bi)).toSet
  }

  test("abs-band theta join is rewritten to a bucketed equi-join with identical results") {
    val n = 300
    val a = (0 until n).map(i => (i.toLong, (i.toLong * 37) % 1000)).toDF("a_id", "a_t")
    val b = (0 until n).map(i => (i.toLong + 10000, (i.toLong * 91) % 1000)).toDF("b_id", "b_t")
    val joined = a.join(b, abs(col("a_t") - col("b_t")) <= 13)
      .select(col("a_id"), col("b_id"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join must not plan as a nested loop:\n$plan")
    assert(plan.contains("_graft_band"), s"expected the bucketed rewrite:\n$plan")

    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naiveResult(n), "rewrite must preserve exact join semantics")
  }

  test("negative timestamps: truncating buckets still cover all qualifying pairs") {
    val a = Seq((1L, -1L), (2L, -11L), (3L, 0L), (4L, -30L)).toDF("a_id", "a_t")
    val b = Seq((10L, -10L), (11L, 9L), (12L, -21L)).toDF("b_id", "b_t")
    val got = a.join(b, abs(col("a_t") - col("b_t")) <= 10L)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ai, at) <- Seq((1L, -1L), (2L, -11L), (3L, 0L), (4L, -30L))
      (bi, bt) <- Seq((10L, -10L), (11L, 9L), (12L, -21L))
      if math.abs(at - bt) <= 10
    } yield (ai, bi)).toSet
    assert(got === want)
  }

  test("property: random timestamps and widths — rewrite ≡ ground truth") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
      val params = Gen.Parameters.default
      Iterator.iterate(Seed(seed))(_.next)
        .map(s => g.pureApply(params, s)).take(n).toSeq
    }
    for (round <- 0 until 4) {
      val w = samples(Gen.chooseNum(1L, 5000L), 1, 100L + round).head
      val at = samples(Gen.chooseNum(-100000L, 100000L), 120, 7L + round)
      val bt = samples(Gen.chooseNum(-100000L, 100000L), 120, 900L + round)
      val a = at.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("a_id", "a_t")
      val b = bt.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("b_id", "b_t")
      val joined = a.join(b, abs(col("a_t") - col("b_t")) <= w)
        .select(col("a_id"), col("b_id"))
      assert(joined.queryExecution.executedPlan.toString.contains("_graft_band"))
      // MULTISET comparison (sorted seq, not set): the canonical failure
      // mode of a bucket-explode rewrite is emitting a qualifying pair
      // once per matching replica — a set compare would mask duplicates
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      val want = (for {
        (x, i) <- at.zipWithIndex; (y, jx) <- bt.zipWithIndex
        if math.abs(x - y) <= w
      } yield (i.toLong, jx.toLong)).sorted
      assert(got === want, s"round $round (w=$w) diverged from ground truth")
    }
  }

  test("two band predicates: the non-selected band survives as a residual") {
    // |a_t - b_t| <= 10 AND |a_u - b_u| <= 5 — the rule rewrites ONE band
    // into buckets; the other must stay in the join condition verbatim
    val a = (0 until 80).map(i => (i.toLong, (i * 7L) % 100, (i * 11L) % 100))
      .toDF("a_id", "a_t", "a_u")
    val b = (0 until 80).map(i => (i.toLong + 500, (i * 13L) % 100, (i * 3L) % 100))
      .toDF("b_id", "b_t", "b_u")
    val joined = a.join(b,
        abs(col("a_t") - col("b_t")) <= 10L && abs(col("a_u") - col("b_u")) <= 5L)
      .select(col("a_id"), col("b_id"))
    assert(joined.queryExecution.executedPlan.toString.contains("_graft_band"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = (for {
      i <- 0 until 80; j <- 0 until 80
      if math.abs((i * 7L) % 100 - (j * 13L) % 100) <= 10 &&
        math.abs((i * 11L) % 100 - (j * 3L) % 100) <= 5
    } yield (i.toLong, j.toLong + 500)).sorted
    assert(got === want, "second band predicate must not be dropped")
  }

  test("same-side band filter survives the rewrite") {
    // |a_t - a_u| <= 3 references only the left side: it is band-SHAPED but
    // not a cross-side band — it must remain a filter, not vanish
    val a = Seq((1L, 10L, 11L), (2L, 10L, 50L), (3L, 20L, 22L))
      .toDF("a_id", "a_t", "a_u")
    val b = Seq((7L, 12L), (8L, 90L)).toDF("b_id", "b_t")
    val joined = a.join(b,
        abs(col("a_t") - col("b_t")) <= 5L && abs(col("a_t") - col("a_u")) <= 3L)
      .select(col("a_id"), col("b_id"))
    assert(joined.queryExecution.executedPlan.toString.contains("_graft_band"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a_id=2 matches the cross band (|10-12|<=5) but fails |10-50|<=3;
    // a_id=3 passes the same-side filter but fails the cross band (|20-12|=8)
    assert(got === Set((1L, 7L)),
      "same-side band-shaped filter must not be dropped")
  }

  test("joins that already have an equi key are left alone") {
    val a = Seq((1L, 5L, 100L)).toDF("k", "a_t", "a_v")
    val b = Seq((1L, 7L, 200L)).toDF("k2", "b_t", "b_v")
    val j = a.join(b, col("k") === col("k2") && abs(col("a_t") - col("b_t")) <= 10L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("_graft_band"),
      s"equi-keyed joins must keep their hash-join plan:\n$plan")
    assert(j.count() === 1)
  }
}
