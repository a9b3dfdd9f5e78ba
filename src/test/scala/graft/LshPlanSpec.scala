package graft

import graft.operators.Dedup

/** Dedup.lshPlan: the S-curve laws the q299 oracle replays but does not
  * interpret — midpoint proximity, curve sharpening with budget, and
  * the budget/tie-break contract. */
class LshPlanSpec extends SparkSpec {

  private lazy val plan =
    Dedup.lshPlan(spark, thresholds = Seq(0.5, 0.7), budgets = Seq(32, 256))
      .collect()
      .map(r => (r.getAs[Double]("tau"), r.getAs[Long]("budget")) -> r).toMap

  test("chosen midpoint sits near tau and inside the budget") {
    plan.foreach { case ((tau, h), r) =>
      val (b, rr) = (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"))
      assert(b * rr <= h, s"budget respected at ($tau, $h)")
      assert(math.abs(r.getAs[Double]("t_est") - tau) < 0.08,
        s"midpoint ${r.getAs[Double]("t_est")} near $tau at budget $h")
    }
  }

  test("detection probabilities are monotone across the threshold") {
    plan.values.foreach { r =>
      assert(r.getAs[Double]("p_below") <= r.getAs[Double]("p_at") &&
        r.getAs[Double]("p_at") <= r.getAs[Double]("p_above"),
        "P(s) rises with similarity")
    }
  }

  test("a bigger budget buys a sharper curve (more power above, less noise below)") {
    Seq(0.5, 0.7).foreach { tau =>
      val small = plan((tau, 32L)); val big = plan((tau, 256L))
      assert(big.getAs[Double]("p_above") >= small.getAs[Double]("p_above"),
        s"tau=$tau: true-dup detection does not degrade with budget")
      assert(big.getAs[Double]("p_above") - big.getAs[Double]("p_below") >=
        small.getAs[Double]("p_above") - small.getAs[Double]("p_below") - 1e-9,
        s"tau=$tau: the curve is at least as sharp at 8x the budget")
    }
  }
}
