package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic sampling invariants: partition-independence, split
  * disjointness/exhaustiveness/stability, and fraction accuracy. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 4000L).toDF("id")

  test("deterministicSample is partition-independent and ~accurate") {
    val a = Sampling.deterministicSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids.repartition(13), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "same rows selected under any partitioning")
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03, s"fraction off: ${a.size}")
    // nested property: a smaller fraction selects a subset of a larger one
    val half = Sampling.deterministicSample(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(half), "fractions are nested prefixes of the hash range")
  }

  test("threeWaySplit is disjoint, exhaustive and stable; salt decorrelates") {
    val s = Sampling.threeWaySplit(ids, "id", 0.7, 0.15)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.size === 4000, "every row gets exactly one split")
    val bySplit = s.groupBy(_._2).view.mapValues(_.size).toMap
    assert(math.abs(bySplit("train") / 4000.0 - 0.7) < 0.03)
    assert(math.abs(bySplit("val") / 4000.0 - 0.15) < 0.03)
    // stability: recomputing yields the identical assignment
    val s2 = Sampling.threeWaySplit(ids.repartition(7), "id", 0.7, 0.15)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s2 === s)
    // a different salt draws an (almost surely) different sample
    val salted = Sampling.deterministicSample(ids, "id", 0.25, salt = "other")
      .collect().map(_.getLong(0)).toSet
    val base = Sampling.deterministicSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(salted !== base)
  }

  test("capPerGroup caps big groups, keeps small ones whole, deterministic") {
    // group a: 2000 rows (over cap), group b: 40 rows (under cap)
    val df = ((1L to 2000L).map(i => (i, "a")) ++ (3000L to 3039L).map(i => (i, "b")))
      .toDF("id", "grp")
    val kept = Sampling.capPerGroup(df, "grp", "id", 100)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("b") === 40L, "under-cap group must be kept whole")
    // threshold = 100/2000 = 5% of hash space; hash-uniform within ~3x
    assert(byGrp("a") >= 50L && byGrp("a") <= 200L, s"cap ~100: ${byGrp("a")}")
    // deterministic under repartitioning
    val again = Sampling.capPerGroup(df.repartition(17), "grp", "id", 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("capPerGroup treats a NULL group as a real group (capped, not dropped)") {
    val df = ((1L to 50L).map(i => (i, Option.empty[String])) ++
      (100L to 119L).map(i => (i, Some("a")))).toDF("id", "grp")
    val kept = Sampling.capPerGroup(df, "grp", "id", 100)
    val byGrp = kept.collect().map(r => Option(r.getAs[String]("grp")))
      .groupBy(identity).map { case (g, xs) => g -> xs.length }
    assert(byGrp.getOrElse(None, 0) === 50, s"null group under cap must survive whole: $byGrp")
    assert(byGrp.getOrElse(Some("a"), 0) === 20)
  }

  test("stratifiedSample applies per-stratum fractions; unlisted strata drop") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", "id", Map("en" -> 0.5, "de" -> 0.125))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!byLang.contains("xx"), "strata without a fraction are dropped")
    assert(math.abs(byLang("en") / 1000.0 - 0.5) < 0.06)
    assert(math.abs(byLang("de") / 1000.0 - 0.125) < 0.06)
  }

  test("weightedSample favors heavy rows, is partition-stable, drops w<=0") {
    // two weight classes: 100 rows at w=100 vs 100 rows at w=1 — the
    // heavy class must dominate a k=20 sample (P[light row beats a heavy
    // row] is tiny under u^(1/w)); plus a zero-weight row that must never
    // be selected
    val rows = (1L to 100L).map((_, 100.0)) ++ (101L to 200L).map((_, 1.0)) :+ (201L, 0.0)
    val d = rows.toDF("id", "w").withColumn("grp", org.apache.spark.sql.functions.lit("g"))
    val kept = graft.operators.Sampling.weightedSample(d, "grp", "id", "w", k = 20)
    val ids = kept.collect().map(_.getLong(0)).toSet
    assert(ids.size === 20)
    assert(!ids.contains(201L), "zero-weight rows are never sampled")
    assert(ids.count(_ <= 100L) >= 15,
      s"heavy rows must dominate the sample, got ${ids.count(_ <= 100L)}")
    val stable = graft.operators.Sampling.weightedSample(
      d.repartition(13), "grp", "id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(stable === ids, "selection is content-determined, not partition-determined")
  }

  test("budgetAllocation: waterfilling caps small sources, redistributes exactly") {
    val per = Seq(("A", 100L, 1L), ("B", 1000L, 1L), ("C", 1000L, 2L))
      .toDF("source", "avail", "weight")
    // sorted by avail/weight: A(100) capped; C: 1000*3 > 2*(1200-100) uncapped;
    // B uncapped. a_cap=100, w_rest=3 -> C: 2*1100 div 3 = 733, B: 1100 div 3 = 366
    val out = Sampling.budgetAllocation(per, budget = 1200L).collect()
      .map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    assert(out("A") === ((true, 100L)))
    assert(out("C") === ((false, 733L)))
    assert(out("B") === ((false, 366L)))
    assert(out.values.map(_._2).sum <= 1200L, "flooring residue never over-allocates")
  }

  test("budgetAllocation: ample budget caps everyone; zero-weight source gets nothing") {
    val per = Seq(("A", 100L, 1L), ("B", 1000L, 1L), ("C", 1000L, 2L), ("D", 50L, 0L))
      .toDF("source", "avail", "weight")
    val out = Sampling.budgetAllocation(per, budget = 5000L).collect()
      .map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    assert(out("A") === ((true, 100L)) && out("B") === ((true, 1000L)) &&
      out("C") === ((true, 1000L)))
    assert(out("D") === ((false, 0L)), "weight 0 must never absorb budget")
  }

  test("budgetAllocation: randomized equivalence with an exact iterative waterfill") {
    // reference: repeatedly allocate lambda*w with exact rational lambda,
    // cap saturated sources, redistribute, until stable — the textbook
    // iterative algorithm the closed prefix form must reproduce
    def reference(rows: Seq[(String, Long, Long)], budget: Long): Map[String, Long] = {
      var capped = Set.empty[String]
      var stable = false
      while (!stable) {
        val free = rows.filterNot(r => capped(r._1))
        val wSum = free.map(_._3).sum
        val rem = budget - rows.filter(r => capped(r._1)).map(_._2).sum
        val newly = free.filter { case (_, avail, w) =>
          w > 0 && BigInt(avail) * wSum <= BigInt(w) * rem }.map(_._1).toSet
        if (newly.isEmpty) stable = true else capped ++= newly
      }
      val aCap = rows.filter(r => capped(r._1)).map(_._2).sum
      val wRest = rows.filterNot(r => capped(r._1)).map(_._3).sum
      rows.map { case (s, avail, w) =>
        s -> (if (capped(s)) avail
              else if (wRest == 0 || w == 0) 0L
              else (BigInt(w) * (budget - aCap).max(0L) / BigInt(wRest)).toLong)
      }.toMap
    }
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(6)
      val rows = (1 to n).map(i =>
        (f"s$i%02d", rnd.nextInt(2000).toLong, rnd.nextInt(5).toLong))
      val budget = rnd.nextInt(4000).toLong
      val got = Sampling.budgetAllocation(rows.toDF("source", "avail", "weight"), budget)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val want = reference(rows, budget)
      assert(got === want, s"trial $trial budget=$budget rows=$rows")
      assert(got.values.sum <= budget.max(rows.map(_._2).sum),
        "never over-allocates")
    }
  }

  test("budgetAllocation: allocation is proportional when no cap binds") {
    val per = Seq(("X", 10000L, 3L), ("Y", 10000L, 1L)).toDF("source", "avail", "weight")
    val out = Sampling.budgetAllocation(per, budget = 4000L).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("X") === 3000L && out("Y") === 1000L)
  }
}
