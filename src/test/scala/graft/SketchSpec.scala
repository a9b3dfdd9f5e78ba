package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** HLL sketch aggregate invariants: accuracy in its design envelope,
  * partition-order independence (the merge is a register max — fully
  * associative/commutative), and the scale property that justifies its
  * existence: partial ObjectHashAggregate map-side, so only 512-byte
  * sketches — never values — cross the shuffle. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Int, parts: Int = 8): Double =
    spark.range(n.toLong).repartition(parts).toDF("x")
      .agg(Sketches.hllApproxCountDistinct(col("x")).as("nd"))
      .head().getDouble(0)

  test("estimates land within the ~1.04/sqrt(m) error envelope") {
    // p=9 -> m=512 -> stderr ~4.6%; allow 3 sigma
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val e = estimate(n)
      assert(math.abs(e - n) < math.max(0.14 * n, 4.0),
        s"estimate $e for true $n out of envelope")
    }
  }

  test("duplicates don't move the estimate (cardinality, not count)") {
    val once = spark.range(5000).toDF("x")
    val dup = once.union(once).union(once)
    val a = once.agg(Sketches.hllApproxCountDistinct(col("x"))).head().getDouble(0)
    val b = dup.agg(Sketches.hllApproxCountDistinct(col("x"))).head().getDouble(0)
    assert(a === b)
  }

  test("estimate is independent of partitioning (merge is a register max)") {
    val a = estimate(20000, parts = 1)
    val b = estimate(20000, parts = 32)
    assert(a === b)
  }

  test("hllRegisters: column estimator replays the aggregate bit-for-bit; union law holds") {
    // 1) est(registers) must equal the estimate-emitting aggregate EXACTLY
    //    (same register state, same double expression shape)
    val df = spark.range(30000).repartition(16).toDF("x")
    val row = df.agg(
      Sketches.hllApproxCountDistinct(col("x")).as("agg_est"),
      Sketches.hllEstimateFromRegs(Sketches.hllRegisters(col("x"))).as("col_est"))
      .head()
    assert(row.getDouble(0) === row.getDouble(1),
      "column estimator must be bit-identical to the aggregate's eval")

    // 2) union law: regs(A ∪ B) == unionRegs(regs(A), regs(B)) as arrays,
    //    so the union ESTIMATE equals one sketch built over both inputs —
    //    the property that makes pairwise overlap answerable from
    //    per-group sketches alone
    val a = spark.range(0, 12000).toDF("x")
    val b = spark.range(8000, 20000).toDF("x") // overlapping ranges
    def regsOf(d: org.apache.spark.sql.DataFrame) =
      d.agg(Sketches.hllRegisters(col("x")).as("r"))
    val merged = regsOf(a).crossJoin(regsOf(b).withColumnRenamed("r", "r2"))
      .select(Sketches.hllUnionRegs(col("r"), col("r2")).as("u")).head().getSeq[Int](0)
    val direct = regsOf(a.union(b)).head().getSeq[Int](0)
    assert(merged === direct, "register union must equal the union's registers")

    // 3) registers are partition-independent (the merge is a register max)
    val r1 = regsOf(df.repartition(1)).head().getSeq[Int](0)
    val r32 = regsOf(df.repartition(32)).head().getSeq[Int](0)
    assert(r1 === r32)
  }

  test("nulls are ignored like count(DISTINCT)") {
    val df = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("x")
    val e = df.agg(Sketches.hllApproxCountDistinct(col("x"))).head().getDouble(0)
    assert(math.abs(e - 2.0) < 1.0)
  }

  test("CMS estimates upper-bound exact counts and are tight without collisions") {
    // 20 items, width 256 >> 20: collisions are unlikely but possible;
    // the estimate is ALWAYS >= exact, and equals it when the item's
    // buckets are collision-free in at least one row
    val items = (1 to 20).flatMap(i => Seq.fill(i * 3)(s"it_$i"))
    val df = spark.sparkContext.parallelize(items, 5).toDF("x")
    val sk = df.agg(Sketches.cmsSketch(col("x"), 4, 256).as("sk"))
    val out = df.groupBy(col("x")).count()
      .crossJoin(broadcast(sk))
      .select(col("x"), col("count"),
        Sketches.cmsEstimate(col("sk"), col("x"), 4, 256).as("est"))
      .collect()
    assert(out.length === 20)
    for (r <- out)
      assert(r.getAs[Long]("est") >= r.getAs[Long]("count"),
        s"CMS must never under-count: $r")
    // with 20 items in 4x256 buckets, expect at least 19 exact estimates
    assert(out.count(r => r.getAs[Long]("est") == r.getAs[Long]("count")) >= 19)
  }

  test("CMS sketch is independent of partitioning (merge is element-wise add)") {
    val items = (1 to 50).flatMap(i => Seq.fill(i)(s"k$i"))
    def sk(parts: Int): Seq[Long] =
      spark.sparkContext.parallelize(items, parts).toDF("x")
        .agg(Sketches.cmsSketch(col("x"), 4, 64).as("sk"))
        .head().getSeq[Long](0)
    assert(sk(1) === sk(13))
  }

  test("plan partial-aggregates the sketch map-side (ObjectHashAggregate)") {
    val df = spark.range(1000).toDF("x")
      .groupBy((col("x") % 7).as("g"))
      .agg(Sketches.hllApproxCountDistinct(col("x")).as("nd"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_hll_approx_nd"),
      s"expected a partial (map-side) sketch stage:\n$plan")
  }

  test("bloom filter: NO false negatives, bounded false positives") {
    val members = spark.range(2000).select(concat(lit("in"), col("id")).as("x"))
    val filt = members.agg(Sketches.bloomFilter(col("x"), 1 << 16, 3).as("bf"))
    val hits = members.crossJoin(filt)
      .filter(Sketches.bloomMightContain(col("bf"), col("x"), 1 << 16, 3))
      .count()
    assert(hits === 2000L, "every inserted value must pass the probe")
    // non-members: expected fpr ~ (1-e^(-3*2000/65536))^3 ~ 6e-4
    val probes = spark.range(10000).select(concat(lit("out"), col("id")).as("x"))
    val fp = probes.crossJoin(filt)
      .filter(Sketches.bloomMightContain(col("bf"), col("x"), 1 << 16, 3))
      .count()
    assert(fp <= 30L, s"false-positive rate out of envelope: $fp / 10000")
  }

  test("bloom filter is independent of partitioning (merge is bitwise OR)") {
    def bits(parts: Int): Seq[Long] =
      spark.range(5000).repartition(parts).select(col("id").cast("string").as("x"))
        .agg(Sketches.bloomFilter(col("x"), 4096, 3).as("bf"))
        .head().getSeq[Long](0)
    assert(bits(1) === bits(17))
  }

  test("vectorSum: element-wise exact on floats, partition-independent, null-safe") {
    import graft.functions.VectorSumAgg.vectorSum
    val rows = Seq(
      (1, Array(1.0f, 2.0f, 3.0f)),
      (1, Array(0.5f, -2.0f, 1.0f)),
      (2, Array(10.0f, 0.0f, 0.25f)))
    def sums(parts: Int) = rows.toDF("label", "v").repartition(parts)
      .groupBy(col("label")).agg(vectorSum(col("v"), 3).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val one = sums(1)
    assert(one(1) === Seq(1.5, 0.0, 4.0))
    assert(one(2) === Seq(10.0, 0.0, 0.25))
    // these inputs sum exactly in double, so every partitioning agrees
    assert(sums(7) === one, "merge must be element-wise, any partitioning")
    // null rows skipped entirely
    val withNull = (rows.map { case (l, v) => (l, Option(v)) } :+ (1, None))
      .toDF("label", "v")
      .groupBy(col("label")).agg(vectorSum(col("v"), 3).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(withNull(1) === Seq(1.5, 0.0, 4.0))
  }

  test("vectorSum plan partial-aggregates map-side (sketch shuffles, not members)") {
    import graft.functions.VectorSumAgg.vectorSum
    val p = Seq((1, Array(1.0f, 2.0f))).toDF("label", "v")
      .groupBy(col("label")).agg(vectorSum(col("v"), 2))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    assert(p.contains("partial_vector_sum"), s"expected map-side partial:\n$p")
  }

  // ---------------------------------------------------------------------
  // RankSampleAgg — the mergeable rank sketch (bottom-k-by-hash sample)
  // ---------------------------------------------------------------------

  /** Deterministic heavy-tail fixture: ~lognormal via exp of a hash-
    * uniform, plus one monster outlier per group — the shape that
    * breaks equi-width histograms (range explodes; every real value
    * lands in bucket 0). */
  private def heavyTail(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(n.toLong).toDF("id")
      .withColumn("g", (col("id") % 2).cast("int"))
      // salt "v|": the sampler keys on md5(id) itself — an unsalted u
      // would be perfectly correlated with the sampling hash and the
      // bottom-k "sample" would just be the k smallest values
      .withColumn("u",
        (conv(substring(md5(concat(lit("v|"), col("id").cast("string"))), 1, 15), 16, 10)
          .cast("double") / lit(math.pow(2, 60))))
      .withColumn("v",
        when(col("id") < 2, lit(1e9)) // one outlier per group
          .otherwise(exp(lit(6.0) * col("u"))))

  test("rankSample state is independent of partitioning and arrival order") {
    val df = heavyTail(20000)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.ApproxQuantile
        .sampledQuantiles(d, "g", "v", Seq("id"), qs, k = 512)
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    val base = run(df.coalesce(1))
    assert(run(df.repartition(13)) === base, "13-way repartition changed the sketch")
    assert(run(df.orderBy(col("v").desc)) === base, "arrival order changed the sketch")
  }

  test("rankSample plan partial-aggregates map-side (sketches cross the shuffle)") {
    val p = heavyTail(100)
      .groupBy(col("g"))
      .agg(graft.functions.RankSampleAgg.rankSample(col("id"), col("v"), 64))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    assert(p.contains("partial_rank_sample"), s"expected map-side partial:\n$p")
  }

  test("rankSample beats the equi-width histogram on heavy tails (the reason it exists)") {
    val df = heavyTail(20000).localCheckpoint(true)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val exact = graft.operators.ApproxQuantile.exactQuantiles(df, "g", "v", qs)
      .collect().map(r => r.getInt(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val sketch = graft.operators.ApproxQuantile.sampledQuantiles(df, "g", "v", Seq("id"), qs, k = 1024)
      .collect().map(r => r.getInt(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val hist = graft.operators.ApproxQuantile.histogramQuantiles(df, "g", "v", qs)
      .collect().map(r => r.getInt(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // histogram error bound is range/256 ≈ 1e9/256 ≈ 3.9e6 — the outlier
    // destroys it; the sample's rank error is scale-free
    def relErr(est: Seq[Double], tru: Seq[Double]): Double =
      est.zip(tru).map { case (e, t) => math.abs(e - t) / math.max(t, 1e-12) }.max
    for (g <- exact.keys) {
      val se = relErr(sketch(g), exact(g))
      val he = relErr(hist(g), exact(g))
      info(f"group $g: sketch(k=1024) max rel err $se%.4f vs histogram(256) $he%.1f " +
        s"(exact=${exact(g)})")
      assert(se < 0.15, s"group $g sketch rel err $se too big (exact=${exact(g)}, sketch=${sketch(g)})")
      assert(se < he / 10,
        s"group $g: sketch err $se not ≪ histogram err $he — the scale story is broken")
    }
  }

  test("decontaminateBloom output is IDENTICAL to the exact formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = graft.operators.Dedup.decontaminate(corpus, bench, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.operators.Dedup.decontaminateBloom(corpus, bench, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom === exact, "bloom pre-filter must not change the result set")
    assert(exact.nonEmpty, "fixture must actually contaminate something")
  }
}
