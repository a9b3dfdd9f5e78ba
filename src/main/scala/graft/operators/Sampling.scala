package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` is seed-deterministic but engine-specific (Spark's
  * Bernoulli sampler walks a partition-local RNG), so two runs over
  * different partitionings — or any other engine — select different rows.
  * Reproducible pipelines sample by CONTENT instead: hash a stable key into
  * 1e6 buckets and keep a bucket range. Properties that matter at 100 TB:
  *
  *   - no shuffle, no RNG state: a pure projection + filter, fully
  *     pushdown/codegen-friendly, identical on any partitioning;
  *   - stable under re-runs and engine ports (md5 is everywhere — the
  *     DuckDB oracle replays the same arithmetic bit-for-bit);
  *   - disjoint fractions = disjoint row sets (split sets never leak into
  *     each other — the train/test hygiene property).
  *
  * The bucket is the first 12 md5 hex digits (48 bits) mod 1e6: ~uniform,
  * and safely inside exact int64/double arithmetic in every engine.
  */
object Sampling {

  val buckets = 1000000L

  /** Uniform hash bucket in [0, 1e6) for a key column (content-derived,
    * partition-independent). `salt` decorrelates independent samples over
    * the same keys. */
  /** The shared 48-bit content hash (first 12 md5 hex digits) every
    * sampler's bucket/draw derives from — ONE definition, so the hash
    * contract cannot drift between [[hashBucket]] and [[weightedSample]]. */
  def hash48(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 12), 16, 10)
      .cast("long")

  def hashBucket(key: Column, salt: String = ""): Column =
    hash48(key, salt) % buckets

  /** Keep ~`fraction` of rows, chosen by key hash — deterministic across
    * runs, partitionings, and engines. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          salt: String = ""): DataFrame = {
    // the threeWaySplit precedent: an out-of-range fraction silently
    // empties (or silently keeps) the sample — fail loudly instead
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    df.filter(hashBucket(col(keyCol), salt) < (fraction * buckets).toLong)
  }

  /** Per-stratum fractions: e.g. keep 10% of "en" docs, 50% of "de".
    * Strata absent from the map are dropped (explicit is safer than a
    * silent default at corpus scale). One scan, no shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double], salt: String = ""): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"every stratum fraction must be in [0,1]: $fractions")
    val frac = fractions.foldLeft(lit(null).cast("double")) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < (frac * buckets).cast("long"))
  }

  /** Source-mixture rebalancing by capping: downsample every group
    * (source/domain/language) to at most ~`cap` rows, keeping smaller
    * groups whole — the data-mixing step that stops one crawl dump from
    * dominating a training corpus (equivalent to temperature-flattening
    * with the cap as the knee). The keep-threshold is
    * `min(1e6, cap·1e6 div n_group)` — INTEGER arithmetic end to end, so
    * the selection is engine-exact (no float normalization whose sum
    * order could flip a row).
    *
    * Scale: one count aggregate over the group column (tiny result,
    * broadcast back), then the same map-only hash-filter as the other
    * samplers — no shuffle of the data itself, selection stable across
    * runs/partitionings/engines. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String, cap: Long,
                  salt: String = ""): DataFrame = {
    require(cap > 0, "cap must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumnRenamed(groupCol, "_grp")
    // null-SAFE join: a NULL group is a real group (it must be capped like
    // any other, not silently dropped by null ≠ null join semantics)
    df.join(broadcast(counts), col(groupCol) <=> col("_grp"))
      .withColumn("_thr", least(lit(buckets), expr(s"(${cap}L * ${buckets}L) div _n")))
      // a NULL key hashes to NULL (concat semantics) and NULL < thr drops
      // the row — but "keep smaller groups whole" must include NULL-key
      // rows when the whole group survives (_thr == buckets). In an
      // over-cap group a NULL key has no deterministic hash and is
      // excluded, documented.
      .filter(hashBucket(col(keyCol), salt) < col("_thr") ||
        (col(keyCol).isNull && col("_thr") >= lit(buckets)))
      .drop("_grp", "_n", "_thr")
  }

  /** Temperature-based mixture rebalancing (α = 0.5): resample sources in
    * proportion to `√n_source` instead of `n_source`, the standard move
    * that keeps small high-quality sources from being drowned by one big
    * crawl dump (hard capping, [[capPerGroup]], is the α→0 limit of this).
    *
    * Everything is ENGINE-EXACT: the weight is `floor(√n)` (IEEE sqrt is
    * correctly rounded in every engine, so its floor over a bigint is
    * deterministic), targets are integer `totalTarget·w div Σw`, and the
    * per-source selection is `row_number ≤ target` over the content-hash
    * order (ties on the key) — no float normalization whose summation
    * order could flip a row.
    *
    * Scale: one tiny count aggregate broadcast back, then ONE window
    * partitioned by source — each source's rank fan-outs independently;
    * no global sort, no RNG. */
  def temperatureRebalance(df: DataFrame, groupCol: String, keyCol: String,
                           totalTarget: Long, salt: String = ""): DataFrame = {
    require(totalTarget > 0, "totalTarget must be positive")
    // NULL keys are excluded, not sampled (the weightedSample contract):
    // a group's NULL-key rows tie completely in the selection window
    // (NULL hash AND NULL tie-break), so which ones survive the rank cut
    // would depend on partition order — the one shape that breaks this
    // operator's bit-for-bit replay promise. Excluded BEFORE the weights
    // too, so targets reflect only sampleable rows.
    val eligible = df.filter(col(keyCol).isNotNull)
    // control-plane frame, read twice (totW and targets) — materialize
    // once like the packSequences/balancedShards siblings
    val weights = eligible.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", floor(sqrt(col("_n").cast("double"))).cast("long"))
      .materialized
    val totW = weights.agg(sum(col("_w")).as("_tw"))
    val targets = weights.crossJoin(broadcast(totW))
      .withColumn("_target", expr(s"(${totalTarget}L * _w) div _tw"))
      .withColumnRenamed(groupCol, "_grp")
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(keyCol), salt).asc_nulls_last,
        col(keyCol).asc_nulls_last)
    eligible.join(broadcast(targets), col(groupCol) <=> col("_grp"))
      .withColumn("_rn", row_number().over(rn))
      .filter(col("_rn") <= col("_target"))
      .drop("_grp", "_n", "_w", "_tw", "_target", "_rn")
  }

  /** Weighted sampling without replacement (top-k per group), the
    * Efraimidis–Spirakis A-ES scheme made deterministic: each row draws a
    * content-hash uniform `u ∈ (0,1]` and is ranked by the exponential
    * priority `ln(u)/w` (descending u^(1/w) order) — over many draws a row
    * is selected with probability proportional to its weight `w`, which is
    * how a pipeline oversamples high-quality documents without an RNG.
    *
    * Determinism: `u = (h+1)/2^48` from the row key's md5 (exact in
    * double — 48-bit integers are representable), the priority is
    * `round(ln(u)/w, 6)` (the same float crutch the cosine ranks use; ties
    * broken on the key), so the selection replays bit-for-bit in any
    * engine and is independent of partitioning.
    *
    * Scale: one map-only projection + ONE window partitioned by group
    * (each group ranks independently; for a global sample pass a constant
    * group column and k rows survive a tree-reduce top-k — or use
    * [[graft.functions.TopKAggregator]]). No shuffle of losers: the filter
    * drops them before any downstream stage. */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
                     weightCol: String, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val h = hash48(col(keyCol), salt)
    val u = (h.cast("double") + lit(1.0)) / lit(281474976710656.0) // 2^48
    // ln(u) < 0, so DIVIDING by a larger weight pulls the priority toward
    // 0 from below: rank ascending-by-|ln(u)|/w == descending u^(1/w)
    // 12 dp, not 6: ln(u)/w for large weights is tiny (|x| < 5e-7 already
    // at w = 1e6), and a 6 dp round collapsed those rows into one massive
    // tie broken by id — "weighted" sampling degenerated to
    // pick-smallest-key among heavy items. 12 dp keeps ties away up to
    // w ~ 1e11 while staying orders of magnitude above libm's cross-
    // engine log error (~1e-16 relative)
    val pri = round(log(u) / col(weightCol).cast("double"), 12)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(pri.desc, col(keyCol))
    // NULL keys are excluded, not sampled: their md5 priority AND the
    // tie-break are both NULL, so which of several NULL-key rows survives
    // row_number would depend on partition order — the one shape that
    // breaks this operator's bit-for-bit replay contract
    df.filter(col(weightCol).cast("double") > 0 && col(keyCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Token-budget waterfilling: given one row per source with an integer
    * availability (`avail`, e.g. total tokens) and an integer weight,
    * allocate a total `budget` proportionally to weight but never more
    * than a source HAS — the step after mixture weighting
    * ([[temperatureRebalance]] chooses weights; this turns them into
    * actual token counts an extraction job can execute). Small sources
    * saturate ("capped") and their surplus redistributes to the rest —
    * classic waterfilling, computed in CLOSED FORM: sorted by
    * avail/weight ascending, a source is capped iff
    * `avail·(W − W_prev) ≤ weight·(budget − A_prev)` (prefix sums A, W) —
    * the standard fair-share argument, cross-multiplied so the test is
    * EXACT integer/decimal math, no iteration and no float threshold.
    * Uncapped sources get `weight·(budget − A_capped) div W_uncapped`
    * (integer division — up to one token per source of flooring residue
    * stays unallocated; deterministic, documented).
    *
    * Scale: the frame is one row per SOURCE (tiny by construction); the
    * one window is over those rows — same class as q57's daily deltas.
    * Returns (source, avail, weight, capped, allocated).
    */
  def budgetAllocation(perSource: DataFrame, budget: Long,
                       sourceCol: String = "source", availCol: String = "avail",
                       weightCol: String = "weight"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    // try_divide: ANSI mode errors on /0 even for doubles; weight-0 rows
    // sort last (NULL here, inf/NULL in the mirror — same tail position)
    // and are excluded from capping by the guard below either way
    val w = Window
      .orderBy(expr(s"try_divide(CAST($availCol AS DOUBLE), CAST($weightCol AS DOUBLE))")
        .asc_nulls_last, col(sourceCol))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    // Exactness bounds: individual avail/weight/budget < 1e18 (18-digit
    // operand casts) AND the corpus TOTALS of avail and weight fit int64
    // (the prefix sums are LONG — ANSI throws loudly past that). The
    // prefix DIFFERENCES can reach 19-20 digits even under those bounds,
    // so they cast to decimal(20,0): 18+20-digit products stay ≤ 38
    // digits — exact in Spark and in the mirror.
    val d = "decimal(18,0)"
    val dWide = "decimal(20,0)"
    val staged = perSource.select(
        col(sourceCol).as("source"),
        col(availCol).cast("long").as("avail"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("_A_prev", coalesce(sum(col("avail")).over(prev), lit(0L)))
      .withColumn("_W_prev", coalesce(sum(col("weight")).over(prev), lit(0L)))
      .withColumn("_W", sum(col("weight")).over(full))
      .withColumn("capped",
        // weight-0 sources are never "capped" (the cross-test degenerates
        // to 0 ≤ 0 for them); they fall to the else branch and get 0
        col("weight") > 0 &&
          (col("avail").cast(d) * (col("_W") - col("_W_prev")).cast(dWide)) <=
          (col("weight").cast(d) * (lit(budget) - col("_A_prev")).cast(dWide)))
    staged
      .withColumn("_A_cap", coalesce(
        sum(when(col("capped"), col("avail"))).over(full), lit(0L)))
      .withColumn("_W_rest",
        col("_W") - coalesce(sum(when(col("capped"), col("weight"))).over(full), lit(0L)))
      // allocation division runs in LONG (weight × remaining-budget must
      // fit int64 — ANSI throws loudly past that): Spark's `div` and the
      // mirror's BIGINT `//` both truncate; DECIMAL `//` in DuckDB does NOT
      .withColumn("allocated",
        when(col("capped"), col("avail")).otherwise(
          coalesce(
            expr(s"CAST(greatest(weight * (${budget}L - _A_cap), 0L) " +
              "div nullif(_W_rest, 0L) AS BIGINT)"),
            lit(0L))))
      .select(col("source"), col("avail"), col("weight"), col("capped"), col("allocated"))
  }

  /** Temporal train/test split with an embargo gap — the time-series
    * leakage guard: rows strictly before `splitAt − embargo` train, rows
    * at/after `splitAt` test, and the embargo window between is labeled
    * "embargo" and EXCLUDED from both (features computed near the
    * boundary leak across it through windows/sessions that straddle the
    * cut; the gap absorbs that horizon — set it to the longest lookback
    * any feature uses). Map-only, no shuffle; epoch-µs comparisons via
    * [[Times.epochMicros]] so every timestamp flavor works. NULL
    * timestamps label NULL (auditable, never silently trained on). */
  def temporalSplit(df: DataFrame, tsCol: String, splitAt: String,
                    embargo: String = "0 seconds"): DataFrame = {
    val us = Times.epochMicros(col(tsCol))
    val splitUs = Times.epochMicros(to_timestamp(lit(splitAt)))
    val embargoUs = Times.parseDurationUs(embargo)
    // a NEGATIVE embargo would shift the train cut PAST splitAt and the
    // when-chain (train tested first) would silently label test-period
    // rows "train" — the exact leakage this operator exists to prevent
    require(embargoUs >= 0, s"embargo must be non-negative: $embargo")
    df.withColumn("split",
      when(us.isNull, lit(null).cast("string"))
        .when(us < splitUs - embargoUs, lit("train"))
        .when(us >= splitUs, lit("test"))
        .otherwise(lit("embargo")))
  }

  /** Curriculum phase assignment: within each group (source/domain), order
    * documents by an easiness score (ascending — easy first, the standard
    * curriculum-learning schedule), accumulate token counts down that
    * order, and cut the stream into consecutive phases of `phaseTokens`
    * tokens each. A training job then consumes phase 0, then 1, … —
    * deterministic (score, key) ordering makes the schedule replayable
    * bit-for-bit on any engine.
    *
    * phase = exclusive-prefix-sum(tokens) / phaseTokens: a document's
    * phase is decided by how many tokens PRECEDE it, so phases carry
    * AT LEAST phaseTokens once a boundary is crossed, and a document
    * larger than the budget is never split (documents are atomic
    * training units) — it joins whatever phase its start falls in
    * (sharing it with the smaller docs that opened the phase) and its
    * overflow simply skips the phase numbers it covers. This is the
    * standard greedy schedule, NOT an exact-capacity packer — use
    * [[graft.operators.Packing.nextFitPack]] when hard per-bin caps
    * matter more than the easy-first order.
    *
    * Scale: ONE window partitioned by the group — millions of sources
    * spread across the cluster, and the per-group sort is the same
    * shuffle any per-source ordering pays. For a single-source corpus the
    * window degenerates to one partition; range-repartition + the
    * KeyAssign dense-rank path is the documented escape hatch there.
    * Returns the input plus `phase`. */
  def curriculumPhases(df: DataFrame, groupCol: String, keyCol: String,
                       scoreCol: String, tokensCol: String,
                       phaseTokens: Long): DataFrame = {
    require(phaseTokens > 0, "phaseTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol)).over(w))
      // integer `div`, not double `/`: the prefix sums are exact longs and
      // must stay exact past 2^53 (the mirror's BIGINT `//` is the same op)
      .withColumn("phase", expr(s"(_cum - $tokensCol) div ${phaseTokens}L"))
      .drop("_cum")
  }

  /** Train/validation/test split by key hash: returns the input with a
    * `split` column ("train"/"val"/"test"), disjoint and exhaustive, stable
    * for a given key forever — the property that keeps a test set clean
    * across pipeline re-runs and data refreshes. */
  def threeWaySplit(df: DataFrame, keyCol: String,
                    trainFrac: Double, valFrac: Double,
                    salt: String = ""): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"fractions must be non-negative with train+val <= 1 " +
        s"(got $trainFrac + $valFrac) — an over-1 total silently empties " +
        "the test holdout")
    val b = hashBucket(col(keyCol), salt)
    val t = (trainFrac * buckets).toLong
    val v = ((trainFrac + valFrac) * buckets).toLong
    // a NULL key gets a NULL split — the otherwise() branch would
    // silently pool every NULL-key row into "test" and contaminate the
    // holdout (the groupKFold contract, applied here)
    df.withColumn("split",
      when(col(keyCol).isNotNull,
        when(b < t, lit("train")).when(b < v, lit("val")).otherwise(lit("test"))))
  }

  /** GROUP-aware k-fold assignment — cross-validation's leakage guard:
    * the fold is hashed from the GROUP key (author, session, near-dup
    * cluster id from [[graft.operators.Dedup.connectedComponents]]), so
    * every row of a group lands in the SAME fold and a model can never
    * meet its validation group's siblings in training — the
    * [[threeWaySplit]] philosophy extended to k folds and correlated
    * rows (sklearn's GroupKFold, made deterministic).
    *
    * fold = 48-bit md5 bucket of the group mod k — seedless,
    * partition-independent, engine-replayable; NULL groups get NULL
    * fold (route them explicitly, don't let them silently pool).
    * Map-only: zero shuffles, zero state. */
  def groupKFold(df: DataFrame, groupCol: String, k: Int,
                 salt: String = ""): DataFrame = {
    require(k >= 2 && k <= 1024, "k out of range")
    df.withColumn("fold",
      when(col(groupCol).isNotNull,
        pmod(hashBucket(col(groupCol), salt), lit(k.toLong))))
  }
}
