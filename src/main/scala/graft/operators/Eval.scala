package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Deterministic model/label-quality evaluation operators — the metrics a
  * training-data pipeline computes over its own labels, scores, and
  * annotations before (and after) a model ever trains: exact ROC AUC,
  * calibration/ECE, inter-annotator agreement, re-identification risk,
  * and pairwise-preference ranking.
  *
  * Engine-parity discipline (matches the catalog contract): every metric
  * is an INTEGER or exact-DECIMAL fold with at most one double division at
  * readout, rounded once — no transcendental, no float accumulation, so
  * the DuckDB oracle replays each value bit-for-bit.
  *
  * Scale notes are per method; the common shape is one shuffle on the
  * group key and group-partitioned windows only — no global sort, no
  * driver fold.
  */
object Eval {

  /** Exact ROC AUC per group via the tie-aware Mann-Whitney identity.
    *
    * With ranks assigned ascending by score and ties sharing their
    * AVERAGE rank, `U = Σ_pos avgrank − np(np+1)/2` and
    * `AUC = U / (np·nn)`. Average ranks step by ½, so the whole fold is
    * carried DOUBLED in integers: for a tie block starting at min-rank r
    * with c members, `2·avgrank = 2r + c − 1` (exact BIGINT), and
    *
    *   AUC = (Σ_pos (2r + c − 1) − np(np+1)) / (2·np·nn)
    *
    * — one double division at readout, rounded to 6 dp. Degenerate groups
    * (no positives or no negatives) yield NULL, never NaN.
    *
    * Plan shape: one window sort per group for `rank()` + a same-window
    * tie count, then one grouped aggregate — the distributed exact-AUC
    * plan (each group sorts independently; no global sort). 100 TB note:
    * partitions by `groupCol`, so a skewed single-group input (a GLOBAL
    * AUC) should use [[rocAucSharded]] — score-range buckets merged via
    * the rank-offset identity, bit-identical result; at the catalog's
    * shapes (per-class, per-slice AUC) groups are many and modest.
    *
    * @param df       input rows
    * @param groupCol one AUC per distinct value
    * @param scoreCol ranking score (any orderable numeric; ties handled)
    * @param posCol   0/1 positive-class indicator
    */
  def rocAuc(df: DataFrame, groupCol: String, scoreCol: String,
             posCol: String): DataFrame = {
    val rankW = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).asc)
    val tieW = Window.partitionBy(col(groupCol), col(scoreCol))
    // NULL score/indicator rows are excluded (the sibling discipline:
    // kappa, conformal, isotonic all filter) — ranking them would break
    // the Mann-Whitney identity and diverge from rocAucSharded, whose
    // n_neg counts every non-positive row
    val ranked = df.select(col(groupCol), col(scoreCol),
        col(posCol).cast("long").as("_pos"))
      .filter(col(scoreCol).isNotNull && col("_pos").isNotNull)
      .withColumn("_ar2",
        lit(2L) * rank().over(rankW).cast("long") +
          count(lit(1)).over(tieW) - lit(1L))
    // DECIMAL(38,0) fold like rocAucSharded: Σ_pos(2r+c−1) reaches
    // n_pos·2n ~ 10^20 at the scales this file advertises — a BIGINT sum
    // would wrap SILENTLY. rank() itself is 32-bit (a Spark limit the
    // sharded twin documents per bucket): past 2^31 rows per group the
    // window wraps, so the AUC goes loudly NULL there instead of lying.
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        sum(col("_pos")).as("n_pos"),
        sum(lit(1L) - col("_pos")).as("n_neg"),
        sum((col("_pos") * col("_ar2")).cast("decimal(38,0)")).as("_s2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0 ||
            col("_n") >= lit(Int.MaxValue.toLong), lit(null).cast("double"))
          .otherwise(round(
            (col("_s2") - (col("n_pos") * (col("n_pos") + 1)).cast("decimal(38,0)"))
              .cast("double") /
              (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6))
          .as("auc"))
  }

  /** Exact ROC AUC per group, sharded by score range — the skew-safe twin
    * of [[rocAuc]] for ONE giant group (a global AUC over 100 TB of
    * scores), where partitioning by `groupCol` alone would serialize the
    * rank sort into a single task.
    *
    * Rank-offset identity: bucket rows by score range (monotone in the
    * score, so ties of one score value land in one bucket and earlier
    * buckets hold strictly smaller scores). With `off_b` = rows in
    * earlier buckets, a row's global min-rank is its in-bucket min-rank
    * + `off_b`, so its doubled average rank is the IN-BUCKET doubled
    * average rank + `2·off_b`, and
    *
    *   Σ_pos 2·avgrank  =  Σ_b ( Σ_pos∈b 2·avgrank_local + 2·off_b·np_b )
    *
    * — exact BIGINTs end to end; the readout formula is [[rocAuc]]'s.
    * Result is bit-identical to [[rocAuc]] on any input (the bucketing
    * never reaches the value, only the plan).
    *
    * Plan shape: rank/tie windows partition by (group, bucket) — the
    * giant group spreads over `buckets` tasks; the offset prefix sum
    * runs on the groups×buckets control-plane frame and broadcasts
    * back. One grouped aggregate per bucket, one per group. */
  def rocAucSharded(df: DataFrame, groupCol: String, scoreCol: String,
                    posCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= 65536, "buckets out of range")
    val base = df.select(col(groupCol), col(scoreCol).as("_v"),
      col(posCol).cast("long").as("_pos"))
      .filter(col("_v").isNotNull && col("_pos").isNotNull) // rocAuc parity
    val g = col(groupCol)
    val stats = base.groupBy(g.as("_sg"))
      .agg(min(col("_v")).cast("double").as("_lo"),
        max(col("_v")).cast("double").as("_hi"))
    val bucketed = base.join(broadcast(stats), g <=> col("_sg"))
      .withColumn("_bkt",
        when(col("_hi") <= col("_lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            greatest(lit(0), floor((col("_v").cast("double") - col("_lo")) *
              buckets / (col("_hi") - col("_lo"))).cast("int")))))
    val rankW = Window.partitionBy(g, col("_bkt")).orderBy(col("_v").asc)
    val tieW = Window.partitionBy(g, col("_bkt"), col("_v"))
    // overflow discipline (the abSignificance lesson): per-row 2r+c−1 and
    // pos·ar2 fit a long (≤ 2·bucket-rows each), but the group-level SUMS
    // reach n_pos·2n ≈ 10^20 at the giant-single-group scale this path
    // exists for — every cross-term folds in DECIMAL(38,0), which NULLs
    // loudly on precision overflow instead of wrapping. rank() is 32-bit:
    // each BUCKET must stay under 2^31 rows (at the default 256 buckets
    // that is ~5·10^11 rows per group; raise `buckets` beyond that).
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val perBucket = bucketed
      .withColumn("_ar2loc",
        lit(2L) * rank().over(rankW).cast("long") +
          count(lit(1)).over(tieW) - lit(1L))
      .groupBy(g, col("_bkt"))
      .agg(count(lit(1)).as("_nb"), sum(col("_pos")).as("_npb"),
        sum(d38(col("_pos") * col("_ar2loc"))).as("_s2loc"))
    // groups×buckets control-plane frame: prefix row counts per group
    val offW = Window.partitionBy(g).orderBy(col("_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("_off", coalesce(sum(col("_nb")).over(offW), lit(0L)))
      .groupBy(g)
      .agg(sum(col("_npb")).as("n_pos"),
        sum(col("_nb") - col("_npb")).as("n_neg"),
        sum(col("_s2loc") + lit(2) * d38(col("_off")) * d38(col("_npb")))
          .as("_s2"))
      .select(g, col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(round(
            (col("_s2") - d38(col("n_pos")) * (d38(col("n_pos")) + 1))
              .cast("double") /
              (lit(2) * d38(col("n_pos")) * d38(col("n_neg"))).cast("double"),
            6))
          .as("auc"))
  }

  /** Reliability-diagram bins + expected calibration error, exactly.
    *
    * `confCol` must be an EXACT decimal confidence in [0,1] (the catalog
    * derives one as a hash-mod rational; a real pipeline quantizes model
    * probabilities once upstream) — binning and both bin means are then
    * exact: bin b holds n_b rows with Σconf (DECIMAL) and Σpos (BIGINT),
    * `conf_mean = Σconf/n_b`, `acc = Σpos/n_b`, `gap = acc − conf_mean`.
    * The per-bin n_b cancels in ECE's weighted sum, so
    * `ECE = Σ_b |Σconf_b − Σpos_b| / N` — one exact DECIMAL fold and ONE
    * double division for the whole frame (not one per bin), rounded once.
    *
    * Single grouped aggregate + a one-row totals frame broadcast back over
    * the `bins`-row result (the documented stats-frame pattern; no
    * unpartitioned window) — no shuffle beyond the groupBy at any input
    * size. */
  def calibrationBins(df: DataFrame, confCol: String, posCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    // floor, not a bare integer cast: Spark's decimal→long cast truncates
    // while DuckDB's ROUNDS — floor() means the same thing in both engines
    // NULL confidence/indicator rows are excluded: least() skips NULL
    // arguments, so a NULL conf would land in the TOP bin (inflating its
    // n and acc while its conf skips sum_conf) instead of being rejected
    // bin from _c — the SAME value the masses sum: binning on the raw
    // conf while summing its (18,6) cast would let a finer-scale input
    // land boundary mass in one bin and its rounded weight in another
    val binned = df.select(
      col(confCol).cast("decimal(18,6)").as("_c"),
      col(posCol).cast("long").as("_p"))
      .filter(col("_c").isNotNull && col("_p").isNotNull)
      .select(
        least(floor(col("_c") * bins).cast("long"), lit(bins - 1L)).as("bin"),
        col("_c"), col("_p"))
    val agg = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_c")).as("_sc"),
        sum(col("_p")).as("_sp"))
      // decimal(38,6): a bin past 1e12 positives would NULL an (18,6)
      // cast and sum() would silently SKIP the bin from the ECE numerator
      .withColumn("_absgap", abs((col("_sc").cast("decimal(38,6)") -
        col("_sp").cast("decimal(38,6)")).cast("decimal(38,6)")))
    val totals = agg.agg(sum(col("_absgap")).as("_totGap"),
      sum(col("n")).as("_totN"))
    agg.crossJoin(broadcast(totals)) // one-row stats frame (documented pattern)
      .select(col("bin"), col("n"),
        round(col("_sc").cast("double") / col("n"), 6).as("conf_mean"),
        round(col("_sp").cast("double") / col("n"), 6).as("acc"),
        Stats.canonZero(round((col("_sp").cast("decimal(38,6)") -
            col("_sc").cast("decimal(38,6)"))
          .cast("double") / col("n"), 6)).as("gap"),
        round(col("_totGap").cast("double") / col("_totN"), 6).as("ece"))
  }

  /** Cohen's κ between two binary raters, per group — the
    * inter-annotator-agreement gate a labeling pipeline runs before
    * trusting a batch of annotations.
    *
    * Division-free core: with n rows, a1/b1 positive votes per rater and
    * `agree` matching votes, chance agreement has numerator
    * `pe_num = a1·b1 + (n−a1)(n−b1)` over n², and
    *
    *   κ = (n·agree − pe_num) / (n² − pe_num)
    *
    * — exact BIGINTs until the single readout division (NULL when the
    * denominator is 0, i.e. a degenerate all-one-cell table). Observed
    * agreement `po` rides along. One grouped aggregate; scales as a
    * count. */
  def cohenKappa(df: DataFrame, groupCol: String, raterA: Column,
                 raterB: Column): DataFrame = {
    def d38k(c: Column): Column = c.cast("decimal(38,0)")
    val a = raterA.cast("boolean").cast("long")
    val b = raterB.cast("boolean").cast("long")
    df.select(col(groupCol), a.as("_a"), b.as("_b"))
      // A row where either rater abstained (NULL) is not a rated item:
      // drop it from n, the marginals, AND the agreement count alike —
      // counting it in n but skipping it in the sums deflates po/pe.
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("_a")).as("_a1"),
        sum(col("_b")).as("_b1"),
        sum((col("_a") === col("_b")).cast("long")).as("_agree"))
      .withColumn("_pe",
        d38k(col("_a1")) * d38k(col("_b1")) +
          (d38k(col("n")) - d38k(col("_a1"))) *
            (d38k(col("n")) - d38k(col("_b1"))))
      .select(col(groupCol), col("n"),
        round(col("_agree").cast("double") / col("n"), 6).as("po"),
        // decimal products: n·n and the pe cross-terms wrap a long past
        // ~3e9 rows per group — decimal NULLs loudly instead
        when(d38k(col("n")) * d38k(col("n")) === col("_pe"),
            lit(null).cast("double"))
          .otherwise(Stats.canonZero(round(
            (d38k(col("n")) * d38k(col("_agree")) - col("_pe")).cast("double") /
              (d38k(col("n")) * d38k(col("n")) - col("_pe")).cast("double"), 6)))
          .as("kappa"))
  }

  /** k-anonymity / l-diversity audit over a quasi-identifier set — the
    * re-identification risk check a release pipeline runs before
    * publishing: every row whose quasi-identifier equivalence class is
    * smaller than `k` is individually re-identifiable to that class.
    *
    * One row out, all BIGINT: `k_anonymity` = the smallest class,
    * `l_diversity` = the fewest distinct `sensitiveCol` values in any
    * class, `n_classes`, plus the classes and rows below the `k`
    * threshold. Two grouped aggregates (classes, then the summary) — a
    * count-shaped plan at any scale. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    // NULL is a sensitive VALUE to an attacker (absence is learnable):
    // countDistinct alone skips NULLs, so an all-NULL class would report
    // l = 0 and drag the frame minimum to a meaningless zero
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        (countDistinct(col(sensitiveCol)) +
          max(col(sensitiveCol).isNull.cast("long"))).as("_l"))
    classes.agg(
      min(col("_n")).as("k_anonymity"),
      min(col("_l")).as("l_diversity"),
      count(lit(1)).as("n_classes"),
      sum((col("_n") < k).cast("long")).as("n_small_classes"),
      sum(when(col("_n") < k, col("_n")).otherwise(lit(0L))).as("rows_at_risk"))
  }

  /** Copeland pairwise-preference ranking — the RLHF-adjacent aggregate:
    * items dueling via per-voter scores, ranked by pairwise wins. Item a
    * beats item b when MORE voters score a above b than b above a; the
    * Copeland score is +2 per opponent beaten, +1 per drawn opponent
    * (doubled to stay integer — no ½-point floats).
    *
    * Per-voter scores fold as exact DECIMAL so the within-voter
    * comparison is order-free; the voter-local self-join fans each voter
    * to items² ordered pairs (items is small by construction — event
    * types, model variants, prompt templates), then one global pair
    * aggregate and one item aggregate. Linear in voters; never
    * voters×voters. */
  def copelandRanking(df: DataFrame, voterCol: String, itemCol: String,
                      scoreCol: String): DataFrame = {
    // NULL voters are excluded, loudly documented rather than silently
    // half-counted: groupBy would keep a NULL-voter group, but the
    // self-join on _v (equality) could never match it — its preferences
    // would tally into s yet contribute to no pair. A NULL voter is a
    // missing identity, not a ballot. (Items that share no voter with
    // any other item emit no pair rows and are absent from the output —
    // the documented contract: this is a PAIRWISE ranking.)
    val s = df.filter(col(voterCol).isNotNull)
      .select(col(voterCol).as("_v"), col(itemCol).as("_i"),
        col(scoreCol).cast("decimal(18,6)").as("_s"))
      .groupBy(col("_v"), col("_i")).agg(sum(col("_s")).as("_s"))
    val o = s.select(col("_v"), col("_i").as("_j"), col("_s").as("_t"))
    // ordered pairs (i, j), i != j: wins_ij = #voters with s_i > s_j
    val pairs = s.join(o, Seq("_v")).filter(col("_i") =!= col("_j"))
      .groupBy(col("_i"), col("_j"))
      .agg(sum((col("_s") > col("_t")).cast("long")).as("_w"))
    val flipped = pairs.select(col("_i").as("_j2"), col("_j").as("_i2"),
      col("_w").as("_wr"))
    pairs.join(flipped, col("_i") === col("_i2") && col("_j") === col("_j2"))
      .groupBy(col("_i"))
      .agg(sum((col("_w") > col("_wr")).cast("long")).as("pair_wins"),
        sum((col("_w") === col("_wr")).cast("long")).as("pair_ties"),
        sum((col("_w") < col("_wr")).cast("long")).as("pair_losses"),
        sum(when(col("_w") > col("_wr"), 2L)
          .when(col("_w") === col("_wr"), 1L).otherwise(0L)).as("copeland2"))
      .withColumnRenamed("_i", "item")
  }

  /** Division-free two-proportion z-test — the A/B experiment readout,
    * one verdict row per metric: does variant 1's unit-conversion rate to
    * that metric differ from variant 0's at the given critical value?
    *
    * The textbook test `|p₁−p₀| > z·√(p̂(1−p̂)(1/n₁+1/n₀))` is squared and
    * cross-multiplied into one INTEGER inequality over DECIMAL(38,0)
    * operands. Headroom: the left side is `(x₁n₀−x₀n₁)²·N·critDen²`
    * ≲ n⁵·10⁴, inside DECIMAL(38,0) for per-variant unit counts to
    * ~5·10⁶ — past that Spark's 38-digit cap NULLs the product
    * (non-ANSI) rather than corrupting it, and the experiment should be
    * read per-stratum (where the identity is then exact again):
    *
    *   (x₁n₀ − x₀n₁)² · N · critDen²  >  critNum² · X(N−X) · n₁ · n₀
    *
    * with X = x₁+x₀, N = n₁+n₀ and z = critNum/critDen (default
    * 196/100 = 1.96, the two-sided 5% level) — no square root, no float,
    * so the DuckDB oracle replays the verdict bit-for-bit. The only
    * double is the effect-size readout, divided once, rounded once, and
    * zero-canonicalized (a −0.0 effect would flip the driver's
    * bit-pattern hash).
    *
    * Plan shape: exposure counts per variant (one aggregate over units),
    * conversion counts per (metric, variant) (one distinct-unit
    * aggregate), then a ≤-variants-wide broadcast — count-shaped at any
    * scale.
    *
    * @param variant 0/1 assignment expression over the input columns
    *                (deterministic — e.g. `pmod(col("user_id"), 2)`)
    */
  def twoProportionTest(df: DataFrame, unitCol: String, metricCol: String,
                        variant: Column, critNum: Long = 196L,
                        critDen: Long = 100L): DataFrame = {
    require(critNum > 0 && critDen > 0, "critical value must be positive")
    val base = df.filter(col(unitCol).isNotNull && col(metricCol).isNotNull)
      .select(col(unitCol).as("_u"), col(metricCol).as("metric"),
        variant.cast("long").as("_v"))
    val exposed = base.select(col("_u"), col("_v")).distinct()
      .groupBy(col("_v")).agg(count(lit(1)).as("_n"))
    val nRow = exposed.groupBy()
      .agg(sum(when(col("_v") === 1L, col("_n"))).as("n1"),
        sum(when(col("_v") === 0L, col("_n"))).as("n0"))
    val conv = base.groupBy(col("metric"))
      .agg(countDistinct(when(col("_v") === 1L, col("_u"))).as("x1"),
        countDistinct(when(col("_v") === 0L, col("_u"))).as("x0"))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    // Multiply in decimal(38,0), never LONG: x1·n0 at ~3e9 units each
    // wraps a long silently; the decimal product NULLs on precision
    // overflow instead of corrupting the significance verdict.
    val num = d38(col("x1")) * d38(col("n0")) - d38(col("x0")) * d38(col("n1"))
    val bigN = d38(col("n1") + col("n0"))
    val bigX = d38(col("x1") + col("x0"))
    conv.crossJoin(broadcast(nRow))
      .select(col("metric"), col("n1"), col("x1"), col("n0"), col("x0"),
        Stats.canonZero(round(
          num.cast("double") /
            (d38(col("n1")) * d38(col("n0"))).cast("double"), 6)).as("effect"),
        (num * num * bigN * d38(lit(critDen)) * d38(lit(critDen)) >
          d38(lit(critNum)) * d38(lit(critNum)) * bigX * (bigN - bigX) *
            d38(col("n1")) * d38(col("n0"))).as("significant"))
  }

  /** Split-conformal calibration per group (Mondrian conformal): from a
    * calibration split's nonconformity scores, the threshold
    * `qhat = the k-th smallest score, k = ⌈(n+1)·(1−α)⌉` guarantees
    * marginal coverage ≥ 1−α on exchangeable test rows (Vovk et al.;
    * Angelopoulos & Bates, arXiv:2107.07511 §2) — the distribution-free
    * "how big must the prediction set be" primitive an eval pipeline
    * runs per class/slice. Emits qhat plus the EMPIRICAL coverage
    * measured on the test split.
    *
    * α is a RATIONAL `alphaNum/alphaDen`, so k is exact integer math;
    * qhat is a SELECTED input value (an order statistic — no arithmetic,
    * bit-exact in any engine); coverage is the one rounded readout.
    * When k > n (calibration set too small for the requested level) the
    * honest answer is qhat = +∞: emitted as NULL with every test row
    * covered.
    *
    * Scale: the k-th order statistic is found WITHOUT a per-group sort —
    * the [[ApproxQuantile.exactOrderStats]] bucket-histogram walk (range
    * histogram → cumulative window over ≤ `buckets` rows per group →
    * row_number inside the ONE covering bucket), so a skewed group costs
    * one small-bucket sort, never a whole-group sort. Test rows take one
    * broadcast join against the per-group threshold frame. */
  def conformalCalibration(df: DataFrame, groupCol: String, scoreCol: String,
                           calCol: String, alphaNum: Long, alphaDen: Long,
                           buckets: Int = 1024): DataFrame = {
    val g = col(groupCol)
    // materialized once: thr feeds the coverage join, the scored frame,
    // AND the unscored anti-join — without this the whole threshold
    // pipeline (histogram, cumulative window, rank pick) re-runs three
    // times over the calibration split. ≤ |groups| rows, control-plane.
    val thr = conformalThreshold(df.filter(col(calCol)), groupCol, scoreCol,
      alphaNum, alphaDen, buckets).materialized
    // empirical coverage on the test split — grouped from the TEST side,
    // then left-joined back onto the thresholds so a group with
    // calibration rows but no test rows still surfaces its qhat
    // (n_test = 0, coverage NULL) instead of vanishing
    val test = df.filter(!col(calCol))
      .select(g, col(scoreCol).cast("double").as("_tv"))
      .filter(col("_tv").isNotNull)
    val cov = test.join(broadcast(thr), g <=> col("_g"))
      .groupBy(g).agg(
        count(lit(1)).as("n_test"),
        sum((col("_inf") || col("_tv") <= col("qhat")).cast("long"))
          .as("n_covered"))
      .withColumnRenamed(groupCol, "_cg")
    val scored = thr.join(broadcast(cov), col("_g") <=> col("_cg"), "left")
      .select(col("_g").as(groupCol),
        col("_nc").as("n_cal"), col("_k").as("k_rank"), col("qhat"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        when(col("n_test").isNotNull, col("n_covered")).as("n_covered"))
      .withColumn("coverage",
        when(col("n_test") > 0,
          round(col("n_covered").cast("double") / col("n_test"), 6)))
    // groups with test rows but NO calibration threshold surface as an
    // UNSCORED row (n_cal = 0, NULL k/qhat/coverage) instead of vanishing —
    // parity with StreamingConformal's unscored verdict for unknown groups.
    // Distinguishable from the k>n "+∞ threshold" case, which also carries a
    // NULL qhat but has n_cal > 0 (and counts every test row covered).
    val unscored = test.groupBy(g).agg(count(lit(1)).as("n_test"))
      .join(broadcast(thr.select(col("_g"))), g <=> col("_g"), "left_anti")
      .select(g, lit(0L).as("n_cal"), lit(null).cast("long").as("k_rank"),
        lit(null).cast("double").as("qhat"), col("n_test"),
        lit(null).cast("long").as("n_covered"),
        lit(null).cast("double").as("coverage"))
    scored.unionByName(unscored)
  }

  /** Isotonic calibration per group — the pool-adjacent-violators fit
    * (Barlow et al. 1972; the standard probability-calibration method
    * beside [[calibrationBins]]' ECE readout and
    * [[conformalCalibration]]'s coverage guarantee): the least-squares
    * NONDECREASING fit of a 0/1 outcome against a score, i.e. the
    * calibrated probability table a reliability-critical consumer maps
    * raw scores through.
    *
    * Engine-exact: equal scores pre-pool into one point (the standard
    * tie rule); PAV pool merges compare means by CROSS-MULTIPLIED
    * integer sums (`sumA·nB ≥ sumB·nA` — no float decides a pool);
    * `fitted = round(Σpos/n, 6)` is the one double division per pool,
    * rounded once. The oracle replays the fit through the minimax
    * identity `ŷ_k = max_{i≤k} min_{j≥k} mean(y[i..j])` — a DIFFERENT
    * algorithm (O(n²) prefix-sum pairs vs the linear stack walk), so the
    * two implementations cross-check; double min/max selection is an
    * exact decider because distinct pooled means p/q, p'/q' with
    * q ≤ n differ by ≥ 1/n², orders of magnitude past double rounding
    * at calibration-set sizes.
    *
    * Scale: one grouped pre-pool aggregate, then each group's walk runs
    * SEQUENTIALLY inside its partition (hash-repartition by group +
    * sortWithinPartitions — the [[graft.operators.Packing]] next-fit
    * pattern): PAV is inherently order-coupled, so the unit of
    * parallelism is the group, the same contract as [[rocAuc]]'s
    * window; calibration sets are sampled and bounded by construction.
    * State = the pool stack (≤ distinct scores per group). */
  def isotonicCalibration(df: DataFrame, groupCol: String, scoreCol: String,
                          posCol: String): DataFrame = {
    val g = col(groupCol)
    val pts = df
      .filter(g.isNotNull && col(scoreCol).isNotNull && col(posCol).isNotNull)
      .select(g, col(scoreCol).cast("double").as("_x"),
        col(posCol).cast("long").as("_y"))
      .groupBy(g, col("_x"))
      .agg(sum(col("_y")).as("_sy"), count(lit(1)).as("_n"))
    import org.apache.spark.sql.Encoders
    val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble,
      Encoders.scalaLong, Encoders.scalaLong)
    val outEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    // the group key rides as a string so one walk serves any key type;
    // readback casts it to the input column's type
    val keyType = pts.schema(groupCol).dataType
    val walked = pts
      .select(g.cast("string").as("_g"), col("_x"), col("_sy"), col("_n"))
      .repartition(col("_g"))
      .sortWithinPartitions(col("_g"), col("_x"))
      .as(enc)
      .mapPartitions { (it: Iterator[(String, Double, Long, Long)]) =>
        // pools: (sumY, n, points-in-pool). STREAMED per group: groups
        // are contiguous after the sort, so buffering only the CURRENT
        // group's pools bounds executor memory by one group — a hash
        // partition can hold arbitrarily many groups, and collecting the
        // whole partition's output first would hold them all at once
        final case class Pool(var sy: Long, var n: Long,
                              pts: scala.collection.mutable.ArrayBuffer[(Double, Long, Long)])
        // NB: named `in`, not `buffered` — inside the anonymous Iterator,
        // `buffered` resolves to THIS.buffered (Iterator's own method)
        val in = it.buffered
        new Iterator[(String, Double, Long, Long, Double)] {
          private var outIt: Iterator[(String, Double, Long, Long, Double)] =
            Iterator.empty
          private def nextGroup(): Unit = {
            val grp = in.head._1
            val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
            while (in.hasNext && in.head._1 == grp) {
              val (_, x, sy, n) = in.next()
              stack += Pool(sy, n,
                scala.collection.mutable.ArrayBuffer((x, sy, n)))
              // merge while the new pool's mean is BELOW its predecessor's
              // (cross-multiplied longs; sums bounded by calibration-set
              // sizes, far inside long range)
              while (stack.length >= 2 &&
                  stack(stack.length - 1).sy * stack(stack.length - 2).n <=
                  stack(stack.length - 2).sy * stack(stack.length - 1).n) {
                val top = stack.remove(stack.length - 1)
                val prev = stack(stack.length - 1)
                prev.sy += top.sy; prev.n += top.n; prev.pts ++= top.pts
              }
            }
            outIt = stack.iterator.flatMap { p =>
              val fitted = BigDecimal(p.sy.toDouble / p.n)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              p.pts.iterator.map { case (x, sy, n) => (grp, x, n, sy, fitted) }
            }
          }
          override def hasNext: Boolean = {
            while (!outIt.hasNext && in.hasNext) nextGroup()
            outIt.hasNext
          }
          override def next(): (String, Double, Long, Long, Double) = {
            if (!hasNext) throw new NoSuchElementException
            outIt.next()
          }
        }
      }(outEnc)
      .toDF("_g", "score", "n", "sum_pos", "fitted")
    walked.select(col("_g").cast(keyType).as(groupCol), col("score"),
      col("n"), col("sum_pos"), col("fitted"))
  }

  /** The threshold half of [[conformalCalibration]]: per-group
    * `(_g, _nc, _k, _inf, qhat)` from CALIBRATION rows only — qhat the
    * exact k-th smallest score via the bucket-histogram rank walk, NULL
    * with `_inf = true` when k > n. Shared by the batch operator and
    * [[graft.streaming.StreamingConformal]] (which freezes this frame
    * once and scores every micro-batch against it). */
  def conformalThreshold(calDf: DataFrame, groupCol: String, scoreCol: String,
                         alphaNum: Long, alphaDen: Long,
                         buckets: Int = 1024): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, "need 0 < alpha < 1")
    require(buckets >= 2 && buckets <= (1 << 16), "buckets in [2, 65536]")
    val g = col(groupCol)
    val cal = calDf
      .select(g, col(scoreCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    // per-group stats + the exact conformal rank k = ⌈(n+1)(1−α)⌉
    val st = cal.groupBy(g)
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
        count(lit(1)).as("_nc"))
      .withColumn("_k", expr(
        s"((_nc + 1) * ${alphaDen - alphaNum}L + ${alphaDen - 1}L) div ${alphaDen}L"))
      .withColumn("_inf", col("_k") > col("_nc"))
      .withColumnRenamed(groupCol, "_g")
      .materialized
    val varied = st.filter(col("_mx") > col("_mn") && !col("_inf"))
    // bucket histogram over the calibration scores of varied groups
    val bkt = least(floor((col("_v") - col("_mn")) * buckets /
      (col("_mx") - col("_mn"))).cast("long"), lit(buckets - 1L))
    val b = cal.join(broadcast(varied), g <=> col("_g"))
      .select(g, col("_v"), bkt.as("_bkt"))
    val cum = b.groupBy(g, col("_bkt")).agg(count(lit(1)).as("_c"))
      .withColumn("_cc", sum(col("_c")).over(
        Window.partitionBy(g).orderBy(col("_bkt"))))
    // covering bucket (first cumulative count ≥ k) + count before it
    val pick = cum.join(broadcast(varied), g <=> col("_g"))
      .groupBy(g).agg(
        min(when(col("_cc") >= col("_k"), col("_bkt"))).as("_tb"),
        coalesce(max(when(col("_cc") < col("_k"), col("_cc"))), lit(0L))
          .as("_before"),
        first(col("_k")).as("_k2"))
      .withColumnRenamed(groupCol, "_pg")
    val qVaried = b.join(broadcast(pick),
        g <=> col("_pg") && col("_bkt") === col("_tb"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(g).orderBy(col("_v"))))
      .filter(col("_rn") === col("_k2") - col("_before"))
      .select(g.as("_qg"), col("_v").as("_qv"))
    // assemble qhat: NULL when infinite, the constant when flat
    st.join(broadcast(qVaried), col("_g") <=> col("_qg"), "left")
      .select(col("_g"), col("_nc"), col("_k"), col("_inf"),
        when(col("_inf"), lit(null).cast("double"))
          .when(col("_mx") <=> col("_mn"), col("_mn"))
          .otherwise(col("_qv")).as("qhat"))
  }
}
