package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Exact-arithmetic statistics verdicts — the [[TimeSeries.rollingAnomalies]]
  * family: decisions a pipeline branches on must be engine-exact, so the
  * comparisons run in integer/decimal arithmetic and only display values
  * pass through floats (rounded).
  */
object Stats {

  /** Canonicalize IEEE signed zero: `-0.0 + 0.0 = +0.0`; every other
    * double (including NULL and NaN) is unchanged. Applied to every
    * rounded double readout whose argument can be tiny-negative, and
    * mirrored as `+ 0` in the oracle SQL — the r9 q163 lesson: Spark's
    * BigDecimal round normalizes `-0.0` to `+0.0` while DuckDB's round
    * preserves the sign, so a cov cell whose 6-dp rounding is zero
    * hashed differently on the two legs despite comparing equal. The
    * bit-exact replay contract must not hinge on either engine's zero-
    * sign policy. */
  def canonZero(c: Column): Column = c + lit(0d)

  /** Per-group feature normalization — the feature-engineering staple:
    * z-score and min-max scaling of a numeric column against its group's
    * distribution, as one stats aggregate broadcast back + a map-only
    * projection (the winsorize/q113 topology).
    *
    * Determinism contract: values enter as DECIMAL(18,6); Σx and Σx² are
    * EXACT decimal sums (order-free), and the mean/σ/scaled outputs are
    * fixed-shape double expressions over those exact bases, rounded to 6 —
    * so any engine replays every z bit-for-bit. σ is the population form
    * √(Q/n − μ²). Degenerate groups defined away from NaN: zero variance →
    * NULL z; constant min=max → NULL minmax; NULL values pass through
    * NULL. Exactness bound: Σx² stays in DECIMAL(38,12) while
    * n·max(x)² < ~1e25 — rescale heavier-tailed metrics first.
    *
    * Returns the input plus `<valueCol>_z` and `<valueCol>_minmax`. */
  def standardize(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val xd = col(valueCol).cast("decimal(18,6)")
    val stats = df.groupBy(col(groupCol))
      .agg(count(xd).as("_n"),
        sum(xd).as("_s"),
        sum((xd * xd).cast("decimal(38,12)")).as("_q"),
        min(xd).as("_mn"), max(xd).as("_mx"))
      .withColumnRenamed(groupCol, "_grp")
    val mean = col("_s").cast("double") / col("_n")
    val variance = col("_q").cast("double") / col("_n") - mean * mean
    df.join(broadcast(stats), col(groupCol) <=> col("_grp"), "left")
      .withColumn(s"${valueCol}_z",
        // EXACT zero-variance gate: min < max decides group constancy with
        // NO arithmetic at all (a decimal n·Q > S² cross-product looks
        // exact but Spark's precision-loss rule rounds the 59-digit product
        // to scale 6, blurring sub-1e-6 variances). The variance > 0
        // conjunct is the float-cancellation guard: a non-constant group
        // whose double cross-product cancels to ≤ 0 reads NULL z instead of
        // NaN/∞ — deterministic, since both engines evaluate the identical
        // fixed-shape expression over the same exact decimal bases.
        when(col("_n") > 1 && col("_mn") < col("_mx") && variance > lit(0d),
          canonZero(round((xd.cast("double") - mean) / sqrt(variance), 6))))
      .withColumn(s"${valueCol}_minmax",
        when(col("_mx") > col("_mn"),
          round((xd - col("_mn")).cast("double") /
            (col("_mx") - col("_mn")).cast("double"), 6)))
      .drop("_grp", "_n", "_s", "_q", "_mn", "_mx")
  }

  /** Quantile normalization — map every group's value DISTRIBUTION onto
    * a reference group's (the feature-engineering/bioinformatics staple
    * beside [[standardize]]'s moments and [[robustScale]]'s quartiles:
    * z-scores align location/scale but keep each source's SHAPE; this
    * makes "the p-th best document of source B" score exactly like "the
    * p-th best of source A", which is what a cross-source ranking cutoff
    * actually needs).
    *
    * Per row: p = (rank − 1)/(n − 1), the min-rank ECDF position within
    * the row's own group (ties share the min rank — ANSI rank() in both
    * engines; a singleton group reads p = 0). The reference's quantile
    * at p comes from a (slots+1)-edge grid — the reference's exact
    * quantiles at i/slots via [[ApproxQuantile.exactQuantiles]]
    * (bounded state, ≡ quantile_cont rounded 6) — broadcast once, with
    * linear interpolation INSIDE the slot. Within-slot error ≤ the
    * reference's density variation over a 1/S quantile step (S = 256
    * default) — the documented bound that keeps state FIXED while the
    * exact per-row rank stays exact.
    *
    * Determinism contract — NO double arithmetic anywhere near the
    * readout (the first draft rounded an interpolated double and hit a
    * genuine cross-engine round-boundary flip at row 697 of sf0.01:
    * Spark's round works on the exact binary value via BigDecimal,
    * DuckDB's multiplies by 1e6 first, and a last-ulp difference
    * straddled the 6-dp boundary): slot = ⌊(rank−1)·S/(n−1)⌋ and the
    * in-slot fraction ⌊a·10⁶/(n−1)⌋ (a = (rank−1)·S − slot·(n−1)) are
    * INTEGER floor divisions — exact in any engine; edges enter as
    * DECIMAL(18,6); the interpolation e_lo + fr·(e_hi − e_lo) and its
    * final 6-dp rounding run entirely in exact decimal. The millionth-
    * quantized fraction perturbs the output by ≤ 1e-6 slot widths —
    * part of the transform's definition, identical on every engine.
    *
    * Scale: one rank window per group (PARTITION BY group — groups fan
    * out), one 3-pass [[ApproxQuantile.edgeGrid]] over the REFERENCE
    * subset only; the grid's single S+1-edge row is collected (control
    * plane: ONE row) and re-entered as plan literals, so the readout is
    * a map-only projection with no join. An EMPTY reference group fails
    * loudly instead of emptying the output. NULL values pass through
    * NULL.
    *
    * Returns the input plus `<valueCol>_qnorm`. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        refGroup: Column, slots: Int = 256): DataFrame = {
    require(slots >= 8 && slots <= 4096, "slots out of range")
    require((slots & (slots - 1)) == 0,
      "slots must be a power of two (so i/slots is binary-exact and the " +
        "in-edge fraction has a finite decimal expansion)")
    val x = col(valueCol).cast("double")
    // reference values quantized ONCE to 6 dp — order statistics of the
    // quantized column are exact decimals, so the whole edge grid (built
    // long-form by edgeGrid: e_i = vlo + ((i·(n−1)) mod S)/S · (vhi−vlo),
    // all-decimal, integer order-statistic indices) carries no double
    // round anywhere. The grid is ONE row of S+1 decimals — collected to
    // the driver (control plane) and re-entered as literals, so the
    // per-row readout below is a pure map-only projection.
    val grid = ApproxQuantile.edgeGrid(
      df.filter(col(groupCol) <=> refGroup && x.isNotNull)
        .select(lit(1).as("_rq"), x.cast("decimal(18,6)").as("_rx")),
      "_rq", "_rx", slots)
    val gridRows = grid.collect()
    // an empty reference group would otherwise produce an edge frame of
    // zero rows and silently EMPTY output downstream — fail loudly
    require(gridRows.length == 1,
      s"quantileNormalize: reference group has no non-null '$valueCol' rows")
    val edgeVals = gridRows.head.getSeq[java.math.BigDecimal](
      gridRows.head.fieldIndex("_edges"))
    val edgesLit = array(edgeVals.map(d =>
      if (d == null) lit(null).cast("decimal(25,18)")
      else lit(d).cast("decimal(25,18)")): _*)
    // nulls LAST: Spark's asc default is nulls-first, which would shift
    // every non-null rank by the group's null count (DuckDB sorts them
    // last) — and p must be the ECDF over the NON-NULL values
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(x.asc_nulls_last)
    val ranked = df
      .withColumn("_rk",
        when(x.isNotNull, rank().over(w).cast("long")))
      .withColumn("_n",
        when(x.isNotNull, count(x).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol)))))
    // integer-exact slot and millionth-quantized fraction (see contract)
    val staged = ranked
      .withColumn("_nm1", (col("_n") - 1).cast("long"))
      .withColumn("_rkS", ((col("_rk") - 1) * slots).cast("long"))
      .withColumn("_slot",
        when(col("_n") > 1, least(expr("_rkS DIV _nm1"), lit(slots - 1L)))
          .otherwise(lit(0L)))
      .withColumn("_a", col("_rkS") - col("_slot") * col("_nm1"))
      .withColumn("_fr6",
        when(col("_n") > 1, expr("(_a * 1000000) DIV _nm1"))
          .otherwise(lit(0L)))
    val fr = (col("_fr6").cast("decimal(7,0)") *
      lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)"))
      .cast("decimal(7,6)")
    // two element_at lookups into the literal edge array, not a
    // 2×S-branch CASE chain (which would blow the codegen method budget
    // at S=256); no join at all — the edges are plan constants
    val eLo = element_at(edgesLit, (col("_slot") + 1).cast("int"))
    val eHi = element_at(edgesLit, (col("_slot") + 2).cast("int"))
    staged
      .withColumn(s"${valueCol}_qnorm",
        when(x.isNotNull,
          canonZero(round(eLo + fr * (eHi - eLo), 6).cast("double"))))
      .drop("_rk", "_n", "_nm1", "_rkS", "_slot", "_a", "_fr6")
  }

  /** Robust per-group scaling: (x − median) / IQR — the outlier-immune
    * twin of [[standardize]] (one wild value moves a mean/σ arbitrarily
    * far; the median and quartiles move by at most one rank). Bounds come
    * from [[ApproxQuantile.exactQuantiles]] — the bounded-state exact
    * path, so the operator survives near-unique doubles at any scale —
    * broadcast back as one tiny row per group; the scaling itself is
    * map-only. Zero-IQR groups (≥ 50% mass on one value) yield NULL,
    * never NaN/Inf; NULL values pass through NULL.
    *
    * Returns the input plus `<valueCol>_robust`. */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val b = ApproxQuantile.exactQuantiles(df, groupCol, valueCol,
        Seq("_q1" -> 0.25, "_med" -> 0.5, "_q3" -> 0.75))
      .withColumnRenamed(groupCol, "_grp")
    df.join(broadcast(b), col(groupCol) <=> col("_grp"), "left")
      .withColumn(s"${valueCol}_robust",
        when(col("_q3") > col("_q1"),
          canonZero(round((col(valueCol).cast("double") - col("_med")) /
            (col("_q3") - col("_q1")), 6))))
      .drop("_grp", "_q1", "_med", "_q3")
  }

  /** The shared exact-Pearson law: (num, denx, deny) from the five
    * integer/decimal sums, everything in DECIMAL(38,0) — ONE definition
    * for [[corrVerdict]] and [[TimeSeries.autocorrelation]], so the
    * determinism-critical formula cannot drift between copies. */
  private[operators] def pearsonParts(n: Column, sx: Column, sy: Column,
      sxy: Column, sxx: Column, syy: Column): (Column, Column, Column) = {
    def d(c: Column) = c.cast("decimal(38,0)")
    (d(n) * d(sxy) - d(sx) * d(sy),
      d(n) * d(sxx) - d(sx) * d(sx),
      d(n) * d(syy) - d(sy) * d(sy))
  }

  /** The once-rounded r readout over [[pearsonParts]]; NULL for a
    * degenerate (zero-variance) side. */
  private[operators] def pearsonCorr(num: Column, denx: Column,
                                     deny: Column): Column =
    when(denx > 0 && deny > 0, canonZero(round(num.cast("double") /
      (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))), 6)))

  /** Group-wise Pearson correlation between two INTEGER-valued metrics,
    * with an exact strength verdict: `strong` ⇔ corr² > threshold², cross-
    * multiplied into DECIMAL(38,0) so the decision never touches a float —
    * `(n·Σxy − ΣxΣy)² · tDen² > tNum² · (n·Σx²−(Σx)²) · (n·Σy²−(Σy)²)`
    * with threshold = tNum/tDen. The displayed `corr` is the same exact
    * integers pushed through one fixed-shape double expression, rounded
    * to 6 (the cosine-rank crutch); the VERDICT does not depend on it.
    *
    * Inputs must already be integral (longs — scale fixed-point metrics
    * up front, e.g. cents instead of dollars). Exactness bound: the
    * decimal cross-products stay under 38 digits while
    * `n·max|x|·max|y| < ~1e17` and the variance products stay under
    * ~1e37 — comfortably true for per-group slices into the billions of
    * rows with bounded metrics; past that, rescale the metrics.
    *
    * Scale: ONE hash-aggregate over the group key (six exact decimal
    * sums, map-side partial); everything after runs on one row per group.
    */
  def corrVerdict(df: DataFrame, groupCol: String, x: Column, y: Column,
                  thresholdNum: Int = 1, thresholdDen: Int = 2): DataFrame = {
    // rows where EITHER metric is NULL drop entirely: count(*) with
    // null-skipping sums would mix mismatched populations in the
    // cross-products and corrupt both corr and the verdict
    // per-row products and their sums fold in DECIMAL, not long: x = 1e10
    // squares to 1e20 > Long.MaxValue and a long product wraps SILENTLY
    // under non-ANSI even inside this operator's documented n·|x|·|y|
    // bound — decimal(19,0)² → decimal(38,0) is exact to ~8.5e37, and
    // past THAT the sum goes NULL, which the loud guard below catches
    def dl(c: Column) = c.cast("decimal(19,0)")
    val g = df.select(col(groupCol), x.cast("long").as("_x"), y.cast("long").as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(dl(col("_x"))).as("_sx"), sum(dl(col("_y"))).as("_sy"),
        sum(dl(col("_x")) * dl(col("_y"))).as("_sxy"),
        sum(dl(col("_x")) * dl(col("_x"))).as("_sxx"),
        sum(dl(col("_y")) * dl(col("_y"))).as("_syy"))
    val (num, denx, deny) = pearsonParts(col("n"), col("_sx"), col("_sy"),
      col("_sxy"), col("_sxx"), col("_syy"))
    val corr = pearsonCorr(num, denx, deny)
    // Outside the documented bound, non-ANSI decimal multiply returns NULL
    // — without a guard `strong` would silently become NULL and a pipeline
    // branching on it would treat the group as neither strong nor weak.
    // Detect overflow (product NULL while its inputs are not) and fail
    // LOUDLY instead.
    val lhs = num * num * lit(thresholdDen.toLong * thresholdDen)
    val rhs = lit(thresholdNum.toLong * thresholdNum) * denx * deny
    val inputsOk = col("_sx").isNotNull && col("_sy").isNotNull &&
      col("_sxy").isNotNull && col("_sxx").isNotNull && col("_syy").isNotNull
    // two overflow surfaces, both loud: a SUM past 38 digits nulls the
    // aggregate itself (n > 0 proves rows existed), and a cross-product
    // past 38 digits nulls downstream of intact sums
    val overflowed =
      (col("n") > 0 && !inputsOk) ||
        (inputsOk &&
          (num.isNull || denx.isNull || deny.isNull || lhs.isNull || rhs.isNull))
    g.select(col(groupCol), col("n"),
      corr.as("corr"),
      when(overflowed, raise_error(concat(
          lit("corrVerdict: decimal overflow in group "), col(groupCol).cast("string"),
          lit(" — rescale the metrics (bound: n*max|x|*max|y| < ~1e17)"))))
        .otherwise(denx > 0 && deny > 0 && lhs > rhs).as("strong"))
  }

  /** Population Stability Index between every ordered pair of groups —
    * the model-monitoring drift metric for NUMERIC columns, beside
    * [[TextAnalysis.sourceKlDivergence]]'s token-distribution drift:
    * PSI(A→B) = Σ_bins (p_A − p_B)·ln(p_A/p_B) over a SHARED equal-width
    * binning (industry folklore: < 0.1 stable, 0.1–0.25 shifting,
    * > 0.25 drifted). Symmetric in information terms but reported per
    * ordered pair to match the KL surface.
    *
    * Determinism contract: the bin edges come from the GLOBAL min/max
    * (exact aggregate), and bin assignment is
    * `least(B−1, floor((x−mn)·B / (mx−mn)))` — plain IEEE-754 ops that
    * every engine computes bit-identically (only transcendentals vary
    * across libms). Counts are add-one smoothed over all B bins so every
    * term is finite; the ln factors are each rounded once to 6 dp and
    * combined as DECIMAL; each bin's term is one fixed-shape double
    * expression over exact integers and those decimals, rounded once to
    * 12 dp, and the per-pair fold is an exact DECIMAL sum — order-free,
    * so any engine replays the PSI bit-for-bit. NULL values are
    * excluded from the distributions; a degenerate column (mx = mn)
    * puts all mass in bin 0 — equal-SIZED groups then score exactly 0,
    * while unequal sizes keep the small add-one smoothing residual
    * (smoothed probabilities depend on n).
    *
    * Scale: ONE (group, bin) count aggregate over the data (map-side
    * partial — at most groups×B partial rows per task), a one-row
    * min/max broadcast, and a groups²×B dense grid for the readout —
    * never corpus². B is the state bound, not the data. */
  def psi(df: DataFrame, groupCol: String, valueCol: String,
          bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 4096, "bins out of range")
    val x = col(valueCol).cast("double")
    // NaN is excluded with NULL: it passes isNotNull, Spark's max() treats
    // it as the largest double, and a NaN span makes every bin expression
    // NaN — floor(NaN) = 0 puts ALL mass in bin 0 for every group and the
    // drift monitor reads "stable" on arbitrarily drifted data. A NaN
    // metric value carries no binnable information; it leaves the
    // distribution like a NULL does.
    val base = df.filter(x.isNotNull && !isnan(x))
      .select(col(groupCol).as("_g"), x.as("_x"))
    val span = base.agg(min(col("_x")).as("_mn"), max(col("_x")).as("_mx"))
    val binned = base.crossJoin(broadcast(span))
      .select(col("_g"),
        when(col("_mx") > col("_mn"),
          least(lit(bins - 1L), floor((col("_x") - col("_mn")) *
            lit(bins.toDouble) / (col("_mx") - col("_mn")))))
          .otherwise(lit(0L)).as("_bin"))
    psiFromBinned(binned, bins, groupCol)
  }

  /** [[psi]] with EQUAL-MASS bins — edges at the global i/B quantiles
    * ([[ApproxQuantile.exactQuantiles]], ≡ quantile_cont, rounded 6)
    * instead of equal width: the heavy-tail-robust variant (one outlier
    * stretches an equal-width grid until every real value shares a bin;
    * quantile edges keep each bin carrying ~1/B of the reference mass,
    * the industry-standard PSI binning). Bin = the count of edges
    * STRICTLY below x (ties land low), a fixed-shape integer sum both
    * engines replay; the grid/term fold is [[psi]]'s, unchanged. */
  def psiQuantileBins(df: DataFrame, groupCol: String, valueCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 256, "bins out of range")
    val x = col(valueCol).cast("double")
    // NaN leaves the distribution like a NULL does — the psi contract:
    // binned unfiltered, NaN (largest in Spark's ordering) would pile
    // into the top bin AND, past a 1/B fraction, turn the upper quantile
    // edges themselves NaN, collapsing the grid
    val base = df.filter(x.isNotNull && !isnan(x))
      .select(col(groupCol).as("_g"), x.as("_x"))
      .materialized // quantile pass + binning pass
    val qs = (1 until bins).map(i => s"_e$i" -> i.toDouble / bins)
    val edges = ApproxQuantile.exactQuantiles(
      base.select(lit(1).as("_q"), col("_x")), "_q", "_x", qs).drop("_q")
    val binExpr = (1 until bins)
      .map(i => (col("_x") > col(s"_e$i")).cast("long"))
      .reduce(_ + _)
    val binned = base.crossJoin(broadcast(edges))
      .select(col("_g"), binExpr.as("_bin"))
    psiFromBinned(binned, bins, groupCol)
  }

  /** The shared PSI tail: (group, bin) counts → smoothed pair grid →
    * once-rounded DECIMAL-summed terms. `binned` = (_g, _bin) rows. */
  /** The shared once-rounded log: ln as ONE fixed-shape double readout,
    * rounded to 6 and re-anchored in decimal so downstream folds are
    * order-free — one definition for every divergence (PSI, JSD, the LM
    * ratios), so the formula cannot drift between them. */
  private def r6ln(c: Column): Column =
    round(log(c.cast("double")), 6).cast("decimal(12,6)")

  private def psiFromBinned(prebinned: DataFrame, bins: Int,
                            groupCol: String): DataFrame = {
    val binned = prebinned
      .groupBy(col("_g"), col("_bin")).agg(count(lit(1)).as("c"))
      .materialized // read by totals AND both pair legs
    val totals = binned.groupBy(col("_g")).agg(sum(col("c")).as("n"))
    // dense groups² × B grid: absent bins must still contribute their
    // smoothed term, so left-join counts onto the full bin range
    // null-safe inequality: a NULL group key is a REAL category for
    // drift (the "suddenly unlabeled" failure mode) — plain =!= would
    // silently drop it from the pair grid
    val grid = totals.select(col("_g").as("a"), col("n").as("na"))
      .join(broadcast(totals.select(col("_g").as("b"), col("n").as("nb"))),
        !(col("a") <=> col("b")))
      .withColumn("_bin", explode(sequence(lit(0L), lit(bins - 1L))))
      .join(binned.select(col("_g").as("_ga"), col("_bin").as("_bina"),
          col("c").as("ca")),
        col("a") <=> col("_ga") && col("_bin") === col("_bina"), "left")
      .drop("_ga", "_bina")
      .join(binned.select(col("_g").as("_gb"), col("_bin").as("_binb"),
          col("c").as("cb")),
        col("b") <=> col("_gb") && col("_bin") === col("_binb"), "left")
      .drop("_gb", "_binb")
      .withColumn("ca1", coalesce(col("ca"), lit(0L)) + 1)
      .withColumn("cb1", coalesce(col("cb"), lit(0L)) + 1)
      .withColumn("na1", col("na") + bins)
      .withColumn("nb1", col("nb") + bins)
    // (pA − pB)·ln(pA/pB): probability diff from exact integers via IEEE
    // division; the log via once-rounded decimal factors
    val pDiff = col("ca1").cast("double") / col("na1").cast("double") -
      col("cb1").cast("double") / col("nb1").cast("double")
    val lnRatio = (r6ln(col("ca1")) - r6ln(col("na1")) -
      r6ln(col("cb1")) + r6ln(col("nb1"))).cast("double")
    grid.withColumn("_t", round(pDiff * lnRatio, 12).cast("decimal(24,12)"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("_t")).as("_s"))
      .select(col("a").as(s"${groupCol}_a"), col("b").as(s"${groupCol}_b"),
        canonZero(round(col("_s").cast("double"), 6)).as("psi"))
  }

  /** Pairwise two-sample chi-square drift over a CATEGORICAL column —
    * the categorical complement of [[psi]]'s numeric grid (language mix
    * per source, label mix per split, event-type mix per day). For each
    * ordered group pair (a, b) and each category with pooled support,
    * the cell term is the classic contingency form
    * (O − E)²/E with E the pooled-rate expectation, folded as once-
    * rounded DECIMAL; the readout adds the degrees of freedom (pooled
    * categories − 1) and Cramér's V = √(χ²/n) (the 2×k association
    * strength, 0 when dof = 0).
    *
    * Determinism contract: counts are exact integers; each cell term is
    * ONE fixed-shape double expression over those integers
    * ((c·n − nₐ·k)² / (nₐ·k·n), both sides' terms added), rounded once
    * to 12 dp, summed as DECIMAL, with the final χ²/V readouts rounded
    * once to 6 — any engine replays the table bit-for-bit. NULL
    * categories are REAL categories (the "suddenly unlabeled" drift
    * mode) and NULL group keys real groups — all pairings null-safe.
    *
    * Scale: ONE (group, category) count aggregate over the data
    * (map-side partial), then a groups²×categories grid built from
    * broadcast aggregates — never corpus². */
  def chiSquareDrift(df: DataFrame, groupCol: String,
                     catCol: String): DataFrame = {
    val cnt = df.select(col(groupCol).as("_g"), col(catCol).as("_k"))
      .groupBy(col("_g"), col("_k")).agg(count(lit(1)).as("c"))
      .materialized // read by totals, the cat union, both legs
    val totals = cnt.groupBy(col("_g")).agg(sum(col("c")).as("n"))
    val pairs = totals.select(col("_g").as("a"), col("n").as("na"))
      .join(broadcast(totals.select(col("_g").as("b"), col("n").as("nb"))),
        !(col("a") <=> col("b")))
    val grid = pairs
      .join(broadcast(cnt.select(col("_k")).distinct()))
      .join(cnt.select(col("_g").as("_ga"), col("_k").as("_ka"),
          col("c").as("ca")),
        col("a") <=> col("_ga") && col("_k") <=> col("_ka"), "left")
      .drop("_ga", "_ka")
      .join(cnt.select(col("_g").as("_gb"), col("_k").as("_kb"),
          col("c").as("cb")),
        col("b") <=> col("_gb") && col("_k") <=> col("_kb"), "left")
      .drop("_gb", "_kb")
      .withColumn("ca0", coalesce(col("ca"), lit(0L)))
      .withColumn("cb0", coalesce(col("cb"), lit(0L)))
      // a category absent from BOTH sides of the pair contributes no
      // cell (its expectation is 0); it exists only via other groups
      .filter(col("ca0") + col("cb0") > 0)
    val nD = (col("na") + col("nb")).cast("double")
    val ck = (col("ca0") + col("cb0")).cast("double")
    val numA = col("ca0").cast("double") * nD - col("na").cast("double") * ck
    val numB = col("cb0").cast("double") * nD - col("nb").cast("double") * ck
    val tA = numA * numA / (col("na").cast("double") * ck * nD)
    val tB = numB * numB / (col("nb").cast("double") * ck * nD)
    grid.withColumn("_t", round(tA + tB, 12).cast("decimal(24,12)"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(sum(col("_t")).as("_s"), count(lit(1)).as("_cells"))
      .withColumn("chi2", round(col("_s").cast("double"), 6))
      .select(col("a").as(s"${groupCol}_a"), col("b").as(s"${groupCol}_b"),
        col("chi2"), (col("_cells") - 1).as("dof"),
        when(col("_cells") > 1,
          round(sqrt(col("chi2") / (col("na") + col("nb")).cast("double")), 6))
          .otherwise(lit(0.0)).as("cramers_v"))
  }

  /** Gini coefficient of corpus-mass concentration across groups — the
    * one-number "is this corpus dominated by a few sources?" audit a
    * mixture designer reads before setting sampling weights (0 = evenly
    * spread, (n−1)/n = all mass in one group).
    *
    * Computed via the mean-absolute-difference identity
    * G = Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx) — completely ORDER-FREE: no sort, no
    * rank, no tie-break policy to keep in sync with another engine, and
    * NULL group keys participate as real groups. The pair sum runs on
    * the groups×groups cross of the per-group totals frame (tiny by
    * construction — distinct groups, broadcast), never on the data.
    *
    * Determinism contract: per-group weights are exact integer sums
    * (all-NULL groups coalesce to 0), |xᵢ−xⱼ| and its fold stay in
    * exact longs, and the single readout is one fixed-shape double
    * division rounded once to 6. Zero total mass reads 0. */
  def giniConcentration(df: DataFrame, groupCol: String,
                        weightCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol).as("_g"))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("w"))
      .materialized // read by the pair sum AND the totals
    // the pairwise fold is DECIMAL: G² pairs of |wa−wb| reach G²·W —
    // byte totals over a large corpus push a long sum past 2^63 and it
    // wraps SILENTLY under non-ANSI (a negative mad → negative gini)
    val mad = g.select(col("w").as("wa"))
      .crossJoin(broadcast(g.select(col("w").as("wb"))))
      .agg(sum(abs(col("wa") - col("wb")).cast("decimal(38,0)")).as("mad"))
    g.agg(count(lit(1)).as("n_groups"), sum(col("w")).as("total_w"))
      .crossJoin(broadcast(mad))
      .select(col("n_groups"), col("total_w"),
        when(col("total_w") > 0,
          round(col("mad").cast("double") /
            (lit(2.0) * col("n_groups").cast("double") *
              col("total_w").cast("double")), 6))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** Pairwise Jensen-Shannon divergence over a categorical column — the
    * SYMMETRIC, BOUNDED ([0, ln 2]) drift measure that complements
    * [[chiSquareDrift]] (a significance test) and q159's directed KL
    * (unbounded, asymmetric): JSD(a,b) = ½Σp·ln(2p/(p+q)) +
    * ½Σq·ln(2q/(p+q)) with add-one smoothed category probabilities, so
    * a monitoring dashboard can threshold it without per-pair dof math.
    *
    * Determinism contract: with p = ca/na and q = cb/nb the ln
    * arguments are RATIOS OF INTEGERS — 2p/(p+q) = 2·ca·nb /
    * (ca·nb + cb·na) — so every ln factor is a once-rounded 6-dp
    * DECIMAL of an integer's log ([[psi]]'s discipline, no ln of a
    * float anywhere); each cell term is one fixed-shape double
    * expression over exact integers and those decimals, rounded once to
    * 12 dp, DECIMAL-summed, halved and rounded once to 6. The cross
    * products ca·nb run in DECIMAL(38,0); the widened combinations
    * (cross·2, cross+ssorc) are precision-capped at 38 by Spark, so the
    * honest exactness bound is products < ~5e37 — far past any count
    * two long-counted groups can produce (ca·nb ≤ n², exact up to
    * n ≈ 7e18, beyond long range). NULL categories and NULL groups are
    * real rows (null-safe pairings throughout).
    *
    * Scale: the [[chiSquareDrift]] topology — one (group, category)
    * count aggregate, then broadcast groups²×k grids. */
  def jsDivergence(df: DataFrame, groupCol: String,
                   catCol: String): DataFrame = {
    val cnt = df.select(col(groupCol).as("_g"), col(catCol).as("_k"))
      .groupBy(col("_g"), col("_k")).agg(count(lit(1)).as("c"))
      .materialized // read by totals, the cat union, both legs
    val totals = cnt.groupBy(col("_g")).agg(sum(col("c")).as("n"))
    val nCats = cnt.select(col("_k")).distinct().count()
    val grid = totals.select(col("_g").as("a"), col("n").as("na0"))
      .join(broadcast(totals.select(col("_g").as("b"), col("n").as("nb0"))),
        !(col("a") <=> col("b")))
      .join(broadcast(cnt.select(col("_k")).distinct()))
      .join(cnt.select(col("_g").as("_ga"), col("_k").as("_ka"),
          col("c").as("ca")),
        col("a") <=> col("_ga") && col("_k") <=> col("_ka"), "left")
      .drop("_ga", "_ka")
      .join(cnt.select(col("_g").as("_gb"), col("_k").as("_kb"),
          col("c").as("cb")),
        col("b") <=> col("_gb") && col("_k") <=> col("_kb"), "left")
      .drop("_gb", "_kb")
      // add-one smoothing over the FULL category union (psi's policy):
      // every cell has mass on both sides, so every ln argument is a
      // positive integer ratio
      .withColumn("ca1", coalesce(col("ca"), lit(0L)) + 1)
      .withColumn("cb1", coalesce(col("cb"), lit(0L)) + 1)
      .withColumn("na1", col("na0") + nCats)
      .withColumn("nb1", col("nb0") + nCats)
    val p = col("ca1").cast("double") / col("na1").cast("double")
    val q = col("cb1").cast("double") / col("nb1").cast("double")
    // 2p/(p+q) = 2·ca·nb / (ca·nb + cb·na): integer-ratio ln factors.
    // DECIMAL(38,0) products, not long: ca·nb wraps silently past 2^63 in
    // long arithmetic. The widened sums below stay capped at precision 38,
    // so exactness holds while the products stay < ~5e37 (n ≈ 7e18 —
    // unreachable for long-typed counts); the DuckDB oracle's hugeint leg
    // carries the same headroom
    def d38(c: Column) = c.cast("decimal(38,0)")
    val cross = d38(col("ca1")) * d38(col("nb1"))
    val ssorc = d38(col("cb1")) * d38(col("na1"))
    val lnP = (r6ln(cross * 2) - r6ln(cross + ssorc)).cast("double")
    val lnQ = (r6ln(ssorc * 2) - r6ln(cross + ssorc)).cast("double")
    grid.withColumn("_t", round(p * lnP + q * lnQ, 12).cast("decimal(24,12)"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("_t")).as("_s"))
      .select(col("a").as(s"${groupCol}_a"), col("b").as(s"${groupCol}_b"),
        canonZero(round(col("_s").cast("double") / 2.0, 6)).as("jsd"))
  }

  /** Benford first-significant-digit audit — the forensic data-quality
    * staple: naturally-occurring multiplicative quantities (prices,
    * populations, file sizes) follow P(d) = log₁₀(1 + 1/d); fabricated
    * or truncated columns don't. Emits one row per digit 1-9 with the
    * observed share, the Benford expectation, and the deviation — the
    * table an auditor eyeballs before trusting a numeric feed.
    *
    * Determinism contract: the digit is extracted from the DECIMAL(18,2)
    * string rendering (first char after stripping everything outside
    * 1-9) — a fixed-point rendering both engines print identically, no
    * float-to-string or log₁₀-of-value anywhere near the data; counts
    * are exact; the Benford constants are 6-dp literals baked into both
    * engines' queries; shares/deviations are fixed-shape double
    * divisions rounded once to 6. NULL and exact-zero values (no
    * leading significant digit) are excluded; absent digits still get
    * their row via the literal 1-9 frame.
    *
    * Scale: one map-side digit projection + a 9-row count aggregate;
    * everything after is a 9-row broadcast readout. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val ps = (1 to 9).map(d =>
      d -> math.round(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6)
    // decimal(38,12), NOT a coarse scale: rounding to 2 dp would cross
    // leading-digit boundaries (0.096 -> 0.10 reads digit 1, not 9;
    // 1.996 -> 2.00 reads 2) and silently drop |x| < 0.005 — only
    // |x| < 0.5e-12 falls out now, and trailing zeros strip in the regex
    val x = abs(col(valueCol).cast("decimal(38,12)"))
    val counts = df.select(x.as("_x"))
      .filter(col("_x").isNotNull && col("_x") =!= 0)
      .select(substring(
        regexp_replace(col("_x").cast("string"), "[^1-9]", ""), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      // ≤ 9 rows, read by the totals AND the digit join — without this
      // the full digit-projection scan runs twice (the file's multi-
      // reader checkpoint convention)
      .materialized
    val total = counts.agg(sum(col("n_obs")).as("_tot"))
    val pExpr = ps.tail.foldLeft(when(col("digit") === 1, ps.head._2)) {
      case (acc, (d, p)) => acc.when(col("digit") === d, p) }
    df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("obs_share",
        when(col("_tot") > 0,
          round(col("n_obs").cast("double") / col("_tot").cast("double"), 6))
          .otherwise(lit(0.0)))
      .withColumn("benford_p", pExpr)
      .select(col("digit"), col("n_obs"), col("obs_share"), col("benford_p"),
        canonZero(round(col("obs_share") - col("benford_p"), 6)).as("dev"))
  }

  /** Upper-triangular covariance matrix of an embedding column — the
    * base object for PCA/whitening/feature-correlation audits over a
    * vector corpus, as (i, j, n, cov) rows with 1 ≤ i ≤ j ≤ d.
    *
    * Determinism contract: each component is quantized ONCE to integer
    * micro-units x̂ = round(x·1e6) — so every cross product x̂_i·x̂_j is
    * an EXACT integer (no per-pair rounding at all), sums are exact
    * DECIMAL folds of longs, and cov = Σx̂x̂/1e12/n − (Σx̂_i/1e6/n)
    * (Σx̂_j/1e6/n) is one fixed-shape double readout rounded to 6. The
    * result is the covariance of the 1e-6-quantized embeddings — the
    * quantization perturbs cov by ≲ 1e-6·E|x|, below the rounded
    * output's own granularity for unit-scale embeddings. Bound:
    * |x| ≤ ~2e3 keeps each product inside a long; DECIMAL(38,0) sums
    * never overflow.
    *
    * Scale: the flat pair-product array is generated MAP-SIDE by array
    * algebra (slice + transform — no self-join, no shuffle of the
    * vectors) and folded by ONE [[graft.functions.LongVectorSumAgg]] —
    * integer addition is associative, so the one-pass aggregate is
    * bit-identical to any grouped formulation while the shuffle carries
    * a single d(d+1)/2-long state row per partition. The O(N·d²)
    * multiply work is the covariance itself. NULL vectors are skipped;
    * ragged dims fail LOUDLY; sum overflow fails LOUDLY
    * (Math.addExact — bound n·(1e6·max|x|)² < 2^63). */
  /** Micro-unit quantization of the vector column (shared by the
    * covariance and Mahalanobis paths). */
  private def quantizedVecs(df: DataFrame, d: Int, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.filter(v.isNotNull)
      .select(when(size(v) === d,
        transform(v.cast("array<double>"), x => round(x * lit(1e6), 0).cast("long")))
        .otherwise(raise_error(concat(lit(s"quantizedVecs (embeddingCovariance/mahalanobisScores): expected $d dims, got "),
          size(v).cast("string")))).as("_v"))
  }

  /** ONE-pass (_ps pair-product sums, _ms component sums, n) over the
    * quantized frame — both covariance and mean derive from this row. */
  private def covAggRow(checked: DataFrame, d: Int): DataFrame = {
    val p = d * (d + 1) / 2
    // map-side flat x̂i·x̂j products for i ≤ j (slice algebra, no join)
    val products = expr(
      """flatten(transform(_v, (xi, i) ->
        |  transform(slice(_v, i + 1, size(_v) - i), (xj, j) -> xi * xj)))""".stripMargin)
    checked.agg(
      graft.functions.LongVectorSumAgg.longVectorSum(products, p).as("_ps"),
      graft.functions.LongVectorSumAgg.longVectorSum(col("_v"), d).as("_ms"),
      count(lit(1)).as("n"))
  }

  def embeddingCovariance(df: DataFrame, d: Int,
                          vecCol: String = "embedding"): DataFrame = {
    require(d >= 1 && d <= 4096, "dims out of range")
    val aggRow = covAggRow(quantizedVecs(df, d, vecCol), d)
    val mapping = df.sparkSession.range(1).select(posexplode(expr(
      s"""flatten(transform(sequence(1, $d), i ->
         |  transform(sequence(i, $d), j -> struct(i AS i, j AS j))))""".stripMargin))
      .as(Seq("_t", "_p")))
      .select(col("_t"), col("_p.i").cast("long").as("i"),
        col("_p.j").cast("long").as("j"))
    aggRow.select(posexplode(col("_ps")).as(Seq("_t", "_sxy")), col("_ms"), col("n"))
      .join(broadcast(mapping), Seq("_t"))
      .select(col("i"), col("j"), col("n"),
        canonZero(round(col("_sxy").cast("double") / lit(1e12) / col("n") -
          (element_at(col("_ms"), col("i").cast("int")).cast("double") / lit(1e6) / col("n")) *
            (element_at(col("_ms"), col("j").cast("int")).cast("double") / lit(1e6) / col("n")),
          6)).as("cov"))
  }

  /** Mahalanobis novelty scores — the covariance-aware outlier detector
    * over an embedding corpus: m²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ), the distance
    * that discounts directions the corpus itself varies in (a point far
    * along the data's main axis is ordinary; the same distance across
    * it is novel). The anomaly screen to run before trusting corpus
    * statistics, beside q113's per-label centroid distances.
    *
    * Σ comes from [[embeddingCovariance]] (the quantized-exact
    * triangle), μ from the same micro-unit sums; `ridge`·I is added
    * before inversion so a rank-deficient corpus (constant dims, n < d)
    * degrades smoothly instead of blowing up. The inverse runs ON THE
    * DRIVER — Σ is d×d, control-plane sized BY CONSTRUCTION — via
    * Gauss-Jordan with partial pivoting (deterministic double math,
    * single-threaded); the per-row quadratic form is one mapPartitions
    * pass with the d² matrix shipped in the closure (NOT as plan
    * literals — 4096 literal columns would bloat every plan string).
    *
    * The general inverse is not oracle-replayable (iterative inversion
    * isn't SQL); the spec proves it against closed forms instead — the
    * [[pcaTopComponent]] evidence contract. `diagonal = true` zeroes the
    * off-diagonal Σ entries BEFORE inversion, and then the whole path
    * IS replayable: Gauss-Jordan on a diagonal matrix performs no row
    * swaps and no eliminations, so the inverse is bit-exactly
    * diag(1/(ridge + varᵢ)) (one IEEE division per dim), and the
    * quadratic-form loop degenerates to the ordered fold
    * Σᵢ diffᵢ·(invᵢᵢ·diffᵢ) — the q191 oracle replays it with a
    * list_sum over the same index order and the same literal shapes.
    * Returns (idCol, m2) with m2 = round(quadratic form, 6); NULL
    * vectors are skipped. */
  def mahalanobisScores(df: DataFrame, d: Int, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        ridge: Double = 1e-6,
                        diagonal: Boolean = false): DataFrame = {
    require(d >= 1 && d <= 4096, "dims out of range")
    // ONE aggregate pass yields both Σ and μ (covAggRow) — the matrix
    // readout is the same fixed-shape arithmetic the oracle-checked
    // covariance emits, replayed on the driver from the exact sums
    val sums = covAggRow(quantizedVecs(df, d, vecCol), d).collect().head
    require(!sums.isNullAt(0), "mahalanobisScores: empty corpus")
    val ps = sums.getSeq[Long](0)
    val ms = sums.getSeq[Long](1)
    val n = sums.getLong(2)
    def covOf(i: Int, j: Int, t: Int): Double = {
      val raw = ps(t) / 1e12 / n - (ms(i) / 1e6 / n) * (ms(j) / 1e6 / n)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val a = Array.tabulate(d, d)((i, j) => if (i == j) ridge else 0.0)
    var t = 0
    var ii = 0
    while (ii < d) {
      var jj = ii
      while (jj < d) {
        val c = if (diagonal && ii != jj) 0.0 else covOf(ii, jj, t)
        a(ii)(jj) += c; if (ii != jj) a(jj)(ii) = a(jj)(ii) + c
        t += 1; jj += 1
      }
      ii += 1
    }
    val mean = ms.map(_ / 1e6 / n).toArray
    // Gauss-Jordan with partial pivoting: deterministic, single-threaded
    val inv = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var colIx = 0
    while (colIx < d) {
      var pivot = colIx
      var best = math.abs(a(colIx)(colIx))
      var r = colIx + 1
      while (r < d) {
        if (math.abs(a(r)(colIx)) > best) { best = math.abs(a(r)(colIx)); pivot = r }
        r += 1
      }
      require(best > 0, s"singular covariance at column $colIx — raise ridge")
      if (pivot != colIx) {
        val t = a(pivot); a(pivot) = a(colIx); a(colIx) = t
        val t2 = inv(pivot); inv(pivot) = inv(colIx); inv(colIx) = t2
      }
      val p = a(colIx)(colIx)
      var j = 0
      while (j < d) { a(colIx)(j) /= p; inv(colIx)(j) /= p; j += 1 }
      r = 0
      while (r < d) {
        if (r != colIx && a(r)(colIx) != 0.0) {
          val f = a(r)(colIx)
          j = 0
          while (j < d) {
            a(r)(j) -= f * a(colIx)(j); inv(r)(j) -= f * inv(colIx)(j); j += 1
          }
        }
        r += 1
      }
      colIx += 1
    }
    val flatInv = inv.flatten // shipped in the closure, not as plan literals
    val meanB = mean
    val dd = d
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val diff = new Array[Double](dd)
          var i = 0
          while (i < dd) { diff(i) = v(i) - meanB(i); i += 1 }
          var s = 0.0
          i = 0
          while (i < dd) {
            var acc = 0.0
            var j = 0
            while (j < dd) { acc += flatInv(i * dd + j) * diff(j); j += 1 }
            s += diff(i) * acc
            i += 1
          }
          (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF(idCol, "m2")
  }

  /** Top principal component of a covariance matrix by power iteration —
    * the PCA readout over [[embeddingCovariance]]'s result. The matrix
    * is d×d (control-plane sized BY CONSTRUCTION — it never grows with
    * the corpus), so the iteration runs on the driver: collect the
    * triangle, mirror it, iterate v ← normalize(Cv) from the all-ones
    * start. Deterministic: fixed iteration count, fixed start, driver
    * double math (single-threaded, no reduction-order variance). The
    * sign is canonicalized so the largest-|component| entry is positive.
    * Returns (eigenvector, eigenvalue λ = ‖Cv‖ of the final iterate). */
  def pcaTopComponent(cov: DataFrame, d: Int, iters: Int = 64): (Array[Double], Double) = {
    require(iters >= 1 && iters <= 10000, "iters out of range")
    val m = Array.ofDim[Double](d, d)
    cov.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1, r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }; s
      })
      lambda = math.sqrt(w.map(x => x * x).sum)
      if (lambda > 0) v = w.map(_ / lambda)
    }
    // canonical sign: the max-|x| entry positive (ties: lowest index)
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) v = v.map(-_)
    (v, lambda)
  }

  /** Map-only projection of each vector onto a fixed component (the PCA
    * score column): dot(x, component) via the same left-to-right fold
    * both engines use for array dot products, rounded once to 6. */
  def pcaProject(df: DataFrame, component: Array[Double],
                 vecCol: String = "embedding", outCol: String = "pc1"): DataFrame = {
    val lit64 = array(component.map(lit(_)): _*)
    df.withColumn(outCol,
      round(graft.functions.VectorFunctions.dot_product(
        col(vecCol).cast("array<double>"), lit64), 6))
  }

  /** Poisson(1) CDF thresholds, rounded once to 12 dp — shared verbatim
    * with the SQL oracle so multiplicity draws are engine-identical. */
  private val poissonCdf: Seq[Double] = Seq(
    0.367879441171, 0.735758882343, 0.919698602929, 0.981011843124,
    0.996340153173, 0.999405815182, 0.999916758851, 0.999989750803)

  /** Poisson-bootstrap confidence interval for a per-group mean — the
    * scale-correct bootstrap (Chamandy et al. 2012, "Estimating
    * Uncertainty for Massive Data Streams"): classical resampling of n
    * rows with replacement needs coordinated global draws, but each row's
    * multiplicity in a resample is asymptotically an INDEPENDENT
    * Poisson(1), so every row can draw its own multiplicities for all
    * `replicas` replicas map-side and never talk to another row.
    *
    * Determinism: the multiplicity for (row, replica b) inverts the
    * Poisson(1) CDF at u = md5("p:" ++ b ++ ":" ++ id) / 2^60 — seedless,
    * partition-independent, replayed exactly by the oracle (the md5
    * uniform trick of [[TextAnalysis.dsirSample]]'s Gumbel keys).
    * Multiplicity caps at 8 (P ≈ 1e-6, the CDF tail rounds to 1 at 12 dp).
    * Replica means ride exact decimal sums; a replica that draws zero
    * total multiplicity for a group drops out of the spread (count of
    * replica means, both engines).
    *
    * Returns (group, n, mean, se_boot, ci_lo, ci_hi, n_replicas) with a
    * ±1.96·SE normal interval. Scale: one map-side `replicas`× fan-out
    * (the documented bootstrap cost), one (group, replica) partial-agg
    * shuffle, then one row per (group, replica) — nothing pairs rows.
    */
  def poissonBootstrap(df: DataFrame, groupCol: String, idCol: String,
                       value: Column, replicas: Int = 32): DataFrame = {
    require(replicas >= 2 && replicas <= 1024, "replicas out of range")
    // NULL values are excluded from BOTH the numerator and the replica
    // denominators: a NULL-x row's multiplicity in sum(_c) (with sum(_c·_x)
    // skipping it) would bias every replica mean toward 0. NULL ids are
    // excluded like every sampler's draw key (Sampling): a NULL id's md5
    // draw is NULL, every threshold test falls through, and the row would
    // ride EVERY replica at the deterministic base multiplicity 8 —
    // variance-free weight that silently shrinks se_boot. NaN/±Infinity
    // are DROPPED like NULLs (the psiQuantileBins contract — a non-finite
    // reading is absent data, not a rescaling problem); only a genuinely
    // FINITE value that overflows DECIMAL(18,6) fails LOUDLY instead of
    // silently leaving n and the mean (under ANSI the cast itself throws;
    // this keeps the non-ANSI path honest too).
    val xr = round(value, 6).cast("decimal(18,6)")
    val vd = value.cast("double")
    val finite = !isnan(vd) && abs(vd) =!= lit(Double.PositiveInfinity)
    val base = df.select(col(groupCol), col(idCol).as("_id"),
        when(value.isNotNull && finite && xr.isNull,
          raise_error(lit("poissonBootstrap: value overflows DECIMAL(18,6)" +
            " — rescale the metric")))
          .otherwise(when(finite, xr)).as("_x"))
      .filter(col("_x").isNotNull && col("_id").isNotNull)
      .materialized // read by the point estimate AND the fan-out
    val point = base.groupBy(col(groupCol))
      .agg(count(col("_x")).as("n"),
        round(sum(col("_x")).cast("double") / count(col("_x")), 6).as("mean"))
    val u = conv(substring(md5(concat(lit("p:"), col("_b").cast("string"),
      lit(":"), col("_id").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2.0, 60))
    // CASE WHEN u<t0 THEN 0 WHEN u<t1 THEN 1 … ELSE 8 — built inside-out,
    // so fold the thresholds largest-first and the smallest checks first
    val multOrdered = poissonCdf.zipWithIndex.reverse.foldLeft(lit(8): Column) {
      case (acc, (t, k)) => when(u < t, lit(k)).otherwise(acc)
    }
    val repMeans = base
      .withColumn("_b", explode(array((0 until replicas).map(lit): _*)))
      .withColumn("_c", multOrdered.cast("long"))
      .groupBy(col(groupCol), col("_b"))
      .agg(sum(col("_c") * col("_x")).as("_cx"), sum(col("_c")).as("_cn"))
      .filter(col("_cn") > 0)
      .select(col(groupCol),
        round(col("_cx").cast("double") / col("_cn"), 9)
          .cast("decimal(20,9)").as("_m"))
    val spread = repMeans.groupBy(col(groupCol))
      .agg(count(col("_m")).as("n_replicas"),
        sum(col("_m")).as("_sm"), sum(col("_m") * col("_m")).as("_smm"))
      .select(col(groupCol), col("n_replicas"),
        when(col("n_replicas") > 1, round(sqrt(greatest(
          (col("_smm").cast("double") -
            col("_sm").cast("double") * col("_sm").cast("double") / col("n_replicas")) /
            (col("n_replicas") - 1), lit(0.0))), 6)).as("se_boot"))
        // greatest(·, 0): exact-decimal sums subtracted in doubles can
        // cancel to ~-1e-18 for zero-spread replicas — sqrt would be NaN
    // null-safe group join: a NULL group key is a group like any other
    point.join(spread.withColumnRenamed(groupCol, "_sg"),
        col(groupCol) <=> col("_sg"))
      .select(col(groupCol), col("n"), col("mean"),
        col("se_boot"),
        round(col("mean") - lit(1.96) * col("se_boot"), 6).as("ci_lo"),
        round(col("mean") + lit(1.96) * col("se_boot"), 6).as("ci_hi"),
        col("n_replicas"))
  }
}
