package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Histogram-sketch quantiles — the 100 TB scale path next to the exact
  * `percentile` aggregate (q59): exact percentiles sort every group's
  * values; this pass keeps `buckets` counters per group instead.
  *
  *   pass 1: per-group min/max/count (tiny, broadcast back);
  *   pass 2: equi-width bucket counts — fixed `buckets`-row state per
  *           group, mergeable map-side like any count aggregate;
  *   read-out: smallest bucket whose cumulative count reaches ⌈q·n⌉,
  *           estimate = the bucket's upper edge (error ≤ range/buckets).
  *
  * Engine parity: counts/cumsums are exact longs, the bucket index and
  * the edge formula are fixed-shape double expressions identical in any
  * engine, and estimates are round(…, 6) like every other float output.
  * Degenerate groups (min = max) are skipped by construction — their
  * quantile is the constant itself and needs no histogram.
  */
object ApproxQuantile {

  /** Per-group quantile estimates for `qs` (name → fraction), e.g.
    * `Seq("p50_est" -> 0.5, "p99_est" -> 0.99)`. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         qs: Seq[(String, Double)],
                         buckets: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      "quantile fractions must be in (0, 1]")
    require(buckets >= 2 && buckets <= (1 << 16), "buckets must be in [2, 65536]")
    val v = col(valueCol)
    // NULL values are excluded from n AND from the bucket stream — the
    // exact-percentile twin (q59/q86) ignores NULLs, and counting them
    // here would both inflate ceil(q·n) and (NULLS FIRST) pad every
    // cumulative count, dragging both bounds toward lower quantiles
    val mm = df.groupBy(col(groupCol))
      .agg(min(v).as("_mn"), max(v).as("_mx"), count(v).as("_n"))
      .withColumnRenamed(groupCol, "_grp")
      // per-group row, read by BOTH broadcast joins (binning and the
      // cumulative pick) — without this pass 1 scans the input twice
      // (the exactOrderStats convention)
      .materialized
    val b = df.filter(v.isNotNull)
      .join(broadcast(mm), col(groupCol) <=> col("_grp"))
      .filter(col("_mx") > col("_mn"))
      .select(col(groupCol),
        least(floor((v - col("_mn")) * buckets / (col("_mx") - col("_mn"))).cast("long"),
          lit(buckets - 1L)).as("_bkt"))
    val h = b.groupBy(col(groupCol), col("_bkt")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(col(groupCol), col("_bkt"), sum(col("_c")).over(w).as("_cc"))
      .join(broadcast(mm), col(groupCol) <=> col("_grp"))
    val picks = qs.map { case (name, q) =>
      min(when(col("_cc") >= ceil(lit(q) * col("_n")), col("_bkt"))).as(s"_b_$name")
    }
    cum.groupBy(col(groupCol), col("_mn"), col("_mx"))
      .agg(picks.head, picks.tail: _*)
      .select(col(groupCol) +: qs.map { case (name, _) =>
        round(col("_mn") + (col(s"_b_$name") + 1) * (col("_mx") - col("_mn")) / buckets, 6)
          .as(name)
      }: _*)
  }

  /** EXACT per-group quantiles with bounded state — the scalable twin of
    * the `percentile` aggregate, bit-matching `quantile_cont` semantics
    * (rank r = q·(n−1), linear interpolation between the two covering
    * order statistics, round(…, 6)).
    *
    * The `percentile` aggregate buffers a value→count map per group —
    * O(distinct values) memory, which is exactly what does NOT survive
    * 100 TB of near-unique doubles (and is why q86 was the slowest query
    * on the board at sf0.1). This pass never buffers values:
    *
    *   pass 1: per-group min/max/count (fixed state);
    *   pass 2: equi-width histogram counts (`buckets` counters per group,
    *           map-side combinable) + cumulative counts over the tiny
    *           (groups × buckets) frame → the ONE bucket covering each
    *           needed order statistic k = floor/ceil(q·(n−1));
    *   pass 3: re-scan ONLY rows landing in target buckets (~n/buckets per
    *           target), rank within (group, bucket), pick offset
    *           k − count(before bucket) — the exact k-th smallest.
    *
    * Cost: three scans of a two-column projection and one window over the
    * ~n/buckets target-bucket subset, vs one scan that accumulates an
    * unbounded map. Worst case (all mass in one bucket, e.g. a constant
    * plus outliers) degrades to sorting that bucket only. Groups that are
    * constant or all-NULL short-circuit: quantile = the constant / NULL.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[(String, Double)],
                     buckets: Int = 1024): DataFrame = {
    val stats = exactOrderStats(df, groupCol, valueCol, qs, buckets)
    stats.select(col(groupCol) +: qs.map { case (name, q) =>
      val r = lit(q) * (col("_n") - 1)
      round(col(s"_vlo_$name") +
        (r - floor(r)) * (col(s"_vhi_$name") - col(s"_vlo_$name")), 6).as(name)
    }: _*)
  }

  /** [[exactQuantiles]] WITHOUT the final interpolate-and-round: one row
    * per group with `_n` and, per quantile, the UNROUNDED covering order
    * statistics `_vlo_<name>` / `_vhi_<name>` (the q·(n−1) rank's floor/
    * ceil neighbors; equal when the rank is integral, and both = the
    * constant for a flat group). Values keep the INPUT column's type —
    * feed a DECIMAL column and the order stats come back exact decimals,
    * which is what lets [[Stats.quantileNormalize]] build its edge grid
    * in pure decimal arithmetic (a rounded-double readout at 6 dp is a
    * cross-engine coin flip whenever the true value is an exact decimal
    * half — cents interpolated at k/256 land there constantly). */
  def exactOrderStats(df: DataFrame, groupCol: String, valueCol: String,
                      qs: Seq[(String, Double)],
                      buckets: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 },
      "quantile fractions must be in [0, 1]")
    require(buckets >= 2 && buckets <= (1 << 16), "buckets must be in [2, 65536]")
    val v = col(valueCol)
    val g = col(groupCol)
    // the tiny internal frames (per-group stats, cumulative histogram,
    // target picks — all ≤ groups × buckets rows) are each consumed by
    // several downstream branches; localCheckpoint truncates their lineage
    // so every reuse does NOT re-scan the input. With it, the operator
    // performs exactly its three documented input scans.
    val mm = df.groupBy(g)
      .agg(min(v).as("_mn"), max(v).as("_mx"), count(v).as("_n"))
      .withColumnRenamed(groupCol, "_grp")
      .materialized
    // null-safe split: _mx <=> _mn also catches all-NULL groups (both
    // NULL), whose quantiles are NULL — round(NULL) propagates below
    val varied = mm.filter(col("_mx") > col("_mn"))
    val flat = mm.filter(col("_mx") <=> col("_mn"))
    // 0-based order-statistic indices per quantile: lo = ⌊q·(n−1)⌋,
    // hi = ⌈q·(n−1)⌉ (equal when the rank is integral)
    val withIdx = varied.select(
      col("_grp") +: col("_n") +: qs.flatMap { case (name, q) => Seq(
        floor(lit(q) * (col("_n") - 1)).cast("long").as(s"_ilo_$name"),
        ceil(lit(q) * (col("_n") - 1)).cast("long").as(s"_ihi_$name"))
      }: _*)
    val bkt = least(
      floor((v - col("_mn")) * buckets / (col("_mx") - col("_mn"))).cast("long"),
      lit(buckets - 1L))
    // every group-key join below is NULL-SAFE (<=>): a NULL-keyed group is
    // a group like any other to the percentile aggregate this operator is
    // contractually identical to, and a plain === join would silently drop
    // its rows here (no bucket rows → no output row)
    val b = df.filter(v.isNotNull)
      .join(broadcast(varied), g <=> col("_grp"))
      .select(g, v.as("_v"), bkt.as("_bkt"))
    val h = b.groupBy(g, col("_bkt")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(g).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(g, col("_bkt"), sum(col("_c")).over(w).as("_cc"))
    // ONE aggregation over the tiny cumulative frame finds, per target
    // index k: the covering bucket (smallest _bkt with _cc ≥ k+1) AND the
    // count of everything in earlier buckets (max _cc among _cc < k+1 —
    // cum counts are strictly increasing over the non-empty buckets, so
    // that max is exactly the cumulative count just before the covering
    // bucket; coalesce(0) when the first non-empty bucket covers)
    val picks = first(col("_n")).as("_n") +:
      qs.flatMap { case (name, _) => Seq(
        min(when(col("_cc") >= col(s"_ilo_$name") + 1, col("_bkt"))).as(s"_blo_$name"),
        coalesce(max(when(col("_cc") < col(s"_ilo_$name") + 1, col("_cc"))), lit(0L))
          .as(s"_clo_$name"),
        min(when(col("_cc") >= col(s"_ihi_$name") + 1, col("_bkt"))).as(s"_bhi_$name"),
        coalesce(max(when(col("_cc") < col(s"_ihi_$name") + 1, col("_cc"))), lit(0L))
          .as(s"_chi_$name"),
        first(col(s"_ilo_$name")).as(s"_xlo_$name"),
        first(col(s"_ihi_$name")).as(s"_xhi_$name"))
      }
    val tb = cum.join(broadcast(withIdx), g <=> col("_grp"))
      .groupBy(g).agg(picks.head, picks.tail: _*)
      .materialized
    // unpivot to one row per needed order statistic:
    // (group, covering bucket, index, offset-within-bucket)
    val tgt = tb.select(g, explode(array(qs.flatMap { case (name, _) => Seq(
        struct(col(s"_blo_$name").as("_tbkt"), col(s"_xlo_$name").as("_idx"),
          (col(s"_xlo_$name") - col(s"_clo_$name")).as("_off")),
        struct(col(s"_bhi_$name").as("_tbkt"), col(s"_xhi_$name").as("_idx"),
          (col(s"_xhi_$name") - col(s"_chi_$name")).as("_off")))
      }: _*)).as("_t"))
      .select(g, col("_t._tbkt").as("_bkt"), col("_t._idx").as("_idx"),
        col("_t._off").as("_off"))
      .distinct()
    // ONE broadcast join against the target list (the r17 "fold the
    // control-plane joins" item): joining b to targets on (group, bucket)
    // restricts the re-scan to covering buckets AND attaches (_idx, _off)
    // in the same pass — the former two-join form (bucket-restrict, then
    // target-attach) paid a second broadcast stage for nothing. A bucket
    // covering several targets duplicates its rows once per target, so
    // the row_number partition gains _idx: each copy ranks the full
    // bucket by _v independently, and _rn === _off picks the same order
    // statistic the two-join form did (ties are equal _v values — any
    // physical pick reads the same value).
    val tgtR = tgt.select(g.as("_tg"), col("_bkt").as("_tb"), col("_idx"), col("_off"))
    val vals = b
      .join(broadcast(tgtR), g <=> col("_tg") && col("_bkt") === col("_tb"))
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(g, col("_bkt"), col("_idx")).orderBy(col("_v"))) - 1)
      .filter(col("_rn") === col("_off"))
      .select(g, col("_idx"), col("_v"))
    // fold the ≤ 2·|qs| picked order statistics per group back to one row
    val readAggs = first(col("_n")).as("_n") +: qs.flatMap { case (name, _) => Seq(
      max(when(col("_idx") === col(s"_xlo_$name"), col("_v"))).as(s"_vlo_$name"),
      max(when(col("_idx") === col(s"_xhi_$name"), col("_v"))).as(s"_vhi_$name"))
    }
    val tbR = tb.drop(qs.flatMap { case (name, _) =>
        Seq(s"_blo_$name", s"_clo_$name", s"_bhi_$name", s"_chi_$name") }: _*)
      .withColumnRenamed(groupCol, "_tbg")
    val variedStats = vals
      .join(broadcast(tbR), g <=> col("_tbg"))
      .drop("_tbg")
      .groupBy(g).agg(readAggs.head, readAggs.tail: _*)
    // flat/all-NULL groups: every order statistic IS the constant (or
    // NULL), so vlo = vhi = _mn — interpolation in the caller degrades
    // to the constant, matching the old round(_mn) branch bit-for-bit
    val flatStats = flat.select(
      col("_grp").as(groupCol) +: col("_n") +: qs.flatMap { case (name, _) =>
        Seq(col("_mn").as(s"_vlo_$name"), col("_mn").as(s"_vhi_$name")) }: _*)
    variedStats.unionByName(flatStats)
  }

  /** The FULL (slots+1)-edge quantile grid per group, long-form — the
    * many-order-statistics twin of [[exactOrderStats]]. The wide path
    * materializes 6 aggregate expressions PER quantile; at the grid
    * sizes [[Stats.quantileNormalize]] needs (257 edges → ~1,500
    * aggregates, 514-column frames) Catalyst planning goes quadratic
    * and the hash aggregate falls out of whole-stage codegen past the
    * 100-field limit — measured 32 s at sf0.1 where the data itself
    * needs < 2 s. This path keeps every frame LONG (one row per edge
    * index), so expression counts are constant in `slots` and every
    * stage stays inside codegen.
    *
    * Edge math is bit-identical to the wide path's contract: edge i sits
    * at rank i·(n−1)/slots, ilo = (i·(n−1)) DIV S and ihi the ceiling
    * (INTEGER division — exact in any engine), and
    * e_i = vlo + ((i·(n−1)) mod S)/S · (vhi − vlo) runs entirely in
    * decimal (S a power of two ⇒ the fraction has a finite decimal
    * expansion at scale 12). Feed a DECIMAL value column and the edges
    * come back exact decimal(25,18).
    *
    * Returns one row per group: (`groupCol`, `_n`, `_edges`) with
    * `_edges` the (slots+1)-element ascending edge array. Flat groups
    * repeat the constant; all-NULL groups repeat NULL.
    *
    * Scale: the same three input passes as [[exactOrderStats]] (stats,
    * histogram, target-bucket re-scan); the long control-plane frames
    * are ≤ groups × (slots+1) rows. The covering-bucket match is a
    * broadcast join of targets against the tiny cumulative-histogram
    * frame with a band filter — groups × nonempty-buckets × targets
    * predicate evaluations, all on control-plane rows. */
  def edgeGrid(df: DataFrame, groupCol: String, valueCol: String,
               slots: Int, buckets: Int = 1024): DataFrame = {
    // Upper bound 4096 = 2^12: invS below carries 1/slots at scale 12
    // with RoundingMode.UNNECESSARY, which is exact only while slots'
    // decimal expansion fits 12 digits (2^-12 = 0.000244140625). Beyond
    // that the divide would throw an opaque ArithmeticException at plan
    // build — fail here with a real message instead.
    require(slots >= 2 && slots <= 4096 && (slots & (slots - 1)) == 0,
      "slots must be a power of two in [2, 4096]")
    require(buckets >= 2 && buckets <= (1 << 16), "buckets must be in [2, 65536]")
    val v = col(valueCol)
    val g = col(groupCol)
    val mm = df.groupBy(g)
      .agg(min(v).as("_mn"), max(v).as("_mx"), count(v).as("_n"))
      .withColumnRenamed(groupCol, "_grp")
      .materialized
    val varied = mm.filter(col("_mx") > col("_mn"))
    val flat = mm.filter(col("_mx") <=> col("_mn"))
    // one row per (group, edge index i): exact integer order-statistic
    // indices and the mod-S fraction numerator
    val idx = varied.select(col("_grp"), col("_n"),
        explode(sequence(lit(0L), lit(slots.toLong))).as("_i"))
      .withColumn("_nm1", (col("_n") - 1).cast("long"))
      .withColumn("_ilo", expr(s"(_i * _nm1) DIV $slots"))
      .withColumn("_ihi", expr(s"(_i * _nm1 + ${slots - 1}) DIV $slots"))
      .withColumn("_frE",
        pmod(col("_i") * col("_nm1"), lit(slots.toLong)).cast("decimal(10,0)"))
    // distinct 0-based order statistics actually needed (ilo ∪ ihi)
    val tgt = idx.select(col("_grp"),
        explode(array(col("_ilo"), col("_ihi"))).as("_k"))
      .distinct()
    // bucketed selection, same formulas as exactOrderStats
    val bkt = least(
      floor((v - col("_mn")) * buckets / (col("_mx") - col("_mn"))).cast("long"),
      lit(buckets - 1L))
    val b = df.filter(v.isNotNull)
      .join(broadcast(varied), g <=> col("_grp"))
      .select(g, v.as("_v"), bkt.as("_bkt"))
    val h = b.groupBy(g, col("_bkt")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(g).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("_cc", sum(col("_c")).over(w))
      .withColumn("_prev", col("_cc") - col("_c"))
      .materialized
    // covering bucket per target: _prev ≤ k < _cc (0-based), offset
    // within the bucket = k − _prev
    val cov = cum.join(broadcast(tgt),
        g <=> col("_grp") && col("_k") >= col("_prev") && col("_k") < col("_cc"))
      .select(g, col("_k"), col("_bkt"), (col("_k") - col("_prev")).as("_off"))
    // ONE broadcast join against the covering targets (same fold as
    // exactOrderStats): restrict to covering buckets and attach
    // (_k, _off) in one pass; the per-(g, bucket, target) row_number
    // ranks each duplicated copy of the bucket independently, so
    // _rn === _off reads the same order statistic the two-join form did
    val cov2 = cov.select(g.as("_tg"), col("_bkt").as("_tb"),
      col("_k"), col("_off"))
    val vals = b
      .join(broadcast(cov2), g <=> col("_tg") && col("_bkt") === col("_tb"))
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(g, col("_bkt"), col("_k")).orderBy(col("_v"))) - 1)
      .filter(col("_rn") === col("_off"))
      .select(g.as("_vg"), col("_k"), col("_v"))
      .materialized
    // decimal edge interpolation, one row per (group, i)
    val invS = new java.math.BigDecimal(java.math.BigDecimal.ONE.toBigInteger)
      .divide(new java.math.BigDecimal(slots), 12, java.math.RoundingMode.UNNECESSARY)
    val vlo = vals.select(col("_vg").as("_g1"), col("_k").as("_klo"),
      col("_v").as("_vlo"))
    val vhi = vals.select(col("_vg").as("_g2"), col("_k").as("_khi"),
      col("_v").as("_vhi"))
    val e = idx
      .join(vlo, col("_grp") <=> col("_g1") && col("_ilo") === col("_klo"))
      .join(vhi, col("_grp") <=> col("_g2") && col("_ihi") === col("_khi"))
      .withColumn("_frac",
        (col("_frE") * lit(invS).cast("decimal(13,12)")).cast("decimal(13,12)"))
      .withColumn("_e",
        (col("_vlo") + col("_frac") * (col("_vhi") - col("_vlo")))
          .cast("decimal(25,18)"))
    // collect_list is order-free; array_sort on the (i, e) struct keyed
    // by the leading i restores the ascending edge order deterministically
    val variedEdges = e.groupBy(col("_grp"))
      .agg(first(col("_n")).as("_n"),
        transform(
          array_sort(collect_list(struct(col("_i").as("i"), col("_e").as("e")))),
          s => s.getField("e")).as("_edges"))
    val flatEdges = flat.select(col("_grp"), col("_n"),
      array_repeat(col("_mn").cast("decimal(25,18)"), slots + 1).as("_edges"))
    variedEdges.unionByName(flatEdges)
      .withColumnRenamed("_grp", groupCol)
  }

  /** ONE-pass quantile estimates off a MERGEABLE rank sketch
    * ([[graft.functions.RankSampleAgg]] — bottom-k-by-hash row sample):
    * the heavy-tail-safe sketch path this family was missing.
    * [[histogramQuantiles]]' equi-width counters bound error by
    * range/buckets — useless once one outlier stretches the range —
    * and [[exactQuantiles]] is exact but takes three passes; this takes
    * ONE pass with k doubles of state per group and rank error
    * O(1/√k) at ANY tail shape (the sample is uniform over rows, so
    * order statistics of the sample estimate order statistics of the
    * group with the standard binomial bound — range never enters).
    *
    * `idCols` must uniquely key rows (they seed the md5 sampling hash;
    * duplicates would correlate the sample). The readout is
    * [[exactQuantiles]]' interpolation — r = q·(m−1) over the m sampled
    * order statistics, linear between the two covering values,
    * round(…, 6) — so the q192 oracle replays sample AND readout
    * bit-for-bit via `row_number() OVER (ORDER BY h, v) <= k`.
    *
    * Scale: one grouped aggregate, map-side combinable, ≤ 2k pairs of
    * state per task per group — the 100 TB shuffle carries sketches,
    * never values. */
  def sampledQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       idCols: Seq[String], qs: Seq[(String, Double)],
                       k: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 },
      "quantile fractions must be in [0, 1]")
    val sampled = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.RankSampleAgg
        .rankSample(rowHash60(idCols), col(valueCol), k).as("_smp"))
    readSampleQuantiles(sampled, Seq(groupCol), qs)
  }

  /** 60-bit md5 hash of the unique row key — the engine-portable random
    * source (DuckDB: CAST('0x' || substring(md5(...), 1, 15) AS BIGINT)).
    * Shared by [[sampledQuantiles]] and the streaming monitor so the two
    * paths sample IDENTICAL pairs. */
  private[graft] def rowHash60(idCols: Seq[String]): Column = {
    require(idCols.nonEmpty, "idCols must uniquely key rows")
    // the joint key must be INJECTIVE: concat_ws silently SKIPS NULL
    // components (("a",NULL) and (NULL,"a") would collide) and a raw '|'
    // inside a value aliases the separator — escape (backslash first, so
    // the escape escapes itself), then sentinel NULLs; an escaped value
    // can never read "\N", so the sentinel is unambiguous. Identical
    // bytes to the plain concat for separator-free non-NULL keys (every
    // existing oracle's shape).
    def enc(n: String) = coalesce(
      call_function("replace",
        call_function("replace", col(n).cast("string"),
          lit("\\"), lit("\\\\")),
        lit("|"), lit("\\|")),
      lit("\\N"))
    conv(substring(md5(
      concat_ws("|", idCols.map(enc): _*)), 1, 15), 16, 10).cast("long")
  }

  /** The rank-sample readout — exactQuantiles' r = q·(m−1) interpolation
    * over a `_smp` column (values sorted ascending). One shared shape so
    * batch and streaming verdicts are bit-identical on the same sample. */
  private[graft] def readSampleQuantiles(sampled: DataFrame, keep: Seq[String],
                                         qs: Seq[(String, Double)]): DataFrame = {
    val m = size(col("_smp"))
    sampled.select(keep.map(col) ++ qs.map { case (name, q) =>
      val r = lit(q) * (m - 1).cast("double")
      val vlo = element_at(col("_smp"), (floor(r) + 1).cast("int"))
      val vhi = element_at(col("_smp"), (ceil(r) + 1).cast("int"))
      Stats.canonZero(round(vlo + (r - floor(r)) * (vhi - vlo), 6)).as(name)
    }: _*)
  }
}
