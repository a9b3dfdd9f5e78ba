package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's scalar cleansing semantics (SURVEY.md §2.2, P2–P10),
  * re-expressed as pure Column functions so they stay inside whole-stage
  * codegen and push down to the scan. No UDFs anywhere: every quirk of the
  * reference's Python coercions maps to built-in expressions.
  */
object Cleanse {

  /** P2 — lossy int coercion: `"" / garbage → NULL`, `"4.0" → 4`.
    * The reference parses float first, then truncates toward zero
    * (reference: flink/stream_to_star.py:61-67, `int(float(x))`). A plain
    * `try_cast(x AS BIGINT)` would reject `"4.0"`, so: try-cast to double,
    * then truncate to long. The final narrowing must be `try_cast` too:
    * Spark 4 runs ANSI mode by default, so a plain cast of NaN/Infinity/
    * overflow doubles ("1e300") would throw and kill the batch — the
    * contract is garbage→NULL, never crash.
    */
  def toIntLossy(c: Column): Column =
    doubleToLong(tryDouble(c.cast(StringType)))

  /** Exception-free double→long truncation: ANSI try_cast throws-and-
    * catches on every overflow (a column of 1e290s costs one exception per
    * row). Range-gate instead: |d| ≤ 9.2e18 is safely castable (plain ANSI
    * cast, no exception; NaN fails the compare and falls through),
    * |d| > 1e19 is definitely overflow → NULL (so is ±Infinity), and only
    * the sliver between them — values that barely straddle Long.MaxValue —
    * pays the try_cast exception path. Semantics identical to a bare
    * try_cast. */
  private def doubleToLong(d: Column): Column =
    when(abs(d) <= lit(9.2e18), d.cast(LongType))
      .when(abs(d) > lit(1e19), lit(null).cast(LongType))
      .otherwise(d.try_cast(LongType))

  /** P3 — lossy float coercion: `"" / garbage → NULL`
    * (reference: flink/stream_to_star.py:70-76). */
  def toFloatLossy(c: Column): Column =
    tryDouble(c.cast(StringType))

  /** Exception-free numeric gate: ANSI `try_cast(string AS double)` parses
    * by throw-and-catch, so a column of definite garbage costs one Java
    * exception per row (measured ~7 s/600 k rows). This prefilter rejects
    * strings that cannot possibly be numeric WITHOUT parsing; `try_cast`
    * still backstops whatever passes, so the accepted language is a strict
    * superset of Spark's and the semantics are unchanged. Two branches:
    * digit-bearing strings over the numeric alphabet (the lookahead
    * requires ≥1 digit — without it, bare letters like "N" or "E" slip
    * through and throw per row: a flag column cost ~2 s/600 k), and the
    * signed Infinity/NaN spellings. */
  private val numericish =
    // boundary class includes ISO control chars: Spark's cast runs
    // UTF8String.trimAll (strips \u0000-\u001F), so the prefilter must
    // accept what the cast would parse — "1.5\u001C" is a number to Spark
    "^[\\s\\x00-\\x1F]*(?=[^0-9]*[0-9])[0-9eEdDfFxXpP+\\-.]+[\\s\\x00-\\x1F]*$|(?i)^[\\s\\x00-\\x1F]*[+-]?(inf(inity)?|nan)[\\s\\x00-\\x1F]*$"
  private def tryDouble(c: Column): Column =
    when(c.rlike(numericish), c.try_cast(DoubleType))

  /** P4 — multi-format date parse: try `M/d/yyyy`, then `yyyy-MM-dd`,
    * then `d.M.yyyy`; NULL if none match
    * (reference: flink/stream_to_star.py:50-58). */
  def parseDateMulti(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("M/d/yyyy")).cast(DateType),
      try_to_timestamp(c, lit("yyyy-MM-dd")).cast(DateType),
      try_to_timestamp(c, lit("d.M.yyyy")).cast(DateType))

  /** P5 — trim + empty→NULL: `(x or "").strip() or None`
    * (reference: flink/stream_to_star.py:104-109 et al.). */
  def trimToNull(c: Column): Column =
    nullif(trim(c), lit(""))

  /** P6 — name concat: `first + " " + last`, trimmed, NULL if both empty
    * (reference: flink/stream_to_star.py:104-106). concat_ws skips NULLs,
    * matching the reference's `" ".join(filter(None, ...))` shape. */
  def fullName(first: Column, last: Column): Column =
    trimToNull(concat_ws(" ", trim(coalesce(first, lit(""))), trim(coalesce(last, lit("")))))

  /** P7 — field-alias coalesce: first non-empty of alternative source
    * spellings, then int-coerced (reference: flink/stream_to_star.py:100). */
  def aliasKey(cols: Column*): Column =
    toIntLossy(coalesce(cols.map(trimToNull): _*))

  /** P9 — default-on-null measures: qty→0, price→0.0
    * (reference: flink/stream_to_star.py:252-253). */
  def defaultZeroLong(c: Column): Column = coalesce(toIntLossy(c), lit(0L))
  def defaultZeroDouble(c: Column): Column = coalesce(toFloatLossy(c), lit(0.0))

  /** Lossy decimal coercion for the NUMERIC(p,s)-typed warehouse columns:
    * float-coerce, then `try_cast` into the target decimal — a value that
    * parses as a double but overflows the declared precision (e.g. "1e300"
    * into NUMERIC(12,2)) becomes NULL instead of throwing. Spark 4's ANSI
    * mode makes the plain cast THROW on overflow, which would kill the
    * whole micro-batch for one bad record; the reference instead fails the
    * single record at the Postgres insert (numeric field overflow) — the
    * error channel flags such records (ErrorChannel.decimalBounds), this
    * keeps the surviving plan exception-free. */
  def toDecimalLossy(c: Column, precision: Int, scale: Int): Column =
    toFloatLossy(c).try_cast(DecimalType(precision, scale))

  /** Winsorization: clamp a metric into its per-group [pLo, pHi] exact-
    * percentile band — the robust-statistics tail-trim a feature pipeline
    * applies before aggregating heavy-tailed metrics. The thresholds are
    * round(percentile, 6) (the cross-engine float crutch the cosine
    * queries use), clamped values ride DECIMAL(18,6) into any downstream
    * sum so accumulation order stays moot.
    *
    * Scale: the exact bounds come from [[ApproxQuantile.exactQuantiles]]
    * (histogram-locate + k-th-selection — bounded state, no per-group
    * value map; identical results to the `percentile` aggregate, which
    * buffered a value→count map per group and was the slowest query on
    * the sf0.1 board on 600 k near-unique doubles), the tiny per-group
    * bounds frame broadcasts back, and the clamp itself is map-only. The
    * "agg" strategy keeps the single-pass `percentile` aggregate for
    * small-group-cardinality frames where one scan beats three;
    * "sketch" trades exactness for a single fixed-size histogram pass.
    * Returns the input plus `<valueCol>_w`. */
  def winsorize(df: org.apache.spark.sql.DataFrame, groupCol: String,
                valueCol: String, pLo: Double = 0.05,
                pHi: Double = 0.95,
                bounds: String = "exact",
                buckets: Int = 256): org.apache.spark.sql.DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val bnds = bounds match {
      case "exact" =>
        ApproxQuantile.exactQuantiles(df, groupCol, valueCol,
            Seq("_lo" -> pLo, "_hi" -> pHi))
          .withColumnRenamed(groupCol, "_grp")
      case "agg" =>
        df.groupBy(col(groupCol))
          .agg(round(expr(s"percentile($valueCol, $pLo)"), 6).as("_lo"),
            round(expr(s"percentile($valueCol, $pHi)"), 6).as("_hi"))
          .withColumnRenamed(groupCol, "_grp")
      case "sketch" =>
        // histogram-sketch bounds: fixed 256-counter state per group
        // instead of the exact percentile's value→count map — the
        // corpus-scale path. Error envelope: each bound is its covering
        // bucket's upper edge, so it sits within range/buckets ABOVE the
        // exact percentile; the clamp is correspondingly looser at the
        // low tail and tighter at the high tail by < range/buckets.
        // Needs pLo > 0 (a 0-quantile has no covering bucket).
        require(pLo > 0, "sketch bounds need pLo > 0")
        ApproxQuantile.histogramQuantiles(df, groupCol, valueCol,
            Seq("_lo" -> pLo, "_hi" -> pHi), buckets)
          .withColumnRenamed(groupCol, "_grp")
      case other => throw new IllegalArgumentException(
        s"unknown bounds strategy '$other' (exact | agg | sketch)")
    }
    // LEFT join: the sketch drops constant-valued groups (mx == mn) from
    // its bounds frame — those clamp to themselves via the coalesce
    df.join(broadcast(bnds), col(groupCol) <=> col("_grp"), "left")
      .withColumn(s"${valueCol}_w",
        // NULL stays NULL: greatest/least SKIP null arguments, so a bare
        // clamp would fabricate _lo for a NULL metric and inflate every
        // downstream aggregate over the winsorized column
        when(col(valueCol).isNull, lit(null))
          .otherwise(
            least(greatest(col(valueCol), coalesce(col("_lo"), col(valueCol))),
              coalesce(col("_hi"), col(valueCol)))))
      .drop("_grp", "_lo", "_hi")
  }
}
