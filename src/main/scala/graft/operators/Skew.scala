package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation — the salting pattern.
  *
  * A `groupBy(key)` over data where one key holds a large fraction of all
  * rows puts that key's entire volume into a single reduce task. AQE's
  * skew-join splitting does not help aggregations, so the classic fix is a
  * two-phase aggregate:
  *
  *   1. phase 1 groups by (key, salt) where salt = a deterministic spread
  *      over `saltBuckets` — the hot key's rows land on `saltBuckets`
  *      different reducers and partially aggregate there;
  *   2. phase 2 re-aggregates the (at most `saltBuckets × |keys|`) partial
  *      rows by key alone — tiny by construction.
  *
  * Only algebraic aggregates decompose this way; count/sum/min/max are
  * provided. (avg = sum/count composed at the call site.)
  *
  * Note: for plain count/sum, Spark's own map-side partial aggregation
  * already bounds reducer load, so salting matters most when the partial
  * aggregation is defeated — high-cardinality composite keys downstream of
  * a shuffle, or memory-heavy aggregates (collect_list/distinct). The
  * operator exists so those cases have a scale-safe drop-in.
  */
object Skew {

  /** Per-row salt in [0, saltBuckets). Hashing row CONTENTS alone would
    * send fully-identical duplicate rows (a common shape of count/sum skew,
    * e.g. replayed events) to one salt bucket — the hot key still lands on
    * a single reducer, defeating the mitigation exactly when it's needed.
    * So the row's physical position (`monotonically_increasing_id`, which
    * encodes partition id + in-partition index) is mixed in: duplicates
    * spread round-robin. The salt is only stable within a run, which is
    * all that's required — it exists solely to spread phase 1, and the
    * phase-2 re-aggregate makes the OUTPUT identical for any salt. */
  private def salt(df: DataFrame, saltBuckets: Int): Column = {
    // a user '_salt' column would be silently overwritten by withColumn
    // and dropped at the end — fail loudly instead
    require(!df.columns.contains("_salt"),
      "column name '_salt' collides with the skew operators' working column")
    // hash ONLY the position id: it already spreads identical duplicate
    // rows round-robin, and hashing every column both paid per-byte cost
    // on wide payloads and threw on MapType columns (xxhash64 rejects
    // maps), failing a groupBy that plain Spark handles fine
    pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int")
  }

  /** Two-phase salted aggregation: `aggs` maps output column name →
    * (phase-1 aggregate of an input column, phase-2 re-aggregate of the
    * phase-1 partial). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Seq[(String, Column, String => Column)]): DataFrame = {
    val p1 = df.withColumn("_salt", salt(df, saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2.as(s"_p_${aggs.head._1}"),
        aggs.tail.map { case (n, c, _) => c.as(s"_p_$n") }: _*)
    p1.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(s"_p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map { case (n, _, f) => f(s"_p_$n").as(n) }: _*)
  }

  /** Salted count(*) per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets,
      Seq(("n", count(lit(1)), (p: String) => sum(col(p)))))

  /** Salted sum of a column per key. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets,
      Seq(("total", sum(col(valueCol)), (p: String) => sum(col(p)))))

  /** Salted collect_set per key — the genuinely skew-prone case: the hot
    * key's set is built in `saltBuckets` partial pieces, then flattened. */
  def saltedCollectSet(df: DataFrame, keys: Seq[String], valueCol: String,
                       saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets,
      Seq(("values", collect_set(col(valueCol)),
        (p: String) => array_distinct(flatten(collect_list(col(p)))))))

  /** Salted equi-join for a skewed big-side key: the big side gets a
    * position-mixed salt (same rationale as [[salt]] — identical duplicate
    * rows of the hot key spread round-robin), the small side is replicated
    * `saltBuckets`× (one copy per salt value), and the join runs on
    * (keys, salt) — so the hot key's rows land on `saltBuckets` reducers
    * instead of one. Every big row carries exactly ONE salt and each small
    * row exists once per salt value, so the output is row-identical to the
    * plain join for "inner" and "left" (each big row meets each matching
    * small row exactly once); "right"/"full" would multiply-count the
    * replicated small side and are rejected.
    *
    * When to reach for this over AQE's skew-join split: AQE splits
    * oversized SORT-MERGE partitions at runtime, but a skewed key feeding
    * a stream-static join, a broadcast-ineligible small side, or a
    * downstream keyed aggregate still hot-spots — explicit salting is the
    * deterministic, plan-time fix. Replication cost: |small| × saltBuckets
    * rows shuffled, the explicit knob traded against the hot reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 32, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left")(joinType),
      s"salted join preserves only inner/left semantics, got $joinType")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val bigS = big.withColumn("_salt", salt(big, saltBuckets))
    val smallS = small.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }
}
