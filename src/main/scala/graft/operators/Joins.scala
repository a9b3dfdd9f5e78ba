package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, in their scale-correct
  * formulations (SURVEY.md §2.3 lists them ABSENT in the reference; they
  * are first-class here because event/feature pipelines need them).
  *
  * Neither operator probes per row: the as-of join is a union + one
  * partitioned window (one shuffle on the key), and the range join is an
  * equi-join on (key, time bucket) with neighbor-bucket expansion — never
  * a theta join, which Spark would execute as a broadcast nested-loop.
  */
object Joins {

  /** As-of join with pandas-`merge_asof` direction semantics: for every
    * left row, ONE matching right row for the same key — `backward`
    * (default) the latest right with `rightTime <= leftTime`, `forward`
    * the earliest right with `rightTime >= leftTime`, `nearest` the
    * closer of the two (ties → backward). LEFT semantics: no match →
    * NULL right columns.
    *
    * Implementation: tag and union both sides, then carry the right
    * payload with `last(_, ignoreNulls)` over a window partitioned by
    * key and ordered by (time, side) — ascending for backward,
    * descending for forward; right rows at time T sort before left rows
    * at T either way, so ties are inclusive, matching DuckDB's
    * `ASOF JOIN`. `nearest` runs BOTH windows over the same union (one
    * shuffle, two sorts) and picks per row by exact epoch-µs distance.
    * One shuffle on the key regardless of direction; no per-row lookups.
    *
    * The right side must be unique per (key, rightTime) — pre-collapse
    * with e.g. lastWriteWins; otherwise which duplicate wins is
    * tie-undefined.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPrefix: String = "right_",
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftPayload = left.columns.filterNot(keys.contains)
    val rightPayload = right.columns.filterNot(keys.contains)
    require(direction != "nearest" || rightPayload.contains(rightTime),
      "nearest needs the right time column outside the join keys")
    // a NULL left time matches NOTHING (merge_asof semantics) — route
    // those rows around the windows: under the desc ordering NULLs sort
    // last and the forward carry would otherwise fabricate a match.
    // DELIBERATELY two scans of `left` (filter + complement union), NOT a
    // localCheckpoint: the left side is the BIG side of an as-of join —
    // materializing it into executor memory is exactly the wrong trade at
    // the scale this join exists for; a second columnar scan is cheap.
    val (leftOk, leftNull) = (left.filter(col(leftTime).isNotNull),
      left.filter(col(leftTime).isNull))
    // The whole right payload travels as ONE nullable struct, so the carry
    // below picks every right column from the SAME matched row. Carrying
    // columns independently (last(c, ignoreNulls) per column) would stitch
    // a NULL field from an OLDER right row whenever the matched row has a
    // NULL in that field — diverging from ASOF JOIN semantics.
    val rpayType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(nullable = true)))
    val l2 = leftOk
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rpayType).as("_rpay"): _*)
    val r2 = right
      .filter(col(rightTime).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.toIndexedSeq.map(col): _*).as("_rpay"): _*)
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // descending time: "last seen" right row is the EARLIEST with t >= left
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val union = l2.unionByName(r2)
    val head = keys.map(col) ++ Seq(col("_side")) ++ leftPayload.map(col)
    val carried = direction match {
      case "backward" => union.select((head :+
        last(col("_rpay"), ignoreNulls = true).over(wBack).as("_rpay")): _*)
      case "forward" => union.select((head :+
        last(col("_rpay"), ignoreNulls = true).over(wFwd).as("_rpay")): _*)
      case "nearest" =>
        // exact epoch-µs distance for time types, raw double otherwise —
        // the comparison is integer micros either way for timestamps
        def num(c: Column): Column = left.schema(leftTime).dataType match {
          case _: org.apache.spark.sql.types.TimestampType |
               _: org.apache.spark.sql.types.TimestampNTZType |
               _: org.apache.spark.sql.types.DateType => Times.epochMicros(c)
          case _ => c.cast("double")
        }
        union
          .withColumn("_b", last(col("_rpay"), ignoreNulls = true).over(wBack))
          .withColumn("_f", last(col("_rpay"), ignoreNulls = true).over(wFwd))
          .select((head :+
            when(col("_b").isNull, col("_f"))
              .when(col("_f").isNull, col("_b"))
              .when(num(col(s"_f.$rightTime")) - num(col("_t")) <
                num(col("_t")) - num(col(s"_b.$rightTime")), col("_f"))
              .otherwise(col("_b")).as("_rpay")): _*)
    }
    // a NULL join KEY matches nothing (SQL ASOF JOIN equality semantics):
    // the window treats the NULL-key rows as one ordinary partition, so
    // without this gate a NULL-key left row would "match" NULL-key right
    // rows — the carried payload is nulled for those rows instead
    val keyNull = keys.map(col(_).isNull).reduceOption(_ || _).getOrElse(lit(false))
    carried.filter(col("_side") === 1)
      .withColumn("_rpay",
        when(keyNull, lit(null).cast(rpayType)).otherwise(col("_rpay")))
      .select(keys.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"_rpay.$c").as(s"$rightPrefix$c")): _*)
      .unionByName(leftNull.select(keys.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"$rightPrefix$c")): _*))
  }

  /** Banded range join: all (left, right) pairs with the same key and
    * `|leftTime - rightTime| <= width`. Times are compared at microsecond
    * precision.
    *
    * Implementation: bucket both sides by `floor(micros / width)`; a
    * qualifying pair is always in the same or an adjacent bucket, so the
    * right side expands to buckets {b-1, b, b+1} (3× its row count — the
    * bounded cost that replaces an O(n²) theta join) and the join is a
    * plain equi-join on (key, bucket) + an exact band filter.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String, width: String,
                rightPrefix: String = "right_"): DataFrame = {
    val wUs = Times.parseDurationUs(width)
    val leftPayload = left.columns.filterNot(keys.contains)
    val rightPayload = right.columns.filterNot(keys.contains)
    val lb = left.withColumn("_lus", Times.epochMicros(col(leftTime)))
      .withColumn("_bucket", floor(col("_lus") / wUs))
    val rb = right.withColumn("_rus", Times.epochMicros(col(rightTime)))
      .withColumn("_bucket", explode(array(
        floor(col("_rus") / wUs) - 1, floor(col("_rus") / wUs), floor(col("_rus") / wUs) + 1)))
      .select(keys.map(col) ++ Seq(col("_rus"), col("_bucket")) ++
        rightPayload.map(c => col(c).as(s"$rightPrefix$c")): _*)
    lb.join(rb, keys :+ "_bucket")
      .filter(abs(col("_lus") - col("_rus")) <= wUs)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"$rightPrefix$c")): _*)
  }

  /** Interval-overlap join: all (left, right) pairs with the same key
    * whose CLOSED intervals `[leftStart, leftEnd]` and `[rightStart,
    * rightEnd]` intersect (`ls <= re AND rs <= le`) — the missing third
    * temporal-join class next to [[asOf]] (point-to-latest) and
    * [[rangeJoin]] (point-to-band): interval-to-interval. Bounds are
    * numeric (epoch days/seconds/micros — caller's unit).
    *
    * Implementation: each side explodes its interval to the
    * `bucketWidth`-wide buckets it covers, the join is a plain equi-join
    * on (key, bucket), and each surviving pair is attributed to exactly
    * ONE bucket — the bucket of `max(ls, rs)`, the overlap's start, which
    * both sides necessarily cover — so no distinct/dedup shuffle is ever
    * needed. Cost is rows × (span/bucketWidth + 1) per side, an explicit
    * fan-out knob in place of the O(n²-per-key) theta join Spark would
    * otherwise plan; pick `bucketWidth` near the typical interval length.
    * A row whose span would explode to more than `maxSpanBuckets` buckets
    * fails LOUDLY (raise_error) rather than silently fanning out — at
    * 100 TB one year-long interval in day buckets is a data bug, not a
    * join plan.
    *
    * Rows with NULL or inverted bounds (end < start) are dropped, like
    * NULL keys in an equi-join.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      bucketWidth: Long, maxSpanBuckets: Int = 4096,
                      rightPrefix: String = "right_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = floor(col(s) / bucketWidth)
      val b1 = floor(col(e) / bucketWidth)
      df.filter(col(s).isNotNull && col(e).isNotNull && col(e) >= col(s))
        .withColumn("_bucket", explode(sequence(b0,
          when(b1 - b0 >= maxSpanBuckets, raise_error(concat(
            lit(s"intervalOverlap: span exceeds $maxSpanBuckets buckets at ["),
            col(s).cast("string"), lit(", "), col(e).cast("string"),
            lit(s"] with bucketWidth=$bucketWidth — widen bucketWidth or clean the row")))
          ).otherwise(b1))))
    }
    val rightPayload = right.columns.filterNot(keys.contains)
    val lb = explodeBuckets(left, leftStart, leftEnd)
    val rb = explodeBuckets(right, rightStart, rightEnd)
      .select(keys.map(col) :+ col("_bucket") :+
        struct(rightPayload.toIndexedSeq.map(col): _*).as("_rpay"): _*)
    lb.join(rb, keys :+ "_bucket")
      .filter(col(leftStart) <= col(s"_rpay.$rightEnd") &&
        col(s"_rpay.$rightStart") <= col(leftEnd))
      // exactly-once attribution: the overlap's first bucket
      .filter(col("_bucket") ===
        floor(greatest(col(leftStart), col(s"_rpay.$rightStart")) / bucketWidth))
      .select(keys.map(col) ++
        left.columns.filterNot(keys.contains).map(col) ++
        rightPayload.map(c => col(s"_rpay.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Bloom-filtered equi-join (semi-join reduction): build a Bloom filter
    * of the small side's keys (one fixed-size row, OR-merged map-side),
    * broadcast it, and drop large-side rows that cannot match BEFORE the
    * join's shuffle. The join result is IDENTICAL to the plain join — the
    * filter has no false negatives, and its false positives are removed by
    * the exact join — but the large side's exchange now carries only
    * ~matching rows, which is the difference between shuffling 100 TB and
    * shuffling the selectivity fraction of it. The classic use: a fact
    * table joined to a filtered dimension whose surviving keys are far too
    * many to broadcast-join outright but compress to a fixed-size bit set.
    *
    * Restricted to "inner"/"left_semi": an outer join must KEEP
    * non-matching large rows, which is exactly what the pre-filter drops.
    * Size numBits ≈ −n·ln(fpr)/ln(2)² for the small side's key count n
    * (numHashes ≤ 4: the probe slices its k bit-indexes from ONE md5).
    */
  def bloomFilteredJoin(large: DataFrame, small: DataFrame, key: String,
                        numBits: Int = 1 << 20, numHashes: Int = 4,
                        joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi")(joinType),
      s"semi-join reduction preserves only inner/left_semi semantics, got $joinType")
    import graft.functions.Sketches
    // Build and probe hash md5(key AS STRING) — so both sides MUST render
    // matching keys to the same string. With mismatched key types (DECIMAL
    // '5.00' vs BIGINT '5') the renderings differ and the probe would drop
    // rows the plain join (which type-coerces) keeps. Guard: for NUMERIC
    // pairs, try_cast the SMALL side's key to the LARGE side's type before
    // hashing — value-preserving whenever a match is possible (a small key
    // equal to some large key is representable in the large key's type and
    // casts to exactly that value; a key the cast nulls/truncates can
    // never match, so losing it from the filter — or adding a false
    // positive the exact join removes — changes nothing). Any OTHER
    // mixture (e.g. STRING large vs BIGINT small, where the plain join
    // coerces both sides but '5.0' still renders ≠ '5') has no
    // provably-safe one-sided cast — fail LOUDLY and make the caller
    // align the key types, never silently drop matching rows.
    val largeKeyType = large.schema(key).dataType
    val smallKeyType = small.schema(key).dataType
    val bothNumeric =
      largeKeyType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        smallKeyType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    require(smallKeyType == largeKeyType || bothNumeric,
      s"bloomFilteredJoin key types must match or both be numeric (got " +
        s"small=$smallKeyType, large=$largeKeyType): the string-hash filter " +
        "cannot guarantee result identity across other coercions — cast the " +
        "key columns to a common type first")
    // Hash in the JOIN's coercion type, not blindly the large side's:
    // with a FLOATING side anywhere, the plain join compares in DOUBLE —
    // casting a double small key back to an integral/decimal large type
    // is LOSSY exactly where doubles alias (2^53+1 as BIGINT matches
    // 2^53 as DOUBLE in the plain join, but '9007199254740993' is not in
    // a filter built from '9007199254740992' — a silently dropped row).
    // Hashing BOTH sides as double mirrors what the join itself compares;
    // any aliasing this introduces is a false POSITIVE the exact join
    // removes. For exact-numeric pairs (integral/decimal) the large type
    // IS the comparison type and the one-sided cast is value-preserving
    // for every matchable key (see the guard comment above).
    import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}
    val floatingPair = smallKeyType != largeKeyType &&
      Seq(smallKeyType, largeKeyType).exists(t =>
        t == DoubleType || t == FloatType)
    val hashType: DataType =
      if (floatingPair) DoubleType else largeKeyType
    val smallKey =
      if (smallKeyType == largeKeyType) col(key)
      else col(key).try_cast(hashType)
    // The filter is materialized to the driver and probed as a LITERAL
    // array — the standard runtime-filter shape (what Spark's own Bloom
    // runtime filters do with their subquery result). Joining the one-row
    // filter frame instead (crossJoin + filter) measures 10× slower: the
    // probe predicate gets pushed into the BroadcastNestedLoopJoin's join
    // condition, which is evaluated interpreted, outside whole-stage
    // codegen, per large-side row. The collect is control-plane by
    // construction: ONE row of numBits/64 longs, fixed size at any scale.
    // BloomFilterAgg is non-nullable: an EMPTY small side yields the
    // zero-filled buffer, whose probe rejects every large-side row — the
    // inner/semi result is empty through the normal path, no special case
    val bfRow = small.agg(
      Sketches.bloomFilter(smallKey, numBits, numHashes).as("_bf")).head()
    locally {
      val bits = bfRow.getSeq[Long](0).toIndexedSeq
      val largeHashKey =
        if (floatingPair) col(key).cast(DoubleType) else col(key)
      val probe = org.apache.spark.sql.graftbridge.Bridge.toColumn(
        graft.functions.BloomProbe(
          org.apache.spark.sql.graftbridge.Bridge.toExpression(
            largeHashKey.cast("string")),
          bits, numBits, numHashes))
      large
        .filter(col(key).isNotNull && probe)
        .join(small, Seq(key), joinType)
    }
  }

  /** Blocked fuzzy join (entity resolution): candidate pairs share a
    * `blockLen`-char name prefix (one equi-shuffle — the same
    * bucket-then-verify shape as the LSH band join, never all-pairs),
    * then exact Levenshtein ≤ `maxDist` verifies each candidate. The
    * distance is projected as a named `dist` column BEFORE the filter so
    * it is computed once per pair.
    *
    * Blocking is the standard recall trade: a true match whose edits
    * fall inside the first `blockLen` chars lands in a different block
    * and is missed — callers pick the prefix past the stable key region
    * (or union several blocking passes, each one equi-join). */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame,
                       leftName: String, rightName: String,
                       maxDist: Int, blockLen: Int = 6): DataFrame = {
    require(maxDist >= 0 && blockLen >= 1, "need maxDist >= 0, blockLen >= 1")
    left.join(right,
        substring(col(leftName), 1, blockLen) === substring(col(rightName), 1, blockLen))
      // threshold variant: the edit-distance DP early-exits the moment a
      // row's distance must exceed maxDist (returns -1) — O(maxDist·len)
      // per pair instead of O(len²), the difference between verifying
      // k-blocked candidates and re-paying full DP on every near-miss
      .withColumn("dist",
        levenshtein(col(leftName), col(rightName), maxDist).cast("long"))
      .filter(col("dist") >= 0)
  }

  /** [[blockedFuzzyJoin]]'s record-linkage twin scored by Jaro-Winkler
    * ([[graft.functions.JaroWinkler]] — the name/title matcher where
    * Levenshtein's length sensitivity misleads): candidates from the
    * same prefix block, kept at `round(similarity, 6) >= minSim`. The
    * prefix block is the NATURAL blocking key for Jaro-Winkler — the
    * Winkler bonus rewards exactly the prefix the block guarantees.
    * Same scale law: the join is a plain equi-join on the block key;
    * the O(len²) scorer runs only on blocked candidates, never a
    * cartesian. */
  def blockedJaroWinklerJoin(left: DataFrame, right: DataFrame,
                             leftName: String, rightName: String,
                             minSim: Double, blockLen: Int = 6): DataFrame = {
    require(minSim >= 0 && minSim <= 1 && blockLen >= 1,
      "need 0 <= minSim <= 1, blockLen >= 1")
    left.join(right,
        substring(col(leftName), 1, blockLen) === substring(col(rightName), 1, blockLen))
      .withColumn("similarity",
        round(graft.functions.JaroWinkler.jaro_winkler(
          col(leftName), col(rightName)), 6))
      .filter(col("similarity") >= minSim)
  }
}
