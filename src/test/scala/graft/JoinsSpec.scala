package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Temporal join semantics: as-of tie inclusivity, no-match NULLs, range
  * band boundaries across bucket edges. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before, NULL when none") {
    val left = Seq(
      (1L, ts("2024-01-01 05:00:00"), "e1"),
      (1L, ts("2024-01-01 04:30:00"), "e2"), // exact tie with a right row
      (2L, ts("2024-01-01 03:00:00"), "e3")  // no right rows for key 2
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 04:00:00"), "x"),
      (1L, ts("2024-01-01 04:30:00"), "y"),
      (1L, ts("2024-01-01 06:00:00"), "z")   // after every left row
    ).toDF("k", "t", "v")

    val out = Joins.asOf(left, right, Seq("k"), "t", "t")
      .collect().map(r => r.getAs[String]("name") -> Option(r.getAs[String]("right_v"))).toMap
    assert(out("e1") === Some("y"), "latest at-or-before 05:00 is the 04:30 row")
    assert(out("e2") === Some("y"), "tie is inclusive (<=), like DuckDB ASOF")
    assert(out("e3") === None, "LEFT semantics: no match -> NULL")
  }

  test("asOf: a NULL join key matches NOTHING (SQL ASOF equality semantics)") {
    val left = Seq(
      (Some(1L), ts("2024-01-01 05:00:00"), "keyed"),
      (None, ts("2024-01-01 05:00:00"), "nullkey"))
      .toDF("k", "t", "name")
    val right = Seq(
      (Some(1L), ts("2024-01-01 04:00:00"), "x"),
      // a NULL-key right row exists BEFORE the null-key left row — the
      // partitioned window would happily carry it; equality must not
      (Option.empty[Long], ts("2024-01-01 04:30:00"), "poison"))
      .toDF("k", "t", "v")
    val out = Joins.asOf(left, right, Seq("k"), "t", "t")
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[String]("right_v"))).toMap
    assert(out("keyed") === Some("x"))
    assert(out("nullkey") === None,
      "NULL-key left rows are kept (left join) but never matched")
    assert(out.size === 2, "no rows lost")
  }

  test("asOf directions: forward picks earliest-at-or-after; nearest ties go backward") {
    val left = Seq(
      (1L, ts("2024-01-01 05:00:00"), "e1"), // back 04:00 (60m), fwd 05:10 (10m) -> fwd
      (1L, ts("2024-01-01 04:10:00"), "e2"), // back 04:00 (10m), fwd 05:10 (60m) -> back
      (1L, ts("2024-01-01 04:35:00"), "e3"), // 35m both sides: tie -> backward
      (1L, ts("2024-01-01 03:00:00"), "e4"), // nothing before -> fwd only
      (2L, ts("2024-01-01 03:00:00"), "e5")  // no right rows at all
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 04:00:00"), "a"),
      (1L, ts("2024-01-01 05:10:00"), "b")
    ).toDF("k", "t", "v")
    def run(dir: String) =
      Joins.asOf(left, right, Seq("k"), "t", "t", direction = dir)
        .collect().map(r => r.getAs[String]("name") ->
          Option(r.getAs[String]("right_v"))).toMap
    val fwd = run("forward")
    assert(fwd === Map("e1" -> Some("b"), "e2" -> Some("b"), "e3" -> Some("b"),
      "e4" -> Some("a"), "e5" -> None),
      s"forward = earliest right at-or-after: $fwd")
    val near = run("nearest")
    assert(near === Map("e1" -> Some("b"), "e2" -> Some("a"), "e3" -> Some("a"),
      "e4" -> Some("a"), "e5" -> None),
      s"nearest picks the closer side, ties backward: $near")
    // a NULL left time matches NOTHING in any direction (merge_asof
    // semantics) — under desc ordering it would otherwise pick up the
    // earliest right row in the forward carry
    val withNullT = left.union(
      Seq((1L, null.asInstanceOf[java.sql.Timestamp], "eN")).toDF("k", "t", "name"))
    Seq("backward", "forward", "nearest").foreach { dir =>
      val nv = Joins.asOf(withNullT, right, Seq("k"), "t", "t", direction = dir)
        .filter(col("name") === "eN").collect()
      assert(nv.length === 1 && nv.head.isNullAt(nv.head.fieldIndex("right_v")),
        s"NULL left time must keep NULL right columns under $dir")
    }
    // a NULL RIGHT time can never be carried as a match either: under the
    // ascending backward window NULLs would sort FIRST and their payload
    // would fabricate a match for left rows preceding every real right
    // row (and 'nearest' would inherit it via its backward leg) — r2
    // filters them out, mirroring the NULL-left routing
    val rightWithNull = right.union(
      Seq((1L, null.asInstanceOf[java.sql.Timestamp], "ghost")).toDF("k", "t", "v"))
    Seq("backward", "forward", "nearest").foreach { dir =>
      val rv = Joins.asOf(left, rightWithNull, Seq("k"), "t", "t", direction = dir)
        .collect().map(r => Option(r.getAs[String]("right_v"))).toSet
      assert(!rv.contains(Some("ghost")),
        s"NULL right time must never be carried under $dir")
      // and results are identical to the NULL-free right side
      val base = Joins.asOf(left, right, Seq("k"), "t", "t", direction = dir)
        .collect().map(r => r.getAs[String]("name") ->
          Option(r.getAs[String]("right_v"))).toMap
      val withG = Joins.asOf(left, rightWithNull, Seq("k"), "t", "t", direction = dir)
        .collect().map(r => r.getAs[String]("name") ->
          Option(r.getAs[String]("right_v"))).toMap
      assert(withG === base, s"NULL right rows must be inert under $dir")
    }
    // forward tie is inclusive too: a left row exactly AT a right time takes it
    val tie = Joins.asOf(
      Seq((1L, ts("2024-01-01 04:00:00"), "t1")).toDF("k", "t", "name"),
      right, Seq("k"), "t", "t", direction = "forward")
      .collect().map(r => Option(r.getAs[String]("right_v"))).head
    assert(tie === Some("a"), "forward tie at equal times matches")
    intercept[IllegalArgumentException](
      Joins.asOf(left, right, Seq("k"), "t", "t", direction = "sideways"))
  }

  test("asOf takes ALL right columns from the matched row, even NULL fields") {
    // the matched (latest at-or-before) right row has v=NULL: the output
    // must carry that NULL, NOT stitch v from the older right row — the
    // whole payload travels as one struct (ADVICE r2)
    val left = Seq((1L, ts("2024-01-01 05:00:00"), "e1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 03:00:00"), Option("old"), Option(7L)),
      (1L, ts("2024-01-01 04:00:00"), Option.empty[String], Option(8L))
    ).toDF("k", "t", "v", "w")
    val r = Joins.asOf(left, right, Seq("k"), "t", "t").collect().head
    assert(Option(r.getAs[String]("right_v")) === None,
      "NULL field of the matched row must stay NULL")
    assert(r.getAs[Long]("right_w") === 8L, "other fields come from the same matched row")
  }

  test("rangeJoin finds pairs across bucket boundaries, excludes outside band") {
    val left = Seq((1L, ts("2024-01-01 01:00:00"), 100L)).toDF("k", "t", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 00:31:00"), 1L),  // 29 min before: in band, previous bucket
      (1L, ts("2024-01-01 01:29:00"), 2L),  // 29 min after: in band
      (1L, ts("2024-01-01 01:30:00"), 3L),  // exactly 30 min: inclusive
      (1L, ts("2024-01-01 01:31:00"), 4L),  // 31 min: out
      (2L, ts("2024-01-01 01:00:00"), 5L)   // other key: out
    ).toDF("k", "t", "rid")
    val out = Joins.rangeJoin(left, right, Seq("k"), "t", "t", "30 minutes")
      .collect().map(_.getAs[Long]("right_rid")).sorted
    assert(out.toSeq === Seq(1L, 2L, 3L))
  }

  test("intervalOverlap: inclusive bounds, exactly-once pairs across buckets, loud span guard") {
    val left = Seq(
      (1L, 10L, 0L, 10L),   // overlaps r1, touches r2 at 10
      (1L, 11L, 20L, 25L),  // overlaps nothing
      (1L, 12L, 8L, 32L),   // spans 4 buckets; overlaps r1, r2, r3
      (2L, 13L, 0L, 10L)    // other key: never pairs with key-1 rows
    ).toDF("k", "lid", "ls", "le")
    val right = Seq(
      (1L, 101L, 5L, 9L),   // r1
      (1L, 102L, 10L, 15L), // r2: closed-interval touch at 10 counts
      (1L, 103L, 30L, 40L), // r3: reached only by the long lid=12 row
      (2L, 104L, 50L, 60L)  // r4: same key as lid=13 but disjoint
    ).toDF("k", "rid", "rs", "re")
    val out = Joins.intervalOverlap(left, right, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 10)
      .collect().map(r => (r.getAs[Long]("lid"), r.getAs[Long]("right_rid")))
    // every expected pair EXACTLY once — shared coverage of several
    // buckets (lid=12 × r1 share none; lid=12 × r2 share buckets 1,2,3)
    // must not duplicate the pair
    assert(out.sorted.toSeq === Seq((10L, 101L), (10L, 102L),
      (12L, 101L), (12L, 102L), (12L, 103L)).sorted)
    // NULL and inverted bounds drop like NULL equi-join keys
    val dirty = Seq((1L, 20L, Some(5L), Option.empty[Long]),
      (1L, 21L, Some(9L), Some(3L))).toDF("k", "lid", "ls", "le")
    assert(Joins.intervalOverlap(dirty, right, Seq("k"),
      "ls", "le", "rs", "re", bucketWidth = 10).count() === 0L)
    // pathological span fails loudly instead of fanning out
    val wide = Seq((1L, 30L, 0L, 1000000L)).toDF("k", "lid", "ls", "le")
    val e = intercept[Exception] {
      Joins.intervalOverlap(wide, right, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 10, maxSpanBuckets = 100).count()
    }
    assert(e.getMessage.contains("span exceeds") ||
      Option(e.getCause).exists(_.getMessage.contains("span exceeds")))
  }

  test("bloomFilteredJoin equals the plain join; outer types rejected") {
    import org.apache.spark.sql.functions.col
    // large side: duplicates per key, keys missing from small, NULL keys
    val large = ((1 to 500).map(i => (Some((i % 50).toLong), i)) ++
      Seq((Option.empty[Long], -1), (Option.empty[Long], -2)))
      .toDF("k", "payload")
    val small = (0 until 20).map(i => (i.toLong * 2, s"s$i")).toDF("k", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("payload"), col("attr")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val plain = canon(large.join(small, Seq("k"), "inner"))
    val bloomed = canon(Joins.bloomFilteredJoin(large, small, "k"))
    assert(bloomed === plain, "semi-join reduction must not change the result")
    assert(plain.nonEmpty, "fixture sanity: some keys must match")
    // left_semi leg: distinct large rows whose key exists in small
    val semiPlain = large.join(small, Seq("k"), "left_semi").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val semiBloom = Joins.bloomFilteredJoin(large, small, "k",
        joinType = "left_semi").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(semiBloom === semiPlain)
    intercept[IllegalArgumentException] {
      Joins.bloomFilteredJoin(large, small, "k", joinType = "left")
    }
  }

  test("bloomFilteredJoin: mismatched key types keep result identity (ADVICE r8)") {
    import org.apache.spark.sql.functions.col
    // DECIMAL small keys render '4.00' while BIGINT large keys render '4':
    // without the common-type cast the hash strings differ and the probe
    // false-negatives away every matching row. Includes a non-integral
    // small key (5.50) that matches nothing, and a small key (1e19) that
    // overflows BIGINT — both must simply not match, never crash.
    val large = (1 to 100).map(i => ((i % 10).toLong, i)).toDF("k", "payload")
    val small = Seq("2.00", "4.00", "5.50", "10000000000000000000.00")
      .toDF("ks").select(col("ks").cast("decimal(22,2)").as("k"),
        col("ks").as("attr"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("payload")).collect().map(_.getInt(0)).sorted.toSeq
    val plain = canon(large.join(small, Seq("k"), "inner"))
    val bloomed = canon(Joins.bloomFilteredJoin(large, small, "k"))
    assert(plain.nonEmpty, "fixture sanity: keys 2 and 4 must match")
    assert(bloomed === plain,
      "cross-type semi-join reduction must not change the result")
    // non-numeric mixtures have no provably-safe one-sided cast (a STRING
    // large key '5.0' matches BIGINT 5 under join coercion but renders a
    // different hash string) — must fail loudly, never silently drop rows
    val largeStr = Seq(("5.0", 1), ("5", 2), ("abc", 3)).toDF("k", "payload")
    val smallNum = Seq(5L).toDF("k")
    intercept[IllegalArgumentException] {
      Joins.bloomFilteredJoin(largeStr, smallNum, "k")
    }
  }

  test("bloomFilteredJoin: integral-large vs floating-small beyond 2^53 keeps identity") {
    import org.apache.spark.sql.functions.col
    // the plain join compares BIGINT vs DOUBLE in DOUBLE, where 2^53 and
    // 2^53+1 ALIAS — hashing the large key in its own integral type would
    // false-negative away a row the plain join emits; both sides must
    // hash in the join's comparison type (double)
    val big = (1L << 53) // 9007199254740992
    val large = Seq((big, 1), (big + 1, 2), (42L, 3)).toDF("k", "payload")
    val small = Seq(big.toDouble, 42.0).toDF("k")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("payload")).collect().map(_.getInt(0)).sorted.toSeq
    val plain = canon(large.join(small, Seq("k"), "inner"))
    assert(plain === Seq(1, 2, 3),
      "fixture sanity: double coercion aliases 2^53 and 2^53+1")
    assert(canon(Joins.bloomFilteredJoin(large, small, "k")) === plain,
      "the bloom variant must keep every row the plain join emits")
  }
}
