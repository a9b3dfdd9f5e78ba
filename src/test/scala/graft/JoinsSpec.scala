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
}
