package graft

import org.apache.spark.sql.functions._
import graft.operators.Cleanse

/** Unit tests for the reference's coercion quirks (SURVEY.md §2.2 P2-P10,
  * §7.4.3): float-then-int truncation, empty-vs-NULL, 3-format dates, and
  * the ANSI-mode crash guards (Spark 4 ANSI is on by default — garbage
  * must become NULL, never an exception). */
class CleanseSpec extends SparkSpec {
  import spark.implicits._

  private def intOf(v: String): Option[Long] =
    Seq(v).toDF("v").select(Cleanse.toIntLossy(col("v"))).collect()
      .headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))

  test("P2 toIntLossy parses float-then-truncates like the reference's int(float(x))") {
    assert(intOf("4.0") === Some(4L))
    assert(intOf("4.7") === Some(4L))
    assert(intOf("-4.7") === Some(-4L)) // toward zero, like Python int()
    assert(intOf("42") === Some(42L))
    assert(intOf(" 7 ") === Some(7L))
  }

  test("P2 toIntLossy maps garbage/overflow/NaN to NULL without throwing (ANSI guard)") {
    for (bad <- Seq("", "abc", "NaN", "Infinity", "-Infinity", "1e300", "12x"))
      assert(intOf(bad) === None, s"input '$bad'")
  }

  test("P3 toFloatLossy: garbage to NULL, numbers parse") {
    val out = Seq("1.5", "", "x", "2").toDF("v")
      .select(Cleanse.toFloatLossy(col("v"))).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(1.5), None, None, Some(2.0)))
  }

  test("P4 parseDateMulti accepts the reference's three formats, rejects others") {
    val out = Seq("3/14/2021", "2021-03-14", "14.3.2021", "2021/03/14", "garbage")
      .toDF("v").select(Cleanse.parseDateMulti(col("v")).cast("string")).collect()
      .map(r => Option(r.getString(0)))
    assert(out.take(3).forall(_.contains("2021-03-14")))
    assert(out.drop(3).forall(_.isEmpty))
  }

  test("P5 trimToNull: whitespace-only and empty become NULL, content is trimmed") {
    val out = Seq("  x  ", "   ", "", "y").toDF("v")
      .select(Cleanse.trimToNull(col("v"))).collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("x"), None, None, Some("y")))
  }

  test("P6 fullName concatenates trimmed parts, NULL when both empty") {
    val df = Seq(("A ", " B"), ("A", ""), ("", "B"), ("", " ")).toDF("f", "l")
    val out = df.select(Cleanse.fullName(col("f"), col("l"))).collect()
      .map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("A B"), Some("A"), Some("B"), None))
  }

  test("P7 aliasKey picks the first non-empty alias then coerces") {
    val df = Seq(("", "5.0", "9"), (" ", "", "7"), ("3", "x", "1")).toDF("a", "b", "c")
    val out = df.select(Cleanse.aliasKey(col("a"), col("b"), col("c"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(Some(5L), Some(7L), Some(3L)))
  }

  test("P9 defaults: NULL/garbage to 0, values kept") {
    val df = Seq("", "3", "x").toDF("v")
    val longs = df.select(Cleanse.defaultZeroLong(col("v"))).collect().map(_.getLong(0))
    val dbls = df.select(Cleanse.defaultZeroDouble(col("v"))).collect().map(_.getDouble(0))
    assert(longs.toSeq === Seq(0L, 3L, 0L))
    assert(dbls.toSeq === Seq(0.0, 3.0, 0.0))
  }
}
