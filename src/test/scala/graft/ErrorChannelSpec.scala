package graft

import org.apache.spark.sql.functions._
import graft.streaming.ErrorChannel

/** T8 semantics: present-but-uncoercible keys are errors; missing keys are
  * not (the reference silently skips those); corrupt rows are errors. */
class ErrorChannelSpec extends SparkSpec {
  import spark.implicits._

  test("split separates uncoercible ids, keeps missing ids as valid") {
    val feed = Seq("1", "abc", "", "4.0", null).toDF("id")
    val (valid, errors) = ErrorChannel.split(feed, Seq("id"))
    assert(valid.collect().map(r => Option(r.getString(0))).toSet ===
      Set(Some("1"), Some(""), Some("4.0"), None))
    val errs = errors.collect().map(_.getAs[String]("_error"))
    assert(errs.length === 1)
    assert(errs.head === "error: ValueError: invalid int for 'id': abc")
  }

  test("corrupt-record column routes to the error side with its raw payload") {
    val feed = Seq(
      ("1", null.asInstanceOf[String]),
      ("2", "raw,junk,line")
    ).toDF("id", ErrorChannel.corruptCol)
    val (valid, errors) = ErrorChannel.split(feed, Seq("id"))
    assert(valid.columns.toSet === Set("id"))
    assert(valid.count() === 1)
    val e = errors.collect().map(_.getAs[String]("_error"))
    assert(e.toSeq === Seq("error: MalformedRecord: raw,junk,line"))
  }

  test("decimal-overflow values error per record (reference: Postgres numeric field overflow)") {
    val feed = Seq(
      ("1", "9.99"),       // fits NUMERIC(12,2)
      ("2", "1e300"),      // parses as double, overflows the decimal -> error
      ("3", "garbage"),    // does not parse at all -> NULL attribute, NOT an error
      ("4", "")            // missing -> NOT an error
    ).toDF("id", "product_price")
    val (valid, errors) = ErrorChannel.split(feed, Seq("id"))
    assert(valid.select(col("id")).collect().map(_.getString(0)).sorted.toSeq ===
      Seq("1", "3", "4"))
    val e = errors.collect().map(_.getAs[String]("_error"))
    assert(e.toSeq === Seq(
      "error: NumericOverflow: 'product_price' out of NUMERIC(12,2) range: 1e300"))
  }

  test("status emits reference-style ok/error lines") {
    val feed = Seq("1", "zz").toDF("id")
    val st = ErrorChannel.status(feed, Seq("id")).collect().map(_.getString(0)).sorted
    assert(st.toSeq === Seq("error: ValueError: invalid int for 'id': zz", "ok"))
  }
}
