package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Cleanse

/** Property-based coverage of the coercion layer (SURVEY.md §5): for all
  * well-formed inputs the coercions invert rendering, and for arbitrary
  * garbage they never throw (ANSI-mode safety). Deterministic seeded
  * ScalaCheck generators, evaluated through the real Column expressions
  * on a DataFrame (not a reimplementation of the semantics). */
class CoercionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.pureApply(params, s)).take(n).toSeq
  }

  private def runInt(vs: Seq[String]): Seq[Option[Long]] =
    vs.toDF("v").select(Cleanse.toIntLossy(col("v"))).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))

  test("toIntLossy inverts toString for any long in the double-exact range") {
    val xs = samples(Gen.chooseNum(-(1L << 52), 1L << 52), 200)
    assert(runInt(xs.map(_.toString)) === xs.map(x => Some(x)))
  }

  test("toIntLossy truncates any rendered double toward zero") {
    val xs = samples(Gen.chooseNum(-1e9, 1e9), 200)
    assert(runInt(xs.map(_.toString)) === xs.map(x => Some(x.toLong)))
  }

  test("toIntLossy never throws on arbitrary printable strings") {
    val xs = samples(Gen.asciiPrintableStr, 500).filter(_.nonEmpty)
    runInt(xs) // must not throw, whatever the input
    succeed
  }

  test("parseDateMulti round-trips any 2000-2099 date in all three formats") {
    val dateGen = for {
      y <- Gen.chooseNum(2000, 2099); m <- Gen.chooseNum(1, 12)
      d <- Gen.chooseNum(1, 28)
    } yield java.time.LocalDate.of(y, m, d)
    val ds = samples(dateGen, 100)
    val rendered = ds.flatMap(d => Seq(
      s"${d.getMonthValue}/${d.getDayOfMonth}/${d.getYear}",
      d.toString,
      s"${d.getDayOfMonth}.${d.getMonthValue}.${d.getYear}"))
    val parsed = rendered.toDF("v")
      .select(Cleanse.parseDateMulti(col("v")).cast("string"))
      .collect().toSeq.map(_.getString(0))
    assert(parsed === ds.flatMap(d => Seq.fill(3)(d.toString)))
  }

  test("adversarial feeds never crash the star builders; invariants hold") {
    import graft.plans.StarSchema
    import graft.streaming.ErrorChannel
    // every field independently drawn from an adversarial value pool:
    // numbers, overflow, NaN/Inf spellings, empties, unicode, multiline
    val nasty = Gen.oneOf(
      "1", "42", "4.0", "-7.5", "1e300", "-1e300", "9223372036854775808",
      "NaN", "nan", "Infinity", "-inf", "", " ", "abc", "id_9", "0x1F",
      "3/14/2021", "2021-03-14", "14.3.2021", "31/31/2021",
      "täst ünïcode 文字", "line1\nline2", "  padded  ", "1,2", "null", "None")
    val row = Gen.listOfN(graft.sources.SalesFeed.fieldNames.length, nasty)
    val rows = samples(row, 300)
    val feed = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row.fromSeq(_)), 4),
      graft.sources.SalesFeed.rawSchema)
      .withColumn("_seq", struct(lit(0L).as("f"), monotonically_increasing_id().as("m")))

    val (valid, errors) = ErrorChannel.split(feed, Seq("id"))
    // no exception anywhere in the cleanse/collapse path, whatever the data
    val cust = StarSchema.lastWriteWins(
      StarSchema.customerRows(valid), Seq("source_customer_id"), "_seq")
    val prod = StarSchema.lastWriteWins(
      StarSchema.productRows(valid), Seq("source_product_id"), "_seq")
    val fact = StarSchema.lastWriteWins(
      StarSchema.factRows(valid), Seq("source_sale_id"), "_seq")
    val dates = StarSchema.dateRows(valid)

    // key invariants: no NULL natural keys survive the guards; LWW yields
    // unique keys; every parsed date is a real date
    assert(cust.filter(col("source_customer_id").isNull).count() === 0)
    assert(cust.count() === cust.select(col("source_customer_id")).distinct().count())
    assert(fact.count() === fact.select(col("source_sale_id")).distinct().count())
    assert(prod.count() === prod.select(col("source_product_id")).distinct().count())
    assert(dates.filter(col("sale_date").isNull).count() === 0)
    // error rows carry reference-style messages; split is a partition
    assert(errors.filter(!col("_error").startsWith("error: ")).count() === 0)
    assert(valid.count() + errors.count() === feed.count())
  }

  test("trimToNull fixpoint: output is either NULL or trimmed non-empty") {
    val xs = samples(Gen.asciiPrintableStr, 500)
    val out = xs.toDF("v").select(Cleanse.trimToNull(col("v"))).collect().toSeq
      .map(r => Option(r.getString(0)))
    out.foreach {
      case Some(s) => assert(s.nonEmpty && s === s.trim)
      case None => succeed
    }
  }

  test("exactQuantiles equals the percentile aggregate on randomized frames " +
      "(sizes, duplicates, group counts, quantile sets all drawn)") {
    // the riskiest operator of the two-pass family: every randomized trial
    // compares the histogram-locate + k-th-selection path against Spark's
    // exact aggregate on the SAME frame — bucket-boundary and offset
    // arithmetic bugs show up as any single mismatched group
    for (trial <- 0 until 3) {
      val seed = 1000L + trial
      val nGroups = 1 + (trial * 2) // 1, 3, 5 groups
      val rows = samples(for {
        g <- Gen.chooseNum(0, nGroups - 1)
        // heavy duplication on small ranges mixed with near-unique doubles
        v <- Gen.oneOf(Gen.chooseNum(0, 9).map(_.toDouble),
          Gen.chooseNum(-1e6, 1e6))
      } yield (s"g$g", v), 400 + 100 * trial, seed)
      val d = rows.toDF("grp", "v")
      val qs = Seq("q1" -> 0.013, "q2" -> 0.5, "q3" -> 0.977)
      val got = graft.operators.ApproxQuantile.exactQuantiles(d, "grp", "v", qs,
          buckets = 16) // tiny buckets: many values per bucket, offsets stressed
        .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
      val want = d.groupBy(col("grp")).agg(
          round(expr("percentile(v, 0.013)"), 6).as("q1"),
          round(expr("percentile(v, 0.5)"), 6).as("q2"),
          round(expr("percentile(v, 0.977)"), 6).as("q3"))
        .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
      assert(got === want, s"trial $trial (seed $seed) diverged")
    }
  }
}
