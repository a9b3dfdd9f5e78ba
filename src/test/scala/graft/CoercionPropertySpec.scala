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

  test("trimToNull fixpoint: output is either NULL or trimmed non-empty") {
    val xs = samples(Gen.asciiPrintableStr, 500)
    val out = xs.toDF("v").select(Cleanse.trimToNull(col("v"))).collect().toSeq
      .map(r => Option(r.getString(0)))
    out.foreach {
      case Some(s) => assert(s.nonEmpty && s === s.trim)
      case None => succeed
    }
  }
}
