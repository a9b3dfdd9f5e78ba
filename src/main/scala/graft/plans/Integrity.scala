package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's verification suite as a callable API
  * (reference: README.md:183-219; SURVEY.md §2.4 A1–A4, §2.3 J2).
  */
object Integrity {

  /** A1 — row counts per star table. */
  def rowCounts(tables: Map[String, DataFrame]): Map[String, Long] =
    tables.map { case (n, df) => n -> df.count() }

  /** A2/A3 — fact uniqueness: COUNT(*) vs COUNT(DISTINCT natural key). */
  def uniqueness(fact: DataFrame, key: String): (Long, Long) = {
    val r = fact.agg(count(lit(1)).as("n"), countDistinct(col(key)).as("d")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** J2/A4 — referential-integrity audit: LEFT JOIN the fact to each dim
    * and count dangling (non-NULL FK with no dim row). All broadcast joins:
    * dims are small relative to the fact at every scale.
    * Returns (dimName -> missing count); all must be 0.
    */
  def audit(fact: DataFrame,
            dims: Seq[(String, DataFrame, String /*fk in fact*/, String /*sk in dim*/)]): Map[String, Long] = {
    val row = auditDf(fact, dims).head()
    dims.zipWithIndex.map { case ((name, _, _, _), i) => name -> row.getLong(i) }.toMap
  }

  /** Same audit as a one-row DataFrame (for the driver's oracle compare). */
  def auditDf(fact: DataFrame,
              dims: Seq[(String, DataFrame, String, String)]): DataFrame = {
    val agg = dims.foldLeft(fact) { case (acc, (name, dim, fk, sk)) =>
      acc.join(broadcast(dim.select(col(sk).as(s"_probe_$name"))),
        acc(fk) === col(s"_probe_$name"), "left")
    }
    val sums = dims.map { case (name, _, fk, _) =>
      // coalesce: sum() over an EMPTY fact is NULL and getLong would NPE —
      // an audit run before the first micro-batch must report zeros
      coalesce(
        sum(when(col(fk).isNotNull && col(s"_probe_$name").isNull, 1)
          .otherwise(0)), lit(0L))
        .as(s"missing_$name")
    }
    agg.agg(sums.head, sums.tail: _*)
  }

  /** Data-quality column profile — the audit a pipeline runs on every new
    * ingest before trusting it (null-rate spikes, cardinality collapse,
    * range drift): one row per profiled column with exact null count
    * (strings count empty-after-trim as null, matching the cleanse
    * contract), exact distinct count, and the numeric [min, max].
    *
    * ONE pass over the data. NOTE the multi-column `countDistinct` plans
    * as an Expand (input amplified ×(#distinct aggs)) — exact and fine
    * into the terabytes; past that, swap the distincts for the
    * deterministic HLL sketch ([[graft.functions.HllSketchAgg]], q58) and
    * keep everything else — the same single-pass shape without the
    * expand.
    */
  def columnProfile(df: DataFrame, numCols: Seq[String],
                    strCols: Seq[String]): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty, "profile needs columns")
    val aggs = numCols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"null_$c"),
      countDistinct(col(c)).as(s"dist_$c"),
      min(col(c)).cast("double").as(s"min_$c"),
      max(col(c)).cast("double").as(s"max_$c"))) ++
      strCols.flatMap(c => Seq(
        count(when(col(c).isNull || trim(col(c)) === "", 1)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // backtick-quote derived names and escape the label literal: a column
    // named "total-price" (or one containing a quote) must profile, not
    // throw an AnalysisException from the generated stack()
    def bq(n: String) = "`" + n.replace("`", "``") + "`"
    def lt(n: String) = "'" + n.replace("'", "''") + "'"
    val rows = numCols.map(c =>
      s"${lt(c)}, ${bq(s"null_$c")}, ${bq(s"dist_$c")}, ${bq(s"min_$c")}, ${bq(s"max_$c")}") ++
      strCols.map(c =>
        s"${lt(c)}, ${bq(s"null_$c")}, ${bq(s"dist_$c")}, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
    one.selectExpr("n_rows",
      s"stack(${rows.size}, ${rows.mkString(", ")}) AS (column, n_null, n_distinct, min_num, max_num)")
      .select(col("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"))
  }
}
