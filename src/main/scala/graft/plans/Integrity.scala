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
      sum(when(col(fk).isNotNull && col(s"_probe_$name").isNull, 1).otherwise(0))
        .as(s"missing_$name")
    }
    agg.agg(sums.head, sums.tail: _*)
  }
}
