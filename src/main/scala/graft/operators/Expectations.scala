package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the Deequ/Great-
  * Expectations shape re-expressed as plain aggregates: a suite of named
  * row-level validity predicates plus key-uniqueness constraints, all
  * evaluated against a table in a FIXED number of passes, returning one
  * verdict row per rule. The reference's integrity checks
  * (`README.md:183-219` — null-key counts, orphan FKs, duplicate
  * natural keys) are instances of this surface; the suite generalizes
  * them into the pipeline gate a 100 TB ingest wants: "run the contract,
  * branch on `pass`".
  */
object Expectations {

  /** A named row-level expectation: `valid` evaluates per row; NULL
    * counts as a VIOLATION (ternary logic would otherwise let an
    * unexpected NULL sail through a range check). */
  final case class Rule(name: String, valid: Column)

  /** Evaluate `rules` in ONE aggregate pass over `df` (every rule is a
    * conditional count in the same hash-aggregate — map-side partial,
    * one row out), plus one count-distinct pass per `uniqueKeys` entry
    * (rows whose key tuple occurs more than once are violations; rows
    * with any NULL key component are counted by a paired
    * `<name>_key_complete` rule instead, keeping the two failure modes
    * separately actionable).
    *
    * Output: (rule STRING, n_rows BIGINT, n_violations BIGINT,
    * pass BOOLEAN), one row per rule — deterministic trivially (exact
    * counts only). Scale: row rules cost one scan regardless of rule
    * count; each uniqueness key costs one (key → count) aggregate whose
    * shuffle carries only keys and counts. */
  def audit(df: DataFrame, rules: Seq[Rule],
            uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "empty expectation suite")
    val rowVerdicts: Option[DataFrame] = Option.when(rules.nonEmpty) {
      val aggs = count(lit(1)).as("_n") +:
        rules.zipWithIndex.map { case (r, i) =>
          sum(when(coalesce(r.valid, lit(false)), 0L).otherwise(1L)).as(s"_v$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single verdict row: explode an array of per-rule structs
      val verdictStructs = rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col("_n").as("n_rows"),
          coalesce(col(s"_v$i"), lit(0L)).as("n_violations"))
      }
      one.select(explode(array(verdictStructs: _*)).as("_r"))
        .select(col("_r.rule"), col("_r.n_rows"), col("_r.n_violations"))
    }
    val uniqVerdicts: Seq[DataFrame] = uniqueKeys.map { case (name, keys) =>
      require(keys.nonEmpty, s"uniqueness rule $name needs key columns")
      val keyCols = keys.map(col)
      val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
      val total = df.agg(count(lit(1)).as("_n"),
        sum(when(nonNull, 0L).otherwise(1L)).as("_nullKeys"))
      val dupRows = df.filter(nonNull)
        .groupBy(keyCols: _*).agg(count(lit(1)).as("_c"))
        .filter(col("_c") > 1)
        .agg(coalesce(sum(col("_c")), lit(0L)).as("_dups"))
      total.crossJoin(dupRows).select(
        explode(array(
          struct(lit(s"${name}_key_complete").as("rule"),
            col("_n").as("n_rows"), col("_nullKeys").as("n_violations")),
          struct(lit(name).as("rule"),
            col("_n").as("n_rows"), col("_dups").as("n_violations")))).as("_r"))
        .select(col("_r.rule"), col("_r.n_rows"),
          coalesce(col("_r.n_violations"), lit(0L)).as("n_violations"))
    }
    (rowVerdicts.toSeq ++ uniqVerdicts)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
