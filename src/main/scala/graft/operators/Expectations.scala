package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

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

  /** Evaluate `rules` in ONE aggregate pass over `df` — every row rule
    * AND every uniqueness key's NULL-component count is a conditional
    * sum in the same hash-aggregate (map-side partial, one row out) —
    * plus exactly one (key → count) aggregate per `uniqueKeys` entry
    * for the duplicate counts (rows whose key tuple occurs more than
    * once are violations; NULL key components land in the paired
    * `<name>_key_complete` rule instead, keeping the two failure modes
    * separately actionable). Rule names must be distinct across the
    * whole suite — the streaming sink merges on (batch_id, rule).
    *
    * Output: (rule STRING, n_rows BIGINT, n_violations BIGINT,
    * pass BOOLEAN), one row per rule — deterministic trivially (exact
    * counts only). Scale: row rules cost one scan regardless of rule
    * count; each uniqueness key costs one (key → count) aggregate whose
    * shuffle carries only keys and counts. */
  def audit(df: DataFrame, rules: Seq[Rule],
            uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "empty expectation suite")
    uniqueKeys.foreach { case (name, keys) =>
      require(keys.nonEmpty, s"uniqueness rule $name needs key columns") }
    // rule names must be globally distinct (incl. the derived
    // <name>_key_complete rows): a collision would fan out the
    // (batch_id, rule)-keyed MERGE in StreamingAudit's sink on replay
    val allNames = rules.map(_.name) ++
      uniqueKeys.flatMap { case (n, _) => Seq(n, s"${n}_key_complete") }
    require(allNames.distinct.size == allNames.size,
      s"duplicate rule names in the suite: ${allNames.diff(allNames.distinct).distinct}")
    // ONE pass for every per-row count: row rules AND each uniqueness
    // key's NULL-component count ride the same aggregate
    val rowAggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(coalesce(r.valid, lit(false)), 0L).otherwise(1L)).as(s"_v$i")
    }
    val keyAggs = uniqueKeys.zipWithIndex.map { case ((_, keys), i) =>
      val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
      sum(when(nonNull, 0L).otherwise(1L)).as(s"_k$i")
    }
    val aggs = count(lit(1)).as("_n") +: (rowAggs ++ keyAggs)
    val one = df.agg(aggs.head, aggs.tail: _*)
      .materialized // joined by every uniqueness verdict
    val rowVerdictStructs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("_n").as("n_rows"),
        coalesce(col(s"_v$i"), lit(0L)).as("n_violations"))
    } ++ uniqueKeys.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(s"${name}_key_complete").as("rule"), col("_n").as("n_rows"),
        coalesce(col(s"_k$i"), lit(0L)).as("n_violations"))
    }
    val rowVerdicts = one.select(explode(array(rowVerdictStructs: _*)).as("_r"))
      .select(col("_r.rule"), col("_r.n_rows"), col("_r.n_violations"))
    // per uniqueness key: ONE (key -> count) aggregate; totals come from
    // the shared row pass above
    val uniqVerdicts: Seq[DataFrame] = uniqueKeys.map { case (name, keys) =>
      val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
      val dupRows = df.filter(nonNull)
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
        .filter(col("_c") > 1)
        .agg(coalesce(sum(col("_c")), lit(0L)).as("_dups"))
      one.select(col("_n")).crossJoin(dupRows)
        .select(lit(name).as("rule"), col("_n").as("n_rows"),
          col("_dups").as("n_violations"))
    }
    (rowVerdicts +: uniqVerdicts)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Functional-dependency audit — "does LHS determine RHS?" as a
    * verdict row per claimed dependency: the schema-contract companion
    * to [[audit]] (uniqueness is the special case LHS = key, RHS = the
    * whole row). A NULL on either side is excluded up front — FD
    * semantics over NULLs are ambiguous, and the null-completeness rule
    * belongs to [[audit]].
    *
    * One (LHS → distinct-RHS, rows) aggregate per dependency, then a
    * one-row summary fold — two key-partitioned aggregates each, no
    * joins. Output per FD: `fd` (name), `n_groups`, `violating_groups`
    * (LHS values mapping to >1 RHS), `violating_rows` (rows under those
    * LHS values), `max_rhs_per_group`. */
  def fdAudit(df: DataFrame, fds: Seq[(Seq[String], String)]): DataFrame = {
    require(fds.nonEmpty, "need at least one functional dependency")
    fds.map { case (lhs, rhs) =>
      require(lhs.nonEmpty, s"FD for '$rhs' needs LHS columns")
      val name = s"${lhs.mkString(",")}->$rhs"
      val nonNull = (lhs :+ rhs).map(col(_).isNotNull).reduce(_ && _)
      df.filter(nonNull)
        .groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("_d"), count(lit(1)).as("_n"))
        .agg(lit(name).as("fd"),
          count(lit(1)).as("n_groups"),
          coalesce(sum((col("_d") > 1L).cast("long")), lit(0L))
            .as("violating_groups"),
          coalesce(sum(when(col("_d") > 1L, col("_n")).otherwise(0L)),
            lit(0L)).as("violating_rows"),
          coalesce(max(col("_d")), lit(0L)).as("max_rhs_per_group"))
    }.reduce(_ unionByName _)
  }
}
