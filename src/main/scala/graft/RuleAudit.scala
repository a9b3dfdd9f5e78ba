package graft
import org.apache.spark.sql.SparkSession

/** Optimizer-rule audit: builds every catalog query's optimized plan
  * under a Bench-shaped session (default broadcast threshold, extensions
  * registered) and reports which ones carry an injected Bloom runtime
  * filter — the "does the new rule silently tax the bench?" check.
  * Round-9 answer at sf0.1: zero (build sides there are either
  * broadcastable or far over the creation cap), so the rule's bench cost
  * is pattern-matching only.
  *
  * Usage: runMain graft.RuleAudit [sfDir]
  */
object RuleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    var hits = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.optimizedPlan.toString
        if (p.contains("might_contain")) { hits += 1; println(s"[ruleaudit] FIRES: $name") }
      } catch { case e: Throwable => println(s"[ruleaudit] ERR $name: ${e.getMessage.take(80)}") }
    }
    println(s"[ruleaudit] done, $hits queries with injected bloom filters")
    spark.stop()
  }
}
