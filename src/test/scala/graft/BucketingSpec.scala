package graft

import org.apache.spark.sql.functions._
import graft.plans.Bucketing

/** The co-located-join property, asserted on the physical plan: two tables
  * bucketed on the same key with the same bucket count join WITHOUT any
  * exchange — the shuffle that normally dominates a big⋈big join is paid
  * once at write time, never per query. */
class BucketingSpec extends SparkSpec {

  test("date-partitioned writes prune untouched partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("day"),
      s"the day predicate must prune partitions, not filter rows:\n$plan")
    // the pruned scan reads only that day's files
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(q.count() > 0)
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"),
      "day must be a partition column, not a data column")
    assert(scanned.nonEmpty)
  }

  test("same-key bucketed tables join with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"))

    Bucketing.writeBucketed(orders, "graft_b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "graft_b_customer", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcasting so the join would NEED a shuffle if the
      // bucket distributions weren't recognized as compatible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "graft_b_orders")
        .join(Bucketing.table(spark, "graft_b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"broadcast disabled, expected a shuffle-family join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // and it computes the right thing
      val n = joined.count()
      assert(n === orders.count(), s"every order matches exactly one customer, got $n")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
