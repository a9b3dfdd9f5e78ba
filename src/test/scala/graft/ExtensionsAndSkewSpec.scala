package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** SQL-registry extension wiring + skew-salting aggregates. */
class ExtensionsAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product is callable from SQL via GraftExtensions injection") {
    // inject into the existing session's registry through the extension
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    // direct registry registration path (same builder hook the config uses)
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(e.head, e(1)))
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM vecs").collect().head.getDouble(0)
    assert(r === 11.0)
  }

  test("salted aggregates equal their unsalted counterparts on skewed data") {
    // hot key: 10k rows on one key, a handful elsewhere
    val df = ((1 to 10000).map(i => ("hot", i % 100)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("k", "v")

    val plainCount = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedCount = Skew.saltedCount(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedCount === plainCount)

    val plainSum = df.groupBy("k").agg(sum("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedSum = Skew.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedSum === plainSum)

    val plainSet = df.groupBy("k").agg(collect_set("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).sorted).toMap
    val saltedSet = Skew.saltedCollectSet(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).sorted).toMap
    assert(saltedSet === plainSet)
  }

  test("salting spreads the hot key across buckets (the scale property)") {
    val df = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val buckets = df.withColumn("_salt",
      pmod(xxhash64(col("k"), col("v")), lit(32)).cast("int"))
      .select("_salt").distinct().count()
    assert(buckets > 20, s"hot key must spread over many salt buckets, got $buckets")
  }
}
