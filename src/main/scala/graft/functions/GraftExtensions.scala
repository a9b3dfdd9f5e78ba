package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native graft
  * expressions with the SQL function registry, so they are callable from
  * `spark.sql` (not only the Column API):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * spark.sql("SELECT dot_product(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      GraftExtensions.dotProductInfo,
      GraftExtensions.dotProductBuilder))
    // banded theta joins (abs(a.t - b.t) <= w with no equi key) rewrite to
    // the bucketed equi-join instead of a nested-loop plan
    ext.injectOptimizerRule(_ => graft.plans.BandedThetaJoinRule)
  }
}

object GraftExtensions {
  private[functions] val dotProductInfo =
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
  private[functions] val dotProductBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "dot_product(a, b) takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Register graft functions AND the banded-theta-join optimizer rule on
    * an already-built session (the extensions class only hooks
    * construction; `experimental.extraOptimizations` is the sanctioned
    * post-hoc injection point for optimizer rules). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "dot_product", dotProductInfo, dotProductBuilder)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.BandedThetaJoinRule))
      spark.experimental.extraOptimizations = cur :+ graft.plans.BandedThetaJoinRule
  }
}
