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
  }
}

object GraftExtensions {
  private[functions] val dotProductInfo =
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
  private[functions] val dotProductBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "dot_product(a, b) takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Register graft functions on an already-built session (the extensions
    * class only hooks construction). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "dot_product", dotProductInfo, dotProductBuilder)
}
