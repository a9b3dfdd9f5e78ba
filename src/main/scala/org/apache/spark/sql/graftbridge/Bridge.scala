package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]`; custom Catalyst expressions still need them to expose a
  * Column API. This is the one sanctioned touch-point — no Spark internals
  * are re-implemented here.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking Observation read (`getOrEmpty` went `private[sql]` in
    * Spark 4): empty map until the listener bus delivers the metrics of the
    * observed action. Callers poll briefly and fall back to an explicit
    * job — never the unbounded wait of the public `get`. */
  def observationResult(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty

  /** Register a function on an ALREADY-BUILT session (SparkSessionExtensions
    * only hooks session construction; `sessionState` is private[sql], hence
    * bridged here). Idempotent — re-registration overwrites. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
