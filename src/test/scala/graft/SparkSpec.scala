package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session: Spark
  * startup dominates test wall-clock otherwise). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local("graft-test", 4)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
}
