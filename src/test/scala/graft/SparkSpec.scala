package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared spark session for all suites (one JVM-wide session; getOrCreate
  * returns the same instance, so suites can run in any order).
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean = math.abs(a - b) <= eps
}
