package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (Sessions.local is a getOrCreate, so all suites
  * in one forked JVM share the session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
  lazy val sf: String = "/root/testdata/sf0.001"
}
