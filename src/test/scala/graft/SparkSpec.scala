package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for all specs (getOrCreate reuses one JVM-wide
  * session — see GraftSession's scaladoc). 4 cores keeps test startup
  * cheap; queries under test are SF-independent logic, not throughput.
  */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
