package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    // Same session posture as production (GraftSession.tune): specs then
    // exercise the plans users actually get — AQE, broadcast threshold,
    // nanosAsLong — instead of a divergent test-only configuration.
    val s = GraftSession.tune(
        SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpecBase extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}
