package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for unit tests. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf0001 = "/root/testdata/sf0.001"
  lazy val sf001 = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force in-memory collections to REALLY spill past 300k elements so
      // spill paths are testable (TopKFallbackSpec); fixture suites stay
      // far below this, so only the deliberately-oversized specs pay it
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "300000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
