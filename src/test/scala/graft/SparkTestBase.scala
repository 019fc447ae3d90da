package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy, reused across suites within
  * the same JVM via getOrCreate). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every test-suite StateStore merge asserts the span-coverage contract
    // (StateStore.mergeReplaceReturning scaladoc); off on the prod hot path
    .config("spark.graft.store.verifyMergeSpan", "true")
    .getOrCreate()
}
