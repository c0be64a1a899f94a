package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.GraftSession.builder("local[4]", 4)
      .appName(getClass.getSimpleName)
      .getOrCreate()

  def sf0001 = "/root/testdata/sf0.001"
}
