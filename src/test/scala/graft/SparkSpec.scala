package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, getOrCreate
  * dedups across suites). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
