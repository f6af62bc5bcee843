package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — suites
  * run sequentially under `Test / fork := true`). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConfKey, "true") // events TIMESTAMP(NANOS) decode
      .config("spark.ui.enabled", "false")
      .config(Tables.listingParallelismKey, Tables.listingParallelism("4"))
      .config("spark.sql.warehouse.dir", graft.sources.Etl.warehouseDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
  /** The denser second-scale fixture for tests whose claim only holds
    * past the sparse-grid regime (curve-layout comparisons etc.). */
  val sfDense: String = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf

  /** Order-insensitive DataFrame equality on collected rows. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"column mismatch: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val ra = a.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val rb = b.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(ra.length == rb.length, s"row count ${ra.length} vs ${rb.length}")
    ra.zip(rb).foreach { case (x, y) => assert(x == y, s"row $x != $y") }
  }
}
