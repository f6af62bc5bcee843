package graft

import org.apache.spark.sql.functions._
import graft.operators.RefQueries

/** AQE runtime re-planning: the skew-join split — at 100 TB the hot-key
  * half of the skew story (qSkewSaltedAgg covers aggregation skew).
  *
  * The split works at MAP-OUTPUT granularity: a skewed reduce partition
  * is subdivided along mapper boundaries, so the input must come from
  * several map tasks (the single-file sf0.01 fixture scan is one mapper
  * and physically cannot be split — exactly why this matters only at
  * scale, where scans have thousands of mappers). The mechanism is
  * demonstrated on a controlled 8-mapper skewed input of the same join
  * shape as `qSkewJoin`; the declared query itself is hash-gated by its
  * DuckDB oracle. */
class AqeSpec extends SparkSpec {

  private val skewConfs = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.5",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  private def withSkewConfs[T](body: => T): T = {
    val conf = spark.conf
    val saved = skewConfs.map { case (k, _) => k -> conf.getOption(k) }
    try {
      skewConfs.foreach { case (k, v) => conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a skewed sort-merge join") {
    withSkewConfs {
      import spark.implicits._
      // 99% of rows on key 20, produced by 8 map tasks with a ~40-byte
      // payload so the hot partition is hot in shuffle bytes
      val ev = spark.range(0, 100000, 1, 8)
        .select(
          when($"id" % 100 < 99, lit(20L)).otherwise($"id" % 20).as("k"),
          concat(lit("payload-"), $"id").as("props"))
      val dim = spark.range(0, 21)
        .select($"id".as("k"), concat(lit("seg"), $"id" % 5).as("seg"))
      val df = ev.join(dim, Seq("k"))
        .groupBy($"seg")
        .agg(count(lit(1)).as("cnt"),
          sum(length($"props")).as("props_bytes"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    }
  }

  test("q_skew_join result is identical with skew-split thresholds active") {
    val base = RefQueries.qSkewJoin(spark, sf).collect().toSeq
    val underSkewConfs =
      withSkewConfs(RefQueries.qSkewJoin(spark, sf).collect().toSeq)
    assert(base == underSkewConfs)
  }
}
