package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the executed physical plan of one declared query.
  * Usage: runMain graft.PlanPeek <queryName> [sfDir]
  * Complements PlanSpec — peek here first, then freeze the shape there. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config(Tables.nanosConfKey, "true")
      .appName("plan-peek").getOrCreate()
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
