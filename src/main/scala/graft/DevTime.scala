package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time queries (2 runs each — cold incl. codegen/JIT, then
  * warm) or dump formatted plans with -plan. Not part of the driver
  * contract. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConfKey, "true") // events TIMESTAMP(NANOS) decode
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("DEV_SF_DIR", "/root/testdata/sf0.1")
    val (flags, names) = args.partition(_.startsWith("-"))
    names.foreach { name =>
      if (flags.contains("-plan")) {
        println(s"===== PLAN $name =====")
        SparkEntry.queries(name)(spark, d).explain("formatted")
      } else (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, d).count()
        println(f"TIMING $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
