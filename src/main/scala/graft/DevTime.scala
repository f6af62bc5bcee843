package graft
import org.apache.spark.sql.SparkSession
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("DEV_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      println(s"===== PLAN $name =====")
      val df = SparkEntry.queries(name)(spark, d)
      df.explain("formatted")
    }
    spark.stop()
  }
}
