package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // process-scoped warehouse: the bucketed-table build (Etl
      // .bucketedOrderTables) can only ever touch this run's own artifacts
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_wh_${java.util.UUID.randomUUID()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture conversions (CSV/ORC/JSON twins, partitioned events copy,
    // bucketed tables) are one-time ETL, not query cost: build them up
    // front and report the time as a separate metric so the per-query
    // numbers measure steady-state reads.
    val etlT0 = System.nanoTime()
    try graft.sources.Etl.prepareFixtures(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] etl prepare FAILED: ${e.getMessage}")
    }
    val etlSec = (System.nanoTime() - etlT0) / 1e9
    // noop sink: forces full evaluation of every output column (a bare
    // count() would let Catalyst prune the per-row work entirely).
    // Returns success — a failed query must surface in the JSON (as -1 and
    // in "failed"), not read as a near-zero "speedup".
    def run(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        false
      }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // untimed warm-up pass: JIT + codegen compilation are per-query
    // one-time costs; the timed pass below measures steady-state
    // throughput (disable with SPARK_GRAFT_WARMUP=0).
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      ordered.foreach { case (name, fn) => run(name, fn) }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = run(name, fn)
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"etl":$etlSec,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
