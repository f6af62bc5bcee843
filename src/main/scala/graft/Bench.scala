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
      .config(Tables.nanosConfKey, "true") // events TIMESTAMP(NANOS) decode
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // per-process private warehouse, deleted on exit (Etl.warehouseDir:
      // bucket metadata cannot outlive the in-memory catalog, so
      // isolation is free and concurrent runs cannot collide)
      .config("spark.sql.warehouse.dir", graft.sources.Etl.warehouseDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture conversions (CSV/ORC/JSON twins, partitioned events copy,
    // bucketed tables) are one-time ETL, not query cost: build them up
    // front and report the time as a separate metric so the per-query
    // numbers measure steady-state reads. A failed build must surface as
    // etl = -1 (the per-query failure convention), NOT as silently
    // inflated per-query timings from lazy in-query rebuilds.
    val etlT0 = System.nanoTime()
    val etlOk =
      try { graft.sources.Etl.prepareFixtures(spark, sfDir); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] etl prepare FAILED: ${e.getMessage}")
        false
      }
    val etlSec = if (etlOk) (System.nanoTime() - etlT0) / 1e9 else -1.0
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
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"etl":$etlSec,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // Also persist the COMPLETE per-query map to a committed file: the
    // round artifact only keeps a truncated stdout tail, which hid 34 of
    // 97 per-query numbers in r3/r4 — regressions in the cut-off families
    // were invisible to round-over-round diffing.
    // default lands next to the code: sbt runs main classes in-process,
    // so user.dir is the project root of whatever checkout ran the bench
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"${sys.props("user.dir")}/BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
