package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time queries (2 runs each — cold incl. codegen/JIT, then
  * warm) or dump formatted plans with -plan. `-jobs` additionally prints
  * every Spark job the warm run launched (wall ms + description) plus the
  * driver-side gap between jobs — the planning/listing/collect time no
  * task metric sees. Not part of the driver contract. */
object DevTime {

  private final class JobLog extends org.apache.spark.scheduler.SparkListener {
    case class J(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[J]
    private val open = new java.util.concurrent.ConcurrentHashMap[Int, J]
    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val d = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      val j = J(e.jobId, d, e.time)
      open.put(e.jobId, j); jobs.add(j): Unit
    }
    override def onJobEnd(
        e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      Option(open.remove(e.jobId)).foreach(_.end = e.time)
    def clear(): Unit = { jobs.clear(); open.clear() }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("DEV_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConfKey, "true") // events TIMESTAMP(NANOS) decode
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.sources.Etl.warehouseDir)
      .config(Tables.listingParallelismKey, Tables.listingParallelism(cpus))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("DEV_SF_DIR", "/root/testdata/sf0.1")
    val (flags, names) = args.partition(_.startsWith("-"))
    val jl = new JobLog
    if (flags.contains("-jobs")) spark.sparkContext.addSparkListener(jl)
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      if (flags.contains("-plan")) {
        println(s"===== PLAN $name =====")
        SparkEntry.queries(name)(spark, d).explain("formatted")
      } else {
        (1 to 2).foreach { i =>
          if (i == 2 && flags.contains("-jobs")) {
            org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
            jl.clear()
          }
          val t0 = System.nanoTime()
          noop(name)
          println(f"TIMING $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        if (flags.contains("-jobs")) {
          org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
          val js = jl.jobs.toArray(Array.empty[jl.J]).sortBy(_.start)
          var prev = 0L
          js.foreach { j =>
            val gap = if (prev == 0L) 0L else j.start - prev
            prev = math.max(prev, j.end)
            val dur = if (j.end > 0) j.end - j.start else -1L
            println(f"  JOB ${j.id}%4d ${dur}%6d ms  (gap ${gap}%5d ms)  ${j.desc.take(90)}")
          }
          println(s"  JOBS total ${js.length}")
        }
      }
    }
    spark.stop()
  }
}
