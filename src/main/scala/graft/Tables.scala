package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table reader for the driver-generated testdata
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §B).
  *
  * Scale notes (100 TB design stance): all reads are plain parquet scans so
  * Catalyst's FileSourceStrategy gets full predicate pushdown + column
  * pruning; callers `.select(...)` / `.filter(...)` immediately after the
  * read so `PushedFilters`/`ReadSchema` stay tight. No caching here — at
  * 100 TB a cached base table is a liability; each query plans its own scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") readEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Session conf every graft entry point must set at SESSION CONSTRUCTION
    * (`SparkSession.builder().config(nanosConfKey, "true")`): the driver
    * regenerates the events fixture each round and has shipped `ts` as
    * TIMESTAMP(NANOS) (through r7), which Spark's parquet reader rejects
    * by default; under this conf it decodes as long (readEvents then
    * floor-divides to micros). Harmless when the fixture is micros (the
    * r8 shape). Set here as a constant — NOT mutated at read time — so
    * reading a table never has a spooky shared-session side effect; a
    * session built without it fails loudly on the first nanos events
    * read with Spark's own "Illegal Parquet type: INT64
    * (TIMESTAMP(NANOS,...))". */
  val nanosConfKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** File-listing job parallelism for every graft session
    * (`spark.sql.sources.parallelPartitionDiscovery.parallelism`).
    * Spark's default is 10000 — sized so a large CLUSTER can fan a huge
    * object-store listing across its executors, but on a single-node
    * session it degenerates to ONE TASK PER PATH: listing the ~2731
    * explicit manifest paths of one commit cost 4.8 s of pure task-
    * scheduling overhead (r17 job profile — the single largest cost in
    * `q_time_travel_chain`, and every partitioned/manifest read paid
    * it). Scale-adaptive: a few listing tasks per core (floor 32);
    * `SPARK_GRAFT_LISTING_PAR` overrides for cluster deployments where
    * a higher fan-out genuinely pays. */
  def listingParallelism(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_LISTING_PAR",
      math.max(32, 4 * cpus.toInt).toString)

  val listingParallelismKey =
    "spark.sql.sources.parallelPartitionDiscovery.parallelism"

  /** Normalizes `ts` to a session-tz TIMESTAMP whatever the parquet
    * writer chose, schema-driven per branch:
    *
    *  - TIMESTAMP(NANOS): under `nanosConfKey` (set at session
    *    construction — see above) it decodes as long; floor-divided to
    *    micros — the same truncation DuckDB applies loading nanos into
    *    its microsecond type, so both engines see identical `ts`. (The
    *    pmod form is true floor division; a bare `div` truncates toward
    *    zero and would diverge from DuckDB by 1µs on pre-1970 nanos.)
    *    CONTRACT: a long-typed `ts` is interpreted as epoch NANOS —
    *    a table storing raw BIGINT epoch-micros must convert upstream
    *    (the logical-type annotation is gone by DataFrame level, so the
    *    two are indistinguishable here).
    *  - TIMESTAMP_NTZ (tz-naive micro/milli — pyarrow's default
    *    `timestamp[us]`, the current driver fixture): cast to
    *    TIMESTAMP. Every graft session pins
    *    `spark.sql.session.timeZone=UTC`, so the cast reinterprets the
    *    naive value as the same UTC instant DuckDB reads — bit-exact.
    *  - TIMESTAMP (tz-adjusted — any normal source): untouched. */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(
              "(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Register every table as a temp view (reference S5 shape:
    * `registerTempTable`, query1.py:93). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => read(spark, sfDir, n).createOrReplaceTempView(n))
}
