package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.Tables

/** Declared-query wrappers around the `StreamingOps` pipelines: each runs
  * the REAL Structured Streaming query (MemoryStream source → transform →
  * sink, micro-batches, watermarks, state store) over the events fixture
  * and returns the sink as a batch DataFrame, with the equivalent batch
  * SQL as its DuckDB oracle. This is what puts the streaming tier under
  * the same hard correctness gate as every batch operator — the
  * batch/stream equivalence StreamingSpec asserts on toy fixtures, the
  * driver now hash-verifies on the full fixture.
  *
  * Scale stance: MemoryStream is the documented local harness (no Kafka
  * in this environment) and is driver-resident BY DEFINITION — the
  * driver-side collect feeding it is harness cost, not operator cost; in
  * production the source swaps to `readStream.format("kafka")` and every
  * pipeline here is already partitioned/watermarked for unbounded input
  * (state is O(active keys or windows), never O(stream length)). Sinks
  * are kept small by aggregating in (or right after) the stream, so the
  * memory sink never holds more than the aggregate's cardinality except
  * for the dedup pass-through, which is fixture-sized by design. */
object StreamingQueries {

  final case class EvRow(event_id: Long, user_id: Long, ts: Timestamp,
    event_type: String, value: Double)

  private def eventRows(spark: SparkSession, sfDir: String): Seq[EvRow] = {
    import spark.implicits._
    Tables.read(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .as[EvRow].collect().toSeq
  }

  private def micros(ts: Timestamp): Long = StreamingOps.micros(ts)

  /** Run one streaming query to completion: each element of `batches`
    * becomes (at least) one micro-batch, the memory sink is read back as
    * a DataFrame. The sink name is deterministic per query key (and the
    * previous run's view is dropped) so repeated invocations — bench
    * warm-up + timed pass — can't accumulate sinks or collide.
    *
    * The stream's state layout is pinned to 8 partitions for the
    * query's lifetime (scoped save/restore around `start()` — the conf
    * is captured at query start, so concurrent batch plans on the
    * session are unaffected): stateful operators run one state store
    * per shuffle partition (FOUR for a stream-stream join) and the
    * per-micro-batch commit overhead of 32 mostly-empty stores, not the
    * data, dominates at harness scale. At production scale this knob is
    * sized to the cluster. */
  private def startToSink(spark: SparkSession, key: String,
      mode: OutputMode, df: DataFrame)
      : (String, org.apache.spark.sql.streaming.StreamingQuery) = {
    val name = s"graft_sink_$key"
    spark.catalog.dropTempView(name)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        df.writeStream.format("memory").queryName(name)
          .outputMode(mode).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    (name, q)
  }

  private def runStream[T: Encoder](spark: SparkSession, key: String,
      batches: Seq[Seq[T]], mode: OutputMode)(
      pipeline: Dataset[T] => DataFrame): DataFrame = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[T]
    val (name, q) = startToSink(spark, key, mode, pipeline(src.toDS()))
    try batches.foreach { b => src.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  /** Watermarked tumbling-window aggregation, run as a stream (complete
    * mode — the memory sink holds the final windows; the watermark is
    * exercised but eviction isn't needed for a finite fixture). Oracle =
    * the batch tumbling-window SQL (`ev_window_tumbling`'s). */
  def windowTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = runStream(spark, "window_tumbling",
      Seq(eventRows(spark, sfDir)), OutputMode.Complete()) { ds =>
      StreamingOps.windowedCounts(ds.toDF())
    }
    out.select($"hour_start".cast("string").as("hour_start"),
      $"event_type", $"cnt", $"sum_value")
      .orderBy($"hour_start".asc, $"event_type".asc)
  }

  /** Streaming dedup under REDELIVERY: the full fixture is delivered
    * twice (batch 2 replays batch 1 — the at-least-once upstream every
    * exactly-once pipeline has to absorb); `dropDuplicatesWithinWatermark`
    * must emit each event_id exactly once. The sink (one row per unique
    * event) is then aggregated per type, so the oracle is simply the
    * batch aggregate over the UN-duplicated fixture. */
  def dedupRedelivery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = eventRows(spark, sfDir)
    val out = runStream(spark, "dedup", Seq(rows, rows),
      OutputMode.Append()) { ds =>
      StreamingOps.dedupStream(ds.toDF())
    }
    out.groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"value".cast("decimal(20,6)")), 4).cast("double")
          .as("sum_value"))
      .orderBy($"event_type".asc)
  }

  /** Stream-static enrichment + streaming aggregate: each micro-batch
    * joins the BROADCAST customer dim (map-side, shuffle-free), the
    * running per-segment aggregate is emitted in complete mode. Oracle =
    * the batch left join + group-by. */
  def enrichAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.read(spark, sfDir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val out = runStream(spark, "enrich",
      Seq(eventRows(spark, sfDir)), OutputMode.Complete()) { ds =>
      StreamingOps.enrichWithDim(ds.toDF(), dim)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          round(sum($"value".cast("decimal(20,6)")), 4).cast("double")
            .as("sum_value"))
    }
    out.orderBy($"c_mktsegment".asc)
  }

  /** `flatMapGroupsWithState` sessionization run to event-time-timeout
    * completion: after the fixture batch, two far-future sentinel events
    * (user −1) advance the watermark so every real session closes and
    * emits — watermark N is derived from data through batch N−1, hence
    * TWO sentinels: the first makes the closing watermark, the second
    * makes it current. Output is the per-user (session count, event
    * count) rollup of the emitted closed sessions — integers only; the
    * oracle is the batch lag+running-sum sessionizer SQL. */
  def sessionizeToCompletion(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import spark.implicits._
    val rows = eventRows(spark, sfDir)
    require(rows.nonEmpty, "events fixture is empty")
    val maxUs = rows.iterator.map(r => micros(r.ts)).max
    def sentinel(plusMin: Long) = StreamingOps.Ev(-1L,
      new Timestamp(maxUs / 1000L + plusMin * 60000L), 0.0)
    val evs = rows.map(r => StreamingOps.Ev(r.user_id, r.ts, r.value))
    // +41 min: past every lastEvent+gap(30)+watermark(10) horizon
    val out = runStream(spark, "sessionize",
      Seq(evs, Seq(sentinel(41)), Seq(sentinel(120))),
      OutputMode.Append()) { ds =>
      StreamingOps.sessionize(ds, gapMinutes = 30).toDF()
    }
    out.filter($"closed" && $"user_id" >= 0)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .orderBy($"user_id".asc)
  }

  /** `mapGroupsWithState` CDC upsert view, one delivery of the full
    * change log: update mode emits each key's latest record once per
    * batch it changed in — with a single batch, the sink IS the final
    * upsert table. Same output shape and oracle as the batch
    * `ev_cdc_compact` argmax aggregate. */
  def cdcUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cdc = eventRows(spark, sfDir)
      .map(r => StreamingOps.Cdc(r.user_id, r.event_id, r.ts, r.event_type))
    val out = runStream(spark, "cdc", Seq(cdc), OutputMode.Update()) { ds =>
      StreamingOps.latestPerKey(ds).toDF()
    }
    out.select($"user_id", $"n_versions", $"last_event_id",
      $"last_event_type", $"last_ts".cast("string").as("last_ts"))
      .orderBy($"user_id".asc)
  }

  /** Watermarked stream-stream join: the purchases stream joined to the
    * clicks stream (same user, click within the preceding 30 minutes),
    * both sides fed from the fixture and run through the real
    * symmetric-hash join with per-side watermarks; the sink (one row per
    * qualifying pair) rolls up to pairs-per-user. Oracle = the batch
    * inequality join. */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = eventRows(spark, sfDir)
    val clicks = rows.filter(_.event_type == "click")
      .map(r => (r.user_id, r.ts, r.event_id))
    val purchases = rows.filter(_.event_type == "purchase")
      .map(r => (r.user_id, r.ts, r.event_id))
    val cs = MemoryStream[(Long, Timestamp, Long)]
    val ps = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingOps.clickAttribution(
      cs.toDF().toDF("c_user", "c_ts", "c_id"),
      ps.toDF().toDF("p_user", "p_ts", "p_id"))
    // two sources, so the single-source runStream doesn't fit — but the
    // pinned-layout start/sink scaffolding is shared (a stream-stream
    // join runs FOUR state stores per shuffle partition, the case the
    // 8-partition pin exists for)
    val (name, q) = startToSink(spark, "stream_join",
      OutputMode.Append(), joined)
    try {
      cs.addData(clicks)
      ps.addData(purchases)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .groupBy($"p_user")
      .agg(count(lit(1)).as("n_pairs"))
      .select($"p_user".as("user_id"), $"n_pairs")
      .orderBy($"user_id".asc)
  }

  /** The `foreachBatch` generational incremental-agg sink, driven with
    * the same before/after-cutoff split as the batch `ev_incremental_agg`
    * (batch 0 = history, batch 1 = the delta): after both commits the
    * LAST generation is read back as the result. The oracle is the
    * from-scratch single-pass recompute — proving state_v1 = merge(
    * state_v0, delta) is exact. */
  def incrementalSink(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cutUs = java.time.Instant.parse("2024-01-20T00:00:00Z")
      .getEpochSecond * 1000000L
    val rows = eventRows(spark, sfDir)
    val (hist, delta) = rows.partition(r => micros(r.ts) < cutUs)
    require(hist.nonEmpty && delta.nonEmpty,
      "cutoff must split the fixture into two non-empty batches")
    val stateRoot = java.nio.file.Files
      .createTempDirectory("graft_stream_inc").toString
    val src = MemoryStream[EvRow]
    val q = StreamingOps.incrementalAggSink(src.toDF(), stateRoot)
    try {
      src.addData(hist)
      q.processAllAvailable()
      src.addData(delta)
      q.processAllAvailable()
    } finally q.stop()
    // materialize the final generation (one row per user — tiny), then
    // delete the temp state dir: returning a lazy reader over it would
    // leak one dir per invocation across bench warm+timed runs
    val result = spark.read.parquet(s"$stateRoot/state_v1")
      .select($"user_id", $"n".as("n_total"),
        round($"s", 4).cast("double").as("total_value"))
      .orderBy($"user_id".asc)
    val resultRows = result.collectAsList()
    val schema = result.schema
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(stateRoot))
    spark.createDataFrame(resultRows, schema)
  }
}
