package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ETL utilities — the reference's `csv_to_parquet.py` (CSV with header +
  * inferSchema → snappy parquet, csv_to_parquet.py:7-13) re-expressed, plus
  * the scale-aware variants a 100 TB ingest actually needs.
  */
object Etl {

  /** Literal port of the reference ETL: one CSV directory → snappy parquet.
    * Schema inference costs an extra pass over the input — fine for a
    * one-time conversion, wrong for repeated ingest (see
    * `csvToParquetWithSchema`). */
  def csvToParquet(spark: SparkSession, csvPath: String,
      parquetPath: String): Unit =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(csvPath)
      .write
      .option("compression", "snappy")
      .mode(SaveMode.Overwrite)
      .parquet(parquetPath)

  /** Production-shape ingest: explicit schema (no inference pass — at
    * 100 TB the inference scan alone is hours), optional partitioning
    * column for downstream partition pruning, and a target in-file row
    * group sizing via maxRecordsPerFile. */
  def csvToParquetWithSchema(spark: SparkSession, csvPath: String,
      schemaDdl: String, parquetPath: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = spark.read
      .option("header", "true")
      .schema(schemaDdl)
      .csv(csvPath)
      .write
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(parquetPath)
  }

  /** Cached CSV copy of a parquet fixture table, for the CSV-source twin
    * queries (the reference measured every query on both formats). */
  def csvFixture(spark: SparkSession, sfDir: String, table: String): String =
    fixture(spark, sfDir, table, "csv")

  /** Cached alternate-format copy of a fixture table (`csv`, `json`
    * (JSON-lines), `orc`) for source-twin queries.
    *
    * Publication is atomic and staleness-safe: the copy is written to a
    * fresh temp dir and renamed into place, and is rebuilt whenever the
    * source parquet is newer than the copy's `_SUCCESS` marker — a bare
    * `exists()` check would trust a stale copy after fixture regeneration,
    * or a torn one from a crashed writer. */
  def fixture(spark: SparkSession, sfDir: String, table: String,
      format: String): String =
    cachedFixture(sfDir, s"$table-$format", s"$sfDir/$table.parquet") { tmp =>
      val w = graft.Tables.read(spark, sfDir, table)
        .write.mode(SaveMode.Overwrite)
      (if (format == "csv") w.option("header", "true") else w)
        .format(format).save(tmp.getAbsolutePath)
    }

  /** Cached copy of `events` as a date-partitioned parquet table
    * (`event_date=YYYY-MM-DD/` directories) — the layout a production
    * event store uses so date filters prune whole partitions at plan
    * time instead of scanning 100 TB to discard 97% of it. */
  def eventsByDayFixture(spark: SparkSession, sfDir: String): String =
    cachedFixture(sfDir, "events-byday", s"$sfDir/events.parquet") { tmp =>
      import org.apache.spark.sql.functions.{col, date_format}
      graft.Tables.read(spark, sfDir, "events")
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_date")
        .parquet(tmp.getAbsolutePath)
    }

  private def cachedFixture(sfDir: String, key: String, srcPath: String)(
      write: java.io.File => Unit): String = {
    val safe = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val target = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_fix_$safe/$key")
    val success = new java.io.File(target, "_SUCCESS")
    val srcMtime = new java.io.File(srcPath).lastModified
    if (!success.exists() || success.lastModified < srcMtime) {
      val tmp = new java.io.File(target.getParentFile,
        s"$key.tmp-${java.util.UUID.randomUUID()}")
      tmp.getParentFile.mkdirs()
      write(tmp)
      deleteRecursively(target)
      // if the rename loses a concurrent-writer race, the winner's copy
      // (also complete — it renamed a finished dir) is used instead
      if (!tmp.renameTo(target)) deleteRecursively(tmp)
    }
    target.getAbsolutePath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
