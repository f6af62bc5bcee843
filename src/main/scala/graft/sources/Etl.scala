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
}
