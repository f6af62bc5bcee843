package graft

import java.nio.file.Files
import graft.sources.Etl

/** S1/S3 ETL parity (reference csv_to_parquet.py): CSV → snappy parquet
  * roundtrip preserves rows, plus the explicit-schema + partitioned
  * production variant. Also covers the GraftExtensions registration. */
class EtlSpec extends SparkSpec {

  test("csv -> parquet roundtrip preserves data (inferred schema)") {
    val dir = Files.createTempDirectory("graft-etl").toString
    val src = Tables.read(spark, sf, "nation")
    src.write.option("header", "true").csv(s"$dir/nation_csv")
    Etl.csvToParquet(spark, s"$dir/nation_csv", s"$dir/nation_parquet")
    val back = spark.read.parquet(s"$dir/nation_parquet")
    assert(back.count() == src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
  }

  test("csv -> parquet with explicit schema and partitioning") {
    val dir = Files.createTempDirectory("graft-etl2").toString
    Tables.read(spark, sf, "region")
      .write.option("header", "true").csv(s"$dir/region_csv")
    Etl.csvToParquetWithSchema(spark, s"$dir/region_csv",
      "r_regionkey INT, r_name STRING", s"$dir/region_parquet",
      partitionBy = Seq("r_regionkey"))
    val back = spark.read.parquet(s"$dir/region_parquet")
    assert(back.count() == 5)
    // partition pruning must reach the scan
    val pruned = back.filter(back("r_regionkey") === 1)
    assert(pruned.count() == 1)
  }

  test("cosine_sim is SQL-callable after registration") {
    val s2 = spark.newSession()
    graft.functions.CosineSimilarity.register(s2)
    val r = s2.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // orthogonal → 0
    val o = s2.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(o) < 1e-12)
  }

  test("GraftExtensions injects cosine_sim at session build time") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(e) // must register without throwing
  }

  test("type widening: mergeSchema hard-fails on int-vs-bigint" +
      " generations; the tracked-schema cast-on-read serves all three") {
    import org.apache.spark.sql.functions.{col, max, min}
    val path = Etl.typeWideningFixture(spark, sf)
    // the migration mergeSchema CANNOT do — its StructType merge has no
    // numeric promotion, so the mixed int/bigint o_qty must fail loudly
    // (this failure is exactly why the widened-read protocol exists)
    val merged = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(path)
        .select(col("o_qty")).collect()
    }
    assert(merged.getMessage.toLowerCase.contains("merge")
        || merged.getMessage.toLowerCase.contains("int"),
      s"expected a schema-merge failure, got: ${merged.getMessage}")
    // cast-on-read: the widened query must agree with reading each
    // generation separately through its own native type
    val out = graft.operators.RefQueries.qSchemaWidening(spark, sf)
      .collect()(0)
    val raw = spark.read.parquet(path) // schema from a sampled footer;
    // count is type-agnostic, so use it only for the row total
    assert(out.getLong(0) == raw.count(), "widened read lost rows")
    // the wide generation is REAL: its minimum exceeds Int range, so a
    // reader that silently truncated to int could not produce these
    val wide = spark.read
      .schema("o_orderkey bigint, ck bigint, o_qty bigint").parquet(path)
      .filter(col("o_orderkey") % 3 === 2)
    val mn = wide.agg(min(col("o_qty")), max(col("o_qty"))).collect()(0)
    assert(mn.getLong(0) > Int.MaxValue.toLong,
      s"wide generation must exceed Int range, min=${mn.getLong(0)}")
    assert(out.getLong(1) == wide.count(),
      "n_wide must count exactly the wide generation")
  }
}
