package graft

import graft.operators.RefQueries

/** Differential tests — the reference's correctness methodology
  * (independent implementations compared; SURVEY.md §5.1), automated:
  * df-API ≡ SQL ≡ typed-Dataset ≡ hinted variants per query shape.
  */
class DifferentialSpec extends SparkSpec {

  test("q1: df ≡ sql") {
    assertSameRows(RefQueries.q1TopMonths(spark, sf),
      RefQueries.q1TopMonthsSql(spark, sf))
  }

  test("q1: parquet ≡ orc ≡ jsonl source twins") {
    val base = RefQueries.q1TopMonths(spark, sf)
    assertSameRows(base, RefQueries.q1TopMonthsOrc(spark, sf))
    assertSameRows(base, RefQueries.q1TopMonthsJsonl(spark, sf))
  }

  test("q2: df ≡ typed Dataset port") {
    assertSameRows(RefQueries.q2TimeBuckets(spark, sf),
      RefQueries.q2TimeBucketsTyped(spark, sf))
  }

  test("q3: join hints do not change results") {
    val base = RefQueries.q3JoinChain(spark, sf)
    for (h <- Seq("broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"))
      assertSameRows(base, RefQueries.q3JoinChain(spark, sf, h, h))
  }

  test("as-of join: native AsOfJoinExec ≡ union+window composition") {
    assertSameRows(
      graft.operators.Events.asofJoin(spark, sf),
      graft.operators.Events.asofJoinNative(spark, sf))
  }

  test("range join: native RangeJoinExec ≡ bucket-explode composition") {
    assertSameRows(
      graft.operators.Events.rangeJoinBinned(spark, sf),
      graft.operators.Events.rangeJoinNative(spark, sf))
  }

  test("q4: df ≡ sql ≡ broadcast ≡ typed cogroup port") {
    val base = RefQueries.q4Distance(spark, sf)
    assertSameRows(base, RefQueries.q4DistanceSql(spark, sf))
    assertSameRows(base, RefQueries.q4DistanceBroadcast(spark, sf))
    assertSameRows(base, RefQueries.q4DistanceCogroup(spark, sf))
  }
}
