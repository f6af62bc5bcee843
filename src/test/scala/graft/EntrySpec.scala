package graft

/** Driver-contract smoke: every declared query runs and returns rows, the
  * flagship entry is non-empty, and every oracle key refers to a declared
  * query. Mirrors the reference's own differential methodology (each query
  * implemented 2-4 ways and compared — SURVEY.md §5) via the *Differential*
  * suites; this one guards the contract surface itself.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty at sf0.001") {
    // q3_joinchain_rawkey is EMPTY BY DESIGN: it is the reference's
    // strip-vs-keep join-key sensitivity study (query3.py:84-96) — the
    // uncleaned key matches nothing and every row is silently lost; its
    // oracle independently confirms the empty result.
    val emptyByDesign = Set("q3_joinchain_rawkey")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (emptyByDesign(name)) assert(n == 0, s"query $name should be empty")
      else assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("registerViews exposes every table to SQL") {
    Tables.registerViews(spark, sf)
    val n = spark.sql("""
      SELECT count(*) FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey""").collect()(0).getLong(0)
    assert(n > 0)
  }

  test("driver materializations: show / take / head / collect / explain") {
    val df = SparkEntry.entry(spark)
    df.show(5) // S6: renders without error
    assert(df.take(3).length == 3)
    assert(df.head(1).nonEmpty)
    assert(df.collect().nonEmpty)
    df.explain() // S7
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("oracle column aliases appear in spark output columns") {
    // cheap guard against the alias-mismatch failure mode the driver
    // contract warns about: every Spark output column name must appear
    // verbatim in the oracle SQL text.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val tokens = sql.split("[^A-Za-z0-9_]+").toSet
      val cols = SparkEntry.queries(name)(spark, sf).columns
      cols.foreach { c =>
        assert(tokens.contains(c),
          s"$name: column '$c' not a word in oracle SQL")
      }
    }
  }
}
