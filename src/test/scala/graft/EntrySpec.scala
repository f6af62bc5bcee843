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
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
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
