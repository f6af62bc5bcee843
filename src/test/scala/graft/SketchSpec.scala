package graft

import graft.operators.RefQueries

/** Accuracy bound for the HLL++ sketch query (no SQL oracle — the sketch
  * column is approximate by design; this spec IS its correctness check). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct (rsd=0.02) within 3 sigma of exact per group") {
    RefQueries.qApproxDistinctRaw(spark, sf).collect().foreach { r =>
      val exactOrd = r.getLong(1).toDouble
      val exactPart = r.getLong(2).toDouble
      val approxOrd = r.getLong(3).toDouble
      val approxPart = r.getLong(4).toDouble
      assert(math.abs(approxOrd - exactOrd) / exactOrd < 0.06,
        s"${r.getString(0)}: approx orders $approxOrd vs exact $exactOrd")
      assert(math.abs(approxPart - exactPart) / exactPart < 0.06,
        s"${r.getString(0)}: approx parts $approxPart vs exact $exactPart")
    }
  }

  test("declared approx-distinct bound checks all pass") {
    RefQueries.qApproxDistinct(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: sketch out of 5% bound")
    }
  }

  test("approx_percentile within 1% of exact percentile per group") {
    RefQueries.qQuantilesApprox(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"${r.getString(0)}: approx percentile out of 1% bound")
    }
  }

  test("sessionize window-function and typed mapGroups variants agree") {
    assertSameRows(
      graft.operators.Events.sessionize(spark, sf),
      graft.operators.Events.sessionizeTyped(spark, sf))
  }
}
