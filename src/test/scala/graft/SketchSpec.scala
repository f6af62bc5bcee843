package graft

import graft.operators.RefQueries

/** Accuracy bound for the HLL++ sketch query (no SQL oracle — the sketch
  * column is approximate by design; this spec IS its correctness check). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct (rsd=0.02) within 3 sigma of exact per group") {
    RefQueries.qApproxDistinct(spark, sf).collect().foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("sessionize window-function and typed mapGroups variants agree") {
    assertSameRows(
      graft.operators.Events.sessionize(spark, sf),
      graft.operators.Events.sessionizeTyped(spark, sf))
  }
}
