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

  test("mix64 matches independent splitmix64 reference vectors") {
    // vectors computed outside the JVM (python arbitrary-precision mod
    // 2^64) — guards the wrap-around semantics the codegen relies on
    def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)
    assert(graft.functions.Mix64.mix(0L) == u("16294208416658607535"))
    assert(graft.functions.Mix64.mix(42L) == u("13679457532755275413"))
    assert(graft.functions.Mix64.mix(123456789L)
      == u("2466975172287755897"))
    assert(graft.functions.Mix64.mix(Long.MaxValue)
      == u("3055647633038352039"))
  }

  test("F2 self-join-size sketch: never under, inside the additive bound") {
    graft.operators.Sketches.selfJoinSizeCms(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(5),
        s"${r.getString(0)}: CMS F2 under exact — structurally impossible")
      assert(r.getBoolean(6), s"${r.getString(0)}: F2 est out of 2N²/w bound")
      assert(r.getLong(3) >= r.getLong(2))
    }
  }

  test("sliding HLL: exact column replays in-memory, estimate in bound") {
    val pairs = graft.Tables.read(spark, sf, "events")
      .selectExpr("cast(to_date(ts) as string) AS day", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).distinct
    val days = pairs.map(_._1).distinct.sorted
    def plusDays(d: String, i: Int): String =
      java.time.LocalDate.parse(d).plusDays(i.toLong).toString
    val out = graft.operators.Sketches.hllSliding(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == days.toSeq)
    out.foreach { r =>
      val day = r.getString(0)
      // users whose activity day falls in the trailing 7-day window
      val win = (0 until graft.operators.Sketches.HllWinDays)
        .map(i => plusDays(day, -i)).toSet
      val exact = pairs.filter(p => win.contains(p._1)).map(_._2).distinct.size
      assert(r.getLong(1) == exact.toLong,
        s"$day: exact_users ${r.getLong(1)} != $exact")
      assert(r.getBoolean(4), s"$day: hll_ok false")
    }
  }

  test("portable HLL: estimate within 10% of exact per group") {
    // m=1024 → relative error ~1.04/32 = 3.25%; 10% ≈ 3 sigma
    graft.operators.Sketches.hllDistinct(spark, sf).collect().foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(3)
      assert(r.getBoolean(4), s"${r.getString(0)}: hll_ok false")
      assert(math.abs(est - exact) / exact < 0.10,
        s"${r.getString(0)}: HLL est $est vs exact $exact")
    }
  }
}
