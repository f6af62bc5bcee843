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

  test("block sampling: deterministic selection replays in-memory," +
      " estimate inside its own 4-SE bound, gate non-vacuous") {
    val P = BigInt("18446744073709551616")
    def mix64(x0: Long): Long = { // independent splitmix64 reference
      var z = (BigInt(x0) + BigInt("11400714819323198485")).mod(P)
      z = ((z ^ (z >> 30)) * BigInt("13787848793156543929")).mod(P)
      z = ((z ^ (z >> 27)) * BigInt("10723151780598845931")).mod(P)
      (z ^ (z >> 31)).toLong
    }
    val li = Tables.read(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val mk = li.map(_._1).max
    val bw = math.max(1L, (mk + 256L) / 256L)
    val blockSums = li.groupBy(x => x._1 / bw).view.mapValues(
      _.map(x => math.floor(x._2 * 100.0 + 0.5).toLong).sum).toMap
    val sampled = blockSums.filter { case (b, _) =>
      ((mix64(b) % 8) + 8) % 8 == 0 }
    val n = blockSums.size
    val m = sampled.size
    val t = blockSums.values.sum
    val sx = sampled.values.sum
    val out = graft.operators.Sketches.sampleBlocks(spark, sf).head()
    assert(out.getLong(0) == n.toLong && out.getLong(1) == m.toLong,
      s"block/sample counts ${(out.getLong(0), out.getLong(1))} !=" +
        s" replay ${(n, m)}")
    assert(out.getLong(2) == t, "exact total cents")
    assert(out.getLong(3) == (BigInt(sx) * n / m).toLong,
      "integer expansion estimate")
    assert(out.getBoolean(4), "estimate fell outside its own 4-SE bound")
    // non-vacuous in BOTH directions: real sampling error exists (the
    // bound gates something) and the sample is a strict minority
    assert(out.getLong(3) != out.getLong(2),
      "estimate coincides with exact — the bound gates nothing")
    assert(m > 1 && m < n, s"degenerate sample $m of $n")
    // and the inequality itself replays in integers
    val bigSx = BigInt(sx); val bigT = BigInt(t)
    val sxx = sampled.values.map(v => BigInt(v) * BigInt(v)).sum
    val lhs = (bigSx * n - bigT * m).pow(2) * (m - 1)
    val rhs = BigInt(16) * n * (n - m) * (BigInt(m) * sxx - bigSx * bigSx)
    assert((lhs <= rhs) == out.getBoolean(4), "4-SE inequality replay")
  }
}
