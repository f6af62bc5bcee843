package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Sketches, TextAnalysis}

/** Semantic invariants of the round-4 pipeline operators, beyond the
  * oracle hash gate: the probabilistic structures' one-sided error
  * guarantees, CDC uniqueness, and merge-equals-recompute. */
class PipelineOpsSpec extends SparkSpec {

  test("bloom prune: no false negatives, few false positives") {
    val rows = Sketches.bloomPrune(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("no_false_neg"),
        s"${r.getString(0)}: bloom dropped a true match")
      val nPass = r.getAs[Long]("n_pass")
      val nMatch = r.getAs[Long]("n_match")
      val nFp = r.getAs[Long]("n_false_pos")
      assert(nPass == nMatch + nFp, "pass must decompose into match + fp")
      // 16 bits/key, k=4 → fp rate ~0.15%; allow 10× slack on tiny data
      val nonMatch = r.getAs[Long]("n_rows") - nMatch
      assert(nFp <= math.max(5L, nonMatch / 50),
        s"${r.getString(0)}: $nFp false positives of $nonMatch is too many")
    }
  }

  test("bloom probe expression: no false negatives on negative keys (pmod)") {
    import spark.implicits._
    // a signed % would drive the bit position negative and the word
    // index out of bounds — pmod keeps any BIGINT key well-defined
    val keys = Seq(-1L, -1000000007L, Long.MinValue + 1, -42L, 7L)
    val mBits = 13
    val m = 1L << mBits
    val P = 1000000007L
    val A = Array(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val words = new Array[Long]((m / 64).toInt)
    keys.foreach { k =>
      val kk = (k % P + P) % P
      (0 until 4).foreach { i =>
        val pos = (kk * A(i) + (10007L * i + 1L)) % P % m
        words((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
      }
    }
    graft.functions.BloomMightContain.register(spark, words, mBits,
      "bloom_probe_negtest")
    val got = keys.toDF("k")
      .selectExpr("k", "bloom_probe_negtest(k) AS hit")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    keys.foreach(k => assert(got(k), s"inserted key $k not found"))
  }

  test("bloom saturation: cap warns, no-false-negative invariant survives") {
    import spark.implicits._
    // 1000 keys against a 2^8-bit cap: 16·n far exceeds m, the adaptive
    // sizing pins at the cap — the degraded-FP regime the mBits=27
    // warning guards in production, reproduced with a small override
    val keys = (1L to 1000L).map(_ * 37L)
    val keysDf = keys.toDF("k")
    val errBuf = new java.io.ByteArrayOutputStream()
    val (words, mBits, saturated) = Console.withErr(errBuf) {
      graft.operators.Sketches.buildBloomBitmap(keysDf, capBits = 8)
    }
    assert(saturated, "1000 keys must saturate a 256-bit cap")
    assert(mBits == 8, "sizing must pin at the cap, not exceed it")
    assert(errBuf.toString.contains("saturated"),
      "the saturation warning must fire")
    // saturation degrades false POSITIVES only — every inserted key must
    // still probe true (the invariant that makes the filter a safe prune)
    graft.functions.BloomMightContain.register(spark, words, mBits,
      "bloom_probe_sattest")
    val misses = keysDf
      .selectExpr("k", "bloom_probe_sattest(k) AS hit")
      .filter(!col("hit")).count()
    assert(misses == 0L, s"$misses inserted keys probed false " +
      "— saturation must never cost a true match")
  }

  test("bloom saturation handoff: probe swapped for the shuffled join") {
    // with a cap the build side exceeds (sf0.01 has ~3k urgent orders vs
    // a 2^8-bit cap), bloomPrune must NOT probe a degraded bitmap: the
    // plan swaps to the exact shuffled hash join, never broadcasting a
    // build side that (in production) outgrew a 16 MiB bitmap
    val dfSat = Sketches.bloomPrune(spark, sf, capBits = 8)
    val pSat = dfSat.queryExecution.executedPlan.toString
    assert(!pSat.contains("bloom_might_contain"),
      s"saturated plan must not probe a bitmap:\n$pSat")
    assert(pSat.contains("ShuffledHashJoin"),
      s"handoff must plan the shuffled hash join:\n$pSat")
    assert(!pSat.contains("BroadcastHashJoin"),
      s"a saturated build side must not be broadcast:\n$pSat")
    // the handoff is the EXACT filter: pass decomposes to matches only,
    // and the data-truth columns agree with the unsaturated default run
    val sat = dfSat.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val dflt = Sketches.bloomPrune(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(sat.keySet == dflt.keySet)
    sat.foreach { case (flag, (nRows, nPass, nMatch, nFp, noFn)) =>
      assert(nFp == 0L, s"$flag: exact handoff produced false positives")
      assert(nPass == nMatch, s"$flag: pass must equal exact matches")
      assert(noFn, s"$flag: handoff dropped a true match")
      assert((nRows, nMatch) == dflt(flag),
        s"$flag: handoff disagrees with the default run's exact columns")
    }
  }

  test("split assign: complete disjoint partition, deterministic, salt-keyed") {
    val run1 = TextAnalysis.splitAssign(spark, sf).collect()
    val run2 = TextAnalysis.splitAssign(spark, sf).collect()
    assert(run1.map(_.toString).sameElements(run2.map(_.toString)),
      "same salt must reproduce the identical assignment")
    // each doc gets exactly one label by construction, so the per-split
    // counts must partition the corpus exactly
    val total = Tables.read(spark, sf, "documents").count()
    assert(run1.map(_.getLong(2)).sum == total)
    val bySplit = run1.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    // 90/5/5 thresholds: binomial noise at corpus size, generous margin
    val trainRate = bySplit.getOrElse("train", 0L).toDouble / total
    assert(math.abs(trainRate - 0.9) < 0.06,
      s"train share $trainRate strays from the 0.9 target")
    // a new salt re-keys the assignment but still partitions the corpus
    val salted = TextAnalysis.splitAssign(spark, sf, salt = 7L).collect()
    assert(salted.map(_.getLong(2)).sum == total)
    assert(!salted.map(_.toString).sameElements(run1.map(_.toString)),
      "salt change must produce a different assignment")
  }

  test("split assign: overflow-safe at extreme doc_ids") {
    import spark.implicits._
    // ids near Long.MaxValue would overflow a raw doc_id * prime; the
    // pmod pre-reduction must keep every bucket in [0, 100)
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    val ids = Seq(0L, 1L, Long.MaxValue, Long.MaxValue - 1,
      999999937L, 4294967296L) ++ (0 until 200).map(i => i * 7919L)
    ids.distinct.map(id => (id, s"text $id", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.splitAssign(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum == ids.distinct.length.toLong,
      "every extreme id must land in exactly one split")
    assert(rows.forall(r => Set("train", "valid", "test")(r.getString(0))))
  }

  test("shuffle pack: total deterministic order, invariant to partition layout") {
    import spark.implicits._
    val out = TextAnalysis.shufflePack(spark, sf).collect()
    val n = out.length
    // positions are exactly 0..n-1 (a permutation — no global window
    // was used to produce them, so this checks the range decomposition)
    assert(out.map(_.getAs[Long]("pos")).sorted.sameElements(0L until n),
      "positions must be a permutation of 0..n-1")
    // the order is (shuffle_key, doc_id)-sorted
    val byPos = out.sortBy(_.getAs[Long]("pos"))
      .map(r => (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
    assert(byPos.sameElements(byPos.sorted), "pos must follow (key, id) order")
    // bin assignment equals the naive running-token cumsum
    var cum = 0L
    out.sortBy(_.getAs[Long]("pos")).foreach { r =>
      assert(r.getAs[Long]("bin_id") == cum / 512L,
        s"doc ${r.getAs[Long]("doc_id")}: bin mismatch at cum=$cum")
      cum += r.getAs[Long]("n_tokens")
    }
    // partition-layout invariance: a differently-partitioned copy of the
    // corpus yields the identical assignment (the property a rand() or
    // monotonically_increasing_id shuffle lacks)
    val dir = java.nio.file.Files.createTempDirectory("graft-shuf").toString
    Tables.read(spark, sf, "documents").repartition(7, $"lang")
      .write.parquet(s"$dir/documents.parquet")
    val again = TextAnalysis.shufflePack(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("bin_id"))).sorted
    val orig = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
      r.getAs[Long]("bin_id"))).sorted
    assert(again.sameElements(orig), "order must not depend on layout")
    // re-salting actually re-shuffles (salt is a real key, not dead)
    val resalted = TextAnalysis.shufflePack(spark, sf, salt = 43L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    val posById = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(posById.count { case (id, p) => resalted(id) != p } > n / 2,
      "a different salt must produce a different order")
  }

  test("token rarity: corpus-relative frequencies, exact on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rare").toString
    // counts: aa=5, zz=qq=ww=1 -> N=8, V=4, mean=2; below-mean = cnt<2
    Seq((0L, "aa aa aa aa", "en", "s", 1L),
        (1L, "aa zz", "en", "s", 1L),
        (2L, "qq ww", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.tokenRarity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getLong(4),
        r.getDouble(5)))).toMap
    assert(rows(0L) == ((4L, 20L, 5.0, 0L, 0.0)), s"doc 0: ${rows(0L)}")
    assert(rows(1L) == ((2L, 6L, 3.0, 1L, 0.5)), s"doc 1: ${rows(1L)}")
    assert(rows(2L) == ((2L, 2L, 1.0, 2L, 1.0)), s"doc 2: ${rows(2L)}")
  }

  test("cms heavy hitters: estimate never undercounts, stays in eps bound") {
    val rows = Sketches.heavyHittersCms(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"key ${r.getAs[Long]("key")}: CMS undercounted — impossible")
      // NB the 2N/w bound is PROBABILISTIC (Markov: each of the 4 rows
      // exceeds N/w overcount with p <= 1/2, all four with p <= 1/16 per
      // key) — it is empirically verified for the checked fixtures (whose
      // hash placements are deterministic, so this cannot flake), but a
      // NEW fixture or sf could legitimately exceed it without any
      // implementation bug; if that happens loosen to a
      // majority-of-keys check rather than "fixing" the sketch
      assert(r.getAs[Boolean]("within_bound"),
        s"key ${r.getAs[Long]("key")}: overcount exceeds 2N/w")
    }
    // the skew construction must actually produce heavy hitters: the
    // collapsed keys 0..4 are the top 5
    assert(rows.take(5).map(_.getAs[Long]("key")).toSet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("cdc compact: one row per user, picks the max-(ts, event_id) record") {
    val out = Events.cdcCompact(spark, sf)
    val byUser = out.groupBy("user_id").count()
      .filter(col("count") > 1).count()
    assert(byUser == 0L, "compaction must emit exactly one row per key")
    // version counts must sum back to the full log
    val total = out.agg(sum("n_versions")).collect()(0).getLong(0)
    assert(total == Tables.read(spark, sf, "events").count())
  }

  test("incremental agg: state+delta merge equals single-pass recompute") {
    import spark.implicits._
    val merged = Events.incrementalAgg(spark, sf)
    val direct = Tables.read(spark, sf, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_total"),
        round(sum($"value".cast("decimal(20,6)")), 4).cast("double")
          .as("total_value"))
    assertSameRows(
      merged.select($"user_id", $"n_total", $"total_value")
        .orderBy($"user_id".asc),
      direct.orderBy($"user_id".asc))
  }

  test("adaptive near-dup banding: precision against brute force at 0.4") {
    import spark.implicits._
    // every reported pair must be a genuine above-threshold pair (the
    // banding can miss pairs, never invent them)
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.read(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val all = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .withColumn("cos", expr("round(cosine_sim(a.vec, b.vec), 6)"))
      .filter($"cos" >= 0.4)
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"))
    val banded = graft.operators.Similarity.cosineNearDup(spark, sf)
      .select($"id_a", $"id_b")
    val invented = banded.join(all, Seq("id_a", "id_b"), "left_anti").count()
    assert(invented == 0L, "banding reported a below-threshold pair")
  }

  test("adaptive near-dup banding: recall floor on TRUE near-dups") {
    // The fixture corpus has no true near neighbors (max cosine ~0.51 at
    // threshold 0.4), so chance-level collisions can't pin recall there.
    // Crafted corpus: 60 base vectors, each with a perturbed twin at
    // cosine ≈ 0.95+ — the regime near-dup detection targets, where sign
    // bits mostly agree and 4 bands must recover a large majority. This
    // is the test that would catch a bits-loop / band-indexing bug that
    // silently empties the buckets (precision alone cannot).
    import spark.implicits._
    val dim = graft.operators.Similarity.Dim
    def base(i: Int, d: Int): Double =
      (((i * 7919 + d * 104729) % 1009) - 504).toDouble / 504.0
    val rows = (0 until 60).flatMap { i =>
      val v = Array.tabulate(dim)(d => base(i, d))
      // twin: flip a small deterministic slice by 10% — cosine stays ~0.99
      val w = Array.tabulate(dim)(d =>
        if ((d + i) % 8 == 0) v(d) * 0.7 else v(d))
      Seq((i.toLong * 2, v.map(_.toFloat).toSeq),
        (i.toLong * 2 + 1, w.map(_.toFloat).toSeq))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_neardup_recall").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val found = graft.operators.Similarity
      .cosineNearDup(spark, dir, threshold = 0.9)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = (0 until 60).map(i => (i.toLong * 2, i.toLong * 2 + 1))
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.8,
      f"recall $recall%.2f below 0.8 floor on cosine≈0.99 twins " +
        s"(found ${found.size} pairs)")
  }

  test("transition matrix: rows normalize to 1, pairs total events−users") {
    val tm = Events.transitionMatrix(spark, sf).collect()
    tm.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      // each prob is rounded to 4 dp; |types| rounding errors ≤ 5e-4 each
      assert(math.abs(s - 1.0) < 0.005, s"$src: probs sum to $s")
    }
    // every user's k-event stream yields exactly k−1 transitions
    val ev = Tables.read(spark, sf, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(tm.map(_.getLong(2)).sum == expected)
  }

  test("anomaly MAD: flag count replays from the published med/mad") {
    import spark.implicits._
    val out = Events.anomalyMad(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(1))).toMap
    val vals = Tables.read(spark, sf, "events")
      .select($"event_type", $"value".cast("double")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    vals.foreach { case (t, vs) =>
      val (med, mad, flagged, cnt) = out(t)
      assert(cnt == vs.length.toLong)
      val expected = vs.count(v => math.abs(v - med) > mad * 4.4478).toLong
      assert(flagged == expected,
        s"$t: operator flagged $flagged, reference flags $expected")
    }
  }

  test("preagg rollup: monthly-from-daily equals direct monthly") {
    import spark.implicits._
    import graft.operators.RefQueries
    val direct = Tables.read(spark, sf, "lineitem")
      .groupBy(substring($"l_shipdate".cast("string"), 1, 7).as("month"),
        $"l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 4).as("qty"))
      .orderBy($"month".asc, $"l_returnflag".asc)
    assertSameRows(RefQueries.qPreaggRollup(spark, sf), direct)
  }

  test("scd2: versions partition the log, intervals chain, one current") {
    import spark.implicits._
    val out = Events.scd2(spark, sf).collect()
    val ev = Tables.read(spark, sf, "events")
    // version rows repartition the log exactly: every event is in
    // exactly one island
    assert(out.map(_.getLong(5)).sum == ev.count())
    out.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // exactly one open-ended current version per user, and it's last
      assert(rows.count(_.getBoolean(6)) == 1, s"user $u: != 1 current")
      assert(sorted.last.getBoolean(6), s"user $u: current not last")
      // consecutive versions change type (else they'd be one island)
      // and intervals chain: valid_to(k) == valid_from(k+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) != b.getString(2),
            s"user $u: adjacent versions share type ${a.getString(2)}")
          assert(a.getString(4) == b.getString(3),
            s"user $u: interval gap ${a.getString(4)} -> ${b.getString(3)}")
        case _ =>
      }
    }
  }

  test("random projection: bit-exact vs in-memory fold, JL distortion sane") {
    import graft.operators.Similarity
    val emb = Tables.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val out = Similarity.randomProject(spark, sf).collect()
    assert(out.length == emb.size)
    out.foreach { r =>
      val v = emb(r.getLong(0))
      (0 until Similarity.JlOutDim).foreach { j =>
        // same left-fold order as the operator's reduce(_ + _)
        val expect = (0 until Similarity.Dim)
          .map(d => v(d) * Similarity.jlSign(j, d)).reduce(_ + _)
        val got = r.getDouble(1 + j)
        val rounded = BigDecimal(expect)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got == rounded,
          s"vec ${r.getLong(0)} p$j: $got vs $rounded (raw $expect)")
      }
    }
    // JL sanity: squared norms scale by ~k on average (E[|Rv|^2]=k|v|^2)
    val ratios = out.take(50).map { r =>
      val v = emb(r.getLong(0))
      val pn = (0 until Similarity.JlOutDim)
        .map(j => r.getDouble(1 + j)).map(x => x * x).sum
      val vn = v.map(x => x * x).sum
      pn / (Similarity.JlOutDim * vn)
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 2.0,
      s"mean norm-preservation ratio $mean outside [0.5, 2]")
  }

  test("cap per source: survivors are the mix64-smallest, checksum replays") {
    import spark.implicits._
    val docs = Tables.read(spark, sf, "documents")
      .select($"source", $"doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val cap = 15
    val out = TextAnalysis.capPerSource(spark, sf, cap).collect()
    assert(out.map(_.getString(0)).toSet == docs.keySet)
    out.foreach { r =>
      val ids = docs(r.getString(0))
      assert(r.getLong(1) == ids.length.toLong)
      assert(r.getLong(2) == math.min(cap, ids.length).toLong)
      val survivors = ids.sortBy(id => (graft.functions.Mix64.mix(id), id))
        .take(cap)
      val checksum = survivors.map(_ % 1000000007L).sum % 1000000007L
      assert(r.getLong(3) == checksum,
        s"${r.getString(0)}: checksum ${r.getLong(3)} != $checksum")
    }
  }

  test("textrank: bit-exact against an in-memory fixed-point reference") {
    import TextAnalysis.{TrScale, TrDampNum, TrDampDen, TrWCap}
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val pairs = docs.flatMap { r =>
      val t = r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")
        .split(" ")
      t.zip(t.drop(1)).filter { case (a, b) => a != b }
    }
    val w0 = (pairs ++ pairs.map(_.swap)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val wdiv = math.max(1L, w0.values.max / TrWCap)
    val w = w0.view.mapValues(_ / wdiv).filter(_._2 > 0).toMap
    val wdeg = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val base = TrScale - TrScale * TrDampNum / TrDampDen
    var s = wdeg.keys.map(_ -> TrScale).toMap
    for (_ <- 1 to 3) {
      val in = w.toSeq.groupBy(_._1._2).view.mapValues { es =>
        base + es.map { case ((u, _), wt) =>
          TrDampNum * wt * s(u) / (TrDampDen * wdeg(u))
        }.sum
      }.toMap
      s = in
    }
    val expect = s.toSeq.map { case (t, sc) => (t, wdeg(t), sc) }
      .sortBy { case (t, _, sc) => (-sc, t) }.take(20)
    val got = TextAnalysis.textRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"textrank mismatch:\n got=$got\n exp=$expect")
  }

  test("pmi collocations: bit-exact against an in-memory reference") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val pairs = docs.toSeq.flatMap { r =>
      val t = r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")
        .split(" ")
      t.zip(t.drop(1))
    }
    val cab = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = pairs.size.toLong
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expect = cab.toSeq
      .filter(_._2 >= TextAnalysis.PmiMinCount)
      .map { case ((a, b), c) =>
        (s"$a $b", c, ca(a), cb(b),
          bitlen(n) + bitlen(c) - bitlen(ca(a)) - bitlen(cb(b)))
      }
      .sortBy { case (bg, c, _, _, bits) => (-bits, -c, bg) }.take(20)
    val got = TextAnalysis.pmiBigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, s"pmi mismatch:\n got=$got\n exp=$expect")
  }

  test("attribution: last-touch credits replay in-memory") {
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val evs = Tables.read(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .filter(r => Set("click", "purchase").contains(r.getString(3)))
    val horizon = Events.AttribHorizonMin * 60000000L
    case class Conv(day: String, attributed: Boolean, value: Double)
    val convs = evs.groupBy(_.getLong(0)).values.toSeq.flatMap { rows =>
      var lastClick: Option[Long] = None
      rows.sortBy(r => (micros(r.getTimestamp(1)), r.getLong(2))).flatMap {
        r =>
          val m = micros(r.getTimestamp(1))
          if (r.getString(3) == "click") { lastClick = Some(m); None }
          else {
            val day = r.getTimestamp(1).toInstant
              .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            Some(Conv(day, lastClick.exists(c => m - c <= horizon),
              r.getDouble(4)))
          }
      }
    }
    val expect = convs.groupBy(_.day).view.mapValues { cs =>
      val attr = cs.filter(_.attributed)
      val v = attr.map(c => BigDecimal(c.value)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cs.size.toLong, attr.size.toLong, v)
    }.toMap
    val got = Events.attribution(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expect, s"attribution mismatch:\n got=$got\n exp=$expect")
  }

  test("surprisal: bit-exact against an in-memory unigram reference") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val toks = docs.map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq)
      .toMap
    val cnt = toks.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = cnt.values.sum
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val out = TextAnalysis.surprisal(spark, sf).collect()
    assert(out.length == docs.length)
    out.foreach { r =>
      val expected = toks(r.getLong(0))
        .map(t => (bitlen(n) - bitlen(cnt(t))).toLong).sum
      assert(r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: bits_total ${r.getLong(2)} != $expected")
      assert(r.getLong(1) == toks(r.getLong(0)).length.toLong)
    }
  }

  test("freq spectrum: bands partition the vocabulary exactly") {
    val docs = Tables.read(spark, sf, "documents")
      .select("text").collect()
    val cnt = docs.flatMap(_.getString(0).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val out = TextAnalysis.freqSpectrum(spark, sf).collect()
    // bands are disjoint + complete: type and mass totals reassemble
    assert(out.map(_.getLong(1)).sum == cnt.size.toLong, "type count")
    assert(out.map(_.getLong(4)).sum == cnt.values.sum, "token mass")
    out.foreach { r =>
      val band = r.getLong(0).toInt
      val (lo, hi) = (1L << (band - 1), (1L << band) - 1)
      assert(r.getLong(2) >= lo && r.getLong(3) <= hi,
        s"band $band: counts [${r.getLong(2)}, ${r.getLong(3)}] escape " +
          s"[$lo, $hi]")
      val expTypes = cnt.values.count(c => bitlen(c) == band).toLong
      assert(r.getLong(1) == expTypes, s"band $band type count")
    }
  }

  test("vocab growth: curve ends at the vocabulary size, never decreases," +
      " and is range-decomposition-invariant") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" ").toSeq)
      .sortBy(_._1)
    val vocabTotal = docs.flatMap(_._2).distinct.length.toLong
    val out = TextAnalysis.vocabGrowth(spark, sf).collect()
    assert(out.length == docs.length, "one curve point per document")
    assert(out.last.getLong(2) == vocabTotal,
      s"curve ends at ${out.last.getLong(2)}, vocabulary is $vocabTotal")
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + b.getLong(1),
        "vocab_size must be the running sum of n_new")
    }
    // the distributed prefix sum must equal the naive single-range cumsum
    val naive = TextAnalysis.vocabGrowth(spark, sf,
      rangeSize = Long.MaxValue / 4).collect().map(_.toString).toSeq
    val tiny = TextAnalysis.vocabGrowth(spark, sf, rangeSize = 7L)
      .collect().map(_.toString).toSeq
    assert(out.map(_.toString).toSeq == naive, "default vs naive cumsum")
    assert(tiny == naive, "tiny ranges vs naive cumsum")
  }

  test("bigram surprisal: bit-exact against an in-memory bigram reference") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val toks = docs.map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq)
      .toMap
    val bigrams = toks.view.mapValues(ts => ts.zip(ts.drop(1))).toMap
    val c2 = bigrams.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val out = TextAnalysis.bigramSurprisal(spark, sf).collect()
    assert(out.length == docs.length)
    out.foreach { r =>
      val bg = bigrams(r.getLong(0))
      val expected = bg.map { case (a, b) =>
        (bitlen(c1(a)) - bitlen(c2((a, b)))).toLong
      }.sum
      assert(r.getLong(1) == bg.length.toLong, s"doc ${r.getLong(0)} n")
      assert(r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: bits_total ${r.getLong(2)} != $expected")
    }
  }

  test("rolling window: trailing frame is calendar days, not observations") {
    val daily = Tables.read(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate) -> r.getLong(2))
      .toMap
    val out = Events.rollingWindow(spark, sf).collect()
    assert(out.length == daily.size)
    out.foreach { r =>
      val u = r.getLong(0)
      val d = java.time.LocalDate.parse(r.getString(1))
      // the frame is the last 7 CALENDAR days — reconstruct by date
      // arithmetic, so a user's silent days are skipped, not counted
      val expect = (0 until 7)
        .flatMap(k => daily.get((u, d.minusDays(k.toLong)))).sum
      assert(r.getLong(3) == expect,
        s"user $u $d: rolling_events ${r.getLong(3)} != $expect")
    }
  }

  test("subqueries: decorrelated counts match a per-customer reference") {
    val spend = Tables.read(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(20,6)")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val active = Tables.read(spark, sf, "events")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    // cross-multiplied (t·n > Σ) like the query SQL — exact decimals,
    // no division-rounding boundary on either side
    val spendSum = spend.values.map(BigDecimal(_)).sum
    val nSpend = spend.size
    val cust = Tables.read(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = graft.operators.RefQueries.qSubqueries(spark, sf).collect()
    out.foreach { r =>
      val seg = r.getString(0)
      val mine = cust.filter(_._2 == seg).map(_._1)
      assert(r.getLong(1) == mine.length.toLong)
      assert(r.getLong(2) == mine.count(spend.contains).toLong,
        s"$seg: EXISTS count")
      assert(r.getLong(3) == mine.count(c => !active.contains(c)).toLong,
        s"$seg: NOT EXISTS count")
      assert(r.getLong(4) == mine.count(c =>
        spend.get(c).exists(t => BigDecimal(t) * nSpend > spendSum)).toLong,
        s"$seg: scalar-subquery comparison count")
    }
  }

  test("bpe merges: replace-based merge equals a true greedy fold," +
      " including symbol runs") {
    import spark.implicits._
    // reference BPE: greedy left-to-right fold over symbol lists
    def fold(syms: List[String], p1: String, p2: String): List[String] =
      syms match {
        case a :: b :: rest if a == p1 && b == p2 =>
          (p1 + p2) :: fold(rest, p1, p2)
        case a :: rest => a :: fold(rest, p1, p2)
        case Nil => Nil
      }
    def refBpe(words: Map[String, Long], steps: Int)
        : Seq[(String, String, Long)] = {
      var ws = words.map { case (w, c) => w.split("").toList -> c }.toSeq
      (1 to steps).map { _ =>
        val pairCounts = ws.flatMap { case (syms, c) =>
          syms.zip(syms.drop(1)).map(_ -> c)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val ((p1, p2), c) = pairCounts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        ws = ws.map { case (syms, cnt) => fold(syms, p1, p2) -> cnt }
        (p1, p2, c)
      }
    }
    // fixture corpus: operator vs reference
    val docs = Tables.read(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" "))
    val fixtureRef = refBpe(docs.groupBy(identity).view
      .mapValues(_.length.toLong).toMap, 3)
    val got = TextAnalysis.bpeMerges(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == fixtureRef,
      s"fixture merges ${got.toSeq} != reference $fixtureRef")
    // run-heavy synthetic corpus: the 4x-iterated replace must reach the
    // greedy fixpoint even when one symbol repeats many times in a word
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val runWords = Seq("aaaaaaaa", "aaaa", "aab", "baa", "ab", "aaaaaaab")
    val corpus = runWords.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(runWords.length - i)(w) // skewed counts, deterministic
    }
    Seq((1L, corpus.mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val runRef = refBpe(corpus.groupBy(identity).view
      .mapValues(_.length.toLong).toMap, 3)
    val runGot = TextAnalysis.bpeMerges(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(runGot.toSeq == runRef,
      s"run-corpus merges ${runGot.toSeq} != reference $runRef")
  }

  test("bpe apply: per-doc symbol counts match a fold-applied reference") {
    def fold(syms: List[String], p1: String, p2: String): List[String] =
      syms match {
        case a :: b :: rest if a == p1 && b == p2 =>
          (p1 + p2) :: fold(rest, p1, p2)
        case a :: rest => a :: fold(rest, p1, p2)
        case Nil => Nil
      }
    val merges = TextAnalysis.bpeMerges(spark, sf).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    def segment(w: String): Int =
      merges.foldLeft(w.split("").toList) { case (s, (p1, p2)) =>
        fold(s, p1, p2)
      }.length
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" ")).toMap
    val out = TextAnalysis.bpeApply(spark, sf).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val toks = docs(r.getLong(0))
      assert(r.getLong(1) == toks.length.toLong, "n_tokens")
      assert(r.getLong(2) == toks.map(_.length.toLong).sum, "n_chars")
      val expSyms = toks.map(segment(_).toLong).sum
      assert(r.getLong(3) == expSyms,
        s"doc ${r.getLong(0)}: n_symbols ${r.getLong(3)} != $expSyms")
      assert(r.getLong(3) <= r.getLong(2),
        "merging can never increase the symbol count")
    }
  }

  test("bpe merges: a fully-merged corpus stops with a SHORT table, not" +
      " an empty vocab") {
    import spark.implicits._
    // every token is a single symbol — step 1 finds no adjacent pair:
    // the loop must stop and emit zero merge rows (visible shortfall),
    // never crossJoin-empty the word table (r8 advice)
    val words = Seq((5L, "a"), (3L, "b"))
      .toDF("cnt", "syms")
    val out = TextAnalysis.bpeMergesFromWords(spark, words, 3).collect()
    assert(out.isEmpty, s"degenerate corpus must yield NO merges, got " +
      out.mkString(", "))
    // and a corpus that exhausts after one merge emits exactly one row
    val words1 = Seq((5L, "a b"))
      .toDF("cnt", "syms")
    val out1 = TextAnalysis.bpeMergesFromWords(spark, words1, 3).collect()
    assert(out1.length == 1 && out1(0).getString(3) == "ab",
      s"one-pair corpus must yield exactly the ab merge, got " +
        out1.mkString(", "))
  }

  test("lm backoff: bit-exact against an in-memory stupid-backoff" +
      " reference, and the backoff path fires") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val toks = docs.map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq)
      .toMap
    val (train, held) = toks.partition(_._1 % 2 == 0)
    val c2 = train.values.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cu = train.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = cu.values.sum
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val out = TextAnalysis.lmBackoff(spark, sf).collect()
    val outDocs = out.map(_.getLong(0)).toSet
    assert(outDocs == held.filter(_._2.length >= 2).keySet,
      "exactly the held-out docs with ≥1 bigram are scored")
    var backoffTotal = 0L
    out.foreach { r =>
      val bg = held(r.getLong(0)).sliding(2).map(s => (s(0), s(1))).toSeq
      val bits = bg.map { case (a, b) =>
        c2.get((a, b)) match {
          case Some(cab) => (bitlen(c1(a)) - bitlen(cab)).toLong
          case None =>
            TextAnalysis.LmAlphaBits + bitlen(n) - bitlen(cu.getOrElse(b, 1L))
        }
      }.sum
      val nBack = bg.count(p => !c2.contains(p)).toLong
      assert(r.getLong(1) == bg.length.toLong, s"doc ${r.getLong(0)} n")
      assert(r.getLong(2) == nBack, s"doc ${r.getLong(0)} n_backoff")
      assert(r.getLong(3) == bits,
        s"doc ${r.getLong(0)}: bits_total ${r.getLong(3)} != $bits")
      backoffTotal += nBack
    }
    // the POINT of the held-out split: unseen bigrams must actually occur
    assert(backoffTotal > 0L,
      "no bigram ever fell back — the held-out split is not exercising" +
        " stupid backoff")
  }

  test("scene cuts: SAD statistics bit-match a byte-level reference") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val P = 1000000007L
    val expect = docs.flatMap { case (id, b) =>
      val h = b.length / 16
      if (h < 2) None
      else {
        var nCuts = 0L; var cks = 0L; var mx = 0L; var sm = 0L
        for (f <- 1 until h) {
          var sad = 0L
          for (c <- 0 until 16)
            sad += 3L * math.abs((b(f * 16 + c) & 0xff) -
              (b((f - 1) * 16 + c) & 0xff))
          if (sad > graft.operators.Multimodal.SceneCutSad) {
            nCuts += 1; cks = (cks + f) % P
          }
          if (sad > mx) mx = sad
          sm += sad
        }
        Some(id -> (h.toLong, nCuts, cks, mx, sm / (h - 1)))
      }
    }.toMap
    val out = graft.operators.Multimodal.sceneCuts(spark, sf).collect()
    assert(out.length == expect.size)
    var totalCuts = 0L
    out.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e, s"doc ${r.getLong(0)}")
      totalCuts += r.getLong(2)
    }
    // the threshold must be non-vacuous on the fixture: some cuts fire,
    // and not every transition is a cut
    assert(totalCuts > 0L, "no scene cut fired — threshold too high")
    val totalTransitions = expect.values.map(_._1 - 1).sum
    assert(totalCuts < totalTransitions / 2,
      "more than half of transitions are cuts — threshold too low")
  }

  test("image stats: exact moments and histogram bit-match a byte" +
      " reference; variance numerator is scale-consistent") {
    val P = 1000000007L
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val expect = docs.flatMap { case (id, b) =>
      val n = (b.length / 16) * 16
      if (n < 16) None
      else {
        var sum = 0L; var sumSq = 0L
        val bins = new Array[Long](4)
        (0 until n).foreach { i =>
          val p = (b(i) & 0xff).toLong
          sum += p; sumSq += p * p; bins((p >> 6).toInt) += 1
        }
        var cks = 0L
        bins.foreach(v => cks = (cks * 31 + v) % P)
        Some(id -> (n.toLong, sum, n * sumSq - sum * sum, cks))
      }
    }.toMap
    val out = graft.operators.Multimodal.imageStats(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e,
        s"doc ${r.getLong(0)}")
      // var_num = n^2 * variance >= 0 always; > 0 unless the image is
      // perfectly flat
      assert(r.getLong(3) >= 0L)
    }
    assert(out.exists(_.getLong(3) > 0L), "every image perfectly flat?")
  }

  test("hilbert index: bijective on the 256x256 grid, every step" +
      " adjacent; layout zone maps no worse than z-order") {
    // curve properties, exhaustively: xy2d is a bijection onto
    // [0, 65536) and consecutive indices are Manhattan-distance-1
    // neighbors — the locality property Morton does NOT have
    val byD = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = graft.functions.HilbertIndex.xy2d(x.toLong, y.toLong).toInt
      assert(byD(d) == null, s"collision at d=$d")
      byD(d) = (x, y)
    }
    for (d <- 1 until 65536) {
      val (x0, y0) = byD(d - 1)
      val (x1, y1) = byD(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-adjacent step at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
    // the layout claim, measured: PER-CELL zone-map area under the same
    // non-aligned 24-cell bucketing (aligned power-of-4 buckets are
    // squares on BOTH curves — vacuously equal; arbitrary ranges are
    // where Morton's quadrant jumps widen zones). Hilbert must be
    // strictly tighter on the dense full grid.
    def zones(idx: (Int, Int) => Long): Long = {
      val byBucket = scala.collection.mutable.Map[Long,
        (Int, Int, Int, Int)]()
      for (x <- 0 until 256; y <- 0 until 256) {
        val b = idx(x, y) / 24
        val cur = byBucket.getOrElse(b, (x, x, y, y))
        byBucket(b) = (math.min(cur._1, x), math.max(cur._2, x),
          math.min(cur._3, y), math.max(cur._4, y))
      }
      byBucket.values.map { case (xl, xh, yl, yh) =>
        (xh - xl + 1).toLong * (yh - yl + 1) }.sum
    }
    val ha = zones((x, y) => graft.functions.HilbertIndex.xy2d(x, y))
    val za = zones { (x, y) =>
      (0 until 8).map(i =>
        (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
      ).sum.toLong
    }
    info(f"24-cell-bucket zone area over the full grid: " +
      f"hilbert $ha%d vs z-order $za%d (${za.toDouble / ha}%.2fx)")
    assert(ha < za,
      s"hilbert zone-map area $ha not tighter than z-order's $za")
    // (the declared queries keep different bucket widths — hilbert 24,
    // zorder 16 — so their fixture outputs are deliberately NOT
    // compared: total area scales with bucket size, and the controlled
    // same-width comparison above is the meaningful one)
  }

  test("hilbert index: out-of-range inputs wrap to the 8-bit grid," +
      " interpreted and codegen paths agreeing") {
    // the r10 mask contract: a caller with an unclamped grid wraps
    // (x & 0xFF) instead of silently folding stray high bits into a
    // garbage index — asserted on BOTH eval paths so the codegen'd
    // expression can never drift from the Scala reference
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    graft.functions.HilbertIndex.register(spark)
    val cases = Seq((300L, 5L), (256L, 0L), (511L, 255L), (-1L, 7L),
      (1L << 40, 99L), (1234567L, 7654321L))
    cases.foreach { case (x, y) =>
      assert(graft.functions.HilbertIndex.xy2d(x, y) ==
        graft.functions.HilbertIndex.xy2d(x & 0xFFL, y & 0xFFL),
        s"scala eval did not wrap ($x, $y)")
    }
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), expr("hilbert_xy2d(x, y)").as("d"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == graft.functions.HilbertIndex.xy2d(
        r.getLong(0) & 0xFFL, r.getLong(1) & 0xFFL),
        s"codegen path did not wrap (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("delta join: 4-term decomposition equals the one-shot full join," +
      " every term populated") {
    import org.apache.spark.sql.functions.{col, count, lit, round, sum, when}
    // independent full-join recompute in Spark (the oracle does the same
    // in DuckDB; this guards the identity without crossing engines)
    val cut = lit("1999-01-01").cast("timestamp")
    val o = Tables.read(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = Tables.read(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"),
        col("l_shipdate"))
    val full = o.join(l, "o_orderkey")
      .withColumn("isBase", col("o_orderdate") < cut && col("l_shipdate") < cut)
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(col("isBase"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("isBase"), 1L).otherwise(0L)).as("n_delta"),
        count(lit(1)).as("n_pairs"),
        round(sum(col("l_quantity").cast("decimal(20,6)")), 4)
          .cast("double").as("qty_total"))
    val inc = graft.operators.RefQueries.qDeltaJoin(spark, sf)
    assertSameRows(inc,
      full.orderBy(col("o_orderpriority").asc))
    // the identity is only exercised if base AND delta terms both carry
    // mass — and the cutoff must split both sides (not just one)
    val rows = inc.collect()
    assert(rows.map(_.getLong(1)).sum > 0, "no base pairs")
    assert(rows.map(_.getLong(2)).sum > 0, "no delta pairs")
    val oD = o.filter(col("o_orderdate") >= cut).count()
    val lD = l.filter(col("l_shipdate") >= cut).count()
    assert(oD > 0 && lD > 0, "cutoff must produce deltas on BOTH sides")
  }

  test("ab assign: arms bit-match an in-memory splitmix64 replay and" +
      " stay balanced") {
    def mix64(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val ev = Tables.read(spark, sf, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def arm(u: Long): String =
      if (((mix64(u) % 2) + 2) % 2 == 0) "A" else "B"
    val expect = ev.groupBy { case (t, u) => (t, arm(u)) }
      .map { case (k, rows) =>
        k -> (rows.length.toLong, rows.map(_._2).distinct.length.toLong)
      }
    val out = graft.operators.Events.abAssign(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect((r.getString(0), r.getString(1)))
      assert((r.getLong(2), r.getLong(3)) == e,
        s"(${r.getString(0)}, ${r.getString(1)})")
    }
    // assignment must be deterministic per user (a user appearing under
    // both arms of one type would mean a non-stateless assignment) —
    // guaranteed by construction in the replay, checked on the output by
    // the distinct-user counts partitioning each type's population
    val users = ev.map(_._2).distinct
    val byArm = users.groupBy(arm).view.mapValues(_.length).toMap
    out.groupBy(_.getString(0)).foreach { case (t, rs) =>
      rs.foreach { r =>
        assert(r.getLong(3) <= byArm(r.getString(1)).toLong,
          s"$t/${r.getString(1)}: more users than the arm holds")
      }
    }
    // splitmix64 balance: 50/50 within binomial noise (~sqrt(n) margin)
    val (na, nb) = (byArm.getOrElse("A", 0), byArm.getOrElse("B", 0))
    val margin = 4 * math.sqrt(users.length.toDouble)
    assert(math.abs(na - nb) <= margin,
      s"arm imbalance $na vs $nb exceeds 4-sigma binomial noise")
  }

  test("shot stats: segmentation bit-matches a byte-level reference and" +
      " is consistent with the cut detector") {
    val P = 1000000007L
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val expect = docs.flatMap { case (id, b) =>
      val h = b.length / 16
      if (h < 2) None
      else {
        val cuts = (1 until h).filter { f =>
          var sad = 0L
          for (c <- 0 until 16)
            sad += 3L * math.abs((b(f * 16 + c) & 0xff) -
              (b((f - 1) * 16 + c) & 0xff))
          sad > graft.operators.Multimodal.SceneCutSad
        }
        val bounds = 0 +: cuts :+ h
        val lens = bounds.zip(bounds.drop(1)).map { case (a, z) =>
          (z - a).toLong }
        var cks = 0L
        lens.foreach(l => cks = (cks * 31 + l) % P)
        Some(id -> (h.toLong, lens.length.toLong, lens.min, lens.max, cks))
      }
    }.toMap
    val out = graft.operators.Multimodal.shotStats(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e, s"doc ${r.getLong(0)}")
    }
    // consistency with the cut detector: n_shots = n_cuts + 1 per video
    val cutsByDoc = graft.operators.Multimodal.sceneCuts(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach { r =>
      assert(r.getLong(2) == cutsByDoc(r.getLong(0)) + 1,
        s"doc ${r.getLong(0)}: shots != cuts + 1")
    }
    // segmentation must be non-trivial on the fixture: some multi-shot
    // videos exist
    assert(out.exists(_.getLong(2) > 1L), "no video has more than one shot")
  }

  test("audio silence: runs bit-match a byte-level reference," +
      " threshold non-vacuous") {
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val P = 1000000007L
    val expect = docs.flatMap { case (id, b) =>
      val nWin = b.length / 80
      if (nWin < 1) None
      else {
        var nSil = 0L; var nRuns = 0L; var maxRun = 0L
        var cur = 0L; var hash = 0L
        for (w <- 0 until nWin) {
          var e = 0L
          for (j <- w * 80 until w * 80 + 80) {
            val c = (b(j) & 0xff) - 128L
            e += c * c
          }
          if (e < 156000L) {
            if (cur == 0L) { nRuns += 1; hash = (hash * 31 + w) % P }
            cur += 1; nSil += 1
            if (cur > maxRun) maxRun = cur
          } else cur = 0L
        }
        Some(id -> (nWin.toLong, nSil, nRuns, maxRun, hash))
      }
    }.toMap
    val out = graft.operators.Multimodal.audioSilence(spark, sf).collect()
    assert(out.length == expect.size)
    var totSil = 0L; var totFrames = 0L
    out.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(6)) == e, s"doc ${r.getLong(0)}")
      // run structure sanity: runs can't outnumber silent frames, and
      // the longest run can't exceed the silent total
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(4) <= r.getLong(2))
      totSil += r.getLong(2); totFrames += r.getLong(1)
    }
    // calibration guard, both directions (the sceneCuts discipline)
    assert(totSil > 0L, "no silent frame — threshold too low")
    assert(totSil < totFrames / 2,
      "over half the frames silent — threshold too high")
  }

  test("lateness audit: bit-exact against a shard-merge arrival replay") {
    val P = 1000000007L
    val ev = Tables.read(spark, sf, "events")
      .selectExpr("event_type", "event_id", "unix_micros(ts) as us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // replay: 4 id-sharded partitions, batch size b = max(n/2048, 4),
    // arrival order (cycle, shard, within-shard seq); the watermark base
    // for a batch is the max event time over all earlier batches
    val b = math.max(ev.length / 2048L, 4L)
    val byShard = ev.sortBy(_._2).groupBy(x => (x._2 % 4).toInt)
    val batched = byShard.toSeq.flatMap { case (shard, rows) =>
      rows.zipWithIndex.map { case ((t, id, us), i) =>
        (i / b, shard, t, id, us)
      }
    }.sortBy { case (cycle, shard, _, id, _) => (cycle, shard, id) }
    var hwm = Long.MinValue
    var curBatch = (-1L, -1)
    var pending = Long.MinValue // max of the in-flight batch
    val acc = scala.collection.mutable.Map[String, (Long, Long, Long, Long,
      Long)]().withDefaultValue((0L, 0L, 0L, 0L, 0L))
    val lateByType = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Long]]()
    batched.foreach { case (cycle, shard, t, id, us) =>
      if ((cycle, shard) != curBatch) { // batch boundary: watermark moves
        curBatch = (cycle, shard)
        if (pending > hwm) hwm = pending
        pending = Long.MinValue
      }
      val late = if (hwm == Long.MinValue) 0L else math.max(hwm - us, 0L)
      val (n, nl, mx, sm, ck) = acc(t)
      acc(t) = (n + 1, nl + (if (late > 0) 1L else 0L),
        math.max(mx, late), sm + late,
        if (late > 0) (ck + id % P) % P else ck)
      lateByType.getOrElseUpdate(t,
        scala.collection.mutable.ArrayBuffer[Long]()) += late
      if (us > pending) pending = us
    }
    // the watermark recommendation: linear-interpolated p99 over ALL of
    // a type's lateness values (zeros included — the percentile sizes a
    // delay budget for every arrival, not just the late tail)
    def p99(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val pos = 0.99 * (s.length - 1)
      val lo = pos.toInt
      if (lo + 1 >= s.length) s.last.toDouble
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val out = graft.operators.Events.latenessAudit(spark, sf).collect()
    assert(out.length == acc.size)
    var totLate = 0L
    out.foreach { r =>
      val t = r.getString(0)
      val e = acc(t)
      assert((r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
        r.getAs[Long]("max_late_us"), r.getAs[Long]("sum_late_us"),
        r.getAs[Long]("late_ids_checksum")) == e, s"type $t")
      val wm = r.getAs[Double]("wm_p99_us")
      assert(math.abs(wm - p99(lateByType(t).toSeq)) < 1e-3,
        s"type $t: wm_p99_us $wm != replay ${p99(lateByType(t).toSeq)}")
      // the recommendation must be non-vacuous (late tail exists) and
      // bounded by the observed worst case
      assert(wm > 0.0 && wm <= r.getAs[Long]("max_late_us").toDouble,
        s"type $t: wm_p99_us $wm outside (0, max]")
      totLate += r.getAs[Long]("n_late")
    }
    // the shard merge must actually produce late arrivals (the audit's
    // reason to exist: the raw feed has zero — any subsequence of a
    // time-sorted feed is sorted) but not degenerate to all-late;
    // ~55-60% late is the expected round-robin shape (every event behind
    // the frontier shard is late by a small cross-shard gap)
    assert(totLate > 0L, "no late event under the shard-merge replay")
    assert(totLate < ev.length, "every event late — replay degenerated")
  }

  test("secondary sort: one-pass running state bit-matches an in-memory" +
      " ordered replay") {
    val P = 1000000007L
    val ev = Tables.read(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).map { case (u, xs) =>
      val ordered = xs.sortBy(x => (x._3, x._2))
      var runMax = Long.MinValue
      var nAdv = 0L
      var cks = 0L
      var sumQ = 0L
      ordered.foreach { case (_, id, _, v) =>
        val vq = math.floor(v * 1000000.0 + 0.5).toLong
        sumQ += vq
        if (vq > runMax) {
          runMax = vq; nAdv += 1L; cks = (cks * 31L + id % P) % P
        }
      }
      u -> (ordered.length.toLong,
        BigDecimal(sumQ) / 1000000, nAdv, cks, ordered.last._2)
    }
    val got = graft.operators.Events.secondarySortTyped(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), BigDecimal(r.getDouble(2)), r.getLong(3),
          r.getLong(4), r.getLong(5))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (u, e) =>
      val g = got(u)
      assert(g._1 == e._1 && g._3 == e._3 && g._4 == e._4 && g._5 == e._5,
        s"user $u: $g != $e")
      assert((g._2 - e._2).abs < BigDecimal("0.0001"), s"user $u value_sum")
    }
    // the order-dependence is real on this fixture: some user's max
    // advances more than once but not every event (else the statistic
    // degenerates and the checksum gates nothing)
    assert(expect.values.exists(e => e._3 > 1L && e._3 < e._1),
      "running-max advances are degenerate — statistic gates nothing")
  }

  test("lateness replay: range-decomposed arrival sequence is" +
      " range-width invariant and equals the naive per-shard rank") {
    // the sequencer's contract: per-shard seq = rank of event_id within
    // the shard, whatever cell width the prefix-count decomposition
    // picks — tiny cells (many ranges), one giant cell (the naive
    // single-window shape), and the corpus-derived default must agree
    // bit-for-bit, at BOTH precision knobs
    def dump(msFloor: Boolean, rangeSize: Long): Seq[String] =
      graft.operators.Events.latenessReplay(spark, sf, nShards = 4,
          targetBatches = 512L, msFloor = msFloor, rangeSize = rangeSize)
        .select("event_id", "shard", "seq", "cycle", "late_us")
        .orderBy("event_id")
        .collect().map(_.toString).toSeq
    for (msFloor <- Seq(false, true)) {
      val dflt = dump(msFloor, 0L)
      val naive = dump(msFloor, Long.MaxValue / 4)
      val tiny = dump(msFloor, 7L)
      assert(dflt == naive, s"msFloor=$msFloor: default vs naive")
      assert(tiny == naive, s"msFloor=$msFloor: tiny cells vs naive")
      // and the naive shape itself must equal an in-memory per-shard rank
      val ids = Tables.read(spark, sf, "events").select("event_id")
        .collect().map(_.getLong(0)).sorted
      val expSeq = ids.groupBy(_ % 4).iterator.flatMap { case (_, xs) =>
        xs.sorted.iterator.zipWithIndex
          .map { case (id, i) => id -> (i + 1L) }
      }.toMap
      val gotSeq = graft.operators.Events.latenessReplay(spark, sf, 4,
          512L, msFloor = msFloor)
        .select("event_id", "seq").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotSeq == expSeq, s"msFloor=$msFloor: seq != in-memory rank")
    }
  }

  test("lateness projection lifecycle: one scan per family, zero jobs on" +
      " a memo hit, no CacheManager entry outlives the family") {
    val E = graft.operators.Events
    // fresh memo → the first call pays the one scan+checkpoint
    E.releaseEventsProjections()
    val (df1, n1) = E.eventsProjection(spark, sf, 4)
    assert(n1 > 0L)
    // a memo hit must run ZERO jobs (the one-pass property: the family's
    // later queries re-derive from the checkpoint, never re-scan)
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val (df2, n2) = E.eventsProjection(spark, sf, 4)
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      assert(df2 eq df1, "memo hit must return the same checkpoint")
      assert(n2 == n1)
      assert(jobs == 0, s"memo hit launched $jobs job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
    // the family leaves NO CacheManager entry (the r13 persist() did):
    // a fresh session running a declared lateness query end-to-end must
    // find the shared cache manager exactly as empty as it started
    spark.catalog.clearCache()
    E.releaseEventsProjections()
    val child = spark.newSession()
    assert(E.latenessAudit(child, sf).collect().nonEmpty)
    assert(child.sharedState.cacheManager.isEmpty,
      "lateness family left a CacheManager entry behind")
  }

  test("hash features: sparse vectors bit-match an in-memory hashing" +
      " replay") {
    val P = 1000000007L
    def polyHash(s: String): Long = {
      var a = 0L
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => a = (a * 31 + (b & 0xff)) % P)
      a
    }
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").toSeq)
    val expect = docs.map { case (id, toks) =>
      val byBin = toks.groupBy(t => (polyHash(t) % 64).toInt)
        .view.mapValues(_.size.toLong).toMap
      val nnz = byBin.size.toLong
      val (topBin, topCnt) = byBin.toSeq.sortBy { case (b, c) => (-c, b) }.head
      var cks = 0L
      byBin.toSeq.sortBy(_._1).foreach { case (b, c) =>
        cks = ((cks * 31 + b) * 31 + c) % P
      }
      id -> (toks.size.toLong, nnz, topBin, topCnt, cks)
    }.toMap
    val out = graft.operators.TextAnalysis.hashFeatures(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
        r.getLong(5)) == e, s"doc ${r.getLong(0)}")
    }
    // the 64-bin space must be genuinely shared on this corpus (vectors
    // collide into dense use), or the trick isn't exercised
    assert(out.map(_.getLong(2)).max >= 16L,
      "no document fills even a quarter of the feature space")
  }

  test("classifier score: per-lang rollup bit-matches an in-memory" +
      " linear-model replay, and the threshold genuinely splits") {
    val P = 1000000007L
    def polyHash(s: String): Long = {
      var a = 0L
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => a = (a * 31 + (b & 0xff)) % P)
      a
    }
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.trim.split("\\s+").toSeq))
    val scores = docs.map { case (_, lang, toks) =>
      val score = toks.groupBy(t => (polyHash(t) % 64).toInt)
        .map { case (b, ts) =>
          ts.size.toLong * graft.operators.TextAnalysis.classifierWeight(b)
        }.sum
      (lang, score)
    }
    val expect = scores.groupBy(_._1).view.mapValues { xs =>
      val ss = xs.map(_._2)
      (ss.size.toLong, ss.count(_ >= 0L).toLong, ss.count(_ < 0L).toLong,
        ss.min, ss.max,
        ss.map(s => ((s % P) + P) % P).foldLeft(0L)((a, x) => (a + x) % P))
    }.toMap
    val out = graft.operators.TextAnalysis.classifierScore(spark, sf)
      .collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) == e, s"lang ${r.getString(0)}")
    }
    // the zero threshold must genuinely partition the corpus — a filter
    // that keeps (or drops) everything proves nothing about the model
    val kept = out.map(_.getLong(2)).sum
    val dropped = out.map(_.getLong(3)).sum
    assert(kept > 0L, "classifier kept nothing — threshold too high")
    assert(dropped > 0L, "classifier dropped nothing — threshold too low")
  }

  test("classifier train: NB weights bit-match an in-memory replay;" +
      " trained separates a divergent-vocabulary corpus where the fixed" +
      " table cannot; fixture-trained weights match the replay") {
    import spark.implicits._
    // toy corpus with GENUINE vocabulary divergence (the real fixture's
    // text is lang-independent word salad — see the operator's scaladoc)
    val toy = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "en", "alpha beta gamma alpha delta beta")
      else (i.toLong, "xx", "omega sigma theta omega kappa sigma")
    }.toDF("doc_id", "lang", "text")
    // in-memory replay of the add-one bitlen log-odds training
    val P = 1000000007L
    def polyHash(s: String): Long = {
      var a = 0L
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => a = (a * 31 + (b & 0xff)) % P)
      a
    }
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val cpos = new Array[Long](64)
    val cneg = new Array[Long](64)
    toy.collect().foreach { r =>
      r.getString(2).split(" ").foreach { t =>
        val b = (polyHash(t) % 64).toInt
        if (r.getString(1) == "en") cpos(b) += 1 else cneg(b) += 1
      }
    }
    val (tp, tn) = (cpos.sum, cneg.sum)
    val expectW = Array.tabulate(64)(b =>
      bitlen(cpos(b) + 1) + bitlen(tn + 64) -
        bitlen(cneg(b) + 1) - bitlen(tp + 64))
    val gotW = graft.operators.TextAnalysis
      .trainedBinWeights(toy, 64, "en", vsAll = false)
    assert(gotW.toSeq == expectW.toSeq,
      "trained weight table diverges from the in-memory replay")
    // trained model fully separates the divergent corpus...
    val trained = graft.operators.TextAnalysis.classifierTrainOn(toy)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(trained("en") == ((20L, 20L, 0L)),
      s"trained must keep every positive doc: ${trained("en")}")
    assert(trained("xx") == ((20L, 0L, 20L)),
      s"trained must drop every negative doc: ${trained("xx")}")
    // ...where the fixed pseudo-random table is lang-blind: within this
    // corpus each lang is textually uniform, so fixed keeps all-or-none
    // of each side and cannot reach perfect accuracy on both
    val fixedScored = toy.select($"lang", graft.operators.TextAnalysis
      .classifierDocScore(spark).as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1) >= 0L))
    val fixedAcc = fixedScored.count { case (l, kept) =>
      kept == (l == "en") }.toDouble / fixedScored.length
    assert(fixedAcc < 1.0, "fixed table accidentally separates the toy")
    // real fixture: the text is lang-independent word salad, so en-vs-
    // rest accuracy is CHANCE for any 64-bin model (trained or fixed) —
    // no ordering between the two is signal there. What must hold is the
    // training math itself: the fixture-trained weight table bit-matches
    // an in-memory replay over the fixture's own token stream
    val fcpos = new Array[Long](64)
    val fcneg = new Array[Long](64)
    Tables.read(spark, sf, "documents").select("lang", "text").collect()
      .foreach { r =>
        r.getString(1).toLowerCase.trim.split("\\s+").foreach { t =>
          val b = (polyHash(t) % 64).toInt
          if (r.getString(0) == "en") fcpos(b) += 1 else fcneg(b) += 1
        }
      }
    val (ftp, ftn) = (fcpos.sum, fcneg.sum)
    val expectFixtureW = Array.tabulate(64)(b =>
      bitlen(fcpos(b) + 1) + bitlen(ftn + 64) -
        bitlen(fcneg(b) + 1) - bitlen(ftp + 64))
    val gotFixtureW = graft.operators.TextAnalysis.trainedBinWeights(
      Tables.read(spark, sf, "documents"), 64, "en", vsAll = false)
    assert(gotFixtureW.toSeq == expectFixtureW.toSeq,
      "fixture-trained weights diverge from the in-memory replay")
  }

  test("importance sample: selects the target-like slice of a divergent" +
      " in-memory corpus; fixture output is structurally consistent") {
    import spark.implicits._
    // target 'en' and 'cc' share a vocabulary; 'bb' diverges — DSIR
    // selection must keep the en-like docs (whatever their label) and
    // drop the divergent ones
    val toy = (0 until 60).map { i =>
      if (i % 3 == 0) (i.toLong, "en", "alpha beta gamma alpha delta beta")
      else if (i % 3 == 1) (i.toLong, "cc", "beta alpha delta gamma beta")
      else (i.toLong, "bb", "omega sigma theta omega kappa sigma")
    }.toDF("doc_id", "lang", "text")
    val sel = graft.operators.TextAnalysis.importanceSampleOn(toy)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(sel("en")._2 == sel("en")._1, "target slice must be selected")
    assert(sel("cc")._2 == sel("cc")._1,
      "target-DISTRIBUTED docs must be selected regardless of label")
    assert(sel("bb")._2 == 0L, "divergent docs must be dropped")
    // real fixture: target and raw distributions coincide (word salad) →
    // the bin log-ratios quantize to noise around 0 (exactly 0 at
    // sf0.01, ±1-bit rounding noise at other SFs), so NO selection-rate
    // direction is signal here — that's the divergent corpus's job
    // above. What must hold structurally: every language reported,
    // selection counts within bounds, rate = the rounded ratio
    val fixture = graft.operators.TextAnalysis.importanceSample(spark, sf)
      .collect()
    assert(fixture.map(_.getString(0)).toSet.contains("en"))
    fixture.foreach { r =>
      val (n, sel, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(sel >= 0L && sel <= n, s"lang ${r.getString(0)}: $sel of $n")
      assert(math.abs(rate - sel.toDouble / n) < 5e-5,
        s"lang ${r.getString(0)}: rate column inconsistent")
    }
  }

  test("pii scrub: precision/recall 1.0 on a planted corpus, redaction" +
      " idempotent, clean fixture sources report all-zero") {
    import spark.implicits._
    val T = graft.operators.TextAnalysis
    // planted in-memory corpus: exact ground truth per doc — ids 0-3
    // carry PII (email / ip / phone / all three), 4-7 are clean decoys
    // chosen to STRESS the tiers (an @ without a domain, a short digit
    // run, a two-dot version string, plain prose)
    val toy = Seq(
      (0L, "s0", "write to jane.doe+spam@mail.example.org for details"),
      (1L, "s0", "server at 192.168.001.7 answered"),
      (2L, "s1", "call 08001234567 now"),
      (3L, "s1", "bob@x.io or 10.0.0.1 or 5551234567"),
      (4L, "s0", "meet @ the cafe at 5"),
      (5L, "s0", "room 123456 floor 12"),
      (6L, "s1", "version 1.2.3 shipped"),
      (7L, "s1", "no contact information whatsoever")
    ).toDF("doc_id", "source", "text")
    val perDoc = T.piiScrubbedDocs(toy).collect()
      .map(r => r.getLong(0) -> r).toMap
    val flagged = perDoc.collect {
      case (id, r) if r.getLong(3) + r.getLong(4) + r.getLong(5) > 0 => id
    }.toSet
    assert(flagged == Set(0L, 1L, 2L, 3L),
      s"precision/recall must be 1.0 on the planted set, flagged $flagged")
    // tier attribution on the all-three doc
    val d3 = perDoc(3L)
    assert((d3.getLong(3), d3.getLong(4), d3.getLong(5)) == ((1L, 1L, 1L)),
      "doc 3 must count one match per tier")
    assert(d3.getString(6) == "<EMAIL> or <IP> or <PHONE>",
      s"redaction order must leave tokens intact: '${d3.getString(6)}'")
    // no PII survives its own scrub, and scrubbing is idempotent
    val rescrubbed = T.piiScrubbedDocs(
      T.piiScrubbedDocs(toy).select($"doc_id", $"source",
        $"scrubbed".as("text"))).collect()
    rescrubbed.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) + r.getLong(5) == 0L,
        s"doc ${r.getLong(0)}: PII survived the scrub")
      assert(r.getString(6) == r.getString(2),
        s"doc ${r.getLong(0)}: scrub not idempotent")
    }
    // clean decoys untouched
    Seq(4L, 5L, 6L, 7L).foreach { id =>
      assert(perDoc(id).getString(6) == perDoc(id).getString(2),
        s"clean doc $id was modified")
    }
    // fixture: the real corpus is digit-free word salad — every real
    // source must report all-zero (a clean bill IS the signal there);
    // the planted source carries the full non-vacuous contract
    val fix = T.piiScrub(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    fix.foreach { case (src, r) =>
      if (src != "planted")
        assert(r.getLong(2) == 0L && r.getLong(6) == 0L && r.getLong(7) == 0L,
          s"real source $src must be PII-free on this fixture")
    }
    val p = fix("planted")
    assert(p.getLong(1) == T.PiiPlantCount && p.getLong(2) == 14L &&
      p.getLong(3) == 7L && p.getLong(4) == 7L && p.getLong(5) == 7L,
      s"planted rollup off: ${p.toString}")
  }

  test("phash clusters: survival rollup matches a union-find over the" +
      " declared pair graph") {
    val pairs = graft.operators.Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no phash near-dup pair at this sf — vacuous")
    // in-memory union-find → min-labeled components (the CC fixpoint)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by min id: the keeper convention
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val removed = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
      .filter(d => find(d) != d).toSet
    val docs = Tables.read(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).view.mapValues { xs =>
      val rem = xs.filter(d => removed(d._1))
      val kept = xs.filterNot(d => removed(d._1))
      (xs.size.toLong, rem.size.toLong, kept.size.toLong,
        kept.map(_._3).sum, rem.map(_._3).sum)
    }.toMap
    val out = graft.operators.Multimodal.phashClusters(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e, s"lang ${r.getString(0)}")
    }
    assert(out.map(_.getLong(2)).sum == removed.size.toLong)
    assert(removed.nonEmpty, "pair graph resolved to zero removals")
  }

  test("audio dedup: planted twins detected with recall 1.0; survival" +
      " rollup matches a union-find over the declared pair graph") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    val base = Tables.read(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text")
    val maxId = base.agg(max($"doc_id")).head().getLong(0)
    // rebuild the declared corpus exactly as the operator does
    val planted = base.filter(length($"text") >= 64)
      .orderBy($"doc_id".asc).limit(M.AudioPlantCount)
      .select(($"doc_id" + maxId + 1L).as("doc_id"), $"lang",
        concat(lit("z"), expr("substring(text, 2)")).as("text"))
    val corpus = base.unionByName(planted)
    val pairs = M.audioDedupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "no audio near-dup pair — vacuous")
    // recall 1.0 on the planted set: every twin pairs with its source
    // (a 1-sample perturbation moves at most a couple of segment
    // energies across the mean)
    val plantedIds = planted.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    plantedIds.foreach { twin =>
      val src = twin - maxId - 1L
      assert(pairSet.contains((src, twin)),
        s"planted twin $twin of $src not detected")
    }
    // union-find differential over the FULL declared pair graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val removed = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
      .filter(d => find(d) != d).toSet
    assert(plantedIds.forall(removed),
      "a planted twin survived dedup — keeper convention broken")
    val docs = corpus.select($"doc_id", $"lang",
        length($"text").cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).view.mapValues { xs =>
      val rem = xs.filter(d => removed(d._1))
      val kept = xs.filterNot(d => removed(d._1))
      (xs.size.toLong, rem.size.toLong, kept.size.toLong,
        kept.map(_._3).sum, rem.map(_._3).sum)
    }.toMap
    val out = M.audioDedup(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e, s"lang ${r.getString(0)}")
    }
  }

  test("video dedup: planted twins detected with recall 1.0; survival" +
      " rollup matches a union-find over the declared pair graph") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    val base = Tables.read(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text")
    val maxId = base.agg(max($"doc_id")).head().getLong(0)
    // rebuild the declared corpus exactly as the operator does
    val planted = base
      .filter(length($"text") >= 16L * M.VideoMinFrames * 2)
      .orderBy($"doc_id".asc).limit(M.VideoPlantCount)
      .select(($"doc_id" + maxId + 1L).as("doc_id"), $"lang",
        concat(lit("z"), expr("substring(text, 2)")).as("text"))
    val corpus = base.unionByName(planted)
    val scan = M.videoScan(corpus).localCheckpoint(true)
    val pairs = M.videoDedupPairs(scan).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "no video near-dup pair — vacuous")
    // recall 1.0 on the planted set: the twin's one changed byte lives
    // in frame 0, so segment 0's key changes but segments 1-3 propose
    // the pair and >= 15 of 16 sampled frame hashes still match
    val plantedIds = planted.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    plantedIds.foreach { twin =>
      val src = twin - maxId - 1L
      assert(pairSet.contains((src, twin)),
        s"planted twin $twin of $src not detected")
    }
    // every confirmed pair clears the integer match floor
    pairs.foreach { case (a, b, m) =>
      assert(m >= M.VideoMatchFloor && m <= 16, s"($a,$b) n_match=$m")
    }
    // union-find differential over the FULL declared pair graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val removed = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
      .filter(d => find(d) != d).toSet
    assert(plantedIds.forall(removed),
      "a planted twin survived dedup — keeper convention broken")
    val docs = scan.select($"doc_id", $"lang", $"frames").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).view.mapValues { xs =>
      val rem = xs.filter(d => removed(d._1))
      val kept = xs.filterNot(d => removed(d._1))
      (xs.size.toLong, rem.size.toLong, kept.size.toLong,
        kept.map(_._3).sum, rem.map(_._3).sum)
    }.toMap
    val out = M.videoDedup(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e, s"lang ${r.getString(0)}")
    }
  }

  test("hilbert write: zone-map prune is partial, exact, and matches a" +
      " pruning-free replay") {
    val P = 1000000007L
    val (xLo, xHi, yLo, yHi) = graft.operators.RefQueries.HilbertRect
    val r = graft.operators.RefQueries.qHilbertWrite(spark, sf).head()
    val (nTotal, nScanned, nRows, cks) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // pruning must be REAL (skips buckets) without being vacuous
    assert(nScanned > 0L && nScanned < nTotal,
      s"scan covered $nScanned of $nTotal buckets — no pruning evidence")
    assert(nRows > 0L, "rectangle matched nothing — vacuous scan")
    // pruning-free replay straight from the raw orders table: grid,
    // rectangle, checksum — if the bucket prefilter lost a row (zone-map
    // soundness violated), the counts/checksum diverge here
    val ord = Tables.read(spark, sf, "orders")
      .selectExpr("o_orderkey", "CAST(o_custkey AS LONG) AS ck",
        "CAST(datediff(CAST(o_orderdate AS date), DATE'1992-01-01') " +
          "AS LONG) AS day")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val (ckMin, ckMax) = (ord.map(_._2).min, ord.map(_._2).max)
    val (dayMin, dayMax) = (ord.map(_._3).min, ord.map(_._3).max)
    val hits = ord.filter { case (_, ck, day) =>
      val x8 = (ck - ckMin) * 256 / (ckMax - ckMin + 1)
      val y8 = (day - dayMin) * 256 / (dayMax - dayMin + 1)
      x8 >= xLo && x8 <= xHi && y8 >= yLo && y8 <= yHi
    }
    assert(nRows == hits.length.toLong)
    val expectCks = hits.map { case (k, _, _) => (k % P) * (k % P) % P }
      .foldLeft(0L)((a, x) => (a + x) % P)
    assert(cks == expectCks, "pruned-scan checksum diverged from replay")
  }

  test("zorder write twin: same exact answer as hilbert; on the written" +
      " tables the hilbert layout scans fewer partitions (sf0.01 — the" +
      " dense-grid regime)") {
    // both prunes are exact, so the answers must coincide curve-for-curve
    val h = graft.operators.RefQueries.qHilbertWrite(spark, sf).head()
    val z = graft.operators.RefQueries.qZorderWrite(spark, sf).head()
    assert(h.getLong(2) == z.getLong(2) && h.getLong(3) == z.getLong(3),
      "the two curve layouts returned different rectangle answers")
    assert(z.getLong(1) > 0L && z.getLong(1) < z.getLong(0),
      "zorder scan shows no pruning evidence")
    // the measurement: partitions actually skipped on PHYSICALLY WRITTEN
    // tables. At sf0.001 the 256×256 grid holds ~1.5k orders — zone maps
    // reflect occupancy noise and the curves tie within ±2% (hilbert 229
    // vs morton 225) — so the comparison is made at sf0.01, where the
    // grid is dense and Hilbert's adjacency genuinely prunes more
    // (measured 544 vs 556). The zone-AREA spec above is the same claim
    // on virtual buckets; this is the write-path version the
    // q_hilbert_write protocol actually exercises.
    val hd = graft.operators.RefQueries.qHilbertWrite(spark, SparkSpec.sfDense).head()
    val zd = graft.operators.RefQueries.qZorderWrite(spark, SparkSpec.sfDense).head()
    assert(hd.getLong(2) == zd.getLong(2) && hd.getLong(3) == zd.getLong(3))
    info(s"sf0.01 buckets scanned: hilbert ${hd.getLong(1)} of " +
      s"${hd.getLong(0)}, morton ${zd.getLong(1)} of ${zd.getLong(0)}")
    assert(hd.getLong(1) < zd.getLong(1),
      s"hilbert (${hd.getLong(1)}) must scan fewer written partitions " +
        s"than morton (${zd.getLong(1)}) on the dense grid")
  }

  test("compaction: fewer files, full row/checksum + rectangle" +
      " invariance, and each compacted file holds a disjoint contiguous" +
      " hbucket range") {
    compactionGate(
      graft.operators.RefQueries.qHilbertWrite(spark, sf).head(),
      graft.operators.RefQueries.qCompactScan(spark, sf).head(),
      graft.sources.Etl.compactHilbertFixture(spark, sf))
  }

  test("compaction (Z-order): the shared curve-agnostic pass holds the" +
      " identical gate on the Morton layout") {
    compactionGate(
      graft.operators.RefQueries.qZorderWrite(spark, sf).head(),
      graft.operators.RefQueries.qCompactScanZ(spark, sf).head(),
      graft.sources.Etl.compactZorderFixture(spark, sf))
  }

  /** The full compaction evidence, shared by both curves: fewer files,
    * rectangle answer identical to the uncompacted scan's, zone-map
    * pruning non-vacuous, full row/checksum invariance against the
    * SOURCE orders table, and per-file hbucket ranges pairwise disjoint
    * ON DISK. `h` = the uncompacted write-scan row, `c` = the compact
    * scan row, `comp` = the compacted fixture path. */
  private def compactionGate(h: org.apache.spark.sql.Row,
      c: org.apache.spark.sql.Row, comp: String): Unit = {
    // (n_files_before, n_files_after, n_bins_scanned, n_rows,
    //  key_checksum, n_rect_rows, rect_checksum)
    assert(c.getLong(1) < c.getLong(0),
      s"compaction must reduce files: ${c.getLong(0)} -> ${c.getLong(1)}")
    assert(c.getLong(1) > 1L,
      "a single-file result would make the layout claims vacuous")
    // the rectangle answer must be EXACTLY the uncompacted scan's
    assert(c.getLong(5) == h.getLong(2) && c.getLong(6) == h.getLong(3),
      "compacted rectangle scan diverged from the uncompacted answer")
    assert(c.getLong(2) > 0L && c.getLong(2) < c.getLong(1),
      "compacted zone maps show no pruning evidence")
    // full-table invariance against the SOURCE orders table
    val P = 1000000007L
    val keys = Tables.read(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(c.getLong(3) == keys.length.toLong, "row count changed")
    val cks = keys.map(k => (k % P) * (k % P) % P)
      .foldLeft(0L)((a, x) => (a + x) % P)
    assert(c.getLong(4) == cks, "key checksum changed")
    // zone-map soundness ON DISK: per-file hbucket ranges are pairwise
    // disjoint (bins are contiguous bucket ranges; an overlap would make
    // a bin's bbox unsound for pruning)
    val perFile = spark.read
      .parquet(s"$comp/${graft.sources.Etl.HilbertTableDir}")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("hbucket").cast("long")).as("lo"),
        max(col("hbucket").cast("long")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length.toLong == c.getLong(1),
      "file census disagrees with the declared n_files_after")
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file bucket ranges overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }
  }

  test("delete rewrite (COW): untouched partition files carry over" +
      " intact, touched partitions hold only fresh files, fully-dead" +
      " dirs removed, survivors equal a predicate-delete replay") {
    val E = graft.sources.Etl
    val R = graft.operators.RefQueries
    val src = E.hilbertOrdersFixture(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_cow_spec")
      .toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    try {
      E.copyDir(new java.io.File(src), root)
      val table = new java.io.File(root, E.HilbertTableDir)
      def snapshot(): Map[String, (Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(table).filter(_.getName.startsWith("part-"))
          .map(f => f.getAbsolutePath.stripPrefix(table.getAbsolutePath)
            -> ((f.length, f.lastModified))).toMap
      }
      val before = snapshot()
      val (_, touched) = E.cowSurvivors(spark, src, R.HilbertRect)
      val touchedSet = touched.toSet
      E.cowDeleteRect(spark, src, root, R.HilbertRect)
      val after = snapshot()
      def bucketOf(p: String): Long =
        "hbucket=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
      // untouched partitions: identical file sets, sizes AND mtimes
      // unchanged — the physical proof the delete never rewrote them
      val ub = before.filter { case (p, _) => !touchedSet(bucketOf(p)) }
      val ua = after.filter { case (p, _) => !touchedSet(bucketOf(p)) }
      assert(ub.nonEmpty, "no untouched partition — prune vacuous")
      assert(ua == ub, "untouched partition files changed")
      // touched partitions: dynamic overwrite replaced every old file
      val tb = before.keySet.filter(p => touchedSet(bucketOf(p)))
      val ta = after.keySet.filter(p => touchedSet(bucketOf(p)))
      assert(tb.nonEmpty && ta.nonEmpty, "no touched partition — vacuous")
      assert(tb.intersect(ta).isEmpty,
        "a touched partition kept a stale file")
      // survivors equal the predicate-delete replay over the source
      val (xLo, xHi, yLo, yHi) = R.HilbertRect
      val expect = spark.read.parquet(s"$src/${E.HilbertTableDir}")
        .filter(!(col("x8").between(xLo, xHi) &&
          col("y8").between(yLo, yHi)))
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      val got = spark.read.parquet(table.getAbsolutePath)
      val gotKeys = got.select("o_orderkey").collect()
        .map(_.getLong(0)).sorted
      assert(java.util.Arrays.equals(gotKeys, expect),
        "survivors differ from the predicate-delete replay")
      // fully-deleted buckets left no directory behind
      val alive = got.select(col("hbucket").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      touchedSet.diff(alive).foreach { b =>
        assert(!new java.io.File(table, s"hbucket=$b").exists(),
          s"fully-deleted bucket dir hbucket=$b survived")
      }
    } finally rm(root)
  }

  test("merge rewrite (COW): untouched partition files carry over" +
      " intact, every row sits at its recomputed curve position, keys" +
      " change by exactly the inserts, movers genuinely relocated") {
    val E = graft.sources.Etl
    val R = graft.operators.RefQueries
    val src = E.hilbertOrdersFixture(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_merge_spec")
      .toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    try {
      E.copyDir(new java.io.File(src), root)
      val table = new java.io.File(root, E.HilbertTableDir)
      def snapshot(): Map[String, (Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(table).filter(_.getName.startsWith("part-"))
          .map(f => f.getAbsolutePath.stripPrefix(table.getAbsolutePath)
            -> ((f.length, f.lastModified))).toMap
      }
      val before = snapshot()
      val (_, touched) = E.cowMergeStripe(spark, sf, src, root)
      val touchedSet = touched.toSet
      val after = snapshot()
      def bucketOf(p: String): Long =
        "hbucket=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
      // untouched partitions: identical file sets, sizes AND mtimes
      val ub = before.filter { case (p, _) => !touchedSet(bucketOf(p)) }
      val ua = after.filter { case (p, _) => !touchedSet(bucketOf(p)) }
      assert(ub.nonEmpty, "no untouched partition — prune vacuous")
      assert(ua == ub, "untouched partition files changed")
      // touched partitions present before AND after were fully replaced
      val tb = before.keySet.filter(p => touchedSet(bucketOf(p)))
      val ta = after.keySet.filter(p => touchedSet(bucketOf(p)))
      assert(tb.nonEmpty && ta.nonEmpty, "no touched partition — vacuous")
      assert(tb.intersect(ta).isEmpty,
        "a touched partition kept a stale file")
      val merged = spark.read.parquet(table.getAbsolutePath)
        .withColumn("hbucket", col("hbucket").cast("long"))
        .localCheckpoint(true)
      // every row self-consistent with the curve: the partition dir, the
      // stored hidx, and the stored grid coords must agree — a relocated
      // row written to a stale bucket fails here
      graft.functions.HilbertIndex.register(spark)
      val bad = merged.filter(
        col("hbucket") =!= expr("hidx div 24") ||
          col("hidx") =!= expr("hilbert_xy2d(x8, y8)")).count()
      assert(bad == 0L, s"$bad rows off their curve position")
      // key set = source keys ∪ re-keyed inserts
      val srcKeys = spark.read.parquet(s"$src/${E.HilbertTableDir}")
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      graft.functions.Mix64.register(spark)
      val keyOff = E.mergeKeyOffset(spark, sf)
      val expectIns = Tables.read(spark, sf, "orders")
        .filter(pmod(call_function("mix64", col("o_orderkey")),
          lit(R.MergeInsertMod)) === 0L)
        .select("o_orderkey").collect()
        .map(_.getLong(0) + keyOff).toSet
      val gotKeys = merged.select("o_orderkey").collect()
        .map(_.getLong(0)).toSet
      assert(gotKeys == srcKeys ++ expectIns,
        s"merged key set drifted: missing=" +
          s"${(srcKeys ++ expectIns).diff(gotKeys).take(3)} extra=" +
          s"${gotKeys.diff(srcKeys ++ expectIns).take(3)}")
      assert(expectIns.nonEmpty, "insert batch empty — vacuous")
      // movers genuinely relocated: every stripe row (they keep x8)
      // changed its y8 vs the source — the day shift moves ≥ 1 y-cell
      val (sLo, sHi) = R.MergeStripe
      val srcY = spark.read.parquet(s"$src/${E.HilbertTableDir}")
        .filter(col("x8").between(sLo, sHi))
        .select("o_orderkey", "y8").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(srcY.nonEmpty, "stripe empty — update half vacuous")
      val movedY = merged
        .filter(col("x8").between(sLo, sHi) &&
          col("o_orderkey") < keyOff)
        .select("o_orderkey", "y8").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(movedY.keySet == srcY.keySet,
        "update half changed the stripe's key membership")
      val unmoved = movedY.count { case (k, y) => srcY(k) == y }
      assert(unmoved == 0,
        s"$unmoved stripe rows kept their y8 — day shift had no effect")
    } finally rm(root)
  }

  test("time travel: version 0 stays byte-complete after the delete" +
      " created version 1, and each snapshot answers through its own" +
      " zone maps") {
    val R = graft.operators.RefQueries
    val rows = R.qTimeTravel(spark, sf).collect()
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set(0, 1))
    val (n0, cs0, rect0) = rows(0)
    val (n1, cs1, rect1) = rows(1)
    // version 0 equals the SOURCE orders exactly — building version 1
    // never mutated history (the COW guarantee, read back)
    val P = graft.operators.TextAnalysis.ChecksumP
    val direct = Tables.read(spark, sf, "orders")
      .agg(count(lit(1)),
        pmod(sum((pmod(col("o_orderkey"), lit(P)) *
            pmod(col("o_orderkey"), lit(P)) % P).cast("decimal(38,0)")),
          lit(P).cast("decimal(38,0)")).cast("long"))
      .head()
    assert(n0 == direct.getLong(0) && cs0 == direct.getLong(1),
      s"version 0 drifted from source: ($n0, $cs0) vs $direct")
    // v0 still sees every predicate row; v1 sees none; the delta is
    // exactly the rectangle
    assert(rect0 > 0L, "v0 must still see the deleted rows")
    assert(rect1 == 0L, s"v1 rectangle must be empty, got $rect1")
    assert(n0 - n1 == rect0,
      s"delete must have removed exactly the rectangle rows:" +
        s" $n0 - $n1 != $rect0")
    assert(cs0 != cs1, "survivor checksum must differ from v0's")
  }

  test("part-file census: the JVM walk and the Hadoop listing agree on" +
      " a real fixture") {
    // countPartFiles dispatches on the path's FS scheme (local → JVM
    // walk, remote → Hadoop listing); the two branches must count the
    // same files or the object-store path silently drifts
    val R = graft.operators.RefQueries
    val dir = s"${graft.sources.Etl.compactHilbertFixture(spark, sf)}/" +
      graft.sources.Etl.HilbertTableDir
    val viaWalk = R.listPartFiles(spark, dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    assert(viaWalk.nonEmpty)
    assert(viaWalk.sorted == R.hadoopPartFiles(fs, path).sorted,
      "census branches disagree")
  }

  test("peaks: every reported day is a strict local maximum") {
    val daily = Tables.read(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    val byType = daily.keys.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val expect = byType.toSeq.flatMap { case (t, days) =>
      days.sliding(3).collect {
        case Seq(a, b, c)
            if daily((t, b)) > daily((t, a)) && daily((t, b)) > daily((t, c)) =>
          (t, b)
      }
    }.toSet
    val out = Events.peakDetection(spark, sf).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == expect,
      "peak set must equal the strict-local-maximum reference")
    assert(expect.nonEmpty, "fixture must actually contain peaks")
    out.foreach { r =>
      assert(r.getLong(2) > r.getLong(3) && r.getLong(2) > r.getLong(4))
    }
  }

  test("snapshot diff: classes partition the key universe") {
    import java.sql.Timestamp
    val cutoff = Timestamp.valueOf(
      graft.operators.Events.DiffCutoff + " 00:00:00")
    val ev = Tables.read(spark, sf, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val aKeys = ev.filter(_._2.before(cutoff)).map(_._1).toSet
    val bKeys = ev.filter(e => !e._2.before(cutoff)).map(_._1).toSet
    val out = graft.operators.Events.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.getOrElse("added", 0L) == (bKeys -- aKeys).size.toLong)
    assert(out.getOrElse("removed", 0L) == (aKeys -- bKeys).size.toLong)
    assert(out.values.sum == (aKeys ++ bKeys).size.toLong,
      "status classes must partition the full-outer key universe")
  }

  test("set ops: counts decompose by inclusion-exclusion") {
    val r = graft.operators.RefQueries.qSetOps(spark, sf).collect()
    assert(r.length == 1)
    val Array(nW1, nW2, nBoth, nOnly1, nOnly2, nUnion) =
      (0 to 5).map(r.head.getLong).toArray
    assert(nBoth + nOnly1 == nW1, "w1 must split into both + only-w1")
    assert(nBoth + nOnly2 == nW2, "w2 must split into both + only-w2")
    assert(nUnion == nBoth + nOnly1 + nOnly2, "union decomposition")
    assert(nBoth > 0 && nOnly1 > 0 && nOnly2 > 0,
      "fixture must exercise all three regions")
  }

  test("unpivot: melt is the exact inverse of the pivot") {
    val out = Events.unpivotCounts(spark, sf).collect()
    val users = Tables.read(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(out.length.toLong == users * 5, "users x 5 type columns")
    val totals = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val expect = Tables.read(spark, sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals == expect, "per-user melt totals must equal event counts")
  }

  test("hll intersect: every unordered pair, exact side right, sketch in band") {
    import spark.implicits._
    val ut = Tables.read(spark, sf, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ut.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val expectPairs = for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield (types(i), types(j))
    val out = Sketches.hllIntersect(spark, sf).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq.sorted ==
      expectPairs.sorted, "one row per unordered type pair")
    out.foreach { r =>
      val exact = (byType(r.getString(0)) & byType(r.getString(1))).size
      assert(r.getLong(2) == exact.toLong,
        s"${r.getString(0)}∩${r.getString(1)}: exact side wrong")
      assert(r.getDouble(3) >= 0.0, "clamped estimate cannot be negative")
      assert(r.getBoolean(4),
        s"${r.getString(0)}∩${r.getString(1)}: estimate ${r.getDouble(3)} " +
          s"outside the 50% band of $exact")
    }
  }

  test("ohlc bars: open/close agree with a per-bar total-order reference") {
    val ev = Tables.read(spark, sf, "events")
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.toString.take(10),
        (r.getTimestamp(1).getTime, r.getLong(2)), r.getDouble(3)))
    val bars = ev.groupBy(e => (e._1, e._2))
    val out = Events.ohlcBars(spark, sf).collect()
    assert(out.length == bars.size)
    out.foreach { r =>
      val rows = bars((r.getString(0), r.getString(1))).sortBy(_._3)
      assert(r.getLong(2) == rows.length.toLong, "n_events")
      assert(r.getDouble(3) == rows.head._4, "open = first in total order")
      assert(r.getDouble(6) == rows.last._4, "close = last in total order")
      assert(r.getDouble(4) == rows.map(_._4).max, "high")
      assert(r.getDouble(5) == rows.map(_._4).min, "low")
    }
  }

  test("dwell time: gaps decompose exactly, cap is one-sided") {
    val out = Events.dwellTime(spark, sf).collect()
    val nUsers = Tables.read(spark, sf, "events")
      .select("user_id").distinct().count()
    val nEvents = Tables.read(spark, sf, "events").count()
    // every event except each user's last contributes exactly one gap
    assert(out.map(_.getLong(1)).sum == nEvents - nUsers,
      "gap count must be events minus one per user")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "capped subset of gaps")
      // capped mean can never exceed the cutoff
      assert(r.getDouble(4) <= 30 * 60.0 + 1e-9,
        s"${r.getString(0)}: mean dwell exceeds the idle cutoff")
    }
  }

  test("gap fill: continuous per-user spine, fill only on gaps") {
    val out = Events.gapFill(spark, sf).collect()
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val days = rows.map(r => java.time.LocalDate.parse(r.getString(1)))
      val span = java.time.temporal.ChronoUnit.DAYS
        .between(days.min, days.max) + 1
      assert(days.length.toLong == span && days.distinct.length == days.length,
        s"user $u: spine not continuous (${days.length} rows, span $span)")
      val sorted = rows.sortBy(_.getString(1))
      assert(!sorted.head.getBoolean(3), s"user $u: first day cannot be a gap")
      var lastObserved = sorted.head.getDouble(4)
      sorted.foreach { r =>
        if (r.getBoolean(3)) {
          assert(r.getLong(2) == 0L, "gap day must carry zero events")
          assert(r.getDouble(4) == lastObserved,
            s"user $u ${r.getString(1)}: fill is not the last observed value")
        } else lastObserved = r.getDouble(4)
      }
    }
  }
}
