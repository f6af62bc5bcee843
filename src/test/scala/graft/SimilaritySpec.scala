package graft

import graft.operators.Similarity
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions.{broadcast, expr, round}

/** Similarity-search behavior: brute force is the exact reference; the LSH
  * tier must return a subset of the corpus ranked consistently. */
class SimilaritySpec extends SparkSpec {

  test("cell assignment tie-break: a 16-way exact cosine tie lands on" +
      " the lowest cell_id") {
    // the fixture never produces exact cosine ties, so the max_by
    // struct(cell_cos, -cell_id) tie-break is otherwise uncovered: an
    // all-identical corpus makes EVERY centroid seed the same vector,
    // every assignment a 16-way exact tie — a regressed tie-break
    // (dropped negation, wrong field order) scatters vectors or lands
    // them on cell 15, and the Lloyd update must hold the tie through
    // both iterations (integer mean of equal quantized vectors is
    // exact, so cell 0's refit centroid stays bit-equal to the others)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tie").toString
    (0L until 20L).map(i => (i, Array.fill(64)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.kmeansClusters(spark, dir).collect()
    assert(out.length == 16)
    out.foreach { r =>
      val (cell, n, norm) = (r.getInt(0), r.getLong(1), r.getDouble(2))
      assert(n == (if (cell == 0) 20L else 0L),
        s"cell $cell holds $n vectors — tie-break regressed")
      assert(norm == 4.0, s"cell $cell centroid norm $norm != 4.0")
    }
  }

  test("brute force: 3 queries × top-5, cosine within [-1, 1], rank ordered") {
    val rows = Similarity.topKBruteForce(spark, sf).collect()
    assert(rows.length == 15)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { g =>
      val cos = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cos.sameElements(cos.sorted.reverse), "rank must follow cosine desc")
    }
  }

  test("LSH top-k cosines never exceed the brute-force cosine at same rank") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), r.getDouble(2))).toMap
    val lsh = Similarity.topKLsh(spark, sf).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getInt(3))
      brute.get(key).foreach { b =>
        assert(r.getDouble(2) <= b + 1e-9,
          s"LSH rank ${key._2} for query ${key._1} beats exact top-k")
      }
    }
  }

  test("IVF top-k cosines never exceed the brute-force cosine at same rank") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), r.getDouble(2))).toMap
    val ivf = Similarity.topKIvf(spark, sf).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getInt(3))
      brute.get(key).foreach { b =>
        assert(r.getDouble(2) <= b + 1e-9,
          s"IVF rank ${key._2} for query ${key._1} beats exact top-k")
      }
    }
  }

  test("ANN recall@5 floors vs exact baseline (measured with margin)") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.topKLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.topKIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = (lsh & brute).size.toDouble / brute.size
    val ivfRecall = (ivf & brute).size.toDouble / brute.size
    // measured at sf0.001 under the r9 mix64 (skew-immune) seeding:
    // lsh 0.60, ivf 0.47 — floors leave margin. The pre-r9 ivf floor
    // of 0.7 was INFLATED by an accident of the old first-N-ids seeds:
    // queries 0-2 were themselves centroids, so each query's home cell
    // was centered exactly on it. Sign-LSH recall is inherently modest
    // on this synthetic corpus (max off-diagonal cosine ≈ 0.5: no true
    // near neighbors to preserve); IVF probes 4/16 cells — recall is a
    // nprobe knob, not a fixed property (0.80 at nprobe=8, exact at 16;
    // see the equality test below).
    assert(lshRecall >= 0.3, f"LSH recall@5 $lshRecall%.2f below floor")
    assert(ivfRecall >= 0.4, f"IVF recall@5 $ivfRecall%.2f below floor")
  }

  test("batched serving shape: per-query results identical to the" +
      " per-query IVF path; every corpus vector in the batch window is" +
      " served") {
    // same centroids, probe selection, and rerank per query — so the
    // batch result restricted to the per-query path's query ids must be
    // ROW-IDENTICAL (ids, cosines, ranks), which makes batch recall
    // equal to per-query recall by construction
    val batch = Similarity.topKBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val perQuery = Similarity.topKIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(batch.filter(_._1 < 3).sortBy(x => (x._1, x._4)).toSeq ==
      perQuery.sortBy(x => (x._1, x._4)).toSeq,
      "batch results drifted from the per-query IVF path")
    // non-vacuity: the batch genuinely serves a SET (every corpus vector
    // under the id-64 window got its k results), not just the 3 literals
    val nQ = batch.map(_._1).distinct.length
    val expected = math.min(64L,
      Tables.read(spark, sf, "embeddings").count())
    assert(nQ.toLong == expected,
      s"expected $expected served queries, got $nQ")
    // k-bounded per query; a sparse probed-cell set may return < k, but
    // never zero (each query's own cell holds at least one other vector
    // on this corpus) and never more than k
    assert(batch.groupBy(_._1).values
        .forall(g => g.length >= 1 && g.length <= 5),
      "per-query result count outside [1, k]")
  }

  test("IVF with nprobe = nCells is EXACTLY brute force — both variants") {
    // probing every cell degrades IVF to an exact scan regardless of
    // where the centroids sit: the output must equal the brute-force
    // baseline row-for-row (ids, rounded cosines, ranks). This is the
    // structural guarantee that survives any seeding policy — the
    // recall floors above are fixture measurements, this is an identity
    val brute = Similarity.topKBruteForce(spark, sf)
    assertSameRows(Similarity.topKIvf(spark, sf, nprobe = 16), brute)
    assertSameRows(Similarity.topKIvfKmeans(spark, sf, nprobe = 16), brute)
  }

  test("IVF with k-means centroids: recall floor + monotone in nprobe") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nprobe: Int): Double = {
      val km = Similarity.topKIvfKmeans(spark, sf, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (km & brute).size.toDouble / brute.size
    }
    // measured at sf0.001 under mix64 seeding: 0.33 at nprobe=4,
    // 0.60 at nprobe=8 (the pre-r9 0.85 floor rode the query==centroid
    // coincidence, see the recall-floors test). The floor guards against
    // an assignment/probe indexing bug (~chance ≈ 5/500 ≈ 0.01), and
    // widening the probe set must never lose a neighbor the narrow set
    // found — candidates only grow with nprobe.
    val r4 = recallAt(4)
    val r8 = recallAt(8)
    assert(r4 >= 0.3, f"k-means IVF recall@5 $r4%.2f below floor")
    assert(r8 >= r4,
      f"recall fell from $r4%.2f to $r8%.2f when DOUBLING nprobe")
  }

  test("PQ/ADC: candidate generation — exact neighbors sit in the ADC" +
      " front of the list") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // production PQ is a CANDIDATE GENERATOR: ADC ranks the corpus in
    // the compressed domain and an exact rerank reads the front. The
    // meaningful fixture guarantee is therefore recall@5-in-topR for a
    // rerank budget R — measured 0.73 at R=100 (a 20% corpus slice)
    // under mix64 codebook seeding, vs ≈ 0.2 by chance; an encode /
    // ADC-table indexing bug drives it to chance
    val adc100 = Similarity.topKPq(spark, sf, k = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallIn100 = (adc100 & brute).size.toDouble / brute.size
    info(f"PQ recall@5-in-top100 = $recallIn100%.2f")
    assert(recallIn100 >= 0.6,
      f"PQ recall@5-in-top100 $recallIn100%.2f below floor")
  }

  test("PQ training: Lloyd-refined codebook sharpens the ADC front") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val s = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      (s & brute).size.toDouble / brute.size
    }
    // measured at sf0.001: seeded-codebook recall@5 = 0.00, trained =
    // 0.20 — per-subspace Lloyd moves codewords to subvector mass
    // centers and the compressed-domain ORDER sharpens at the front.
    // Training must never make the direct top-5 worse than the raw
    // sample it started from
    val seeded = recall(Similarity.topKPq(spark, sf).collect())
    val trained = recall(Similarity.topKPqKmeans(spark, sf).collect())
    info(f"PQ recall@5: seeded $seeded%.2f, Lloyd-trained $trained%.2f")
    assert(trained >= seeded,
      f"training REDUCED direct recall: $trained%.2f < $seeded%.2f")
    // and the candidate-generation guarantee holds for the trained
    // codebook too (0.73 measured, ≈0.2 by chance)
    val in100 = recall(Similarity.topKPqKmeans(spark, sf, k = 100).collect())
    assert(in100 >= 0.6,
      f"trained-PQ recall@5-in-top100 $in100%.2f below floor")
  }

  test("IVF-PQ: ranked shape, probe-widening monotonicity, candidate floor") {
    val rows = Similarity.topKIvfPq(spark, sf).collect()
    assert(rows.nonEmpty)
    // per query: ranks consecutive from 1, ADC distance ascending
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length),
        s"query $q: ranks not consecutive")
      val d = sorted.map(_.getDouble(2))
      assert(d.zip(d.drop(1)).forall { case (a, b) => a <= b + 1e-9 },
        s"query $q: ADC distance must ascend with rank")
    }
    // a given (query, vector) pair's ADC distance does not depend on
    // nprobe, so widening the probe set can only improve (or tie) the
    // distance found at each rank — the IVF-PQ analogue of the IVF
    // nprobe-monotonicity guarantee
    val wide = Similarity.topKIvfPq(spark, sf, nprobe = 16).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), r.getDouble(2))).toMap
    rows.foreach { r =>
      wide.get((r.getLong(0), r.getInt(3))).foreach { w =>
        assert(r.getDouble(2) >= w - 1e-9,
          s"narrow probe beat wide probe at (${r.getLong(0)}, ${r.getInt(3)})")
      }
    }
    // candidate-generation floor with every cell probed (flat scan in the
    // compressed RESIDUAL domain): measured 0.40 at sf0.001 vs ≈ 0.2 by
    // chance (top-100 of ~500). On this synthetic corpus residual PQ has
    // no headroom over raw-vector PQ (0.73): vectors are near-random with
    // no cluster structure, so residuals against arbitrary seed centroids
    // are exactly as hard to quantize as the raw vectors — the residual
    // win only materializes when cells capture real density. The floor
    // guards against an encode / ADC-table / cell-join indexing bug,
    // which drives recall to chance
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val front = Similarity.topKIvfPq(spark, sf, k = 100, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallIn100 = (front & brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@5-in-top100 (nprobe=16) = $recallIn100%.2f")
    assert(recallIn100 >= 0.3,
      f"IVF-PQ recall@5-in-top100 $recallIn100%.2f below floor")
  }

  test("binary-quantized ANN: hamming tracks angle, recall vs exact baseline") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.topKBinary(spark, sf).collect()
    // sign-bit hamming is an angle proxy: every emitted candidate passed
    // the H<=26 ball, and the rerank is exact cosine — ordering within
    // the survivors must agree with the cosine ordering
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b },
        "rerank must order by exact cosine, descending")
    }
    val bin = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bin & brute).size.toDouble / brute.size
    info(f"binary recall@5 = $recall%.2f")
    // same HARD regime as PQ (no true near neighbors in the synthetic
    // corpus, max off-diagonal cosine ~0.5): the floor guards against a
    // bit-packing/hamming bug (recall ~ chance), not quantization loss
    assert(recall >= 0.2, f"binary recall@5 $recall%.2f below floor")
  }

  test("versioned index rebuild: pre-cutover serves the frozen v1 model," +
      " post-cutover the full re-fit, re-serve is idempotent, pointer" +
      " never torn") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val E = graft.sources.Etl
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toFile
    try {
      val root = tmp.getAbsolutePath
      Similarity.buildIndexV1(spark, sf, root)
      java.nio.file.Files.writeString(
        new java.io.File(root, "_current").toPath, "v1")
      def servedTuples(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getInt(5))).toSeq
      def bareTuples(df: org.apache.spark.sql.DataFrame) =
        df.select(col("q_id"), col("vec_id"), col("cos_sim"), col("rnk"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3))).toSeq
      // PRE-CUTOVER: the pointer serves exactly the frozen v1 model
      val pre = Similarity.indexServeAt(spark, sf, root).collect()
      assert(pre.nonEmpty && pre.forall(_.getString(0) == "v1"),
        "pre-cutover rows must carry the v1 ref")
      val emb = Tables.read(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("vec"))
      val index = emb.filter(col("vec_id") % 2 === 0)
      val nc1 = Similarity.ivfCells(index, 0)
      val cents1 = broadcast(
        Similarity.seedVectors(spark, index, nc1).toSeq
          .map { case (id, v) => (id, v.toSeq) }.toDF("cell_id", "centroid"))
      val expectPre = bareTuples(Similarity.ivfServe(spark, emb,
        Similarity.assignCells(spark, index, cents1), cents1,
        k = 5, nQueries = 64, nprobe = Similarity.ivfNprobe(nc1, 0)))
      assert(servedTuples(pre) == expectPre,
        "pre-cutover serving diverged from the frozen v1 model")
      // REBUILD + CUTOVER: the committed v2 serves the full re-fit
      val post = Similarity.indexRebuildAt(spark, sf, root).collect()
      assert(E.chainCurrent(root) == "v2",
        "rebuild must move the pointer to v2")
      assert(post.forall(_.getString(0) == "v2"),
        "post-cutover rows must carry the v2 ref")
      val expectPost = bareTuples(Similarity.topKIvfKmeans(spark, sf,
        k = 5, nQueries = 64))
      assert(servedTuples(post) == expectPost,
        "post-cutover serving diverged from the in-session full re-fit")
      // idempotence: the census trigger sees an up-to-date index and
      // serves WITHOUT re-fitting; same rows
      val again = Similarity.indexRebuildAt(spark, sf, root).collect()
      assert(servedTuples(again) == servedTuples(post),
        "re-serve after cutover diverged")
      // atomicity hygiene: the swap is rename-based — no torn pointer
      // temp file may survive, and the pointer names a committed version
      assert(!tmp.listFiles().exists(_.getName.startsWith("_current.tmp")),
        "torn pointer temp file left behind")
      assert(Set("v1", "v2").contains(E.chainCurrent(root)))
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete(): Unit
      }
      rm(tmp)
    }
  }

  test("semantic dedup: per-label rollup partitions the corpus exactly") {
    val rows = Similarity.dedupSemantic(spark, sf).collect()
    val corpus = Tables.read(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == corpus,
      "per-label counts must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"label ${r.get(0)}: removed + kept must equal total")
    }
  }

  test("semantic dedup cell count: constant target occupancy, clamped") {
    // ceil(n/256) in [16, 65536] — k must GROW with the corpus so the
    // within-cell pair cost stays O(n); both clamps exact
    assert(Similarity.semanticCellCount(0L) == 16)
    assert(Similarity.semanticCellCount(4096L) == 16)
    assert(Similarity.semanticCellCount(4097L) == 17)
    assert(Similarity.semanticCellCount(20000L) == 79)
    assert(Similarity.semanticCellCount(1000000L) == 3907)
    assert(Similarity.semanticCellCount(Long.MaxValue / 4) == 65536)
  }

  test("semantic dedup: adaptive k keeps max cell occupancy bounded") {
    import spark.implicits._
    // 6000 deterministic pseudo-random vectors -> derived k = 24 (> the
    // 16 floor: the transition the fixed-k variant never crossed); the
    // Lloyd cells must then hold occupancy near the 256 target — the
    // guard is against centroid collapse (everything in one cell), which
    // would silently restore the quadratic within-cell blow-up
    val dir = java.nio.file.Files.createTempDirectory("graft-semk").toString
    val n = 6000
    (0 until n).map { i =>
      val vec = Array.tabulate(Similarity.Dim) { d =>
        ((i.toLong * 2654435761L + d * 40503L + 7L) % 2001L - 1000L) / 1000.0
      }
      (i.toLong, vec, s"l${i % 3}")
    }.toDF("vec_id", "embedding", "label")
      .coalesce(2).write.parquet(s"$dir/embeddings.parquet")
    val k = Similarity.semanticCellCount(n.toLong)
    assert(k == 24)
    val occ = Similarity.kmeansClusters(spark, dir, k).collect()
      .map(r => r.getLong(1))
    assert(occ.length == k)
    assert(occ.sum == n.toLong)
    assert(occ.max <= 4L * 256L,
      s"hottest cell ${occ.max} exceeds 4x the 256 occupancy target")
  }

  test("near-dup pairs are canonicalized and above threshold") {
    val rows = Similarity.cosineNearDup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("radius search: exact vs brute-force threshold scan (recall 1.0" +
      " by construction); band audit matches an independent replay") {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.read(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"vec".as("q_vec"))
    val brute = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(expr("cosine_sim(vec, q_vec)"), 6))
      .filter($"cos_sim" >= Similarity.RadiusTau)
      .select($"q_id", $"vec_id", $"cos_sim")
    val got = Similarity.radiusSearch(spark, sf)
    assert(got.count() > 0, "radius fixture must be non-empty")
    assertSameRows(got.select($"q_id", $"vec_id", $"cos_sim"), brute)
    // independent 16-bit signature replay (the documented planeComponent
    // formula) — the in_lsh_bucket audit column must agree band-for-band
    def plane(p: Int, d: Int): Double = {
      val v = (p.toLong * 1000003L + d.toLong) % 104729L
      (((v * v) % 104729L) * 2654435761L + v * 40503L) % 104729L /
        52364.0 - 1.0
    }
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sig(v: Array[Double]): Int =
      (0 until 16).map { p =>
        var dot = 0.0
        var d = 0
        while (d < v.length) { dot += v(d) * plane(p, d); d += 1 }
        if (dot >= 0) 1 << p else 0
      }.sum
    val sigs = vecs.map { case (id, v) => id -> sig(v) }
    got.collect().foreach { r =>
      val (s, qs) = (sigs(r.getLong(1)), sigs(r.getLong(0)))
      val expect = (0 until 4).exists(b =>
        ((s >> (4 * b)) & 15) == ((qs >> (4 * b)) & 15))
      assert(r.getBoolean(3) == expect,
        s"in_lsh_bucket for (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the audit must be informative on this fixture: the band prefilter
    // demonstrably loses true neighbors at τ (the reason sim_radius is
    // exact-scan rather than prefiltered)
    assert(got.filter(!$"in_lsh_bucket").count() > 0,
      "expected ≥1 true neighbor the LSH bands would have missed")
  }

  test("pca power: bit-exact against an in-memory fixed-point reference") {
    val vecs = Tables.read(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        BigInt(math.floor(x.toDouble * 1000000.0).toLong)))
    val d = vecs.head.length
    val g = Array.tabulate(d, d)((i, j) => vecs.map(v => v(i) * v(j)).sum)
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to Similarity.PcaIters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x => {
        val q = x.abs * 1000000 / m // BigInt / truncates — same as engines
        if (x < 0) -q else q
      })
    }
    val out = Similarity.pcaPower(spark, sf).collect()
    assert(out.length == d)
    out.foreach { r =>
      val i = r.getLong(0).toInt
      assert(r.getLong(1) == (g(i)(i) % 1000000007).toLong,
        s"dim $i: gramian diagonal checksum")
      assert(r.getLong(2) == v(i).toLong,
        s"dim $i: eigvec_q ${r.getLong(2)} != ${v(i)}")
    }
    // power-iteration invariant on a PSD Gramian: the Rayleigh quotient
    // never decreases — checked exactly by cross-multiplied BigInt
    // fractions (no convergence CLAIM, just the monotonicity guarantee)
    def rayleighNumDen(x: Array[BigInt]): (BigInt, BigInt) = {
      val gx = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * x(j)).sum)
      ((0 until d).map(i => x(i) * gx(i)).sum,
        (0 until d).map(i => x(i) * x(i)).sum)
    }
    val (n0, d0) = rayleighNumDen(Array.fill(d)(BigInt(1000000)))
    val (n3, d3) = rayleighNumDen(v)
    assert(n3 * d0 >= n0 * d3,
      "Rayleigh quotient decreased across power iterations")
  }

  test("pca projection: exact dot with the in-memory eigenvector," +
      " and order is eigvec-consistent") {
    // rebuild the fixed-point reference eigenvector (same recipe as the
    // pca power spec), then every projection must be the exact integer
    // dot — the transform inherits the eigensolver's hash-exactness
    val byId = Tables.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigInt(math.floor(x.toDouble * 1000000.0).toLong)))
    val vecs = byId.map(_._2)
    val d = vecs.head.length
    val g = Array.tabulate(d, d)((i, j) => vecs.map(v => v(i) * v(j)).sum)
    var ev = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to Similarity.PcaIters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * ev(j)).sum)
      val m = w.map(_.abs).max
      ev = w.map(x => {
        val q = x.abs * 1000000 / m
        if (x < 0) -q else q
      })
    }
    val expect = byId.map { case (id, v) =>
      id -> (0 until d).map(j => v(j) * ev(j)).sum
    }.toMap
    val out = Similarity.projectPc(spark, sf).collect()
    assert(out.length == byId.length)
    out.foreach { r =>
      assert(BigInt(r.getLong(2)) == expect(r.getLong(0)),
        s"vec ${r.getLong(0)}: proj_q ${r.getLong(2)}" +
          s" != ${expect(r.getLong(0))}")
    }
  }

  test("embed outliers: exact fixed-point distances match a BigInt" +
      " reference") {
    val vecs = Tables.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigInt(math.floor(x.toDouble * 1000000.0).toLong)))
    val d = vecs.head._2.length
    val n = BigInt(vecs.length)
    val s = Array.tabulate(d)(j => vecs.map(_._2(j)).sum)
    val d2n2 = vecs.map { case (id, q) =>
      id -> (0 until d).map(j => (n * q(j) - s(j)) * (n * q(j) - s(j))).sum
    }.toMap
    val expectTop = d2n2.toSeq.sortBy { case (id, v) => (-v, id) }
      .take(Similarity.OutlierTopK).map(_._1)
    val out = Similarity.embedOutliers(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == expectTop,
      "top-k outlier identity and order")
    out.foreach { r =>
      val exp = d2n2(r.getLong(0)).toDouble / (vecs.length.toDouble *
        vecs.length) / 1e12
      assert(math.abs(r.getDouble(2) - exp) < 5e-7,
        s"vec ${r.getLong(0)}: dist2 ${r.getDouble(2)} vs $exp")
    }
  }

  test("incremental IVF ≡ full rebuild under the frozen index model" +
      " (sf fixture differential)") {
    import org.apache.spark.sql.functions.col
    // rebuild: the SAME index-frozen centroids/geometry, but assignment
    // recomputed over the whole corpus in one pass — the thing the
    // incremental path replaces with (persisted index) ∪ (Δ-only pass)
    val emb = Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
    val index = emb.filter(col("vec_id") % 2 === 0)
    val nc = Similarity.ivfCells(index, 0)
    import spark.implicits._
    val centroids = broadcast(
      Similarity.seedVectors(spark, index, nc).toSeq
        .map { case (id, v) => (id, v.toSeq) }.toDF("cell_id", "centroid"))
    val rebuilt = Similarity.ivfServe(spark, emb,
        Similarity.assignCells(spark, emb, centroids), centroids,
        5, 3, Similarity.ivfNprobe(nc, 0)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val inc = Similarity.topKIvfIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(rebuilt.nonEmpty, "rebuild produced no rows — vacuous")
    assert(inc == rebuilt,
      s"incremental drifted from the rebuild: only-inc=" +
        s"${inc.diff(rebuilt).take(3)} only-rebuilt=" +
        s"${rebuilt.diff(inc).take(3)}")
    // the frozen-model claim is load-bearing: the index-half seed draw
    // genuinely differs from a full-corpus re-seed (which a per-shard
    // re-training bug would produce)
    val reSeed = Similarity.seedVectors(spark, emb, nc).map(_._2.toSeq)
    val frozen = Similarity.seedVectors(spark, index, nc).map(_._2.toSeq)
    assert(reSeed.toSet != frozen.toSet,
      "full-corpus re-seed coincides with the frozen model — the" +
        " differential cannot distinguish a re-training bug")
  }

  test("serving under maintenance: the merged index serves the query" +
      " batch identically to the rebuilt index at BOTH batch sizes") {
    import org.apache.spark.sql.functions.col
    // the two incremental halves composed: whatever batch size the
    // serving layer throws at it (the per-query 3 and the production 64),
    // (persisted index) ∪ (Δ-assigned shard) must answer exactly as a
    // full-corpus re-assignment under the SAME frozen model — per query,
    // per rank
    val (emb, centroids, merged, np) = Similarity.frozenIvfModel(spark, sf)
    val rebuiltAssign = Similarity.assignCells(spark, emb, centroids)
      .localCheckpoint(true)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    Seq(3, 64).foreach { nq =>
      val served = key(Similarity.ivfServe(spark, emb, merged, centroids,
        5, nq, np))
      val rebuilt = key(Similarity.ivfServe(spark, emb, rebuiltAssign,
        centroids, 5, nq, np))
      assert(rebuilt.nonEmpty, s"rebuild at nq=$nq produced no rows")
      assert(served == rebuilt,
        s"merged-index serving drifted at nq=$nq: only-served=" +
          s"${served.diff(rebuilt).take(3)} only-rebuilt=" +
          s"${rebuilt.diff(served).take(3)}")
    }
    // the 64-batch genuinely exercises more queries than the 3-batch
    val nQ64 = Similarity.topKServingConsistency(spark, sf)
      .select(col("q_id")).distinct().count()
    assert(nQ64 > 3, s"64-query batch served only $nQ64 distinct queries")
  }

  test("haversine scalar: zero distance, symmetry, known value") {
    val d0 = GeoFunctions.haversineKmScalar(48.8566, 2.3522, 48.8566, 2.3522)
    assert(math.abs(d0) < 1e-9)
    val ab = GeoFunctions.haversineKmScalar(48.8566, 2.3522, 51.5074, -0.1278)
    val ba = GeoFunctions.haversineKmScalar(51.5074, -0.1278, 48.8566, 2.3522)
    assert(math.abs(ab - ba) < 1e-9)
    assert(ab > 340 && ab < 350, s"Paris-London ≈ 344 km, got $ab") // great-circle
  }
}
