package graft

import graft.operators.Similarity
import graft.functions.GeoFunctions

/** Similarity-search behavior: brute force is the exact reference; the LSH
  * tier must return a subset of the corpus ranked consistently. */
class SimilaritySpec extends SparkSpec {

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
    // measured at sf0.001: lsh 0.60, ivf 0.87 — floors leave margin.
    // Sign-LSH recall is inherently modest on this synthetic corpus
    // (max off-diagonal cosine ≈ 0.5: no true near neighbors to
    // preserve); IVF probes 4/16 cells and lands much higher.
    assert(lshRecall >= 0.3, f"LSH recall@5 $lshRecall%.2f below floor")
    assert(ivfRecall >= 0.7, f"IVF recall@5 $ivfRecall%.2f below floor")
  }

  test("IVF with k-means centroids: recall@5 ≥ 0.85") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val km = Similarity.topKIvfKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (km & brute).size.toDouble / brute.size
    assert(recall >= 0.85, f"k-means IVF recall@5 $recall%.2f below floor")
  }

  test("PQ/ADC: compressed-domain top-5 recall vs exact baseline") {
    val brute = Similarity.topKBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.topKPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    info(f"PQ recall@5 = $recall%.2f")
    // 8 subspaces × 16 codes on a no-true-neighbors synthetic corpus is
    // the HARD regime for PQ (quantization error ~ the cosine spread);
    // the floor guards against an encode/ADC-table indexing bug (which
    // drives recall to ~chance ≈ 5/500), not against quantization loss
    assert(recall >= 0.2, f"PQ recall@5 $recall%.2f below floor")
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

  test("haversine scalar: zero distance, symmetry, known value") {
    val d0 = GeoFunctions.haversineKmScalar(48.8566, 2.3522, 48.8566, 2.3522)
    assert(math.abs(d0) < 1e-9)
    val ab = GeoFunctions.haversineKmScalar(48.8566, 2.3522, 51.5074, -0.1278)
    val ba = GeoFunctions.haversineKmScalar(51.5074, -0.1278, 48.8566, 2.3522)
    assert(math.abs(ab - ba) < 1e-9)
    assert(ab > 340 && ab < 350, s"Paris-London ≈ 344 km, got $ab") // great-circle
  }
}
