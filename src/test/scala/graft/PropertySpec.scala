package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.GeoFunctions

/** Property-based checks (scalacheck) on the pure scalar kernels — no
  * SparkSession needed, so these run fast and wide. */
class PropertySpec extends AnyFunSuite {

  private val lat = Gen.choose(-89.0, 89.0)
  private val lon = Gen.choose(-179.0, 179.0)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("haversine is symmetric, non-negative, bounded by half circumference") {
    check(Prop.forAll(lat, lon, lat, lon) { (a1, o1, a2, o2) =>
      val d = GeoFunctions.haversineKmScalar(a1, o1, a2, o2)
      val r = GeoFunctions.haversineKmScalar(a2, o2, a1, o1)
      d >= 0 && math.abs(d - r) < 1e-6 &&
        d <= math.Pi * GeoFunctions.EarthRadiusKm + 1e-6
    })
  }

  test("haversine triangle inequality on the sphere") {
    check(Prop.forAll(lat, lon, lat, lon, lat, lon) { (a1, o1, a2, o2, a3, o3) =>
      val ab = GeoFunctions.haversineKmScalar(a1, o1, a2, o2)
      val bc = GeoFunctions.haversineKmScalar(a2, o2, a3, o3)
      val ac = GeoFunctions.haversineKmScalar(a1, o1, a3, o3)
      ac <= ab + bc + 1e-6
    })
  }

  test("PPM codec round-trips arbitrary pixel buffers at arbitrary dims") {
    val dims = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
    } yield (w, h)
    val byteGen = Gen.choose(0, 255).map(_.toByte)
    check(Prop.forAll(dims, Gen.long) { case ((w, h), seed) =>
      val rnd = new scala.util.Random(seed)
      val gray = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = graft.functions.PpmCodec.decode(
        graft.functions.PpmCodec.encode(gray, w, h))
      img.w == w && img.h == h &&
        gray.indices.forall(i => img.rgb(3 * i) == gray(i) &&
          img.rgb(3 * i + 1) == gray(i) && img.rgb(3 * i + 2) == gray(i))
    })
  }

  test("WAV codec round-trips arbitrary sample buffers and rates") {
    val rate = Gen.choose(1, 192000)
    val n = Gen.choose(1, 500)
    check(Prop.forAll(n, rate, Gen.long) { (len, sr, seed) =>
      val rnd = new scala.util.Random(seed)
      val samples = Array.fill(len)(rnd.nextInt(256).toByte)
      val audio = graft.functions.WavCodec.decode(
        graft.functions.WavCodec.encode(samples, sr))
      audio.sampleRate == sr && audio.samples.sameElements(samples)
    })
  }

  test("decimal(20,6)-quantized sums are partition-order independent; double sums are not guaranteed") {
    // The correctness-gate invariant behind the r3 decimal-sum migration:
    // quantizing each double to micro-units (exactly Spark's cast to
    // decimal(20,6)) makes the sum a sum of longs — identical under ANY
    // grouping/permutation of the inputs, which is what the DuckDB hash
    // compare needs. Doubles only promise this per fixed order.
    val values = Gen.listOfN(60, Gen.choose(0.01, 500.0))
    val seed = Gen.choose(0L, Long.MaxValue)
    def micros(d: Double): Long =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .underlying.movePointRight(6).longValueExact
    check(Prop.forAll(values, seed) { (vs, s) =>
      val shuffled = new scala.util.Random(s).shuffle(vs)
      // any partitioning into runs, summed per-run then combined
      val k = 1 + (s % 7).toInt.abs
      val partA = vs.grouped(k).map(_.map(micros).sum).sum
      val partB = shuffled.grouped(3).map(_.map(micros).sum).sum
      partA == partB
    })
  }

  test("bounded top-k aggregation is partition-order independent and" +
      " equals a global sort-take — both score directions, with ties") {
    // The invariant behind the r11 two-stage ANN ranking
    // (functions/TopKAggregator): top-k under the TOTAL order
    // (score best-first, vec_id asc) is associative — merging
    // per-partition partial top-ks of ANY split/permutation equals the
    // top-k of the whole set. Scores are drawn from a SMALL integer
    // range so tie-breaks are genuinely exercised.
    val rows = Gen.listOfN(80,
      Gen.zip(Gen.choose(0L, 999L), Gen.choose(0, 9).map(_.toDouble)))
    val seed = Gen.choose(0L, Long.MaxValue)
    val kGen = Gen.choose(1, 12)
    def run(desc: Boolean, k: Int,
        parts: Seq[Seq[(Long, Double)]]): Seq[(Long, Double, Long, Int)] = {
      val agg = new graft.functions.TopKAggregator(k, desc)
      val merged = parts
        .map(_.foldLeft(agg.zero)((b, r) => agg.reduce(b, (r._1, r._2, 0L))))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(merged).toSeq
    }
    check(Prop.forAll(rows, seed, kGen) { (rs0, s, k) =>
      val rs = rs0.distinctBy(_._1) // unique vec_ids, like the real input
      val rnd = new scala.util.Random(s)
      val split = rnd.shuffle(rs).grouped(1 + rnd.nextInt(9)).toSeq
      Seq(true, false).forall { desc =>
        val got = run(desc, k, split)
        val ord = if (desc) rs.sortBy { case (id, sc) => (-sc, id) }
          else rs.sortBy { case (id, sc) => (sc, id) }
        val want = ord.take(k).zipWithIndex
          .map { case ((id, sc), i) => (id, sc, 0L, i + 1) }
        got == want
      }
    })
    // NaN is the GREATEST score in the Spark/DuckDB total order: first
    // under descending, last under ascending — pinned so a zero-vector
    // cosine (NaN) could never silently diverge from the window
    // formulation the aggregator replaced
    val withNaN = Seq((1L, 0.5), (2L, Double.NaN), (3L, 0.9))
    def ids(desc: Boolean) =
      run(desc, 3, Seq(withNaN)).map(_._1)
    assert(ids(desc = true) == Seq(2L, 3L, 1L),
      "NaN must rank first under descending")
    assert(ids(desc = false) == Seq(1L, 3L, 2L),
      "NaN must rank last under ascending")
  }
}
