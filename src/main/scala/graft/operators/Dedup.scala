package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication operators over `documents` — the exact / MinHash-LSH /
  * SimHash / n-gram-Jaccard family a training-data pipeline runs before
  * anything else.
  *
  * Scale stance: exact dedup is one hash-shuffle on the normalized key.
  * The near-dup operators never do an all-pairs join — candidates come
  * from LSH band buckets (MinHash, SimHash) or a blocking key (prefix),
  * so the join fan-out is bounded by bucket size, which is what makes
  * them viable at 10^10 documents. Pair outputs are canonicalized
  * (doc_a < doc_b) and deduplicated.
  */
object Dedup {

  private def normText: Column = graft.functions.TextNorm.normCol

  /** Exact dedup: group on (xxhash64(norm), norm), keep the smallest
    * doc_id. Grouping on the hash alone would silently merge 64-bit
    * collisions (~n²/2^65 expected at 10^10 docs — a few real ones);
    * including the full normalized text in the key makes the group exact
    * while the leading hash keeps partitioning/comparison cheap. One
    * hash-aggregate shuffle either way. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, sfDir, "documents")
      .withColumn("norm", normText)
      .groupBy(xxhash64($"norm").as("text_hash"), $"norm")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id".asc)
  }

  /** Token 3-gram shingles of normalized text, as a Column over `toks`.
    * The size guard must short-circuit: Spark's `sequence(1, 0)` counts
    * DOWN (step defaults to -1 when start > stop), so a bare
    * `sequence(1, greatest(size-2, 0))` would index element 0 and crash
    * on documents with fewer than 3 tokens. */
  private val shinglesExpr =
    """CASE WHEN size(toks) >= 3 THEN
         transform(sequence(1, size(toks) - 2),
                   i -> concat(element_at(toks, i), ' ',
                               element_at(toks, i + 1), ' ',
                               element_at(toks, i + 2)))
       ELSE array() END"""

  /** Exact n-gram (token-3-gram) Jaccard near-dup within a cheap blocking
    * key (first 64 normalized chars). Blocking bounds the pair count —
    * the exact-similarity stage only ever sees same-block pairs, which is
    * the standard sorted-neighborhood/blocking design at scale. */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .withColumn("norm", normText)
      .withColumn("toks", expr("split(norm, ' ')"))
      .withColumn("shingles", expr(s"array_distinct($shinglesExpr)"))
      .withColumn("block", substring($"norm", 1, 64))
      .select($"doc_id", $"block", $"shingles")
    val a = docs.select($"doc_id".as("doc_a"), $"block",
      $"shingles".as("sh_a"))
    val b = docs.select($"doc_id".as("doc_b"), $"block",
      $"shingles".as("sh_b"))
    a.join(b, Seq("block"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("jaccard", round(
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          greatest(size(array_union($"sh_a", $"sh_b")), lit(1)).cast("double"),
        4))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a".asc, $"doc_b".asc)
  }

  /** MinHash + LSH banding near-dup: 16 permutations over xxhash64'd
    * shingles, banded 4×4; candidate pairs = docs sharing any band bucket;
    * estimated Jaccard = fraction of matching minhashes.
    *
    * Hash-randomized (xxhash64 seeds) → no SQL oracle; rows-only check.
    * Scale: the band-bucket self-join replaces the O(n²) pair space with
    * per-bucket fan-out; 16 minhash aggregates are one pass over the
    * shingle arrays inside codegen. */
  def minHashLsh(spark: SparkSession, sfDir: String,
      estThreshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val nPerm = 16
    val bands = 4
    val rowsPerBand = nPerm / bands
    // Shingle stream without materializing per-doc arrays: posexplode
    // tokens → window lead(1)/lead(2) → concat. Everything stays in
    // WholeStageCodegen (the transform()/array_distinct() HOF route is
    // interpreted and measured ~5× slower at sf0.1); duplicate shingles
    // are harmless because min() ignores them. minhash_p = min over
    // shingles of xxhash64(shingle, seed_p); the group-by shuffles only
    // per-partition partial mins — #docs × 16 longs.
    val toks = Tables.read(spark, sfDir, "documents")
      .withColumn("norm", normText)
      .select($"doc_id", posexplode(split($"norm", " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy($"doc_id").orderBy($"pos".asc)
    val shingles = toks
      .withColumn("t1", lead($"tok", 1).over(w))
      .withColumn("t2", lead($"tok", 2).over(w))
      .filter($"t2".isNotNull)
      .select($"doc_id", concat_ws(" ", $"tok", $"t1", $"t2").as("shingle"))
    val sig = shingles
      .groupBy($"doc_id")
      .agg(min(xxhash64($"shingle", lit(0))).as("mh_0"),
        (1 until nPerm).map(p =>
          min(xxhash64($"shingle", lit(p))).as(s"mh_$p")): _*)
      .withColumn("sig",
        array((0 until nPerm).map(p => col(s"mh_$p")): _*))
      .select($"doc_id", $"sig")
    // explode into (band_id, band_signature) buckets
    val banded = sig.select($"doc_id", $"sig",
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            col("sig")(b * rowsPerBand + r)): _*).as("bsig"))): _*)).as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.bsig")
    val left = banded.select($"doc_id".as("doc_a"), $"sig".as("sig_a"),
      $"band", $"bsig")
    val right = banded.select($"doc_id".as("doc_b"), $"sig".as("sig_b"),
      $"band", $"bsig")
    left.join(right, Seq("band", "bsig"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        round(expr(
          """aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)),
                       0, (a, x) -> a + x)""").cast("double") / nPerm,
          4).as("est_jaccard"))
      .groupBy($"doc_a", $"doc_b")
      .agg(max($"est_jaccard").as("est_jaccard"))
      .filter($"est_jaccard" >= estThreshold)
      .orderBy($"doc_a".asc, $"doc_b".asc)
  }

  /** SimHash near-dup: 64-bit signature from FNV-1a token hashes computed
    * in a typed mapPartitions (the per-bit vote loop is genuinely
    * imperative — mapPartitions is the documented last-resort tier and
    * stays one narrow no-shuffle stage), then 4×16-bit band buckets for
    * candidates and hamming ≤ `maxHamming` via bit_count(xor).
    * Hash-based → rows-only check. */
  def simHash(spark: SparkSession, sfDir: String,
      maxHamming: Int = 8): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .withColumn("norm", normText)
      .select($"doc_id", $"norm").as[(Long, String)]
    val sigs = docs.mapPartitions { it =>
      it.map { case (id, norm) =>
        val votes = new Array[Int](64)
        norm.split(' ').foreach { tok =>
          var h = 0xcbf29ce484222325L // FNV-1a 64-bit
          var i = 0
          while (i < tok.length) {
            h ^= tok.charAt(i).toLong
            h *= 0x100000001b3L
            i += 1
          }
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        (id, sig)
      }
    }.toDF("doc_id", "sig")
    val banded = sigs.select($"doc_id", $"sig",
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        $"sig".bitwiseAND(lit(0xffffL << (16 * b))).as("bsig"))): _*))
        .as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.bsig")
    val l = banded.select($"doc_id".as("doc_a"), $"sig".as("sig_a"),
      $"band", $"bsig")
    val r = banded.select($"doc_id".as("doc_b"), $"sig".as("sig_b"),
      $"band", $"bsig")
    l.join(r, Seq("band", "bsig"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("hamming",
        expr("bit_count(sig_a ^ sig_b)").cast("int"))
      .filter($"hamming" <= maxHamming)
      .select($"doc_a", $"doc_b", $"hamming")
      .distinct()
      .orderBy($"doc_a".asc, $"doc_b".asc)
  }
}
