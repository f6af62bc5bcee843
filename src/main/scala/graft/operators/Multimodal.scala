package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * plus JSON property extraction — the shape of an image/audio ingest
  * pipeline. The image ops decode a REAL format: a pure-JVM binary-PPM
  * (P6) parser (`graft.functions.PpmCodec` — implemented, not imported;
  * no media libraries in this container), so resize and frame sampling
  * compute genuine pixel math over decoded channel data.
  *
  * Scale stance: the binary column never explodes — decode runs
  * per-partition (batched iterator, the Scala analog of `mapInPandas`),
  * emitting only small typed metadata. JSON extraction is a codegen'd
  * path expression, no UDF.
  */
object Multimodal {

  /** JSON property extraction over `events.props` (`{"k": <int>}`):
    * from_json-style typed pull + group stats. */
  def propsJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, sfDir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"k"), 4).as("avg_k"),
        max($"k").as("max_k"),
        count(when($"k".isNull, 1)).as("null_k"))
      .orderBy($"event_type".asc)
  }

  /** Schema'd JSON parse (`from_json` with an explicit struct schema) —
    * the typed sibling of `propsJson`'s path extraction: one parse per
    * row yielding a struct, fields then projected; the right shape when
    * several fields are pulled from the same JSON document. Same output
    * (and oracle) as the path-based variant. */
  def propsJsonTyped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, sfDir, "events")
      .withColumn("p", from_json($"props",
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .withColumn("k", $"p.k")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"k"), 4).as("avg_k"),
        max($"k").as("max_k"),
        count(when($"k".isNull, 1)).as("null_k"))
      .orderBy($"event_type".asc)
  }

  /** Cross-modal join: text metadata ⋈ vector modality on the shared id
    * (doc_id = vec_id), rolled up per language — the "attach the
    * embedding to its document" step every multimodal pipeline has.
    * Scale: ids are unique on both sides, so this is a plain 1:1
    * shuffle-hash/SMJ join; the vector reduces to its norm before the
    * group-by, so the aggregate shuffles scalars, not arrays. */
  def crossModalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"lang", length($"text").cast("long").as("n_chars_calc"))
    val vecs = Tables.read(spark, sfDir, "embeddings")
      .select($"vec_id".as("doc_id"),
        sqrt(expr(
          "aggregate(cast(embedding AS array<double>), 0.0d, (a, x) -> a + x * x)"))
          .as("vec_norm"))
    docs.join(vecs, Seq("doc_id"))
      .groupBy($"lang")
      // avg_norm via order-independent decimal sum (continuous doubles —
      // see RefQueries.q4Finish); avg_chars sums exact integers, so a
      // plain avg is already deterministic
      .agg(count(lit(1)).as("cnt"),
        round(sum($"vec_norm".cast("decimal(20,8)")).cast("double") /
          count(lit(1)), 6).as("avg_norm"),
        round(avg($"n_chars_calc"), 4).as("avg_chars"))
      .orderBy($"lang".asc)
  }

  /** Byte-level feature extractor for an opaque binary payload — the
    * codec-free tier of the pipeline (size, lead byte, an 8-byte content
    * hash): what you compute when the payload's FORMAT is unknown or
    * untrusted, before routing it to a real decoder like `PpmCodec`. */
  object ByteFeatures {
    final case class Decoded(doc_id: Long, n_bytes: Int, first_byte: Int,
      feat_hash: Long)

    def decodeBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[Decoded] =
      rows.map { case (id, bytes) =>
        var h = 0L
        var i = 0
        val n = math.min(8, bytes.length)
        while (i < n) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        Decoded(id, bytes.length,
          if (bytes.isEmpty) -1 else bytes(0) & 0xff, h)
      }
  }

  /** The testdata has no true media column, so each document's payload is
    * CONSTRUCTED deterministically — a 16-pixel-wide grayscale P6 image
    * whose samples are the text's bytes (full rows only: height =
    * len/16) — and then genuinely round-tripped through the `PpmCodec`
    * P6 parser. The construction stands in for the stored payload; the
    * decode, pixel math, and per-partition batched iteration are the
    * real pipeline. The DuckDB oracle replays the pixel math straight
    * from the text (ASCII fixtures, asserted in RobustnessSpec), which
    * keeps real-codec outputs hash-gated. */
  private def grayImage(text: String): Option[graft.functions.PpmCodec.Image] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = bytes.length / 16
    if (h < 1) None
    else Some(graft.functions.PpmCodec.decode(graft.functions.PpmCodec
      .encode(java.util.Arrays.copyOf(bytes, h * 16), 16, h)))
  }

  /** Real image downsample: decode the P6 payload, then a 2×2 box filter
    * (integer mean of each 2×2 block, edge rows replicated — standard
    * resampler behavior) over the decoded pixels. Output carries the
    * real decoded dimensions and a rolling hash of the resized pixels so
    * the oracle verifies every output sample. Runs per-partition
    * (batched iterator, the Scala analog of `mapInPandas`); no shuffle
    * until the order-for-compare. */
  def resize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        grayImage(text).map { img =>
          val outH = (img.h + 1) / 2
          def g(r: Int, c: Int): Int = img.rgb((r * img.w + c) * 3) & 0xff
          var hash = 0L
          var y = 0
          while (y < outH) {
            val r1 = 2 * y
            val r2 = math.min(2 * y + 1, img.h - 1) // edge-replicate
            var x = 0
            while (x < 8) {
              val avg = (g(r1, 2 * x) + g(r1, 2 * x + 1) +
                g(r2, 2 * x) + g(r2, 2 * x + 1)) / 4
              hash = (hash * 31 + avg) % 1000000007L
              x += 1
            }
            y += 1
          }
          (id, img.w.toLong, img.h.toLong, 8L, outH.toLong, hash)
        }
      }
    }
      .toDF("doc_id", "in_w", "in_h", "out_w", "out_h", "out_hash")
      .orderBy($"doc_id".asc)
  }

  /** Real frame sampling: decode the P6 payload, treat each pixel row as
    * a video frame, sample every `stride`-th frame, and hash the frame's
    * decoded RGB bytes (48 per frame — the hash covers the full decoded
    * channel data, so a decoder that mangled the replication would be
    * caught). Fan-out is n_frames/stride rows per doc, produced inside
    * one per-partition pass; no shuffle until the order-for-compare. */
  def frameSample(spark: SparkSession, sfDir: String,
      stride: Int = 4): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        grayImage(text).iterator.flatMap { img =>
          (0 until img.h by stride).iterator.map { f =>
            var hash = 0L
            var i = f * img.w * 3
            val end = i + img.w * 3
            while (i < end) {
              hash = (hash * 31 + (img.rgb(i) & 0xff)) % 1000000007L
              i += 1
            }
            (id, f.toLong, img.h.toLong, hash)
          }
        }
      }
    }
      .toDF("doc_id", "frame_idx", "n_frames", "frame_hash")
      .orderBy($"doc_id".asc, $"frame_idx".asc)
  }

  /** SAD threshold for [[sceneCuts]] — shared with the DuckDB oracle.
    * Sits between the fixture's p95 (1755) and p99 (1902) frame-pair
    * SAD, so ~3-4% of transitions register as cuts — a realistic
    * scene-change rate. */
  val SceneCutSad = 1800L

  /** Scene-cut detection — the video-curation primitive behind frame
    * dedup and clip segmentation: decode the payload, treat each pixel
    * row as a frame ([[frameSample]]'s contract), and score every
    * CONSECUTIVE frame pair by SAD (sum of absolute differences over
    * the 48 decoded channel bytes — the standard shot-boundary
    * statistic); transitions whose SAD exceeds [[SceneCutSad]] are
    * cuts. Output per video: frame count, cut count, a mod-prime
    * checksum of the cut frame indices (so the oracle confirms WHICH
    * transitions fired), max and truncated-mean SAD. All integer
    * arithmetic — hash-gated end-to-end.
    *
    * Scale: one per-partition pass; consecutive frames live in the same
    * decoded payload so NO self-join and no shuffle of pixel data —
    * only the per-video summary rows move. */
  def sceneCuts(spark: SparkSession, sfDir: String,
      threshold: Long = SceneCutSad): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        grayImage(text).filter(_.h >= 2).map { img =>
          var nCuts = 0L
          var checksum = 0L
          var maxSad = 0L
          var sumSad = 0L
          var f = 1
          while (f < img.h) {
            var sad = 0L
            var i = f * img.w * 3
            var j = (f - 1) * img.w * 3
            val end = i + img.w * 3
            while (i < end) {
              sad += math.abs((img.rgb(i) & 0xff) - (img.rgb(j) & 0xff))
              i += 1
              j += 1
            }
            if (sad > threshold) { nCuts += 1; checksum = (checksum + f) % P }
            if (sad > maxSad) maxSad = sad
            sumSad += sad
            f += 1
          }
          (id, img.h.toLong, nCuts, checksum, maxSad,
            sumSad / (img.h - 1))
        }
      }
    }
      .toDF("doc_id", "n_frames", "n_cuts", "cut_checksum", "max_sad",
        "mean_sad")
      .orderBy($"doc_id".asc)
  }

  /** Exact-integer image statistics — the brightness/contrast screen an
    * image-curation pipeline runs before anything expensive (too-dark,
    * too-flat, or clipped images are dropped without decoding twice):
    * per decoded image the pixel count, brightness sum, the EXACT
    * variance numerator n·Σp² − (Σp)² (the [[graft.operators.Similarity
    * ]]`.embedOutliers` n²-scaling trick — no division, no float, so the
    * contrast statistic is hash-gated), and a 4-bin brightness histogram
    * (p >> 6) folded into a mod-prime checksum. One decode loop per
    * image; pixels never leave the scan partition. */
  def imageStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        grayImage(text).map { img =>
          val n = img.h * img.w
          var sum = 0L
          var sumSq = 0L
          val bins = new Array[Long](4)
          var r = 0
          while (r < img.h) {
            var c = 0
            while (c < img.w) {
              val p = (img.rgb((r * img.w + c) * 3) & 0xff).toLong
              sum += p
              sumSq += p * p
              bins((p >> 6).toInt) += 1L
              c += 1
            }
            r += 1
          }
          val varNum = n.toLong * sumSq - sum * sum
          var cks = 0L
          bins.foreach(b => cks = (cks * 31L + b) % P)
          (id, n.toLong, sum, varNum, cks)
        }
      }
    }
      .toDF("doc_id", "n_px", "px_sum", "var_num", "hist_checksum")
      .orderBy($"doc_id".asc)
  }

  /** Shot segmentation statistics — what [[sceneCuts]]'s boundary list is
    * FOR: the cut frames partition each video into shots (the clip units
    * a curation pipeline samples, captions, or drops), and this op
    * reports the shot-length distribution per video — shot count,
    * min/max length, and a mod-prime fold of the lengths IN ORDER so the
    * oracle confirms the exact segmentation, not just its counts. Same
    * single decode loop as the cut detector (shots close as cuts are
    * found — no second pass, no pixel shuffle); videos with no cut are
    * one full-length shot. */
  def shotStats(spark: SparkSession, sfDir: String,
      threshold: Long = SceneCutSad): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        grayImage(text).filter(_.h >= 2).map { img =>
          var lastCut = 0
          var nShots = 1L
          var minShot = Long.MaxValue
          var maxShot = 0L
          var cks = 0L
          def close(len: Long): Unit = {
            if (len < minShot) minShot = len
            if (len > maxShot) maxShot = len
            cks = (cks * 31L + len) % P
          }
          var f = 1
          while (f < img.h) {
            var sad = 0L
            var i = f * img.w * 3
            var j = (f - 1) * img.w * 3
            val end = i + img.w * 3
            while (i < end) {
              sad += math.abs((img.rgb(i) & 0xff) - (img.rgb(j) & 0xff))
              i += 1
              j += 1
            }
            if (sad > threshold) {
              close(f.toLong - lastCut)
              nShots += 1
              lastCut = f
            }
            f += 1
          }
          close(img.h.toLong - lastCut)
          (id, img.h.toLong, nShots, minShot, maxShot, cks)
        }
      }
    }
      .toDF("doc_id", "n_frames", "n_shots", "min_shot", "max_shot",
        "len_checksum")
      .orderBy($"doc_id".asc)
  }

  /** Perceptual-hash image near-dup — the MULTIMODAL dedup tier: decode
    * the P6 payload, average-hash the decoded pixels (8×8 sample grid:
    * rows i·h/8, every other column; bit = pixel strictly above the
    * grid mean, packed into two 32-bit words — the sign-bit-safe pack),
    * then candidate pairs via 4×16-bit band buckets and
    * `bit_count(xor)` hamming ≤ `maxHamming` — the image twin of
    * `dedup_simhash`'s text pipeline, and the standard near-dup-image
    * design (aHash + banded hamming) at corpus scale: candidates come
    * from band buckets, never an all-pairs join, and the decoded pixels
    * never leave their scan partition (only the 16-byte signature
    * shuffles).
    *
    * Deterministic integer math end-to-end (decode → grid → mean
    * comparison → hamming), so the DuckDB oracle replays every bit from
    * the text bytes like the other mm_* ops. Images shorter than 8 rows
    * (< 128 payload bytes) have no stable 8×8 grid and drop out, like
    * `grayImage`'s own < 1-row guard. */
  def phashDedup(spark: SparkSession, sfDir: String,
      maxHamming: Int = 10): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    val sigs = docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        grayImage(text).filter(_.h >= 8).map { img =>
          def g(r: Int, c: Int): Int = img.rgb((r * img.w + c) * 3) & 0xff
          val grid = new Array[Int](64)
          var i = 0
          while (i < 8) {
            val r = i * img.h / 8
            var j = 0
            while (j < 8) { grid(i * 8 + j) = g(r, 2 * j); j += 1 }
            i += 1
          }
          val sum = grid.sum
          var w0 = 0L
          var w1 = 0L
          var k = 0
          while (k < 64) {
            // strict 64·g > Σ: integer-exact "above the mean", no
            // division rounding for the oracle to mismatch
            if (64L * grid(k) > sum) {
              if (k < 32) w0 |= (1L << k) else w1 |= (1L << (k - 32))
            }
            k += 1
          }
          (id, w0, w1)
        }
      }
    }.toDF("doc_id", "w0", "w1")
    bandedHammingPairs(sigs, maxHamming)
  }

  /** The shared banded-hamming candidate stage every 64-bit-signature
    * dedup tier rides (images via [[phashDedup]], audio via
    * [[audioDedup]]): 4×16-bit band buckets propose candidates, exact
    * `bit_count(xor)` hamming confirms — pairs scale with bucket
    * occupancy, never corpus². Input: (doc_id, w0, w1) sign words. */
  private def bandedHammingPairs(sigs: DataFrame, maxHamming: Int)
      : DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val banded = sigs.select($"doc_id", $"w0", $"w1",
      explode(array((0 until 4).map { b =>
        val word = if (b < 2) $"w0" else $"w1"
        struct(lit(b).as("band"),
          shiftrightunsigned(word, 16 * (b % 2))
            .bitwiseAND(lit(0xffffL)).as("bsig"))
      }: _*)).as("bb"))
      .select($"doc_id", $"w0", $"w1", $"bb.band", $"bb.bsig")
    val l = banded.select($"doc_id".as("doc_a"), $"w0".as("a0"),
      $"w1".as("a1"), $"band", $"bsig")
    val r = banded.select($"doc_id".as("doc_b"), $"w0".as("b0"),
      $"w1".as("b1"), $"band", $"bsig")
    l.join(r, Seq("band", "bsig"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("hamming",
        (expr("bit_count(a0 ^ b0)") + expr("bit_count(a1 ^ b1)"))
          .cast("int"))
      .filter($"hamming" <= maxHamming)
      .select($"doc_a", $"doc_b", $"hamming")
      .distinct()
      .orderBy($"doc_a".asc, $"doc_b".asc)
  }

  /** Perceptual-hash dup-CLUSTER resolution + survival rollup — the
    * image twin of the text `Dedup.dedupPipeline`, closing the
    * multimodal dedup loop: [[phashDedup]]'s banded hamming pairs feed
    * the SHARED hub-skew-safe large-star/small-star connected-components
    * resolver (`Dedup.connectedComponentsStar` — one CC implementation
    * serves both modalities, so its committed shuffle gates cover this
    * path too), the canonical image per cluster is the component's min
    * doc_id (the keeper), and the rollup reports per-language how many
    * images survive and how many payload bytes the dedup saves. Oracle:
    * the `mm_phash_dedup` bit replay composed with the recursive-CTE
    * min-reachable-label walk (the `dedup_clusters` oracle pattern) and
    * the survival aggregate.
    *
    * Scale: pairs are band-bucketed (never all-pairs); the CC iterate is
    * bounded by the dup-pair graph — the duplicated minority, not the
    * corpus; the corpus join streams against the small label side (AQE
    * picks broadcast when it fits); one ≤ |langs| map-side-combined
    * rollup. Pixels never travel: only 16-byte signatures, pairs, and
    * labels ever shuffle. */
  def phashClusters(spark: SparkSession, sfDir: String,
      maxHamming: Int = 10): DataFrame = {
    import spark.implicits._
    val pairs = phashDedup(spark, sfDir, maxHamming)
      .select($"doc_a", $"doc_b")
    val (labels, _) = Dedup.connectedComponentsStar(pairs)
    val dupFlag = labels
      .select($"doc_id", ($"label" =!= $"doc_id").as("dup"))
    Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
      .join(dupFlag, Seq("doc_id"), "left_outer")
      .withColumn("removed", coalesce($"dup", lit(false)))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_imgs"),
        sum(when($"removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(!$"removed", 1L).otherwise(0L)).as("n_kept"),
        sum(when(!$"removed", $"n_chars".cast("long")).otherwise(0L))
          .as("bytes_kept"),
        sum(when($"removed", $"n_chars".cast("long")).otherwise(0L))
          .as("bytes_saved"))
      .orderBy($"lang".asc)
  }

  /** Real audio feature extraction: each document's payload is an 8-bit
    * mono PCM WAV (samples = the text's bytes — same stand-in-payload
    * contract as the image ops), genuinely round-tripped through the
    * `WavCodec` RIFF parser, then windowed-energy features over the
    * DECODED samples: total energy Σ(s−128)², peak amplitude, and a
    * rolling hash of per-window (80 samples = 10 ms @ 8 kHz) energies —
    * the standard VAD/loudness front-end shape. All integers, so the
    * oracle replays every value from the text. Per-partition batched
    * iteration; no shuffle until the order-for-compare. */
  def audioFeatures(spark: SparkSession, sfDir: String,
      windowSamples: Int = 80): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (bytes.isEmpty) None
        else {
          val audio = graft.functions.WavCodec
            .decode(graft.functions.WavCodec.encode(bytes))
          val s = audio.samples
          var energy = 0L
          var peak = 0L
          var i = 0
          while (i < s.length) {
            val c = (s(i) & 0xff) - 128L
            energy += c * c
            if (math.abs(c) > peak) peak = math.abs(c)
            i += 1
          }
          val nWin = s.length / windowSamples
          var hash = 0L
          var w = 0
          while (w < nWin) {
            var e = 0L
            var j = w * windowSamples
            val end = j + windowSamples
            while (j < end) {
              val c = (s(j) & 0xff) - 128L
              e += c * c
              j += 1
            }
            hash = (hash * 31 + e) % 1000000007L
            w += 1
          }
          Some((id, audio.sampleRate, s.length.toLong, energy, peak,
            nWin.toLong, hash))
        }
      }
    }
      .toDF("doc_id", "sample_rate", "n_samples", "total_energy",
        "peak_amp", "n_windows", "win_energy_hash")
      .orderBy($"doc_id".asc)
  }

  /** Silence / voice-activity segmentation over the decoded WAV stream —
    * the audio-curation twin of [[sceneCuts]]: frames of `windowSamples`
    * decoded samples score their integer energy Σ(s−128)²; frames below
    * `silenceThresh` (calibrated between the fixture's p25 and median —
    * the spec asserts both silent and voiced frames exist) are silent,
    * and CONSECUTIVE silent frames merge into runs (the segments an
    * audio pipeline would cut or drop). Per doc: frame/silent counts,
    * run count, longest run, silent ratio, and a mod-prime checksum of
    * run start frames — all integers (+ one round-4 ratio), so the
    * DuckDB oracle replays every value from the text bytes via
    * gaps-and-islands. Docs with no complete frame drop out (no 0/0).
    *
    * Scale: like every mm_* op the samples never leave their scan
    * partition — runs are found in the same per-partition byte loop
    * that decodes; only doc-level summaries shuffle for the final sort. */
  def audioSilence(spark: SparkSession, sfDir: String,
      windowSamples: Int = 80, silenceThresh: Long = 156000L): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
    docs.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val audio = graft.functions.WavCodec
          .decode(graft.functions.WavCodec.encode(bytes))
        val s = audio.samples
        val nWin = s.length / windowSamples
        if (nWin < 1) None
        else {
          var nSilent = 0L
          var nRuns = 0L
          var maxRun = 0L
          var curRun = 0L
          var runHash = 0L
          var w = 0
          while (w < nWin) {
            var e = 0L
            var j = w * windowSamples
            val end = j + windowSamples
            while (j < end) {
              val c = (s(j) & 0xff) - 128L
              e += c * c
              j += 1
            }
            if (e < silenceThresh) {
              if (curRun == 0L) { // run opens at this frame
                nRuns += 1L
                runHash = (runHash * 31L + w) % 1000000007L
              }
              curRun += 1L
              nSilent += 1L
              if (curRun > maxRun) maxRun = curRun
            } else curRun = 0L
            w += 1
          }
          Some((id, nWin.toLong, nSilent, nRuns, maxRun, runHash))
        }
      }
    }
      .toDF("doc_id", "n_frames", "n_silent", "n_runs", "max_run",
        "run_hash")
      // the one non-integer column goes through the engine-proven
      // round(x, 4) path, not driver-side BigDecimal
      .withColumn("silent_ratio",
        round($"n_silent".cast("double") / $"n_frames", 4))
      .select($"doc_id", $"n_frames", $"n_silent", $"n_runs", $"max_run",
        $"silent_ratio", $"run_hash")
      .orderBy($"doc_id".asc)
  }

  /** Binary-column feature extraction: text → utf-8 bytes as the stand-in
    * payload (the testdata has no true media column), then the per-
    * partition byte-level extractor. Output is deliberately arithmetic so
    * the DuckDB oracle can reproduce it from the text itself. */
  def binaryFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payload = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    payload
      .mapPartitions(ByteFeatures.decodeBatch)
      .toDF()
      .select($"doc_id", $"n_bytes", $"first_byte", $"feat_hash")
      .orderBy($"doc_id".asc)
  }

  /** 64-bit frame-energy audio fingerprint over the DECODED WAV stream —
    * the [[phashDedup]] recipe on `WavCodec` output, closing the
    * per-modality dedup matrix (text → simhash/minhash, images → phash,
    * audio → this): each clip's samples split into 64 length-relative
    * segments (sample p → segment p·64 div n, so the fingerprint is
    * duration-invariant like a real audio fingerprint's time
    * normalization), integer energy Σ(s−128)² per segment, bit = segment
    * strictly above the 64-segment mean (the phash `64·e > Σ` integer
    * rule), packed into two 32-bit sign-safe words. Clips under 64
    * samples have no stable segmentation and drop out (the phash h ≥ 8
    * precedent). Deterministic integer math end-to-end — the DuckDB
    * oracle replays every bit from the text bytes. Samples never leave
    * the scan partition; only the 16-byte signature shuffles. */
  /** Fingerprint status codes from [[audioScan]]: fingerprinted /
    * decodable-but-too-short (< 64 samples, no stable segmentation) /
    * undecodable (malformed payload, failed PER-ROW via
    * `WavCodec.decodeOpt` — the 100 TB contract that one corrupt blob
    * must never kill the task). */
  private[graft] val FpOk = 0
  private[graft] val FpTooShort = 1
  private[graft] val FpUndecodable = 2

  /** Decode + fingerprint every payload, failure PER-ROW: input
    * (doc_id, lang, bytes, payload), output one row per input row with
    * a status code and the sign words (0 when not fingerprinted). The
    * `bytes` column is the caller's accounting size (the underlying
    * asset's bytes, carried through to the survival rollup) — decoupled
    * from the container size so corrupt payloads still account. */
  private[graft] def audioScan(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("lang"), col("bytes"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, lang, nBytes, payload) =>
          graft.functions.WavCodec.decodeOpt(payload) match {
            case None => (id, lang, nBytes, FpUndecodable, 0L, 0L)
            case Some(audio) =>
              val s = audio.samples
              val n = s.length
              if (n < 64) (id, lang, nBytes, FpTooShort, 0L, 0L)
              else {
                val e = new Array[Long](64)
                var p = 0
                while (p < n) {
                  val c = (s(p) & 0xff) - 128L
                  e((p.toLong * 64L / n).toInt) += c * c
                  p += 1
                }
                val tot = e.sum
                var w0 = 0L
                var w1 = 0L
                var k = 0
                while (k < 64) {
                  if (64L * e(k) > tot) {
                    if (k < 32) w0 |= (1L << k)
                    else w1 |= (1L << (k - 32))
                  }
                  k += 1
                }
                (id, lang, nBytes, FpOk, w0, w1)
              }
          }
        }
      }.toDF("doc_id", "lang", "bytes", "status", "w0", "w1")
  }

  /** Text-corpus wrapper over [[audioScan]]: samples = the text's bytes
    * (the WavCodec round-trip stand-in-payload contract). */
  private def audioScanText(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    audioScan(docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        // an empty asset is a malformed clip: empty payload → the
        // per-row undecodable path, never an encoder exception
        val payload =
          if (bytes.isEmpty) Array.empty[Byte]
          else graft.functions.WavCodec.encode(bytes)
        (id, lang, bytes.length.toLong, payload)
      }.toDF("doc_id", "lang", "bytes", "payload"))
  }

  /** How many near-dup audio twins [[audioDedup]] plants. */
  val AudioPlantCount = 12

  /** Audio near-dup dedup + cluster survival — the audio twin of
    * [[phashClusters]]: [[audioScan]] signatures → the SHARED
    * [[bandedHammingPairs]] candidate stage → the SHARED hub-skew-safe
    * `Dedup.connectedComponentsStar` resolver (one CC implementation
    * serves text, images AND audio), keeper = component min id, per-lang
    * survival + byte-savings rollup.
    *
    * The fixture corpus is word salad with no true audio near-dups
    * (measured: 3 coincidental band pairs at sf0.001, zero at sf0.01),
    * so — the `text_pii_scrub` precedent — the declared corpus is
    * documents ∪ 12 planted near-dup twins: the 12 smallest ≥ 64-byte
    * docs re-recorded with their first sample perturbed (1-char
    * substitution — a genuine near-dup, not an exact copy), twin id =
    * source id + max(doc_id) + 1. Both engines build the same twins, so
    * the hash gate proves the fingerprint DETECTS perturbed
    * re-recordings (every twin must cluster with its source and be
    * removed) while the rest of the corpus stays clean. Spec runs the
    * union-find differential and asserts planted recall 1.0.
    *
    * Scale: pairs are band-bucketed (never all-pairs), the CC iterate is
    * bounded by the dup-pair graph, and the rollup is one ≤ |langs|
    * map-side-combined aggregate. Samples never travel — signatures,
    * pairs, and labels are the only shuffle payloads. */
  def audioDedup(spark: SparkSession, sfDir: String,
      maxHamming: Int = 10): DataFrame = {
    import spark.implicits._
    val base = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"text")
    val maxId = base.agg(max($"doc_id")).head().getLong(0)
    val planted = base.filter(length($"text") >= 64)
      .orderBy($"doc_id".asc).limit(AudioPlantCount)
      .select(($"doc_id" + maxId + 1L).as("doc_id"), $"lang",
        concat(lit("z"), expr("substring(text, 2)")).as("text"))
    audioDedupRollup(audioScanText(base.unionByName(planted)), maxHamming)
  }

  /** Dedup + survival over an [[audioScan]]/[[audioScanText]] table —
    * the payload-agnostic core, shared by the declared text-corpus query
    * and the corrupt-payload robustness spec. Undecodable payloads fail
    * PER-ROW upstream and surface here as a counted `n_undecodable`
    * column (zero on the declared corpus, whose payloads are all
    * well-formed by construction — a clean bill the oracle re-checks). */
  private[graft] def audioDedupRollup(scanned: DataFrame,
      maxHamming: Int = 10): DataFrame = {
    val spark = scanned.sparkSession
    import spark.implicits._
    val pairs = bandedHammingPairs(
      scanned.filter($"status" === FpOk).select($"doc_id", $"w0", $"w1"),
      maxHamming)
    val (labels, _) = Dedup.connectedComponentsStar(
      pairs.select($"doc_a", $"doc_b"))
    val dupFlag = labels
      .select($"doc_id", ($"label" =!= $"doc_id").as("dup"))
    scanned
      .join(dupFlag, Seq("doc_id"), "left_outer")
      .withColumn("removed", coalesce($"dup", lit(false)))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_auds"),
        sum(when($"removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(!$"removed", 1L).otherwise(0L)).as("n_kept"),
        sum(when(!$"removed", $"bytes").otherwise(0L)).as("bytes_kept"),
        sum(when($"removed", $"bytes").otherwise(0L)).as("bytes_saved"),
        sum(when($"status" === FpUndecodable, 1L).otherwise(0L))
          .as("n_undecodable"))
      .orderBy($"lang".asc)
  }

  /** The pair stage of [[audioDedup]], exposed for the union-find
    * differential spec. */
  private[graft] def audioDedupPairs(corpus: DataFrame,
      maxHamming: Int = 10): DataFrame =
    bandedHammingPairs(
      audioScanText(corpus).filter(col("status") === FpOk)
        .select(col("doc_id"), col("w0"), col("w1")),
      maxHamming)

  /** Planted-twin count for [[videoDedup]] — the [[audioDedup]]
    * protocol: the first N sufficiently-long videos re-enter with one
    * changed payload byte. */
  val VideoPlantCount = 12
  /** Frames below this have no stable 4-segment split — unsigned (they
    * stay in the corpus as keepers), like `phashDedup`'s h ≥ 8. */
  val VideoMinFrames = 8
  /** Confirmation contract: of the 16 sampled frame hashes, at least
    * this many must match — a half-changed video is a different video. */
  val VideoMatchFloor = 8

  /** VIDEO near-dup dedup — the frame-SEQUENCE tier that completes the
    * modality matrix (text shingles / image grids / audio segment
    * energies / video frame sequences): a 64-bit per-frame signature is
    * the wrong shape here (a short clip has too few frames to fill one —
    * every short video would collide into a giant bucket), so the
    * sequence itself is the signature. Per decoded video
    * ([[frameSample]]'s contract: one 16-px row per frame):
    *  - each frame's 48 decoded channel bytes fold into the
    *    [[frameSample]] rolling hash — pixels never leave the scan
    *    partition, ~8 bytes per frame thereafter;
    *  - the frame-hash sequence splits into 4 TEMPORAL SEGMENTS (frame r
    *    → segment 4r div h) whose rolling hashes are the LSH band keys:
    *    two videos sharing ANY unchanged quarter become a candidate pair
    *    through one (band, bsig) equi-join — a re-cut, re-intro'd, or
    *    locally-edited copy keeps ≥ 3 quarters intact, while unrelated
    *    videos collide only at hash-collision odds (no near-miss
    *    buckets, unlike bit-signature banding on short content);
    *  - candidates CONFIRM on 16 frame hashes sampled at
    *    r = i·(h−1) div 15: `n_match` of 16 must reach
    *    [[VideoMatchFloor]] (integer — no float in the gate).
    * Pairs then feed the SHARED star-CC resolver and the per-language
    * survival rollup (n_vids / n_removed / n_kept, frames kept/saved) —
    * one dedup pipeline shape across all four modalities.
    *
    * Planted twins ([[audioDedup]]'s protocol) make recall
    * non-vacuous: each twin differs in frame 0 only, so segment 0's key
    * changes but segments 1-3 propose the pair and 15/16 samples match.
    *
    * Scale: the only shuffle payloads are (doc_id, 4 segment hashes,
    * 16 sample hashes) — ~170 bytes per video whatever its length;
    * candidates are bucket-join-sized; the CC iterate is bounded by the
    * dup graph. All integer arithmetic end-to-end, so the DuckDB oracle
    * replays every frame hash, segment fold, sample match, and the
    * recursive cluster walk straight from the text bytes. */
  def videoDedup(spark: SparkSession, sfDir: String,
      matchFloor: Int = VideoMatchFloor): DataFrame = {
    import spark.implicits._
    val base = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"text")
    val maxId = base.agg(max($"doc_id")).head().getLong(0)
    val planted = base.filter(length($"text") >= 16L * VideoMinFrames * 2)
      .orderBy($"doc_id".asc).limit(VideoPlantCount)
      .select(($"doc_id" + maxId + 1L).as("doc_id"), $"lang",
        concat(lit("z"), expr("substring(text, 2)")).as("text"))
    videoDedupRollup(base.unionByName(planted), matchFloor)
  }

  /** Per-video scan table: (doc_id, lang, frames, signed, segs[4],
    * samples[16]) — one decode pass per partition, nothing pixel-sized
    * ever shuffles. Videos under [[VideoMinFrames]] frames carry empty
    * signature arrays (`signed = false`) and skip the pair stage. */
  private[graft] def videoScan(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val P = 1000000007L
    corpus.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, lang, text) =>
          grayImage(text) match {
            case Some(img) if img.h >= VideoMinFrames =>
              val fh = new Array[Long](img.h)
              var r = 0
              while (r < img.h) {
                var hsh = 0L
                var i = r * img.w * 3
                val end = i + img.w * 3
                while (i < end) {
                  hsh = (hsh * 31 + (img.rgb(i) & 0xff)) % P
                  i += 1
                }
                fh(r) = hsh
                r += 1
              }
              val segs = new Array[Long](4)
              r = 0
              while (r < img.h) {
                val b = 4 * r / img.h
                segs(b) = (segs(b) * 31 + fh(r)) % P
                r += 1
              }
              val samples = (0 until 16)
                .map(i => fh(i * (img.h - 1) / 15))
              (id, lang, img.h.toLong, true, segs.toSeq, samples)
            case Some(img) =>
              (id, lang, img.h.toLong, false, Seq.empty[Long],
                Seq.empty[Long])
            case None =>
              (id, lang, 0L, false, Seq.empty[Long], Seq.empty[Long])
          }
        }
      }
      .toDF("doc_id", "lang", "frames", "signed", "segs", "samples")
  }

  /** The candidate + confirm pair stage of [[videoDedup]], exposed for
    * the planted-recall spec: segment-hash LSH proposes, sampled
    * frame-hash agreement confirms. */
  private[graft] def videoDedupPairs(scan: DataFrame,
      matchFloor: Int = VideoMatchFloor): DataFrame = {
    val spark = scan.sparkSession
    import spark.implicits._
    val sigs = scan.filter($"signed")
    val banded = sigs.select($"doc_id", $"samples",
      posexplode($"segs").as(Seq("band", "bsig")))
    val l = banded.select($"doc_id".as("doc_a"), $"samples".as("sa"),
      $"band", $"bsig")
    val r = banded.select($"doc_id".as("doc_b"), $"samples".as("sb"),
      $"band", $"bsig")
    l.join(r, Seq("band", "bsig"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        expr("""aggregate(zip_with(sa, sb, (x, y) -> if(x = y, 1, 0)),
                          0, (a, x) -> a + x)""").as("n_match"))
      .groupBy($"doc_a", $"doc_b")
      .agg(max($"n_match").cast("int").as("n_match"))
      .filter($"n_match" >= matchFloor)
      .orderBy($"doc_a".asc, $"doc_b".asc)
  }

  /** Dedup + survival over a [[videoScan]] table — the payload-agnostic
    * core, shared by the declared query and the planted-recall spec. */
  private[graft] def videoDedupRollup(corpus: DataFrame,
      matchFloor: Int = VideoMatchFloor): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scan = videoScan(corpus)
    val pairs = videoDedupPairs(scan, matchFloor)
      .select($"doc_a", $"doc_b")
    val (labels, _) = Dedup.connectedComponentsStar(pairs)
    val dupFlag = labels
      .select($"doc_id", ($"label" =!= $"doc_id").as("dup"))
    scan
      .join(dupFlag, Seq("doc_id"), "left_outer")
      .withColumn("removed", coalesce($"dup", lit(false)))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_vids"),
        sum(when($"removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(!$"removed", 1L).otherwise(0L)).as("n_kept"),
        sum(when(!$"removed", $"frames").otherwise(0L)).as("frames_kept"),
        sum(when($"removed", $"frames").otherwise(0L)).as("frames_saved"))
      .orderBy($"lang".asc)
  }
}
