package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * plus JSON property extraction — the shape of an image/audio ingest
  * pipeline with the actual codec stubbed (no media libraries in this
  * container; see `FakeDecoder`).
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

  /** STUB decoder for the binary payload. A real pipeline would decode
    * image/audio bytes here (resize, frame-sample, feature-extract); this
    * container has no media libs, so the "features" are a deterministic
    * function of the bytes: payload size, first byte, and a polynomial
    * hash of the first 8 bytes standing in for an embedding. The Spark
    * plumbing around it — binary column, per-partition batched iteration,
    * typed output schema — is the real, tested part. */
  object FakeDecoder {
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

  /** Resize stub: decimate the payload by `factor` (every factor-th byte)
    * — the shape of an image downsample with the real resampler stubbed.
    * Runs in the same per-partition batched iterator as the decoder;
    * output is the resized size + a native hash of the resized bytes so
    * the oracle can reproduce it from the text. NB the oracle folds
    * per-character ascii() — equal to the byte fold only for ASCII
    * payloads, which the fixtures guarantee (asserted in
    * RobustnessSpec). */
  def resize(spark: SparkSession, sfDir: String, factor: Int = 2): DataFrame = {
    import spark.implicits._
    val payload = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    payload.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val resized = Array.tabulate(
          (bytes.length + factor - 1) / factor)(i => bytes(i * factor))
        var h = 0L
        resized.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
        (id, bytes.length, resized.length, h)
      }
    }
      .toDF("doc_id", "n_bytes", "resized_bytes", "resized_hash")
      .select($"doc_id", $"n_bytes".cast("long").as("n_bytes"),
        $"resized_bytes".cast("long").as("resized_bytes"), $"resized_hash")
      .orderBy($"doc_id".asc)
  }

  /** Frame-sampling stub: treat the payload as a "video" of fixed 16-byte
    * frames and sample every 4th frame, emitting a per-frame feature hash
    * (stand-in for a per-frame embedding — no codecs in this container).
    * The Spark shape is the real part: explode a strided index sequence,
    * slice the payload per frame, hash natively (`poly_hash`), no UDFs.
    * Scale: fan-out is n_frames/stride rows per doc, produced inside
    * codegen; no shuffle until the final order-for-compare. */
  def frameSample(spark: SparkSession, sfDir: String,
      frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    import spark.implicits._
    graft.functions.PolyHash.register(spark)
    Tables.read(spark, sfDir, "documents")
      .withColumn("n_frames",
        floor(length($"text") / frameBytes).cast("long"))
      .filter($"n_frames" >= 1)
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, cast(n_frames AS int) - 1, $stride)")))
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        $"n_frames",
        expr(s"poly_hash(substr(text, frame_idx * $frameBytes + 1, " +
          s"$frameBytes), $frameBytes)").as("frame_hash"))
      .orderBy($"doc_id".asc, $"frame_idx".asc)
  }

  /** Binary-column feature extraction: text → utf-8 bytes as the stand-in
    * payload (the testdata has no true media column), then the per-
    * partition decode stub. Output is deliberately arithmetic so the
    * DuckDB oracle can reproduce it from the text itself. */
  def binaryFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payload = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    payload
      .mapPartitions(FakeDecoder.decodeBatch)
      .toDF()
      .select($"doc_id", $"n_bytes", $"first_byte", $"feat_hash")
      .orderBy($"doc_id".asc)
  }
}
