package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k selection as a PARTIAL-AGGREGABLE typed `Aggregator` —
  * the scale-safe replacement for `row_number().over(Window.partitionBy(
  * q_id))` when |q_id| is tiny: the window formulation shuffles the
  * ENTIRE scored stream into |q| reducer partitions and sorts each (a
  * 3-task funnel over the whole corpus at 100 TB), where this aggregator
  * keeps a k-bounded buffer per (q_id, map task), so the exchange
  * carries ≤ k rows per query per map task — candidate-stream size never
  * reaches the wire.
  *
  * Top-k under a TOTAL order (score, then vec_id ascending as the
  * tie-break) is associative: merge(topK(A), topK(B)) = topK(A ∪ B), so
  * the result is exact and bit-deterministic on any partitioning — the
  * same (cos DESC, vec_id ASC) / (dist ASC, vec_id ASC) contract the
  * window formulation had, and the DuckDB oracles hold unchanged.
  *
  * The buffer is a best-first-sorted list of (score, vec_id, aux)
  * capped at k (k ≤ ~100 here; insertion into a 5-element list is
  * cheaper than any heap). `aux` carries one extra output column
  * (binary ANN's hamming) through the selection; callers without one
  * pass 0.
  */
final class TopKAggregator(k: Int, descending: Boolean)
    extends Aggregator[(Long, Double, Long), List[(Double, Long, Long)],
      Seq[(Long, Double, Long, Int)]] {

  // fail at plan-build time: with k <= 0 the insert guard would read
  // buf.last on an empty buffer and throw NoSuchElementException deep
  // inside the aggregation instead of here with a clear message
  require(k > 0, s"top-k requires k > 0, got $k")

  /** Strict total order, best first. NaN is treated as the GREATEST
    * score — the total order Spark SQL sorts by and DuckDB replays —
    * so a NaN score (e.g. cosine of a zero vector, which no current
    * fixture contains) would rank exactly where the window formulation
    * ranked it, not silently last. −0.0 and 0.0 stay EQUAL (primitive
    * comparison, Spark's comparison semantics), falling through to the
    * vec_id tie-break — `java.lang.Double.compare` would order them. */
  private def better(a: (Double, Long, Long), b: (Double, Long, Long))
      : Boolean = {
    val aNaN = a._1.isNaN
    val bNaN = b._1.isNaN
    if (aNaN || bNaN) {
      if (aNaN != bNaN) { if (descending) aNaN else bNaN }
      else a._2 < b._2
    } else if (a._1 != b._1) {
      if (descending) a._1 > b._1 else a._1 < b._1
    } else a._2 < b._2
  }

  private def insert(buf: List[(Double, Long, Long)],
      x: (Double, Long, Long)): List[(Double, Long, Long)] =
    if (buf.lengthCompare(k) >= 0 && !better(x, buf.last)) buf
    else (x :: buf).sortWith(better).take(k)

  override def zero: List[(Double, Long, Long)] = Nil

  override def reduce(buf: List[(Double, Long, Long)],
      in: (Long, Double, Long)): List[(Double, Long, Long)] =
    insert(buf, (in._2, in._1, in._3))

  override def merge(b1: List[(Double, Long, Long)],
      b2: List[(Double, Long, Long)]): List[(Double, Long, Long)] =
    b2.foldLeft(b1)(insert)

  override def finish(buf: List[(Double, Long, Long)])
      : Seq[(Long, Double, Long, Int)] =
    buf.zipWithIndex.map { case ((s, id, aux), i) => (id, s, aux, i + 1) }

  override def bufferEncoder: Encoder[List[(Double, Long, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Double, Long, Int)]] =
    ExpressionEncoder()
}

object TopKAggregator {

  /** Two-stage exact top-k per query over a scored candidate stream:
    * `scored` must carry (`q_id`, `vec_id`, `score`) [+ `aux`]; returns
    * (`q_id`, `vec_id`, `score`, `aux`, `rnk`) for the k best rows per
    * q_id under (score best-first, vec_id ASC) — ranked by the
    * aggregator itself, so the plan is partial agg → one k-bounded
    * exchange → final agg → explode: no Window, no corpus-sized shuffle
    * into |q| partitions. */
  def topKPerQuery(scored: DataFrame, k: Int, descending: Boolean,
      aux: Option[Column] = None): DataFrame = {
    import scored.sparkSession.implicits._
    val fn = udaf(new TopKAggregator(k, descending))
    scored
      .groupBy($"q_id")
      .agg(fn($"vec_id".cast("long"), $"score".cast("double"),
        aux.getOrElse(lit(0L)).cast("long")).as("top"))
      .select($"q_id", explode($"top").as("t"))
      .select($"q_id", $"t._1".as("vec_id"), $"t._2".as("score"),
        $"t._3".as("aux"), $"t._4".as("rnk"))
  }
}
