package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[Double, (sum, count), Double]` — the idiomatic Scala
  * port of the reference's hand-rolled RDD average
  * (`reduceByKey` over `(dist_sum, n)` pairs then `map` to `sum/n`,
  * query4.py:126-128,168-170). The buffer IS the reference's accumulator
  * tuple; Spark runs it as a partial+final aggregate, so only (sum, count)
  * pairs cross the shuffle — exactly the property the reference built by
  * hand, here with Tungsten-encoded buffers.
  */
object AvgAggregator extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + a, b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
