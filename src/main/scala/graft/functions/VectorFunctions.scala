package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns via higher-order functions —
  * codegen'd, no UDFs, identical fold order to DuckDB's list functions so
  * the oracle agrees to the last few ulps (outputs are still rounded).
  *
  * Scale: each op is a per-row fold inside WholeStageCodegen; the arrays
  * never leave the row, so these compose with joins/windows without adding
  * shuffles.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity — dot/(|a||b|), the same formula DuckDB's
    * `list_cosine_similarity` computes. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
