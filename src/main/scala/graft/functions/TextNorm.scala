package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lower, regexp_replace, trim}

/** The one shared text-normalization definition (lowercase, trim, collapse
  * whitespace). Every operator whose DuckDB oracle re-implements the
  * normalization must use these — the Spark and oracle expressions have to
  * stay byte-identical, and a fix applied to a private copy would silently
  * desynchronize the others. */
object TextNorm {
  /** SQL-expression form for use inside expr(...) strings. */
  val normSql: String = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"

  /** Column form of the same normalization. */
  def normCol: Column = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
}
