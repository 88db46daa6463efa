package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns.
  * The dot product is a native one-pass expression with double-precision
  * accumulation in list order, so results stay bit-identical to a
  * sequential fold (and to DuckDB's list functions) while avoiding an
  * interpreted lambda per element.
  */
object Vec {
  def dot(a: Column, b: Column): Column = graft.functions.Sketches.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (cheaper in joins). */
  def cosineWithNorms(dotAB: Column, na: Column, nb: Column): Column =
    dotAB / (na * nb)
}
