package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure codegen'd
  * higher-order expressions (zip_with/aggregate) — double-precision
  * accumulation in list order, so results are bit-identical to a
  * sequential fold (and to DuckDB's list functions).
  */
object Vec {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (cheaper in joins). */
  def cosineWithNorms(dotAB: Column, na: Column, nb: Column): Column =
    dotAB / (na * nb)
}
