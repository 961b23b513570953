package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, computed in
  * double precision with strictly sequential (left-to-right) summation so an
  * external oracle evaluating the same formula reproduces the result bitwise.
  * All codegen'd higher-order functions — no UDFs.
  */
object VectorFunctions {

  /** Dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm (double). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (double); NaN-free for zero vectors via nullif. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (double), strictly sequential summation. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
}
