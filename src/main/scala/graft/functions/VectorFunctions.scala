package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, computed in
  * double precision with strictly sequential (left-to-right) summation so an
  * external oracle evaluating the same formula reproduces the result bitwise.
  *
  * The default entry points route to the native codegen Catalyst expressions
  * registered by [[graft.expressions.GraftSparkSessionExtensions]] (one
  * static kernel call inside whole-stage codegen). The higher-order-function
  * formulations are kept as `*Hof` reference implementations — bitwise
  * identical by construction ([[graft.expressions.VectorKernels]] mirrors
  * their fold order), cross-checked in `VectorKernelsSpec`.
  */
object VectorFunctions {

  /** Dot product of two array columns in double precision (native kernel). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Euclidean norm (double). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (double, native fused kernel). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Squared L2 distance (double, native kernel). */
  def sqDist(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)

  /** Integer squared code distance over two `array<bigint>` code columns
    * (the SQ8 symmetric-ADC inner loop; native fused kernel). */
  def codeSqDist(a: Column, b: Column): Column =
    call_function("graft_code_sqdist", a, b)

  // ---- higher-order-function reference implementations -------------------

  /** HOF reference for [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** HOF reference for [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** HOF reference for [[sqDist]]. */
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** HOF reference for [[codeSqDist]] (the pre-r9 e13/e14 scoring shape;
    * kept as the bitwise cross-check of the fused kernel). */
  def codeSqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)
}
