package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM kernels behind the native vector expressions in
  * [[GraftExpressions]]: dot / cosine / squared-L2 over `array<float>` (or
  * `array<double>`) embedding columns.
  *
  * The arithmetic is EXACTLY the higher-order-function formulation kept in
  * [[graft.functions.VectorFunctions]] (`aggregate(zip_with(...))`):
  * left-to-right IEEE double summation per accumulator, every float widened
  * to double before multiplying, so the DuckDB oracle and the HOF reference
  * reproduce results bitwise. These kernels exist because Catalyst's
  * higher-order functions evaluate their lambda interpreted and boxed per
  * element — on a 64-dim embedding that is ~200 allocations per pair, vs
  * one fused loop here that whole-stage codegen calls statically.
  *
  * Null semantics mirror the HOFs: a null array → null (handled by the
  * expression), ragged lengths or a null element → boxed null (zip_with
  * pads the shorter side with null, null-poisoning the fold).
  */
object VectorKernels {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Sequential-sum dot product; boxed so ragged/null-element inputs can
    * return SQL null exactly like the HOF formulation. */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, af) * elem(b, i, bf)
      i += 1
    }
    acc
  }

  /** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in one fused pass — each
    * accumulator still sums left-to-right, so the value is bitwise the
    * three-fold HOF composition. */
  def cosine(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, af)
      val y = elem(b, i, bf)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Nearest-centroid argmin: index into `cells` of the centroid minimizing
    * squared L2 distance to `emb`, ties broken on the LOWEST cell id —
    * exactly `min_by(cell, struct(sqDist, cell))` over a k-row centroid
    * table, fused into one per-row loop so the assignment needs neither the
    * k-fold crossJoin blowup nor the argmin shuffle. `cents` is the k
    * centroid matrix flattened row-major (k * dim doubles). */
  def nearestCell(emb: ArrayData, cells: Array[Long], cents: Array[Double],
                  ef: Boolean): java.lang.Long = {
    val k = cells.length
    if (k == 0) return null
    val dim = cents.length / k
    // A dimension mismatch is a misconfiguration (wrong dim/m passed to the
    // caller), not a data condition — failing beats an all-null cell column.
    if (emb.numElements() != dim)
      throw new IllegalArgumentException(
        s"graft_nearest_cell: embedding has ${emb.numElements()} dims but " +
          s"the centroid table is $k x $dim")
    var bestCell = 0L
    var bestD = Double.MaxValue
    var first = true
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        if (emb.isNullAt(i)) return null
        val d = elem(emb, i, ef) - cents(off + i)
        acc += d * d
        i += 1
      }
      val cell = cells(c)
      // IEEE total order via Double.compare: NaN sorts GREATER than every
      // finite distance, exactly like the min_by(struct(d, cell)) ordering
      // (and the oracle's ORDER BY dist ASC) this kernel replaces — a NaN
      // centroid must never capture the argmin over a finite one.
      val cmp = java.lang.Double.compare(acc, bestD)
      if (first || cmp < 0 || (cmp == 0 && cell < bestCell)) {
        bestD = acc; bestCell = cell; first = false
      }
      c += 1
    }
    bestCell
  }

  /** Squared L2 distance, sequential summation. */
  def sqDist(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, af) - elem(b, i, bf)
      acc += d * d
      i += 1
    }
    acc
  }
}
