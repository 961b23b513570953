package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}

/** The native vector kernels must agree BIT-FOR-BIT with the
  * higher-order-function formulations (the oracle contract): same fold
  * order, same float→double widening, same null semantics. */
class VectorKernelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random float vectors incl. negatives/denorm-ish
  private def vec(seed: Long, dim: Int): Seq[Float] = {
    var x = seed
    Seq.fill(dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
    }
  }

  private val df = (0L until 40L).map(i => (i, vec(i, 64), vec(i + 1000, 64)))
    .toDF("id", "a", "b")

  test("dot / cosine / sqDist kernels == HOF formulations, bitwise") {
    val rows = df.select(
      VF.dot(col("a"), col("b")).as("kd"), VF.dotHof(col("a"), col("b")).as("hd"),
      VF.cosine(col("a"), col("b")).as("kc"), VF.cosineHof(col("a"), col("b")).as("hc"),
      VF.sqDist(col("a"), col("b")).as("ks"), VF.sqDistHof(col("a"), col("b")).as("hs"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "cosine")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(5)), "sqDist")
    }
  }

  test("float-array x double-array literal (hyperplane case) matches HOF") {
    val plane = lit(vec(7L, 64).map(_.toDouble).toArray)
    val rows = df.select(VF.dot(col("a"), plane).as("k"),
      VF.dotHof(col("a"), plane).as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("nearest-cell kernel == brute-force argmin with min_by tie-break, incl. NaN") {
    val rnd = new scala.util.Random(42)
    val k = 6
    val dim = 8
    // one centroid poisoned with NaN: it must never win over a finite one
    val cents: Array[Array[Double]] = Array.tabulate(k)(c =>
      Array.fill(dim)(if (c == 3) Double.NaN else rnd.nextDouble() * 2 - 1))
    val cells = (0L until k.toLong).toArray
    val flat = cents.flatten
    val vecs = Seq.fill(50)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        call_function("graft_nearest_cell", col("embedding"),
          lit(cells), lit(flat)).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val dists = cents.map(c =>
        v.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
      // min_by(struct(d, cell)) ordering: NaN sorts greatest
      val best = cells.minBy(c => (dists(c.toInt), c))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      assert(got(i.toLong) == best, s"vec $i")
    }
  }

  test("nearest-cell fails loudly on dimension mismatch, not all-null cells") {
    val df2 = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    // per-row embedding width != centroid width: runtime error
    val e = intercept[Exception] {
      df2.select(call_function("graft_nearest_cell", col("embedding"),
        lit(Array(0L, 1L)), lit(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))))
        .collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("dims") || Option(e.getCause).exists(
        c => c.getMessage != null && c.getMessage.contains("dims"))))
    // centroid matrix not a multiple of the cell count: analysis-time error
    val e2 = intercept[Exception] {
      df2.select(call_function("graft_nearest_cell", col("embedding"),
        lit(Array(0L, 1L)), lit(Array(1.0, 2.0, 3.0)))).collect()
    }
    assert(e2.getMessage.contains("multiple") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("ragged lengths and null arrays yield SQL null like zip_with padding") {
    val ragged = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    val r = ragged.select(VF.dot(col("a"), col("b")).as("k"),
      VF.dotHof(col("a"), col("b")).as("h")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val withNull = Seq((Option.empty[Seq[Float]], Option(Seq(1f))))
      .toDF("a", "b")
    val r2 = withNull.select(VF.dot(col("a"), col("b")).as("k")).collect().head
    assert(r2.isNullAt(0))
  }
}
