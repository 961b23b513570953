package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale diagnostic (not part of the library surface; the
  * LshScaleDiag treatment applied to x03 — VERDICT r13 #4): reproduces
  * x03_semdedup_scaledk's exact quantizer path (scaled k = max(8, n/1000),
  * strided training sample, 2 Lloyd iterations, full-corpus assignment)
  * and censuses the WITHIN-CELL PAIR SPACE — the quantity the semdedup
  * cosine pass is quadratic in — at a given sf dir:
  * sum over cells of m*(m-1)/2, plus the cell-size distribution.
  *
  * What it adjudicates: x03 measured 11.58x at sf1, above the 11.5 linear
  * tolerance. If k ∝ n bounds pair mass (pairs ~ n * E[cell] = n * 1000),
  * the census shows pair mass growing ~10x per 10x data once k is off its
  * max(8, ...) FLOOR; at sf0.1 (n=2000 -> k=8 floored, not n/1000=2) the
  * floor makes cells 1000/4-sized relative to the asymptote, so the first
  * step's ratio is inflated by fixture geometry, not engine cost.
  * Usage: runMain graft.tools.SemDedupScaleDiag <sfDir>
  */
object SemDedupScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    // EXACTLY x03's parameterization — the SHARED helper, not a copy, so
    // a change to the fixture's k/stride/iters cannot leave this census
    // silently adjudicating a different quantizer.
    val n = emb.count()
    val (k, stride) = Similarity.scaledSemDedupParams(n)
    val sample = emb.where(pmod(col("vec_id"), lit(stride)) === 0)
    val cents = Similarity.trainCentroids(sample, k,
      Similarity.ScaledSemDedupIters)
    val cells = Similarity.withAssignedCells(emb, cents)
      .groupBy("cell").agg(count(lit(1)).as("m"))
    val agg = cells.agg(
      count(lit(1)).as("n_cells"),
      max("m").as("max_cell"),
      sum(col("m") * (col("m") - 1) / 2).as("pair_mass"),
      sum("m").as("n_assigned")).collect()(0)
    println(s"RESULT sf=$sfDir n=$n k=$k n_cells=${agg.getLong(0)} " +
      s"max_cell=${agg.getLong(1)} pair_mass=${agg.getDouble(2).toLong} " +
      s"n_assigned=${agg.getLong(3)}")
    spark.stop()
  }
}
