package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key top-k WITHOUT a single-partition-per-key sort.
  *
  * `row_number().over(Window.partitionBy(key))` puts every row of a key in
  * ONE task — on a skewed key (one language holding half a 100 TB corpus)
  * that is a full sort of half the data on one core, to keep at most k
  * rows. This is the two-level salted decomposition: stage 1 ranks within
  * `(key, salt)` — `salts`-way parallel, each partition bounded to
  * |key| / salts rows — and keeps only k candidates per salt bucket; stage
  * 2 ranks the <= salts * k survivors per key, a per-key state bounded by
  * a constant regardless of corpus size. Because the global top-k of a key
  * is necessarily inside the top-k of its salt bucket, the result is
  * row-identical to the naive window (given a TOTAL order — callers must
  * include a tiebreaker column, or ranks are nondeterministic either way).
  *
  * Mirrors the per-group cap the reference applies driver-side in pandas
  * (`warehouses/.../transforms.py` head-per-group idiom) re-expressed as a
  * scale-safe Spark plan.
  */
object BoundedRank {

  private val SaltCol = "__brk_salt"

  /** Rows of `df` whose rank within `keyCols` (ordered by `orderCols`) is
    * <= k, with the rank appended as `rankCol`. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                 k: Int, rankCol: String = "rk", salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0, s"k and salts must be positive (k=$k, salts=$salts)")
    val keyCs = keyCols.map(col)
    // Deterministic spread: salt from the hash of the whole row's order
    // position is overkill — any stable per-row value works. xxhash64 over
    // the order columns keeps the salt independent of the key (so a key's
    // rows spread across all buckets) and reproducible across retries.
    val salted = df.withColumn(SaltCol, pmod(xxhash64(orderCols: _*), lit(salts)))
    val perBucket = Window.partitionBy((keyCs :+ col(SaltCol)): _*).orderBy(orderCols: _*)
    val candidates = salted
      .withColumn(rankCol, row_number().over(perBucket))
      .where(col(rankCol) <= k)
      .drop(SaltCol, rankCol)
    // <= salts * k rows per key survive; the per-key window below is over
    // bounded state no matter how large (or skewed) the input was.
    val perKey = Window.partitionBy(keyCs: _*).orderBy(orderCols: _*)
    candidates
      .withColumn(rankCol, row_number().over(perKey).cast("long"))
      .where(col(rankCol) <= k)
  }
}
