package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cursor-range chunking: the scalable Spark shape of SQLAlchemy's
  * `yield_per(chunk_size)` streaming
  * (`elt-common/src/elt_common/sources/sqldatabase/__init__.py:192-195`).
  *
  * Planning runs TWO distributed passes over the (already filter-pushed)
  * scan — a count and an `approx_percentile` sketch on the cursor column —
  * and then each chunk is the source with a `lo < cursor <= hi` range
  * predicate, which lands in the parquet scan's `PushedFilters` (or a JDBC
  * WHERE clause against a real database). Nothing is ever globally sorted
  * and no single task sees more than its partition split: this replaces the
  * round-2 `Window.orderBy().row_number()` chunker whose unpartitioned
  * window serialized the whole extract through one task per chunk.
  *
  * Chunk sizes are approximate (the percentile sketch is exact up to
  * `accuracy` rows, approximate beyond): the contract is "bounded slices
  * that cover the input exactly", not "exactly chunkSize rows" — the write
  * path is chunk-agnostic, chunking only bounds per-commit memory.
  *
  * Rows with a NULL cursor ride in the first chunk. Cursor types without a
  * percentile sketch (strings, binary) fall back to a single chunk.
  */
object Chunker {

  /** Exact for inputs up to this many rows; sketch memory stays O(accuracy). */
  val Accuracy = 10000

  def isRangeable(dt: DataType): Boolean = dt match {
    case _: NumericType | _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }

  def rangeChunks(df: DataFrame, orderCol: String, chunkSize: Long): Iterator[DataFrame] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    if (!isRangeable(df.schema(orderCol).dataType)) return Iterator(df)
    val total = df.count() // planning pass 1 (count-only, column-pruned)
    if (total <= chunkSize) return Iterator(df)

    // planning pass 2: cursor values at every chunkSize-th rank
    val nChunks = ((total + chunkSize - 1) / chunkSize).toInt
    val probs = (1 until nChunks).map(i => (i * chunkSize).toDouble / total)
    val boundsRow = df
      .agg(percentile_approx(col(orderCol), lit(probs.toArray), lit(Accuracy)).as("b"))
      .head()
    if (boundsRow.isNullAt(0)) return Iterator(df) // all-null cursor column
    val bounds = boundsRow.getSeq[Any](0)
      .distinct // duplicate boundaries (skew / few distinct values) collapse

    val c = col(orderCol)
    val preds: Seq[Column] =
      if (bounds.isEmpty) Seq(lit(true))
      else {
        val first = c <= lit(bounds.head) || c.isNull
        val mids = bounds.sliding(2).collect {
          case Seq(lo, hi) => c > lit(lo) && c <= lit(hi)
        }.toSeq
        first +: mids :+ (c > lit(bounds.last))
      }
    preds.iterator.map(df.where)
  }
}
