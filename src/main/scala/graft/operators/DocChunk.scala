package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/embedding-prep
  * transform (RAG indexing, long-document embedding, context-window
  * fitting): each document splits into chunks of at most `size`
  * characters starting every `stride` characters (overlap = size -
  * stride), with exact 1-based offsets and the chunk text's md5 so the
  * extraction itself sits under the hash compare.
  *
  * Semantics (integer-exact, oracle-stateable): chunk i of a doc with
  * len > 0 starts at `1 + i*stride`; chunks exist for
  * i in [0, n), n = 1 + max(0, ceil((len - size) / stride)) — the last
  * chunk may be short, a doc shorter than one window is one chunk, and
  * an empty doc has none. `stride <= size` keeps coverage gap-free.
  *
  * Plan shape: ONE in-row explode (`sequence` over the computed chunk
  * count) + projections — no shuffle at all until the caller aggregates;
  * at 100 TB chunking is scan-speed.
  */
object DocChunk {

  /** One row per chunk: (doc_id, chunk_id, chunk_start, chunk_len,
    * chunk_md5). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val len = length(col(textCol)).cast("long")
    // ceil((len - size) / stride) clamped at 0, via exact double floor
    // (values stay far below 2^53) — Column API only, so a textCol
    // needing quoting cannot break an expr() splice
    val n = when(len === 0L, 0L).otherwise(
      lit(1L) + greatest(lit(0L),
        floor((len - size + stride - 1) / lit(stride)).cast("long")))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        n.as("__n"))
      .where(col("__n") > 0L)
      .select(col("doc_id"), col("__text"),
        explode(sequence(lit(0L), col("__n") - 1L)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride + 1L).as("chunk_start"),
        least(lit(size.toLong),
          length(col("__text")) - (col("chunk_id") * stride)).as("chunk_len"),
        md5(expr(s"substring(__text, chunk_id * $stride + 1, $size)")
          .cast("binary")).as("chunk_md5"))
  }
}
