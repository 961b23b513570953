package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the LAST transform of every pretraining data
  * pipeline: tokenized documents concatenate in a canonical order and the
  * token stream cuts into fixed-capacity training sequences (GPT-style
  * concatenate-and-chunk; documents span cut points). What training
  * infrastructure needs from the data side is the PLACEMENT: for every
  * document, its global token offset and which sequences it lands in —
  * that mapping drives shard assignment, boundary-aware attention masks,
  * and resume bookkeeping.
  *
  * Semantics (stated exactly, so a SQL oracle can recompute it): docs
  * order by `doc_id`; `start_offset` is the exclusive prefix sum of token
  * counts; a doc with n > 0 tokens occupies [start, start + n) of the
  * concatenated stream and therefore sequences `start div C` through
  * `(start + n - 1) div C` (capacity C); a zero-token doc sits AT its
  * offset, belongs to sequence `start div C` positionally, and spans 0
  * sequences.
  *
  * Plan shape (the 100 TB story): the naive plan is ONE GLOBAL WINDOW
  * cumsum — a single-partition sort of the corpus, the exact shape the
  * token-budget selector refuses. Here the global exclusive prefix sum is
  * TWO-LEVEL, keyed by the doc_id high bits (`doc_id >> groupShift`,
  * arithmetic shift — monotone over the full signed range):
  *
  *  1. one groupBy(g) partial-sums each leaf (corpus/2^groupShift rows);
  *  2. a window over the LEAF TABLE (ordered by g) takes each leaf's
  *     exclusive prefix — the only ordered pass, over corpus/2^shift
  *     rows (pick groupShift so that fits one task: shift 20 ≈ 1M-doc
  *     leaves keeps the leaf table under ~10k rows per 1e10 docs);
  *  3. a join back on g + a window INSIDE each leaf (≤ 2^groupShift
  *     doc_ids) finishes the per-doc offsets.
  *
  * Exactness: leaf order refines doc_id order, so leaf-exclusive-prefix +
  * within-leaf exclusive cumsum IS the global exclusive prefix sum —
  * integer-exact, and the oracle states the naive global-window rule.
  */
object SequencePack {

  /** Default leaf width (log2): level-2 windows hold at most 2^12 doc_ids;
    * the level-1 ordered pass holds corpus/2^12 leaf rows. */
  val DefaultGroupShift: Int = 12

  /** Global exclusive prefix sum of `nCol` in `idCol` order — the shared
    * [[PrefixSum.twoLevel]] machinery with no keys and the exclusive
    * frame: input + `start_offset`. */
  def exclusivePrefixSum(docs: DataFrame, idCol: String, nCol: String,
                         groupShift: Int = DefaultGroupShift): DataFrame =
    PrefixSum.twoLevel(docs, Seq.empty, idCol, nCol, "start_offset",
      inclusive = false, groupShift)

  /** Per-document packing placement under capacity `cap`:
    * (doc_id, n_tokens, start_offset, first_seq, last_seq, n_seqs).
    * `base` shifts every offset — the already-placed stream length, which
    * is how the STREAMING form continues packing across micro-batches. */
  def packStats(docs: DataFrame, idCol: String, nCol: String, cap: Long,
                groupShift: Int = DefaultGroupShift,
                base: Long = 0L): DataFrame = {
    require(cap > 0, s"capacity must be positive, got $cap")
    require(base >= 0, s"base offset must be non-negative, got $base")
    val d = docs.select(col(idCol).as("doc_id"),
      col(nCol).cast("long").as("n_tokens"))
    exclusivePrefixSum(d, "doc_id", "n_tokens", groupShift)
      .withColumn("start_offset", col("start_offset") + base)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $cap").as("first_seq"),
        expr(s"(start_offset + greatest(n_tokens, 1L) - 1L) div $cap")
          .as("last_seq"))
      .withColumn("n_seqs",
        when(col("n_tokens") === 0L, 0L)
          .otherwise(col("last_seq") - col("first_seq") + 1L))
  }

  /** One row per (doc, sequence) membership — the dataloader-side join
    * table (a doc spanning k sequences emits k rows). Derived from
    * [[packStats]] by an in-row explode; no extra shuffle. */
  def sequenceMembership(docs: DataFrame, idCol: String, nCol: String,
                         cap: Long,
                         groupShift: Int = DefaultGroupShift): DataFrame =
    packStats(docs, idCol, nCol, cap, groupShift)
      .where(col("n_tokens") > 0L)
      .select(col("doc_id"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))

  /** SFT pair packing with LOSS MASKS — the instruction-tuning variant
    * of [[packStats]]: each example is (prompt tokens, completion
    * tokens); examples concatenate-and-chunk exactly like pretraining
    * docs (spanning cut points, with boundary-aware attention handled by
    * the same placement bookkeeping), and the loss mask is the HALF-OPEN
    * TOKEN INTERVAL of the completion — the dataloader trains only on
    * [loss_start, loss_end) of the global stream. Per example:
    * start_offset (exclusive prefix sum of total length, the d46
    * machinery — never a global window), loss_start/loss_end, the
    * sequence span of the whole example and of the masked region
    * (mask_first_seq/mask_last_seq are null for completion-less rows:
    * nothing to train on, but the example still occupies stream space).
    * Same two-level plan shape as [[packStats]]; the mask arithmetic is
    * pure in-row projection. */
  def packPairsWithMasks(pairs: DataFrame, idCol: String, promptCol: String,
                         completionCol: String, cap: Long,
                         groupShift: Int = DefaultGroupShift,
                         base: Long = 0L): DataFrame = {
    require(cap > 0, s"capacity must be positive, got $cap")
    require(base >= 0, s"base offset must be non-negative, got $base")
    val d = pairs.select(col(idCol).as("pair_id"),
      col(promptCol).cast("long").as("n_prompt"),
      col(completionCol).cast("long").as("n_completion"))
      .withColumn("__n", col("n_prompt") + col("n_completion"))
    PrefixSum.twoLevel(d, Seq.empty, "pair_id", "__n", "start_offset",
        inclusive = false, groupShift)
      .withColumn("start_offset", col("start_offset") + base)
      .select(col("pair_id"), col("n_prompt"), col("n_completion"),
        col("start_offset"),
        (col("start_offset") + col("n_prompt")).as("loss_start"),
        (col("start_offset") + col("__n")).as("loss_end"),
        expr(s"start_offset div $cap").as("first_seq"),
        expr(s"(start_offset + greatest(n_prompt + n_completion, 1L) - 1L) " +
          s"div $cap").as("last_seq"))
      .withColumn("mask_first_seq",
        when(col("n_completion") > 0L, expr(s"loss_start div $cap")))
      .withColumn("mask_last_seq",
        when(col("n_completion") > 0L, expr(s"(loss_end - 1L) div $cap")))
  }
}
