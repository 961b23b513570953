package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.{TextFunctions => TF}
import graft.operators.NgramLm

/** Streaming LM-perplexity admission gate: incoming documents stream in
  * (new parquet files per trigger), each micro-batch is scored against a
  * RESIDENT quantized bigram LM ([[NgramLm]]) trained once on the trusted
  * corpus, and documents whose bits-per-kilotoken exceeds the threshold
  * land in a rejects lake table — the streaming form of the d37 perplexity
  * filter, i.e. the CCNet-style quality control in front of a continuously
  * growing training corpus (the near-dup admission gate
  * [[StreamingDedup]]'s quality-side sibling).
  *
  * Scale shape: the LM count tables are built ONCE and stay persisted
  * across micro-batches — per trigger the only work is the batch's own
  * token positions joined against the (vocabulary-bounded, `minCount`-
  * pruned) count tables plus one per-doc sum. Checkpointed AvailableNow
  * triggers give exactly-once file tracking; the rejects merge goes
  * through the transactional table layer, so a replayed micro-batch
  * re-merges identical rows idempotently.
  */
object StreamingQuality {

  /** Drain new parquet files under `sourceDir`, score each micro-batch
    * against an LM fitted on `trainDocs`, and MERGE rejects
    * (doc_id, n_tokens, bits, bits_per_kilotoken) into the lake table at
    * `matchesLocation`, keyed on doc_id. Blocks until available data is
    * processed. */
  def gateToTable(spark: SparkSession, sourceDir: String, schema: StructType,
                  trainDocs: DataFrame, maxBitsPerKiloToken: Long,
                  matchesLocation: String, checkpointDir: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  minCount: Long = 1L): Unit = {
    def tokenized(df: DataFrame): DataFrame =
      df.select(col(idCol), TF.cleanTokens(col(textCol)).as("tokens"))
    val model = NgramLm.fit(tokenized(trainDocs), idCol, "tokens",
      minCount = minCount)
    try {
      StreamingIngest.drainToTable(spark, sourceDir, schema, matchesLocation,
        checkpointDir, writeMode = "merge", mergeOn = Seq("doc_id"),
        batchTransform = batch =>
          NgramLm.scoreBits(tokenized(batch), idCol, "tokens", model)
            .where(col("bits_per_kilotoken") > maxBitsPerKiloToken))
    } finally model.unpersist()
  }
}
