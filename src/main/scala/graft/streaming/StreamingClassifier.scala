package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.{TextFunctions => TF}
import graft.operators.NbClassifier

/** Streaming model-based admission gate: incoming documents stream in
  * (new parquet files per trigger), each micro-batch is scored against a
  * RESIDENT quantized Naive Bayes classifier ([[NbClassifier]]) trained
  * once on a labeled trusted corpus, and documents the model rejects
  * (quantized log-odds <= 0) land in a rejects lake table — the
  * classifier-gate form of "train on trusted, score the crawl" (GPT-3's
  * quality filter) in front of a continuously growing corpus, completing
  * the admission-gate trio: near-dup ([[StreamingDedup]]), perplexity
  * ([[StreamingQuality]]), classifier (this).
  *
  * Scale shape: the count table is built ONCE and stays persisted across
  * micro-batches — per trigger the only work is the batch's token
  * occurrences joined against the (vocabulary-bounded, `minCount`-pruned,
  * broadcastable) counts plus one per-doc sum. Checkpointed AvailableNow
  * triggers give exactly-once file tracking; the rejects merge goes
  * through the transactional table layer, so a replayed micro-batch
  * re-merges identical rows idempotently.
  */
object StreamingClassifier {

  /** Drain new parquet files under `sourceDir`, score each micro-batch
    * against an NB model fitted on `trainDocs` (must carry boolean
    * `labelCol`), and MERGE rejected docs (doc_id, n_tokens, score_bits)
    * into the lake table at `matchesLocation`, keyed on doc_id. Blocks
    * until available data is processed. */
  def gateToTable(spark: SparkSession, sourceDir: String, schema: StructType,
                  trainDocs: DataFrame, matchesLocation: String,
                  checkpointDir: String, idCol: String = "doc_id",
                  textCol: String = "text", labelCol: String = "y",
                  minCount: Long = 1L): Unit = {
    def tokenized(df: DataFrame): DataFrame =
      df.select(col(idCol) +: df.columns.filter(_ == labelCol).map(col).toSeq :+
        TF.cleanTokens(col(textCol)).as("tokens"): _*)
    val model = NbClassifier.fit(tokenized(trainDocs), idCol, "tokens",
      labelCol, minCount = minCount)
    try {
      StreamingIngest.drainToTable(spark, sourceDir, schema, matchesLocation,
        checkpointDir, writeMode = "merge", mergeOn = Seq("doc_id"),
        batchTransform = batch =>
          NbClassifier.score(tokenized(batch), idCol, "tokens", model)
            .where(col("predicted") === 0L)
            .select("doc_id", "n_tokens", "score_bits"))
    } finally model.unpersist()
  }
}
