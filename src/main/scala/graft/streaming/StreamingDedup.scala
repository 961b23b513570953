package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Streaming near-duplicate gate: incoming documents stream in (new parquet
  * files per trigger), each micro-batch is probed against a RESIDENT LSH
  * index of the already-accepted corpus, and matches land in a quarantine
  * lake table — the streaming form of the d23 incremental dedup probe,
  * i.e. the admission control in front of a continuously-growing training
  * corpus.
  *
  * Scale shape: the index (capped band keys + shingle-hash sets) is built
  * ONCE and stays persisted across micro-batches — per trigger the only
  * work is the batch's own signatures plus an equi-join against the index
  * bands (shuffle on band keys, candidate fanout bounded by the index-side
  * bucket cap). Checkpointed AvailableNow triggers give exactly-once file
  * tracking; the quarantine append goes through the transactional table
  * layer.
  */
object StreamingDedup {

  /** Drain new parquet files under `sourceDir`, probe each micro-batch
    * against `indexed`, and MERGE verified matches
    * (doc_id, n_matches, best_jaccard_e6) into the lake table at
    * `matchesLocation`, keyed on doc_id — a replayed micro-batch (commit
    * landed, checkpoint didn't) re-merges identical rows idempotently
    * instead of double-counting, and a doc re-arriving in a later file
    * updates its row. Blocks until available data is processed. */
  def gateToTable(spark: SparkSession, sourceDir: String, schema: StructType,
                  indexed: DataFrame, matchesLocation: String,
                  checkpointDir: String,
                  idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (indexBands, indexShs) = Dedup.buildLshIndex(indexed, idCol, textCol)
    try {
      StreamingIngest.drainToTable(spark, sourceDir, schema, matchesLocation,
        checkpointDir, writeMode = "merge", mergeOn = Seq("doc_id"),
        batchTransform = batch =>
          Dedup.probeLshIndex(batch, idCol, textCol, indexBands, indexShs))
    } finally {
      indexBands.unpersist()
      indexShs.unpersist()
    }
  }
}
