package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.SequencePack
import graft.tables.LakeTable

/** Streaming sequence packing — D46 as continuous ingest: tokenized
  * documents arrive in micro-batches and each batch extends the SAME
  * concatenated token stream, so the packed placement (global offset +
  * spanned training sequences) stays consistent however arrivals split
  * across triggers — a dataloader can start consuming sealed sequences
  * while the crawl is still arriving.
  *
  * The cross-batch state is ONE number: the placed stream length. It is
  * deliberately NOT carried in an operator state store — it derives from
  * the placed TABLE itself, excluding the current batch's doc_ids. That
  * makes replay idempotent by construction (exactly-once effective): a
  * re-delivered batch subtracts itself from the table before measuring
  * the base, reproduces identical placements, and the keyed merge
  * re-writes the same rows. A side-state counter would instead desync on
  * the replay the checkpoint contract promises to tolerate.
  *
  * Scale shape: within a batch the placement is D46's two-level prefix
  * sum (no single-partition corpus sort); the base derivation is one agg
  * over the placed table with a broadcast anti-join of the (small) batch
  * key set — O(table scan of two columns) per trigger. A production
  * deployment amortizes that with a one-row bookkeeping table committed
  * in the same transaction; the table-derived form is kept here because
  * it is the one that needs no extra commit protocol to stay exact.
  */
object StreamingPack {

  /** Drain new parquet files (schema: doc_id LONG, n LONG — pre-tokenized
    * counts) under `sourceDir`, pack each micro-batch onto the end of the
    * placed stream, and MERGE placements into the lake table at
    * `placedLocation` keyed on doc_id. */
  def packToTable(spark: SparkSession, sourceDir: String, schema: StructType,
                  cap: Long, placedLocation: String, checkpointDir: String,
                  groupShift: Int = SequencePack.DefaultGroupShift): Unit =
    StreamingIngest.drainToTable(spark, sourceDir, schema, placedLocation,
      checkpointDir, writeMode = "merge", mergeOn = Seq("doc_id"),
      batchTransform = batch => {
        val s = batch.sparkSession
        val base =
          if (LakeTable.exists(placedLocation)) {
            LakeTable.load(s, placedLocation).read()
              .select("doc_id", "start_offset", "n_tokens")
              .join(broadcast(batch.select("doc_id")), Seq("doc_id"),
                "left_anti")
              .agg(coalesce(max(col("start_offset") + col("n_tokens")),
                lit(0L)))
              .collect()(0).getLong(0)
          } else 0L
        SequencePack.packStats(batch, "doc_id", "n", cap, groupShift, base)
      })
}
