package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming per-host token-budget admission — the stateful-streaming
  * form of the d43 host cap: documents arrive in micro-batches, each host
  * carries its RUNNING token total in `flatMapGroupsWithState` state, and
  * a document is admitted iff the host's running total through it stays
  * within the budget (the same prefix rule as the batch operator: once a
  * host overflows, everything later for that host is rejected — rejected
  * tokens still advance the counter, so the cut is a prefix of the
  * arrival order, deterministic and SQL-stateable).
  *
  * Within one micro-batch a host's documents process best-first
  * (score DESC, doc_id ASC) — so one AvailableNow batch reproduces the
  * batch semantics exactly; across batches the state makes the budget a
  * LIFETIME cap, which is the point: a crawl frontier can't re-spend a
  * host's budget by splitting arrivals over triggers.
  *
  * Scale shape: state per host is ONE long (no document buffering across
  * batches; within a batch a host's group is buffered to sort — bounded
  * by per-host-per-trigger arrivals, the frontier's politeness window).
  * The state store shards by host hash across executors; checkpointed
  * AvailableNow + keyed merge gives exactly-once effective admission.
  */
object StreamingHostBudget {

  final case class Doc(doc_id: Long, host: String, score: Long,
                       n_tokens: Long)
  final case class Admitted(doc_id: Long, host: String, n_tokens: Long,
                            host_spent: Long)

  /** The stateful admission transform (streaming or batch Dataset). */
  def admit(ds: Dataset[Doc], budget: Long): Dataset[Admitted] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (host: String, docs: Iterator[Doc], state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[Admitted]
          docs.toVector.sortBy(d => (-d.score, d.doc_id)).foreach { d =>
            cum += d.n_tokens
            if (cum <= budget) out += Admitted(d.doc_id, host, d.n_tokens, cum)
          }
          state.update(cum)
          out.result().iterator
        })
  }

  /** Drain new parquet files under `sourceDir` (schema: doc_id, host,
    * score, n_tokens) through the stateful admission and MERGE admitted
    * docs into the lake table at `admittedLocation`, keyed on doc_id.
    * Blocks until available data is processed; the checkpoint carries the
    * per-host spent state to the next drain. */
  def gateToTable(spark: SparkSession, sourceDir: String, schema: StructType,
                  budget: Long, admittedLocation: String,
                  checkpointDir: String): Unit = {
    import spark.implicits._
    StreamingIngest.drainToTable(spark, sourceDir, schema, admittedLocation,
      checkpointDir, writeMode = "merge", mergeOn = Seq("doc_id"),
      transform = stream => admit(stream.as[Doc], budget).toDF())
  }
}
