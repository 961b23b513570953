package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style importance weighting for training-data selection (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus document by how target-like its hashed
  * bag-of-words is, using per-bucket likelihood-ratio weights estimated
  * from a small target (high-quality / in-domain) sample against the raw
  * corpus itself. Downstream, k02/k03-style deterministic samplers draw
  * the training mix by rank or quota over these scores.
  *
  * Deviations from the paper, chosen for cross-engine exactness: weights
  * are floor-scaled INTEGER likelihood ratios (scale x (n_t+1)(R+B) /
  * (n_r+1)(T+B), add-one smoothed) and a document's score is the SUM of
  * its tokens' ratio weights rather than of their logs — same feature
  * hashing, same per-bucket statistics, same probe mechanics, but every
  * intermediate is exact integer arithmetic a SQL oracle reproduces
  * bitwise (the paper's log-sum needs libm, whose last-ulp behavior
  * differs across engines).
  *
  * Scale shape (the 100 TB story): TWO linear corpus passes and nothing
  * resident. Pass one explodes tokens to (bucket, side) and partial-agg
  * counts into at most `numBuckets` rows — collected to the driver
  * (bounded by construction, like codebooks and centroids), where exact
  * BigInt arithmetic turns them into weights. Pass two re-explodes the
  * raw side, broadcast-joins the tiny weight table on the bucket key, and
  * partial-agg sums per document — no shuffle ever carries more than
  * (doc_id, weight) pairs, no pair space, no window.
  */
object ImportanceWeights {

  /** Per-document DSIR weight: (doc_id, dsir_weight), raw-side docs with
    * at least one token. `isTarget` marks the held-out target sample.
    *
    * Weight values are bounded by scale x R/T-ish ratios: with the default
    * 1e6 scale, per-token weights fit a long for any corpus whose
    * raw/target token ratio stays below ~1e13, and per-doc sums accumulate
    * in decimal(38,0) before the final long cast. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, numBuckets: Int = 1024,
      scale: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def bucketed(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(TextFunctions.cleanTokens(col(textCol))).as("token"))
      .select(col("doc_id"), col("is_t"),
        pmod(TextFunctions.portableHash(col("token")),
          lit(numBuckets.toLong)).as("bucket"))

    // Pass one: per-bucket token counts for both sides in ONE aggregation
    // (conditional sums), <= numBuckets result rows.
    val counts = bucketed(docs).groupBy("bucket").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("n_r"))
      .collect()

    val tTot = counts.map(r => BigInt(r.getLong(1))).sum + numBuckets
    val rTot = counts.map(r => BigInt(r.getLong(2))).sum + numBuckets
    val weightRows = counts.map { r =>
      val w = (BigInt(r.getLong(1)) + 1) * rTot * scale /
        ((BigInt(r.getLong(2)) + 1) * tTot)
      (r.getLong(0), w.toLong)
    }.toSeq
    val weights = weightRows.toDF("bucket", "w")

    // Pass two: raw side re-explodes, probes the broadcast weight table,
    // and sums per document.
    bucketed(docs).where(!col("is_t"))
      .join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("w").cast("decimal(38,0)")).cast("long").as("dsir_weight"))
  }
}
