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
  * BigInt arithmetic turns them into weights. Pass two is SHUFFLE-FREE:
  * the weight table is tiny enough to ship as a literal array inside the
  * plan, so each document's score is a single in-row fold
  * (element_at per token) — a pure projection over the raw scan, no
  * join, no exchange, no state (plan-audited).
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
    // Fused codegen kernel (one pass over the string, no per-token HOF
    // dispatch); bitwise-identical to the HOF formulation in
    // [[hofBuckets]] (cross-checked in ImportanceWeightsSpec).
    def buckets(df: DataFrame): Column =
      expr(s"graft_token_buckets(`$textCol`, ${numBuckets}L)")

    // Pass one: per-bucket token counts for both sides in ONE aggregation
    // (conditional sums), <= numBuckets result rows.
    val counts = docs
      .select(isTarget.as("is_t"), explode(buckets(docs)).as("bucket"))
      .groupBy("bucket").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("n_r"))
      .collect()

    val tTot = counts.map(r => BigInt(r.getLong(1))).sum + numBuckets
    val rTot = counts.map(r => BigInt(r.getLong(2))).sum + numBuckets
    // Dense bucket -> weight vector; buckets no token hashed into keep the
    // pure-smoothing weight (they are never probed anyway: a raw token's
    // own bucket always has n_r >= 1).
    val weightVec = Array.fill(numBuckets)(
      (rTot * scale / tTot).toLong)
    counts.foreach { r =>
      weightVec(r.getLong(0).toInt) =
        ((BigInt(r.getLong(1)) + 1) * rTot * scale /
          ((BigInt(r.getLong(2)) + 1) * tTot)).toLong
    }

    // Pass two, shuffle-free: the weight vector rides in the plan as a
    // literal array; each doc's score is an in-row fold — element_at is
    // O(1) per token, accumulation in decimal so per-doc sums can't
    // overflow before the final long cast.
    val wArr = array(weightVec.map(lit(_)): _*)
    docs.where(!isTarget)
      .select(col(idCol).as("doc_id"), buckets(docs).as("bks"))
      .where(size(col("bks")) > 0)
      .select(col("doc_id"),
        aggregate(col("bks"), lit(0L).cast("decimal(38,0)"),
          (acc, b) => acc + element_at(wArr, b.cast("int") + 1).cast("decimal(38,0)"))
          .cast("long").as("dsir_weight"))
  }

  /** Interpreted HOF reference for the token-bucket kernel — kept for the
    * bitwise cross-check, mirroring the TextFunctions/TextHashKernels
    * convention. */
  def hofBuckets(textCol: Column, numBuckets: Int): Column =
    transform(TextFunctions.cleanTokens(textCol),
      t => pmod(TextFunctions.portableHash(t), lit(numBuckets.toLong)))
}
