package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the CCNet-style corpus
  * quality stage (Wenzek et al. 2020: score every document against an LM
  * trained on a trusted slice, keep/bucket by perplexity). The reference
  * pipeline has no LM stage; a 100 TB training-data pipeline does, so this
  * is a first-class §2.11 operator alongside the quality heuristics (D9)
  * and DSIR importance weights (D32).
  *
  * The model is a bigram LM with stupid backoff (Brants et al. 2007) in a
  * QUANTIZED integer form so that scoring is exact, associative and
  * engine-reproducible — the same design stance as [[Bm25]]. Instead of
  * float log-probabilities, every count enters through its integer
  * bit-length: `flog2(c) = floor(log2(c)) = length(bin(c)) - 1`, which
  * both Spark and the SQL oracle compute EXACTLY on integers (no libm, no
  * rounding modes). Per-token cost in "bits" (T = total training tokens):
  *
  *  - first token, seen:      flog2(T) - flog2(c1(w))
  *  - bigram (prev,w) seen:   flog2(c1(prev)) - flog2(c2(prev,w))
  *  - bigram unseen, w seen:  backoffBits + flog2(T) - flog2(c1(w))
  *  - w out-of-vocabulary:    [backoffBits +] flog2(T) + oovExtraBits
  *
  * Each line is the floor-log2 of the corresponding stupid-backoff
  * probability ratio (backoffBits ≈ -log2 of the backoff discount α=0.125;
  * oovExtraBits the unseen-mass penalty), so the score is a 1-bit-granular
  * perplexity: document bits/token ranks fluent-against-the-LM text below
  * out-of-domain text exactly as float perplexity does, quantized to whole
  * bits. A documented variant, not an approximation error — ties that float
  * perplexity would split inside one bit are preserved as ties.
  *
  * Plan shape (the 100 TB story): two explode+groupBy passes over the
  * TRAINING slice build the unigram and bigram tables (map-side partial
  * aggregation; vocabulary-bounded, not corpus-bounded). Scoring joins
  * every token position against c1 (twice: word + its predecessor) and c2,
  * then one groupBy(doc) — when the LM is pruned (`minCount` > 1, the
  * standard n-gram pruning) the count tables broadcast and scoring is
  * map-side only: one shuffle total for the per-doc sum. Bits per position
  * are ≤ 2*flog2(T) + backoffBits + oovExtraBits (< 150 for any corpus
  * that fits in Long), so the per-doc Long sum cannot overflow.
  */
object NgramLm {

  /** floor(log2(x)) for x >= 1, exactly, via the binary string length —
    * the one integer-log formulation Spark and DuckDB evaluate identically. */
  private def flog2(c: Column): Column = length(bin(c)) - 1

  /** Per-document quantized-perplexity report.
    *
    * @param docs        (idCol: long, tokensCol: array&lt;string&gt;)
    * @param isTrain     predicate over `docs` columns selecting the LM
    *                    training slice (the trusted/held-in partition)
    * @param backoffBits integer cost of backing off to the unigram model
    * @param oovExtraBits extra integer cost of an out-of-vocabulary token
    *                    on top of the uniform flog2(T) bound
    * @param minCount    prune LM entries with count &lt; minCount (pruned
    *                    or unseen words score as OOV — standard pruning
    *                    semantics; makes the LM broadcastable at scale)
    * @return (doc_id, is_train: int, n_tokens, bits,
    *         bits_per_kilotoken = bits*1000 div n_tokens) — one row per
    *         document with at least one token, ordered by nothing (order
    *         downstream)
    */
  def perplexityBits(docs: DataFrame, idCol: String, tokensCol: String,
                     isTrain: Column, backoffBits: Int = 3,
                     oovExtraBits: Int = 4, minCount: Long = 1L): DataFrame = {
    val pos = docs
      .select(col(idCol).as("doc_id"), isTrain.as("train"),
        col(tokensCol).as("toks"))
      .select(col("doc_id"), col("train"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "w")))
      // element_at is 1-based; posexplode 0-based: prev of pos p is toks[p]
      .select(col("doc_id"), col("train"), col("pos"), col("w"),
        when(col("pos") > 0, element_at(col("toks"), col("pos"))).as("prev"))

    val train = pos.where(col("train"))
    val tstat = train.agg(count(lit(1)).as("t"))
    val c1 = train.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .where(col("c1") >= minCount)
    val c2 = train.where(col("prev").isNotNull)
      .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minCount)

    val scored = pos
      .join(c1, Seq("w"), "left")
      .join(c1.select(col("w").as("prev"), col("c1").as("c1p")),
        Seq("prev"), "left")
      .join(c2, Seq("prev", "w"), "left")
      .crossJoin(broadcast(tstat))

    val uniBits = flog2(col("t")) - flog2(col("c1"))
    val oovBits = flog2(col("t")) + lit(oovExtraBits)
    val bits = when(col("pos") === 0,
        when(col("c1").isNotNull, uniBits).otherwise(oovBits))
      .otherwise(when(col("c2").isNotNull, flog2(col("c1p")) - flog2(col("c2")))
        .otherwise(lit(backoffBits) +
          when(col("c1").isNotNull, uniBits).otherwise(oovBits)))

    scored
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("train"), 1).otherwise(0)).cast("long").as("is_train"),
        count(lit(1)).as("n_tokens"),
        sum(bits.cast("long")).as("bits"))
      .withColumn("bits_per_kilotoken",
        expr("bits * 1000 div n_tokens"))
  }
}
