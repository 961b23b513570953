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
  * map-side only: one shuffle total for the per-doc sum. Train-once /
  * score-forever splits as [[fit]] + [[scoreBits]]: a persisted [[Model]]
  * scores any number of later batches (the streaming admission gate keeps
  * one resident across micro-batches). Bits per position are
  * ≤ 2*flog2(T) + backoffBits + oovExtraBits (< 150 for any corpus that
  * fits in Long), so the per-doc Long sum cannot overflow.
  */
object NgramLm {

  /** A fitted quantized LM: `t` total training tokens, `c1` (w, c1)
    * unigram counts, `c2` (prev, w, c2) bigram counts — both pruned to
    * `minCount` and PERSISTED (call [[Model.unpersist]] when done; a
    * streaming gate holds one resident across micro-batches). */
  final case class Model(t: Long, c1: DataFrame, c2: DataFrame,
                         backoffBits: Int, oovExtraBits: Int) {
    def unpersist(): Unit = { c1.unpersist(); c2.unpersist() }
  }

  /** floor(log2(x)) for x >= 1, exactly, via the binary string length —
    * the one integer-log formulation Spark and DuckDB evaluate identically. */
  private def flog2(c: Column): Column = NbClassifier.flog2(c)

  /** (doc_id, pos, w, prev) token-position stream for scoring/counting. */
  private def positions(docs: DataFrame, idCol: String, tokensCol: String,
                        extra: Seq[(String, Column)]): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id") +:
      col(tokensCol).as("toks") +: extra.map { case (n, c) => c.as(n) }: _*)
    base
      .select(base.columns.map(col) :+
        posexplode(col("toks")).as(Seq("pos", "w")): _*)
      // element_at is 1-based; posexplode 0-based: prev of pos p is toks[p]
      .select(col("doc_id") +: col("pos") +: col("w") +:
        when(col("pos") > 0, element_at(col("toks"), col("pos"))).as("prev") +:
        extra.map { case (n, _) => col(n) }: _*)
  }

  /** Train the quantized LM on `docs` (idCol, tokensCol). With
    * `persistTables` (the score-many/streaming case) the caller owns the
    * persisted count tables via [[Model.unpersist]]; one-shot callers
    * ([[perplexityBits]]) leave them lazy so no cache outlives the query. */
  def fit(docs: DataFrame, idCol: String, tokensCol: String,
          backoffBits: Int = 3, oovExtraBits: Int = 4,
          minCount: Long = 1L, persistTables: Boolean = true): Model = {
    val train = positions(docs, idCol, tokensCol, Seq.empty)
    val t = train.count()
    def owned(df: DataFrame) = if (persistTables) df.persist() else df
    val c1 = owned(train.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .where(col("c1") >= minCount))
    val c2 = owned(train.where(col("prev").isNotNull)
      .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minCount))
    Model(t, c1, c2, backoffBits, oovExtraBits)
  }

  /** Score `docs` against a fitted model: (doc_id, n_tokens, bits,
    * bits_per_kilotoken), one row per document with at least one token.
    * Extra columns listed in `carry` are grouped through unchanged. */
  def scoreBits(docs: DataFrame, idCol: String, tokensCol: String,
                model: Model, carry: Seq[String] = Seq.empty): DataFrame = {
    val pos = positions(docs, idCol, tokensCol,
      carry.map(c => c -> col(c)))
    val scored = pos
      .join(model.c1, Seq("w"), "left")
      .join(model.c1.select(col("w").as("prev"), col("c1").as("c1p")),
        Seq("prev"), "left")
      .join(model.c2, Seq("prev", "w"), "left")
      .withColumn("t", lit(model.t))

    val uniBits = flog2(col("t")) - flog2(col("c1"))
    val oovBits = flog2(col("t")) + lit(model.oovExtraBits)
    val bits = when(col("pos") === 0,
        when(col("c1").isNotNull, uniBits).otherwise(oovBits))
      .otherwise(when(col("c2").isNotNull, flog2(col("c1p")) - flog2(col("c2")))
        .otherwise(lit(model.backoffBits) +
          when(col("c1").isNotNull, uniBits).otherwise(oovBits)))

    scored
      .groupBy(col("doc_id") +: carry.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"), sum(bits.cast("long")).as("bits"))
      .withColumn("bits_per_kilotoken", expr("bits * 1000 div n_tokens"))
  }

  /** One-shot per-document quantized-perplexity report: trains on the
    * `isTrain` slice of `docs`, scores ALL of `docs`.
    *
    * @param isTrain     predicate over `docs` columns selecting the LM
    *                    training slice (the trusted/held-in partition)
    * @param minCount    prune LM entries with count &lt; minCount (pruned
    *                    or unseen words score as OOV — standard pruning
    *                    semantics; makes the LM broadcastable at scale)
    * @return (doc_id, is_train: long 0/1, n_tokens, bits,
    *         bits_per_kilotoken = bits*1000 div n_tokens)
    */
  def perplexityBits(docs: DataFrame, idCol: String, tokensCol: String,
                     isTrain: Column, backoffBits: Int = 3,
                     oovExtraBits: Int = 4, minCount: Long = 1L): DataFrame = {
    val model = fit(docs.where(isTrain), idCol, tokensCol,
      backoffBits, oovExtraBits, minCount, persistTables = false)
    val withFlag = docs.withColumn("__is_train",
      when(isTrain, 1L).otherwise(0L))
    scoreBits(withFlag, idCol, tokensCol, model, carry = Seq("__is_train"))
      .withColumnRenamed("__is_train", "is_train")
      .select("doc_id", "is_train", "n_tokens", "bits", "bits_per_kilotoken")
  }
}
