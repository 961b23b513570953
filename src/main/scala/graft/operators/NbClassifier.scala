package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the "train a classifier on a
  * trusted corpus, score the crawl" stage every large pretraining pipeline
  * runs (GPT-3's WebText-vs-CommonCrawl logistic filter, CCNet's fastText
  * gate, FineWeb's edu classifier). The reference pipeline has no model
  * stage; a 100 TB training-data pipeline does, so this sits alongside the
  * heuristic quality rules (D9), the LM perplexity filter (D37) and the
  * DSIR importance weights (D32) as a first-class §2.11 operator.
  *
  * The model is multinomial Naive Bayes over tokens in a QUANTIZED integer
  * form — the same exactness stance as [[NgramLm]] and [[Bm25]]: every
  * count enters through its integer bit-length `flog2(c) = floor(log2(c))
  * = length(bin(c)) - 1`, which Spark and the SQL oracle both evaluate
  * exactly on integers (no libm, no rounding modes). A token occurrence
  * `w` contributes whole-bit log-odds
  *
  *   b(w) = [flog2(cPos(w)+1) - flog2(cNeg(w)+1)]
  *        + [flog2(tNeg) - flog2(tPos)]
  *
  * (+1 Laplace smoothing; the total-count term normalizes class sizes; a
  * token unseen in training contributes only the normalizer, the smoothed
  * neutral prior). The document score is the class-prior bits
  * `flog2(nPos) - flog2(nNeg)` plus the sum over token OCCURRENCES —
  * exactly floor-log2 multinomial NB, quantized to whole bits: rankings
  * match float NB except inside one bit, where float splits become
  * preserved ties (a documented variant, not an approximation error).
  *
  * Overflow headroom: |b(w)| <= flog2(max(tPos,tNeg)) + 1 < 64 bits of
  * magnitude per occurrence, so a per-doc Long sum is safe for any
  * document under ~1e17 tokens — no practical bound.
  *
  * Plan shape (the 100 TB story): one explode+groupBy over the TRAINING
  * slice builds the vocabulary-bounded count table (map-side partial
  * aggregation); totals are a single-row agg carried by a broadcast cross
  * join. Scoring joins token positions against the count table — pruned
  * to `minCount` the table broadcasts and scoring is map-side — then one
  * groupBy(doc) sum. Train-once / score-forever splits as [[fit]] +
  * [[score]]: a persisted [[Model]] scores any number of later batches
  * (micro-batch admission gates keep one resident).
  */
object NbClassifier {

  /** A fitted quantized NB model: `counts` (w, cPos, cNeg) pruned to
    * `minCount` total occurrences, plus the four scalars the score needs.
    * `raw` is the UNPRUNED count table `counts` filters — the DataFrame
    * that actually carries the persist when the caller asked for an owned
    * model (so the totals collect during [[fit]] and every later score
    * share ONE explode+groupBy over the training occurrences) — call
    * [[Model.unpersist]] when done. */
  final case class Model(counts: DataFrame, tPos: Long, tNeg: Long,
                         nPos: Long, nNeg: Long,
                         private val raw: DataFrame) {
    def priorBits: Long = flog2Long(nPos) - flog2Long(nNeg)
    def unpersist(): Unit = raw.unpersist()
  }

  /** floor(log2(x)) for x >= 1, exactly, via the binary string length —
    * the one integer-log formulation Spark and DuckDB evaluate
    * identically. Package-visible: the d37/d40/d49 exactness contract
    * depends on every quantized operator using THIS formulation. */
  private[operators] def flog2(c: Column): Column = length(bin(c)) - 1

  private def flog2Long(x: Long): Long =
    63 - java.lang.Long.numberOfLeadingZeros(x)

  /** (doc_id, w) one row per token occurrence. */
  private def occurrences(docs: DataFrame, idCol: String,
                          tokensCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(col(tokensCol)).as("w"))

  /** Train on `docs` (idCol, tokensCol, boolean labelCol). Both classes
    * must be non-empty in tokens and docs — a one-class "corpus" has no
    * odds to learn. `minCount` prunes the vocabulary (the standard
    * tail-trim that lets the count table broadcast); pruned tokens score
    * as unseen. `cacheHook` owns the UNPRUNED count table's persist (the
    * totals collect materializes it, so training is ONE aggregation over
    * the occurrences no matter how many batches later score): the default
    * plain-persists it and the caller releases via [[Model.unpersist]];
    * a harness passes its cache registry; `identity` opts out of caching
    * entirely (the totals pass then runs the aggregation once more when
    * scoring first materializes — the no-resident-cache tradeoff). */
  def fit(docs: DataFrame, idCol: String, tokensCol: String,
          labelCol: String, minCount: Long = 1L,
          cacheHook: DataFrame => DataFrame = _.persist()): Model = {
    val occ = occurrences(docs, idCol, tokensCol)
      .join(docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("boolean").as("y")), Seq("doc_id"))
    // One pass: per-token pos/neg occurrence counts; totals + pruning both
    // read the (hook-owned) result of this single aggregation.
    val counts0 = cacheHook(occ.groupBy(col("w")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("cPos"),
      sum(when(col("y"), 0L).otherwise(1L)).as("cNeg")))
    val counts = counts0.where(col("cPos") + col("cNeg") >= minCount)
    val Array(tPos, tNeg) = counts0
      .agg(coalesce(sum("cPos"), lit(0L)), coalesce(sum("cNeg"), lit(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val Array(nPos, nNeg) = docs
      .agg(sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)),
        sum(when(col(labelCol).cast("boolean"), 0L).otherwise(1L)))
      .collect()(0).toSeq.map(x => Option(x).fold(0L)(_.asInstanceOf[Long]))
      .toArray
    require(tPos > 0 && tNeg > 0 && nPos > 0 && nNeg > 0,
      s"both classes need training mass: tPos=$tPos tNeg=$tNeg nPos=$nPos nNeg=$nNeg")
    Model(counts, tPos, tNeg, nPos, nNeg, raw = counts0)
  }

  /** Score every doc: (doc_id, n_tokens, score_bits, predicted) — one row
    * per input doc (zero-token docs score the prior alone). `predicted` is
    * 1 when the quantized log-odds favor the positive class. Extra columns
    * listed in `carry` pass through unchanged. */
  def score(docs: DataFrame, idCol: String, tokensCol: String,
            model: Model, carry: Seq[String] = Seq.empty): DataFrame = {
    val normBits = flog2Long(model.tNeg) - flog2Long(model.tPos)
    val perToken = occurrences(docs, idCol, tokensCol)
      .join(model.counts, Seq("w"), "left")
      .select(col("doc_id"),
        (flog2(coalesce(col("cPos"), lit(0L)) + 1L)
          - flog2(coalesce(col("cNeg"), lit(0L)) + 1L)
          + lit(normBits)).cast("long").as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("b").as("tb"))
    docs.select(col(idCol).as("doc_id") +: carry.map(col): _*)
      .join(perToken, Seq("doc_id"), "left")
      .select(col("doc_id") +: carry.map(col) :+
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens") :+
        (coalesce(col("tb"), lit(0L)) + model.priorBits).as("score_bits") :+
        (coalesce(col("tb"), lit(0L)) + model.priorBits > 0)
          .cast("long").as("predicted"): _*)
  }

  /** One-shot convenience: fit on the `isTrain` slice, score EVERY doc.
    * `cacheHook` receives the count table's persist (pass the harness
    * cache registry so the resident model is released after the query is
    * consumed; the `identity` default keeps the old lazy no-cache
    * behavior). Output carries is_train for downstream splits. */
  def classify(docs: DataFrame, idCol: String, tokensCol: String,
               labelCol: String, isTrain: Column,
               minCount: Long = 1L,
               cacheHook: DataFrame => DataFrame = identity): DataFrame = {
    val model = fit(docs.where(isTrain), idCol, tokensCol, labelCol,
      minCount, cacheHook)
    score(docs.withColumn("is_train", isTrain.cast("long")),
      idCol, tokensCol, model, carry = Seq("is_train"))
  }
}
