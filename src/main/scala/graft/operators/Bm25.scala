package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a tokenized corpus — the lexical top-k
  * behind retrieval-based curation (nearest-neighbor decontamination by
  * surface overlap, dedup candidate generation, eval-set leakage hunts)
  * when embeddings are unavailable or too expensive at corpus scale.
  *
  * Scoring is the Robertson/Sparck-Jones BM25 shape (k1 = 1.2, b = 0.75)
  * re-expressed in EXACT 64-bit integer arithmetic so that ranking is
  * reproducible bit-for-bit on any engine and any partitioning — float
  * BM25 sums per (query, doc) in shuffle order, which is not
  * deterministic, and `ln` is not correctly-rounded across libm
  * implementations. Two substitutions make it integral:
  *
  *  - idf: the log is dropped in favor of the scaled odds ratio it
  *    monotonically wraps: `idf_s = S_IDF * (2N - 2df + 1) div (2df + 1)`
  *    (the classic RSJ odds with +0.5 smoothing, doubled through). Log is
  *    a monotone transform OF THE PER-TERM WEIGHT only, so rankings can
  *    differ from log-BM25 on multi-term queries (rare-term matches weigh
  *    relatively heavier here); it is a documented variant, not a bug.
  *  - tf normalization: `tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))` with
  *    k1 = 6/5, b = 3/4 multiplied through by `20 * T` (T = total corpus
  *    tokens, N = corpus docs, so avgdl = T/N exactly):
  *    `tfn_s = S_TF * 44*tf*T div (20*tf*T + 6*T + 18*dl*N)`.
  *
  * Per-term contributions `idf_s * tfn_s` are BIGINT products summed with
  * an integer groupBy — associative, commutative, order-free. Headroom
  * (exact, not hand-waved): a rare term (df=1) has
  * `idf_s = S_IDF*(2N-1)/3` and `tfn_s ≤ S_TF*44/20 = 2.2*S_TF`, so the
  * per-term product is ≤ ~1.47e9 * N at the default S_IDF=1e6/S_TF=1e3.
  * A single product overflows Long at N ≈ 6e9 docs, and a multi-term
  * query's SUM(ts) wraps earlier — with ~64 rare query terms, around
  * N ≈ 1e8; treat N ≈ 5e8 as the hard ceiling for multi-term queries at
  * the default scales. Past that, drop S_IDF to 1e3 (costs idf
  * quantization below df ≈ N/1000 — irrelevant for stop-word-capped
  * queries) or move the final sum to double (ranking-only use). The
  * `44*tf*T*S_TF` intermediate independently caps T ≲ 2e11 tokens.
  *
  * Plan shape (the 100 TB story): one explode+groupBy builds per-doc term
  * frequencies with dl carried in the grouping key (no doc-side rejoin);
  * the query term set broadcasts into that layout, so matching costs no
  * extra shuffle; df is counted AFTER the semi-join — only query terms
  * ever aggregate, never the full vocabulary — and broadcasts back; the
  * per-(query, doc) sum is the second and last full shuffle; top-k uses
  * the salted [[BoundedRank]] so a stop-wordy query never sorts its
  * posting list in one task. `maxDf` drops query terms whose document
  * frequency exceeds the cap (stop-word guard) BEFORE the score join —
  * the df-cap groupBy+filter pattern, never a window.
  */
object Bm25 {

  private val S_IDF = 1000000L
  private val S_TF = 1000L

  /** Top-`k` BM25 matches per query.
    *
    * @param docs    (doc_id: long, tokens: array&lt;string&gt;)
    * @param queries (query_id: long, term: string) — distinct pairs, small
    *                enough to broadcast (query terms, not the corpus)
    * @param k       matches to keep per query
    * @param maxDf   drop query terms matching more than this many docs
    * @return (query_id, doc_id, score, rk) — `score` the integer-scaled
    *         BM25, `rk` 1..k by (score desc, doc_id asc); a query's own
    *         source doc is NOT excluded (filter query_id != doc_id
    *         upstream of ranking if self-matches are unwanted)
    */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
           maxDf: Long = Long.MaxValue): DataFrame = {
    val toks = docs.select(col("doc_id"), size(col("tokens")).cast("long").as("dl"),
      explode(col("tokens")).as("term"))
    // dl is functionally dependent on doc_id: folding it into the grouping
    // key costs nothing and saves the doc-length rejoin later
    val tf = toks.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    // n never touches the tokens column (the count scan prunes it away),
    // and t = sum of term frequencies — the same total token count as
    // sum(size(tokens)) but computed over tf, whose exchange the score
    // join already pays for. The old one-pass form tokenized the whole
    // corpus a SECOND time just to size it.
    val stats = docs.agg(count(lit(1)).cast("long").as("n"))
      .crossJoin(tf.agg(coalesce(sum(col("tf")), lit(0L)).as("t")))

    // df from tf semi-joined to the DISTINCT query-term set: tf is one row
    // per (doc, term), so a plain count is the document frequency, and only
    // query terms ever aggregate — the full-vocabulary df pass never
    // happens. (Counting over `matches` instead would multiply each doc by
    // the number of queries sharing the term.)
    val qTerms = queries.select("term").distinct()
    val df = tf.join(broadcast(qTerms), "term")
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)

    val matches = tf.join(broadcast(queries), "term")

    val scored = matches
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("ts",
        expr(s"(($S_IDF * (2*n - 2*df + 1)) div (2*df + 1)) * " +
          s"(($S_TF * 44 * tf * t) div (20*tf*t + 6*t + 18*dl*n))"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("ts")).as("score"))

    BoundedRank.topKPerKey(scored, Seq("query_id"),
        Seq(negate(col("score")), col("doc_id")), k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rk"))
  }
}
