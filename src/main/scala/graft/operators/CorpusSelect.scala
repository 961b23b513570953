package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "take the best documents until the
  * token budget is spent", the final assembly step of a pretraining data
  * mix (every published recipe ends with one: rank by a quality signal,
  * cut at N tokens). Selection order is (score DESC, doc_id ASC); a
  * document is selected iff the running token total through it stays
  * within the budget.
  *
  * The naive plan is a GLOBAL window cumsum over (score DESC, doc_id) —
  * a single-partition sort that dies at 100 TB. This implementation never
  * builds a global order:
  *
  *  1. one groupBy(score) aggregates per-bucket token totals — map-side
  *     partial agg, result bounded by SCORE CARDINALITY, not corpus size
  *     (the contract: `score` is a bucketed integer signal — a quality
  *     heuristic, perplexity bucket, or classifier-bit score of bounded
  *     range; this is what selection recipes threshold on in practice);
  *  2. the driver folds the (tiny) descending histogram into a cutoff
  *     score s* and the residual budget r inside the boundary bucket;
  *  3. selection is then a map-side comparison for every bucket except
  *     the boundary one, which needs a cumsum WITHIN that single bucket —
  *     and the PLAN for that cumsum is chosen ADAPTIVELY from the exact
  *     histogram the driver already holds: when every bucket is small
  *     (row counts are in the histogram), a window partitioned by score
  *     does bounded per-bucket work in one exchange; when any bucket is
  *     large (the degenerate: a constant-score corpus collapses the
  *     boundary bucket to the WHOLE corpus), a TWO-LEVEL cumsum bounds
  *     every window partition regardless of skew.
  *
  * The two-level cumsum is the shared [[PrefixSum.twoLevel]] machinery
  * (keyed by score, inclusive frame): no window partition ever exceeds
  * max(#leaves, leaf width) rows regardless of score skew — the x07
  * adversarial gate holds by construction, not by data luck. The
  * adaptive switch trades the two extra exchanges for skew immunity
  * exactly when the stats say the immunity is needed.
  *
  * Equivalence to the naive rule is exact: docs above the boundary bucket
  * have running totals <= the full-prefix total <= budget; docs inside it
  * pass iff their within-bucket cumsum <= r; docs below never fit.
  * Integer-exact throughout (counts and integer scores only), so the
  * oracle can state the naive global-window rule and must hash-match.
  */
object CorpusSelect {

  /** Default leaf width (log2) of the two-level cumsum: level-2 windows
    * hold at most 2^12 = 4096 rows; level-1 windows hold corpus/4096
    * rows per score bucket. */
  val DefaultGroupShift: Int = 12

  /** Largest per-score bucket (rows) the single-window plan may sort in
    * one partition before the adaptive switch picks the two-level cumsum.
    * 4M rows of (long, long, long) is tens of MB per task — comfortably
    * in-memory on any executor profile. */
  val DefaultMaxBucketRows: Long = 1L << 22

  /** Flag every doc with whether it makes the cut: input (idCol, scoreCol,
    * tokensCol) -> output (doc_id, score, n_tokens, selected 0/1).
    * Null-score rows are ABSENT from the output (not emitted with
    * selected=0): a null has no place in the best-first order, and
    * dropping them up front is the only row set both plan paths below
    * produce identically. `budget` is the inclusive running-token
    * ceiling. `maxBucketRows` tunes the adaptive plan switch (0 forces
    * the two-level cumsum — what the x07 gate pins). */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, budget: Long,
                        groupShift: Int = DefaultGroupShift,
                        maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    // Null scores are excluded BY CONTRACT (a null has no place in the
    // best-first order) — and explicitly here, so both plan paths agree:
    // the two-level path's equi-join would drop them silently while the
    // window path would keep them, making the row set plan-dependent.
    val d = docs.select(col(idCol).as("doc_id"),
      col(scoreCol).cast("long").as("score"),
      col(tokensCol).cast("long").as("n_tokens"))
      .where(col("score").isNotNull)
    // 1. score histogram (bounded by score cardinality), with row counts
    //    so the plan switch below decides from exact stats.
    val hist = d.groupBy("score")
      .agg(sum("n_tokens").as("bt"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (s, _, _) => -s }
    // 2. fold to (cutoff, residual-in-cutoff-bucket). No boundary bucket
    //    (everything fits) -> cutoff below every score, select all.
    var cum = 0L
    var cutoff = Long.MinValue
    var residual = 0L
    var exhausted = false
    hist.foreach { case (s, bt, _) =>
      if (!exhausted) {
        if (cum + bt <= budget) cum += bt
        else { cutoff = s; residual = budget - cum; exhausted = true }
      }
    }
    // 3. boundary bucket resolves by a within-bucket cumsum; every other
    //    bucket is a constant comparison.
    val biggest = if (hist.isEmpty) 0L else hist.map(_._3).max
    val inBucketCum =
      if (biggest <= maxBucketRows) {
        // Every bucket is small: one exchange on score, bounded
        // per-bucket ordered work.
        val w = Window.partitionBy("score").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sum("n_tokens").over(w)
      } else null // marker: take the two-level path below
    val flag = (cumCol: Column) =>
      when(col("score") > cutoff, 1L)
        .when(col("score") === cutoff,
          when(cumCol <= residual, 1L).otherwise(0L))
        .otherwise(0L)
    if (inBucketCum != null) d.withColumn("selected", flag(inBucketCum))
    else PrefixSum.twoLevel(d, Seq("score"), "doc_id", "n_tokens",
        "__cum", inclusive = true, groupShift)
      .withColumn("selected", flag(col("__cum")))
      .select("doc_id", "score", "n_tokens", "selected")
  }

  /** Budget as a fraction `num/den` of the corpus's own total tokens —
    * the scale-free form a recipe config states ("keep the top 30%"). */
  def tokenBudgetSelectFraction(docs: DataFrame, idCol: String,
                                scoreCol: String, tokensCol: String,
                                num: Long, den: Long,
                                groupShift: Int = DefaultGroupShift,
                                maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    val total = docs.agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    tokenBudgetSelect(docs, idCol, scoreCol, tokensCol, total * num / den,
      groupShift, maxBucketRows)
  }

  /** PER-KEY token-budget selection — "no host contributes more than B
    * tokens", the per-domain contribution cap every web-corpus recipe
    * applies (C4/RefinedWeb-style host budgeting) with the same best-first
    * order within each key: (score DESC, doc_id ASC), keep while the
    * key's running token total stays within `budget`.
    *
    * The naive plan windows over (key) — one partition per host, and a
    * hot host (10% of a crawl) becomes one task sorting 10% of the
    * corpus. Here NOTHING ever holds a whole key in one task; there is
    * no driver-side cutoff either (keys are unbounded — millions of
    * hosts), unlike [[tokenBudgetSelect]]'s corpus-global histogram:
    *
    *  1. groupBy(key, score) token sums — the per-key histogram, at most
    *     |score range| rows per key (the bucketed-score contract);
    *  2. a window over those HISTOGRAM rows (partition = key, rows per
    *     partition bounded by score cardinality, not key size) finds each
    *     key's boundary score + residual budget;
    *  3. the boundary table joins back on key (shuffle join, no
    *     broadcast needed) and docs resolve map-side — except inside the
    *     one boundary (key, score) bucket, whose within-bucket cumsum
    *     windows over (key, score): bounded by bucket size.
    *
    * Output: (doc_id, key, score, n_tokens, selected 0/1), exactly equal
    * to the naive per-key global-window rule (the oracle states it). */
  def perKeyTokenBudgetSelect(docs: DataFrame, idCol: String, keyCol: String,
                              scoreCol: String, tokensCol: String,
                              budget: Long): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(keyCol).as("key"),
      col(scoreCol).cast("long").as("score"),
      col(tokensCol).cast("long").as("n_tokens"))
    // 1. per-(key, score) histogram
    val levels = d.groupBy("key", "score").agg(sum("n_tokens").as("bt"))
    // 2. boundary per key: first level (best-first) whose inclusive cum
    //    exceeds the budget; cumBefore = exclusive running sum
    val wl = Window.partitionBy("key").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = levels
      .withColumn("cumBefore", coalesce(sum("bt").over(wl), lit(0L)))
      .where(col("cumBefore") <= budget && col("cumBefore") + col("bt") > budget)
      .select(col("key"), col("score").as("cutoff"),
        (lit(budget) - col("cumBefore")).as("residual"))
    // 3. resolve: above the cutoff -> in; at the cutoff -> within-bucket
    //    cumsum against the residual; below (or beyond an exhausted
    //    budget) -> out. A key with no boundary row fits entirely.
    val wb = Window.partitionBy("key", "score").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(bounds, Seq("key"), "left")
      .withColumn("selected",
        when(col("cutoff").isNull, 1L)
          .when(col("score") > col("cutoff"), 1L)
          .when(col("score") === col("cutoff"),
            when(sum("n_tokens").over(wb) <= col("residual"), 1L).otherwise(0L))
          .otherwise(0L))
      .select("doc_id", "key", "score", "n_tokens", "selected")
  }

  /** [[perKeyTokenBudgetSelect]] with a PER-KEY budget table instead of a
    * constant — the stratified-mixture form: "this language gets 1.2B
    * tokens, that one 0.4B". Same three-step shape (per-(key, score)
    * histogram → boundary window over HISTOGRAM rows → map-side resolve
    * with a within-boundary-bucket cumsum); the only addition is the
    * equi-join of the histogram with `alloc` (key, budget) — one row per
    * key, i.e. dimension-sized, so the join is broadcast-able whenever
    * the key cardinality is (Spark decides from stats). A key absent from
    * `alloc` is a ZERO allocation (left join + coalesce — it selects
    * nothing sized, same as an explicit 0), never a silent select-all; a
    * budget >= the key's total selects everything. */
  def perKeyTokenBudgetSelectAllocated(docs: DataFrame, idCol: String,
                                       keyCol: String, scoreCol: String,
                                       tokensCol: String,
                                       alloc: DataFrame): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(keyCol).as("key"),
      col(scoreCol).cast("long").as("score"),
      col(tokensCol).cast("long").as("n_tokens"))
    val a = alloc.select(col("key"), col("budget").cast("long").as("__budget"))
    val levels = d.groupBy("key", "score").agg(sum("n_tokens").as("bt"))
      .join(a, Seq("key"), "left")
      .withColumn("__budget", coalesce(col("__budget"), lit(0L)))
    val wl = Window.partitionBy("key").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = levels
      .withColumn("cumBefore", coalesce(sum("bt").over(wl), lit(0L)))
      .where(col("cumBefore") <= col("__budget") &&
        col("cumBefore") + col("bt") > col("__budget"))
      .select(col("key"), col("score").as("cutoff"),
        (col("__budget") - col("cumBefore")).as("residual"))
    val wb = Window.partitionBy("key", "score").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(bounds, Seq("key"), "left")
      .withColumn("selected",
        when(col("cutoff").isNull, 1L)
          .when(col("score") > col("cutoff"), 1L)
          .when(col("score") === col("cutoff"),
            when(sum("n_tokens").over(wb) <= col("residual"), 1L).otherwise(0L))
          .otherwise(0L))
      .select("doc_id", "key", "score", "n_tokens", "selected")
  }

  /** Largest-remainder (Hamilton) apportionment of a global token budget
    * across keys, proportional to each key's token mass — the EXACT
    * integer allocation a mixture recipe wants (floors + one extra token
    * to the largest remainders, ties by key; sums to the budget by
    * construction, no floating point anywhere). Input: per-key totals
    * (key, tok); output (key, budget). The window runs over ONE ROW PER
    * KEY — dimension-sized by contract (languages, sources), never the
    * corpus. */
  def largestRemainderAlloc(totals: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative (got $budget)")
    val g = totals.select(col("key"), col("tok").cast("long").as("tok"))
      .withColumn("__tot", sum("tok").over(
        Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // budget * tok overflows Long at real corpus scale (1e13 tokens each
    // side -> 1e26); decimal(38,0) holds the product exactly, and the
    // integral divide / modulo stay exact integers.
    val q = g.withColumn("__num",
        lit(budget).cast("decimal(38,0)") * col("tok").cast("decimal(19,0)"))
      .withColumn("__fl", expr("__num div __tot"))
      .withColumn("__rem", col("__num") % col("__tot"))
    val withLeft = q.withColumn("__sfl", sum("__fl").over(
        Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy().orderBy(col("__rem").desc, col("key").asc)))
    withLeft.select(col("key"),
      (col("__fl") + when(col("__rk") <= lit(budget) - col("__sfl"), 1L)
        .otherwise(0L)).as("budget"))
  }

  /** EXACT per-key quantiles of an integer-valued column (K13 — the
    * length-percentile report every corpus card publishes: p50/p90/p99
    * token counts per language, padding-budget boundaries, chunk-size
    * calibration). Type-1 (lower) quantile: the smallest value v whose
    * cumulative count reaches ceil(p/100 * n) — stated as the pure
    * integer test `100 * cum >= p * n`, so the boundary is bit-identical
    * cross-engine (no float percent math anywhere).
    *
    * Scale shape (the D41/D48 histogram discipline): ONE groupBy(key,
    * value) histogram with map-side partial counts, then the cumulative
    * window runs over HISTOGRAM rows — per-key ordered work bounded by
    * the key's DISTINCT VALUE cardinality, never its row count; a key
    * with a billion docs but 10k distinct lengths windows over 10k rows.
    * Exact, unlike percentile_approx — and at 100 TB the histogram is
    * the same cost an approx sketch pays in its update pass. */
  def groupedExactQuantiles(df: DataFrame, keyCol: String, valCol: String,
                            percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    val hist = df.groupBy(col(keyCol), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keyCol).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(Window.partitionBy(keyCol)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_rows"),
        percentiles.map(p =>
          min(when(col("__cum") * 100 >= col("__n") * p, col("__v")))
            .as(s"p$p")): _*)
  }
}
