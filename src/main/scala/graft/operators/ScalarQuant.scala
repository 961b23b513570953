package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantized (SQ8) ANN — the third compression point on the
  * accuracy/size curve alongside exact search (E1), coarse IVF (E2/E6)
  * and product quantization (E8): each dimension is affinely mapped to
  * an 8-bit code (faiss `ScalarQuantizer` QT_8bit style), shrinking a
  * float32 corpus 4x while keeping per-dimension resolution. Symmetric
  * distance over codes is a SUM of squared INTEGER differences — exact,
  * associative, engine-reproducible, which is why this variant (rather
  * than float reconstruction) carries the oracle gate: the quantization
  * boundary arithmetic `floor(((x - mn) * 255) / range)` is fixed-shape
  * IEEE double math both engines evaluate identically (min/max training
  * stats involve no accumulation, casts float->double are exact).
  *
  * Plan shape (the 100 TB story): training is one posexplode+groupBy to
  * per-dimension min/max — DIM rows to the driver, corpus-size-
  * independent. Encoding is a SHUFFLE-FREE projection under literal
  * min/range arrays (whole-stage codegen, no UDF); at scale the codes
  * ARE the persisted index, 4x smaller than the vectors. Search
  * broadcasts the (contractually small) quantized query set against the
  * coded corpus — one streaming pass, integer ALU per pair — and ranks
  * with the usual bounded top-k.
  */
object ScalarQuant {

  /** Per-dimension affine quantization grid (mins + ranges, dim order). */
  final case class Model(mins: Array[Double], ranges: Array[Double])

  /** Train per-dimension min/max over the index set: one explode +
    * map-side-combined groupBy, `dim` rows collected. */
  def fit(index: DataFrame, embCol: String = "embedding"): Model = {
    val stats = index
      .select(posexplode(col(embCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Double]("mn"),
        r.getAs[Double]("mx")))
      .sortBy(_._1)
    Model(stats.map(_._2), stats.map { case (_, mn, mx) => mx - mn })
  }

  /** 8-bit codes under the model grid: `clamp(floor(((x - mn) * 255) /
    * range), 0, 255)`; a degenerate dimension (range 0) codes to 0.
    * Out-of-grid query values clamp to the edge codes — the standard SQ
    * behavior for queries beyond the training envelope. Shuffle-free. */
  def codesColumn(emb: Column, model: Model): Column = {
    val mins = array(model.mins.map(lit): _*)
    val rngs = array(model.ranges.map(lit): _*)
    transform(emb, (x, i) => {
      val mn = element_at(mins, i + 1)
      val rng = element_at(rngs, i + 1)
      when(rng === 0.0, 0L).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor(((x.cast("double") - mn) * lit(255.0)) / rng))))
    })
  }

  /** Symmetric SQ top-k: quantize both sides, score every (query, index)
    * pair by the integer squared code distance, keep the k nearest
    * (dist ASC, neighbor_id ASC). Queries broadcast by contract; the
    * candidate set per query is by design the WHOLE coded corpus (this
    * is the compressed brute-force tier), so ranking goes through the
    * salted [[BoundedRank]] — never a one-partition-per-query sort. */
  def topK(index: DataFrame, queries: DataFrame, k: Int,
           model: Model): DataFrame = {
    val coded = index.select(col("vec_id").as("neighbor_id"),
      codesColumn(col("embedding"), model).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      codesColumn(col("embedding"), model).as("q_codes"))
    val scored = coded
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions.codeSqDist(
          col("q_codes"), col("codes")).as("dist"))
    BoundedRank.topKPerKey(scored, Seq("query_id"),
        Seq(col("dist"), col("neighbor_id")), k, rankCol = "rank")
      .select("query_id", "rank", "neighbor_id", "dist")
  }

  /** Two-stage retrieval (the faiss `IndexRefineFlat` pattern every
    * production vector store runs): the SQ8 code scan keeps a candidate
    * POOL of `cand` per query on the 4x-compressed codes, then ONLY those
    * candidates re-rank by exact squared L2 against the raw vectors —
    * full-precision cost collapses from |corpus| per query to `cand` per
    * query, and the final order is exact over the pool. The re-rank joins
    * the (|queries| x cand)-row pool back to the corpus on the vector id
    * (an equi-join Spark can broadcast — the pool is query-sized, never
    * corpus-sized); distances are the codegen sqdist kernel rounded to
    * 6dp for cross-engine rank stability, ranked by the salted bounded
    * top-k. */
  def topKRefined(index: DataFrame, queries: DataFrame, k: Int, cand: Int,
                  model: Model): DataFrame = {
    require(cand >= k, s"candidate pool must cover k (cand=$cand, k=$k)")
    val pool = topK(index, queries, cand, model)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val rescored = pool
      .join(index.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb")), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.VectorFunctions.sqDist(
          col("q_emb"), col("c_emb")), 6).as("dist"))
    BoundedRank.topKPerKey(rescored, Seq("query_id"),
        Seq(col("dist"), col("neighbor_id")), k, rankCol = "rank")
      .select("query_id", "rank", "neighbor_id", "dist")
  }

  /** Recall@k of the SQ8 search against exact squared-L2 truth — E11's
    * measurement applied to this compression tier: per query,
    * |SQ top-k ∩ exact top-k| / k, the number a recipe consults before
    * trusting the 4x-compressed index. The truth ranking and hit counting
    * are [[Similarity.recallAtKExactL2]] (shared with e16); the SQ side
    * is [[topK]]. */
  def recallAtK(index: DataFrame, queries: DataFrame, k: Int,
                model: Model): DataFrame =
    Similarity.recallAtKExactL2(index, queries, topK(index, queries, k, model), k)

  /** IVF-SQ8 (faiss `IndexIVFScalarQuantizer`): coarse cells bound the
    * candidate space BEFORE the code scan — the corpus meets the queries
    * through a cell equi-join (shuffle on the cell id, never a per-query
    * full scan), and within a probed cell distances run on the 8-bit
    * codes. The two compression axes compose: IVF cuts candidates,
    * SQ cuts bytes per candidate. */
  def topKIvf(index: DataFrame, queries: DataFrame, cellCol: String,
              k: Int, model: Model): DataFrame = {
    val coded = index.select(col("vec_id").as("neighbor_id"),
      col(cellCol).as("c_cell"),
      codesColumn(col("embedding"), model).as("codes"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col(cellCol).as("q_cell"),
      codesColumn(col("embedding"), model).as("q_codes")))
    val scored = coded
      .join(q, col("q_cell") === col("c_cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions.codeSqDist(
          col("q_codes"), col("codes")).as("dist"))
    BoundedRank.topKPerKey(scored, Seq("query_id"),
        Seq(col("dist"), col("neighbor_id")), k, rankCol = "rank")
      .select("query_id", "rank", "neighbor_id", "dist")
  }
}
