package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph PageRank — the web-corpus curation signal (Common Crawl
  * publishes host/domain ranks exactly this way; crawl-selection recipes
  * weight or threshold hosts by centrality before document filters run).
  * The reference pipeline has no graph stage; a 100 TB web-corpus
  * pipeline ranks its link graph, so this joins the §2.11 roster beside
  * the connected-components pair ([[Dedup.duplicateClusters]] /
  * duplicateClustersStar).
  *
  * QUANTIZED integer form (the [[NgramLm]]/[[Bm25]] exactness stance):
  * ranks are integers at a fixed `scale`, damping 0.85 enters as the
  * rational 17/20, and every division is integer floor division —
  *
  *   r_0(v)  = scale
  *   r_t(v)  = (3*scale + 17 * SUM over in-edges u->v of
  *              (r_{t-1}(u) div outdeg(u))) div 20
  *
  * so both engines compute bit-identical trajectories (no float dot
  * products, no convergence epsilon). Quantization error is < 1 rank unit
  * per division — pick `scale` for the precision you need. Sinks keep
  * their share of teleport mass but re-emit nothing (the undistributed
  * dangling-mass variant; total mass decays toward teleport equilibrium —
  * a documented choice, rankings are unaffected for the usual "top hosts"
  * consumption).
  *
  * Plan shape (the 100 TB story): outdegrees and the node set are one
  * groupBy each over the edge list; every iteration is ONE join of the
  * rank table against the (degree-annotated, persisted) edge list plus
  * ONE groupBy(dst) partial-agg sum — the textbook distributed PageRank
  * step, shuffling rank rows (node cardinality), never the corpus.
  * Rounds own their lineage via [[Dedup.checkpointOwned]] (each round is
  * an eager localCheckpoint, so lineage never deepens). Because the
  * output is the full trajectory, every round's checkpoint backs the
  * returned frame and stays live until the caller drops the result —
  * bounded at `iters` x |nodes| rank rows, the deliberate cost of an
  * auditable trajectory (a fixpoint-only variant would free round i at
  * round i+1 exactly as the CC loops do).
  */
object PageRank {

  /** Run `iters` rounds over `edges` (srcCol, dstCol; parallel edges and
    * self-loops are dropped — host graphs are simple graphs). Returns one
    * row per node: (node, out_deg, rank_1, ..., rank_<iters>) — the full
    * trajectory, so convergence is observable in the output (and every
    * intermediate round sits under the correctness gate, not just the
    * fixpoint). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "need at least one round")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    // Degree-annotated edges are the loop-invariant side of every join.
    val ed = e.join(deg, "src")
      .select(col("src"), col("dst"), col("od"))
      .repartition(col("src"))
      .persist()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node")))
      .distinct()
      .persist()

    // The loop state is ONE frame carrying the whole trajectory so far —
    // (node, out_deg, rank_1..rank_t) — so the output needs no final
    // join chain over per-round history frames (each of which cost a
    // join + broadcast at every scale), and round t-1's checkpoint frees
    // as soon as round t materializes (the CC-loop lineage discipline;
    // the old per-round history had to keep every round's checkpoint
    // live). The trajectory column rides the checkpoint at 8 bytes per
    // round per node — noise against the per-round rank shuffle.
    var (state, stateRdd) = Dedup.checkpointOwned(
      nodes.join(deg.select(col("src").as("node"), col("od")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("od"), lit(0L)).as("out_deg")))
    for (t <- 1 to iters) {
      // Round 1 reads the constant r_0 = scale straight off the edge
      // list (every src is a node and all ranks are `scale` — joining
      // the state adds nothing); later rounds join the previous rank in.
      val contrib =
        if (t == 1)
          ed.select(col("dst").as("node"), expr(s"${scale}L div od").as("c"))
        else
          ed.join(state.select(col("node").as("r_node"),
              col(s"rank_${t - 1}").as("r")), ed("src") === col("r_node"))
            .select(col("dst").as("node"), expr("r div od").as("c"))
      val inSum = contrib.groupBy("node").agg(sum("c").as("m"))
      val (next, nextRdd) = Dedup.checkpointOwned(
        state.join(inSum, Seq("node"), "left")
          .select(state.columns.map(col) :+
            expr(s"(3 * ${scale}L + 17 * coalesce(m, 0L)) div 20")
              .as(s"rank_$t"): _*))
      stateRdd.foreach(_.unpersist(blocking = false)) // prev round: consumed
      state = next
      stateRdd = nextRdd
    }
    ed.unpersist()
    nodes.unpersist()
    // The final round's checkpoint backs the returned frame; the
    // ContextCleaner reclaims it once the result is dropped.
    state
  }

  /** Run to the exact integer fixpoint (or `maxIters`): the long-lived
    * form for "give me the host ranks" consumers who don't need the
    * trajectory. Because the recurrence is integer-quantized, convergence
    * is EXACT (`r_t == r_{t-1}`, no epsilon) — and unlike [[ranks]],
    * round i's checkpoint frees as soon as round i+1 materializes (the
    * CC-loop lineage discipline): live state is one round's rank table
    * regardless of how many rounds convergence takes. Returns
    * (node, out_deg, rank, iters, converged). */
  def ranksFixpoint(edges: DataFrame, srcCol: String, dstCol: String,
                    maxIters: Int = 50,
                    scale: Long = 1000000L): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val ed = e.join(deg, "src")
      .select(col("src"), col("dst"), col("od"))
      .repartition(col("src"))
      .persist()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node")))
      .distinct()
      .persist()

    var (r, rRdd) = Dedup.checkpointOwned(
      nodes.withColumn("r", lit(scale)))
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val inSum = ed.join(r, ed("src") === r("node"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      val (next, nextRdd) = Dedup.checkpointOwned(
        nodes.join(inSum, Seq("node"), "left")
          .select(col("node"),
            expr(s"(3 * ${scale}L + 17 * coalesce(m, 0L)) div 20").as("r")))
      val changed = next.as("n")
        .join(r.select(col("node"), col("r").as("rp")), "node")
        .where(col("r") =!= col("rp")).count()
      rRdd.foreach(_.unpersist(blocking = false)) // prev round: consumed
      r = next
      rRdd = nextRdd
      converged = changed == 0L
      iters += 1
    }
    // Checkpoint the assembled result so the loop-side persists can
    // release without the returned frame recomputing them.
    val (out, _) = Dedup.checkpointOwned(nodes
      .join(deg.select(col("src").as("node"), col("od")), Seq("node"), "left")
      .join(r, "node")
      .select(col("node"), coalesce(col("od"), lit(0L)).as("out_deg"),
        col("r").as("rank"), lit(iters.toLong).as("iters"),
        lit(converged).as("converged")))
    rRdd.foreach(_.unpersist(blocking = false))
    ed.unpersist()
    nodes.unpersist()
    out
  }
}
