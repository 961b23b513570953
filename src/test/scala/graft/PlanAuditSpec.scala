package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-property regression gate: the physical plans the engine must keep
  * producing — pushed-down scans, broadcast joins for small sides, and no
  * cartesian products anywhere near the dedup/ANN paths. A correctness-green
  * change that regresses one of these would still be a 100 TB failure. */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("scans push filters down to parquet") {
    assert(plan("q01_agg_pushdown").contains("LessThanOrEqual(l_shipdate"))
    assert(plan("s02_watermark_filter").contains("GreaterThan(l_shipdate"))
    assert(plan("q06_cast_ts_date").contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("star joins broadcast the small sides") {
    val p = plan("q12_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("interval join is a broadcast nested loop over the tiny periods table") {
    assert(plan("q20_interval_join").contains("BroadcastNestedLoopJoin"))
  }

  test("LSH dedup and IVF ANN never form a cartesian product") {
    for (q <- Seq("d02_minhash_lsh", "d07_ngram_jaccard", "e02_ann_ivf",
        "e04_embedding_near_dup", "e07_hyperplane_lsh_near_dup",
        "d17_semdedup", "d23_incremental_dedup", "e10_ivf_multiprobe")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("PQ encode is a fused projection; ADC scan streams the coded corpus") {
    val p = plan("e08_pq_adc_topk")
    // encoding runs the nearest-cell kernel (no per-subspace joins), and
    // the only pairing is the broadcast of the tiny query set
    assert(p.contains("graft_nearest_cell"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
  }

  test("chunking explodes in place — no join, no hash exchange before the sort") {
    val p = plan("d20_chunking")
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
  }

  test("sequence packing shuffles once, on the shard key") {
    val p = plan("d22_sequence_pack")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("SQL catalog reads push filters into the parquet scan") {
    val p = plan("sql01_catalog_agg")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(o_orderdate"), p.take(800))
    assert(!p.contains("Union")) // one scan node over the lake table
  }

  test("vocab stats stay codegen'd with partial aggregation") {
    val p = plan("d13_vocab")
    assert(!p.contains("ScalaUDF"), "d13 fell out of codegen")
    // token counting must combine map-side before the shuffle
    assert(p.contains("partial_count") || p.contains("partial count") ||
      "HashAggregate.*partial".r.findFirstIn(p).isDefined, p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("repetition rule is a shuffle-free in-row projection") {
    // every d12 statistic is per-document: the top-bigram count runs as the
    // codegen kernel, so the whole rule must stay a projection — no gram
    // shuffle, no join-back, only the output sort's range exchange
    val p = plan("d12_repetition")
    assert(p.contains("graft_top_bigram_count"), p.take(800))
    assert(!p.contains("ScalaUDF") && !p.contains("Join"), p.take(800))
    assert(!p.contains("hashpartitioning"), p.take(800))
  }

  test("centroid assignment is a shuffle-free fused projection") {
    // assignCells runs once per Lloyd iteration: the argmin must stay a
    // map-side projection (fused nearest-cell kernel) — never a window or
    // aggregation shuffle of the corpus
    val emb = Tables.t(spark, dir, "embeddings")
    // materialize the (tiny) centroid table so only the assignment itself
    // is in the audited plan
    val trained = graft.operators.Similarity.trainCentroids(emb, 4, 1)
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    val p = graft.operators.Similarity.assignCells(emb, cents)
      .queryExecution.executedPlan.toString
    // fused argmin: a pure projection — no window, no exchange, no join
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("graft_nearest_cell"), p.take(800))
  }

  test("posting df-caps run as broadcast anti-joins — no window over postings") {
    // Round-6 regression lock (d07 3.69s): a count(*) over (partition by
    // gram) df-cap sorts every posting partition before the self-join. The
    // cap must stay a groupBy + broadcast anti-join of the heavy keys.
    for (q <- Seq("d07_ngram_jaccard", "d10_winnow_containment")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q windows its postings:\n${p.take(800)}")
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
        s"$q df-cap is not a broadcast anti-join:\n${p.take(800)}")
    }
  }

  test("semi-join extract plans as a real semi join") {
    val p = plan("s06_semi_join_extract")
    assert(p.contains("LeftSemi") || p.contains("left_semi"))
  }

  test("hot text kernels run inside whole-stage codegen") {
    val df = SparkEntry.queries("d02_minhash_lsh")(spark, dir)
    df.collect() // AQE only finalizes (and shows codegen spans) on execution
    val p = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n)" markers in the AQE final plan
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p.take(600))
    // the custom expressions appear natively in the plan, not via a UDF
    assert(p.contains("graft_minhash_sig"), p.take(800))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("chunked extract plans contain no window and no global sort") {
    // Round-2 regression: the chunker used an unpartitioned
    // Window.orderBy().row_number(), serializing the whole extract through
    // one task per chunk. Cursor-range chunks must stay scan+filter only.
    import spark.implicits._
    val dir = tmpDir("plan_chunk")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/items.parquet")
    val chunks = new graft.sources.TableSource(spark, dir)
      .scan(graft.sources.TableSourceConfig("items", chunkSize = 30,
        watermarkColumn = Some("id")))(None).toSeq
    assert(chunks.size > 1) // actually chunked, not a single-slice cop-out
    chunks.foreach { c =>
      val p = c.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), p.take(400))
      assert(!p.contains("Sort"), p.take(400))
      assert(!p.contains("Exchange"), p.take(400))
      // the range predicate reaches the parquet scan
      assert(p.contains("PushedFilters"), p.take(400))
    }
    val total = chunks.map(_.count()).sum
    assert(total == 100)
  }

  test("column pruning: two-column projection reads exactly those columns") {
    val p = plan("q27_distinct_filter")
    val readSchema = "ReadSchema: [^\\n]+".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("o_orderstatus") &&
      readSchema.contains("o_orderpriority"), readSchema)
    assert(!readSchema.contains("o_totalprice") &&
      !readSchema.contains("o_orderdate"), readSchema)
  }

  test("segment dedup joins on the segment key — no window, no cartesian") {
    val p = plan("d27_segment_dedup")
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("overlap decontamination broadcasts the benchmark gram set") {
    val p = plan("d28_overlap_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("temperature mixture broadcasts the quota table; one exchange on lang") {
    val p = plan("k04_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("sampler ranks never sort a whole key in one task (salted BoundedRank)") {
    // The full-corpus window must partition by (key..., salt); only the
    // bounded candidate set (<= salts * k rows per key) may be windowed by
    // the bare key. A plain per-lang row_number here is the 100 TB
    // one-task-sorts-half-the-corpus failure.
    for (q <- Seq("k04_temperature_mixture", "k02_group_sample")) {
      val p = plan(q)
      val windows = "Window .*".r.findAllIn(p).toSeq
      assert(windows.size == 2, s"$q: expected 2-level rank, got:\n$p")
      assert(windows.count(_.contains("__brk_salt")) == 1,
        s"$q: full-data window is not salted:\n${windows.mkString("\n")}")
    }
  }

  test("BM25 broadcasts query terms + df + stats; ranks through salted windows") {
    val p = plan("d33_bm25_topk")
    // query-term and df joins broadcast (never shuffle the postings to
    // meet a small side), the only nested loop is the 1-row stats attach,
    // and the per-query top-k is the two-level salted rank
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    val windows = "Window .*".r.findAllIn(p).toSeq
    assert(windows.size == 2 && windows.count(_.contains("__brk_salt")) == 1,
      s"d33: per-query rank is not the salted BoundedRank:\n$p")
  }

  test("trained-quantizer paths contain no per-iteration corpus join") {
    // Round-5 regression lock: trainCentroids must attach assignments in
    // the training-set scan (fused kernel), never by self-joining the
    // corpus on vec_id — e05's plan would show a SortMergeJoin otherwise.
    val p = plan("e05_kmeans_ivf_cells")
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("container/codec explodes are single-pass: no join, one exchange " +
       "at most (the gate's presentation sort)") {
    // m11/m15/m16 decode payload bytes partition-parallel; any join or
    // second exchange would mean the decode stopped being a map-side scan
    for (q <- Seq("m11_video_frame_decode", "m15_tar_shards",
        "m16_zip_shards", "m13_flac_decode")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q joins:\n${p.take(500)}")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, s"$q has $exchanges exchanges") // sort = range
    }
  }

  test("URL canonicalization is a projection; only the demo window shuffles") {
    val p = plan("d35_url_canon")
    assert(!p.contains("Join"), p.take(500))
  }

  test("LM perplexity scoring: count-table joins, no window, no cartesian " +
       "beyond the 1-row stats attach") {
    val p = plan("d37_lm_perplexity")
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the 1-row train-total attaches as a broadcast nested loop, like BM25's
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
  }

  test("exact-substring spans: codegen'd hash kernel, semi-join candidate " +
       "pruning, windows only per-document") {
    val p = plan("d38_exact_substr")
    assert(p.contains("graft_char_gram_hashes"), p.take(800))
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p.take(800))
    // hash and raw-gram dup detection both prune via semi joins (the
    // df-cap groupBy pattern), never a corpus-ordered window
    assert("LeftSemi".r.findAllIn(p).size >= 2, p.take(800))
    val windows = "Window .*".r.findAllIn(p).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"non-per-doc window:\n${windows.mkString("\n")}")
  }

  test("NB classifier scoring: count-table join only — no window, no cartesian") {
    val p = plan("d40_nb_quality")
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("token-budget selection never builds a global order: no single-" +
       "partition exchange; the only window partitions by score") {
    val p = plan("d41_token_budget")
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
    val windows = "Window .*".r.findAllIn(p).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("score")),
      s"window not partitioned by score:\n${windows.mkString("\n")}")
  }

  test("x07: the degenerate-score path runs the two-level cumsum — the " +
       "corpus-sized window is leaf-keyed, never an unkeyed global sort") {
    val p = plan("x07_token_budget_degenerate")
    val windows = "Window .*".r.findAllIn(p).toSeq
    // The doc-level cumsum (the only window ordering by doc_id) must be
    // partitioned by the leaf key g — 4096-doc_id partitions regardless of
    // score skew. (score is a literal in this gate, so Catalyst folds it
    // out of the partition specs; the coarse level-1 window correctly runs
    // over the corpus/4096-row GROUP table, which may single-partition.)
    val docWindows = windows.filter(_.contains("doc_id"))
    assert(docWindows.nonEmpty && docWindows.forall(_.contains("__g")),
      s"corpus-sized window not leaf-keyed:\n${windows.mkString("\n")}")
  }

  test("d46: the global prefix sum never sorts the corpus in one " +
       "partition — the doc-level window is leaf-keyed") {
    val p = plan("d46_sequence_pack")
    val windows = "Window .*".r.findAllIn(p).toSeq
    val docWindows = windows.filter(_.contains("doc_id#"))
    assert(docWindows.nonEmpty && docWindows.forall(_.contains("__g")),
      s"corpus-sized window not leaf-keyed:\n${windows.mkString("\n")}")
  }

  test("PageRank rounds leave no cartesian in the trajectory assembly") {
    assert(!plan("d42_host_pagerank").contains("CartesianProduct"))
  }

  test("SQ8 search broadcasts the query side; codes are a codegen projection; " +
       "scoring runs the fused code-sqdist kernel") {
    val p = plan("e13_sq8_topk")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("ScalaUDF"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    assert(p.contains("graft_code_sqdist"), p.take(800))
    assert(plan("e14_ivf_sq8_topk").contains("graft_code_sqdist"))
  }

  test("WARC explode is a single-pass scan: no join") {
    assert(!plan("m17_warc_records").contains("Join"))
  }

  test("per-host budgets: no single-partition exchange; every window keyed") {
    val p = plan("d43_host_budget")
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
    val windows = "Window .*".r.findAllIn(p).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("key")),
      s"window not keyed:\n${windows.mkString("\n")}")
  }

  test("IVF-SQ8 and SQ8-recall: no cartesian, no UDF; LSH estimator runs " +
       "its fused kernels") {
    for (q <- Seq("e14_ivf_sq8_topk", "e15_sq8_recall")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"),
        s"$q:\n${p.take(600)}")
    }
    val p = plan("d44_lsh_estimate")
    assert(p.contains("graft_count_eq") && p.contains("graft_sorted_iu"),
      p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("d51: every lake-staged survivor set reads back as a table scan — " +
       "the composed plan roots at scans, not at session-cache lineage") {
    // the final flags join must consume the six stage TABLES: six lake
    // scans (file-sourced), no InMemoryTableScan/localCheckpoint RDD scan
    // in the composed gate plan, and no cartesian anywhere
    val p = plan("d51_curation_lake")
    assert(!p.contains("InMemoryTableScan"),
      s"d51 composed plan still reads session cache:\n${p.take(800)}")
    assert(!p.contains("Scan ExistingRDD"),
      s"d51 composed plan still reads checkpoint RDDs:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("Scan parquet".r.findAllIn(p).size >= 6,
      s"expected >= 6 stage-table scans:\n${p.take(1200)}")
  }

  test("d52: BPE encode is a shuffle-free map-side pass under broadcast ranks") {
    // after the (driver-side) training collect, scoring every document
    // must not shuffle: the only exchange is the presentation sort's
    // range partitioning
    val p = plan("d52_bpe_train_encode")
    assert(!p.contains("hashpartitioning"),
      s"d52 encode shuffles:\n${p.take(800)}")
    assert(!p.contains("Join"), p.take(800))
  }

  test("d54: PII redaction is a shuffle-free codegen projection") {
    val p = plan("d54_pii_redaction")
    assert(p.contains("graft_redact_pii"), p.take(800))
    assert(!p.contains("ScalaUDF"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("hashpartitioning"), p.take(800))
  }

  test("m24: shard writing shuffles ONCE on the shard key with a LOCAL " +
       "sort; read-back explode adds no join") {
    // the gate plan roots at the writer's RDD boundary, so audit the
    // writer's internal shape the way it builds it: one hash exchange on
    // the shard key, then a per-partition (non-global) sort — never a
    // range exchange over the corpus
    import org.apache.spark.sql.functions._
    val w = Tables.t(spark, dir, "documents")
      .select((col("doc_id") % 7).as("shard"), col("doc_id"), col("lang"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(w).size == 1, w.take(800))
    assert(!w.contains("rangepartitioning"), w.take(800))
    assert("Sort \\[.*\\], false".r.findFirstIn(w).isDefined,
      s"shard sort must be partition-local:\n${w.take(800)}")
    // the gate's read-back side: a pure explode + projection — no join
    val p = plan("m24_arrow_shard_write")
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("m26: TFRecord explode is a single-pass partition-parallel scan — " +
       "no join, no hash exchange") {
    val p = plan("m26_tfrecord_shards")
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
  }

  test("m27: TFRecord shard writing shuffles ONCE on the shard key with a " +
       "LOCAL sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Tables.t(spark, dir, "documents")
      .select((col("doc_id") % 7).as("shard"), col("doc_id"),
        col("text").cast("binary").as("rec"))
    val w = graft.operators.TfRecordShard
      .writeShards(spark, rows, "shard", "rec", Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(w).size == 1, w.take(800))
    assert(!w.contains("rangepartitioning"), w.take(800))
    assert("Sort \\[.*\\], false".r.findFirstIn(w).isDefined,
      s"shard sort must be partition-local:\n${w.take(800)}")
    val p = plan("m27_tfrecord_shard_write")
    assert(!p.contains("Join"), p.take(800))
  }

  test("d55: semantic decontamination streams the corpus ONCE through a " +
       "broadcast nested loop over the codegen cosine kernel — no " +
       "cartesian, no corpus-keyed shuffle before the hit cut") {
    val p = plan("d55_semantic_decontaminate")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("graft_cosine"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("ScalaUDF"), p.take(800))
  }

  test("e17: refine re-ranks the POOL only — the exact sqdist kernel " +
       "runs after the candidate cut, no cartesian, no UDF") {
    val p = plan("e17_sq8_refine_topk")
    assert(p.contains("graft_code_sqdist"), p.take(800))
    assert(p.contains("graft_sqdist"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("ScalaUDF"), p.take(800))
  }

  test("m28: WebDataset shard writing shuffles ONCE on the shard key " +
       "with a LOCAL sort; the sample read-back adds one keyed agg") {
    import org.apache.spark.sql.functions._
    val rows = Tables.t(spark, dir, "documents")
      .select((col("doc_id") % 7).as("shard"),
        concat(lit("d"), col("doc_id"), lit(".txt")).as("name"),
        col("text").cast("binary").as("bytes"))
    val w = graft.operators.TarShard
      .writeShards(spark, rows, "shard", "name", "bytes", Seq("name"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(w).size == 1, w.take(800))
    assert(!w.contains("rangepartitioning"), w.take(800))
    assert("Sort \\[.*\\], false".r.findFirstIn(w).isDefined,
      s"shard sort must be partition-local:\n${w.take(800)}")
    val p = plan("m28_webdataset_shard_write")
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("d56: hard-negative mining streams the corpus once through the " +
       "broadcast cosine kernel and ranks with the salted bounded top-k") {
    val p = plan("d56_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("graft_cosine"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("ScalaUDF"), p.take(800))
  }

  test("k09: epoch shuffle exchanges ONCE on (epoch, shard) — a keyed " +
       "window, never a global sort of the permutation") {
    val p = plan("k09_epoch_shuffle")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
    assert(!p.contains("Join"), p.take(800))
    // exactly the one range exchange of the presentation orderBy
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("k10: stratified sampling — the corpus-side windows are all keyed; " +
       "single-partition exchanges touch only the dimension-sized " +
       "apportionment rows") {
    val p = plan("k10_stratified_sample")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // Any window that ranks DOC rows (its spec mentions doc_id) must be
    // keyed — an unkeyed one would pull the corpus into one task. The
    // apportionment's global windows never touch doc rows: they consume
    // the one-row-per-language totals aggregate (largestRemainderAlloc),
    // so they are allowed to stay unkeyed/dimension-sized.
    val docWindows = "Window .*doc_id.*".r.findAllIn(p).toSeq
    assert(docWindows.nonEmpty && docWindows.forall(_.contains("key")),
      s"doc-ranking window not keyed:\n${docWindows.mkString("\n")}")
  }

  test("k08: length batching shuffles ONCE on the shard key — the batch " +
       "agg reuses the shard partitioning, no global sort before the " +
       "presentation order") {
    val p = plan("k08_length_batching")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
    assert(!p.contains("Join"), p.take(800))
  }

  test("x08: the hot-digest paragraph dedup keeps the posting list inside " +
       "a partial aggregate — no window over occurrences, no cartesian") {
    val p = plan("x08_paragraph_dedup_hot")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"), p.take(800)) // first-wins is an agg, not a rank
    assert(p.contains("partial_min") || p.contains("partial_count"), p.take(1200))
  }

  test("e18: filtered top-k broadcasts the queries and streams the corpus " +
       "once — Catalyst even turns the equality predicate into a " +
       "broadcast HASH join on the label, ranking stays keyed") {
    val p = plan("e18_filtered_topk")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(600))
    // the bounded-rank windows are keyed on query_id (+ salt), never global
    val windows = "Window .*".r.findAllIn(p).toSeq
    assert(windows.forall(_.contains("query_id")), windows.mkString("\n"))
  }

  test("d55 pinned fixture: the benchmark side carries the vec_id < 500 " +
       "scale pin INTO the broadcast, and the only hash exchange before " +
       "the hit cut is the per-vector aggregate, never a corpus sort") {
    val p = plan("d55_semantic_decontaminate")
    // the pin must be visible in the executed plan — reverting the d55
    // fixture to a bare %-slice (VERDICT r13 #1) fails here as well as in
    // FixtureScaleSpec
    assert(p.contains("< 500"), p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // no range exchange (global sort) of corpus rows before the final
    // presentation orderBy. The corpus-to-hit-counts LEFT join may be a
    // keyed SMJ (linear, one hash exchange per side) — what must never
    // appear is an SMJ against the BENCHMARK side (it broadcasts).
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1, p.take(1200))
  }

  test("e18 pinned fixture: the query side carries the vec_id < 500 " +
       "scale pin into the broadcast side of the label hash join") {
    val p = plan("e18_filtered_topk")
    assert(p.contains("< 500"), p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("k11: masked pair packing never sorts the corpus in one task — " +
       "the prefix sum stays two-level, mask arithmetic is in-row") {
    val p = plan("k11_sft_pack_masks")
    assert(!p.contains("CartesianProduct"))
    // no global (unkeyed) window over pair rows: every window carries
    // the __g leaf key or runs over the leaf-total table
    val pairWindows = "Window .*pair_id.*".r.findAllIn(p).toSeq
    assert(pairWindows.forall(_.contains("__g")), pairWindows.mkString("\n"))
  }

  test("m32/m33: tensor-shard publish is one groupByKey exchange; the " +
       "read-back explode adds no shuffle") {
    for (q <- Seq("m32_safetensors_shards", "m33_npz_shards")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
        s"$q:\n${p.take(1200)}")
    }
  }

  test("e19: MMR broadcasts the queries, streams the corpus once, and the " +
       "greedy runs on the pool cut — no cartesian, no corpus-global sort") {
    val p = plan("e19_mmr_rerank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(800))
    // the pool cut is the salted two-level rank: every Sort is inside a
    // partitioned window, never a global Exchange+Sort of scored rows
    assert(!p.contains("rangepartitioning(rel_e6"), p.take(1200))
  }

  test("k13: the quantile window runs over HISTOGRAM rows — partial " +
       "aggregation before the exchange, no corpus-sized window state") {
    val p = plan("k13_length_quantiles")
    // map-side partial agg of the (lang, n_tokens) histogram
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("d68: the repetition kernels are one shuffle-free codegen projection") {
    val p = plan("d68_gopher_repetition")
    assert(p.contains("graft_top_ngram_chars") &&
      p.contains("graft_dup_ngram_chars"), p.take(800))
    // in-row rules: nothing to exchange before the (display-only) sort
    // (AQE prints the pre-execution plan, so codegen spans aren't shown;
    // the single-Exchange shape is the load-bearing property)
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(1200))
  }

  test("m35: the manifest is one shard-key exchange plus a bounded " +
       "digest fold — never a per-doc shuffle join back") {
    val p = plan("m35_checksum_manifest")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("d62: the crawl front door's only joins are the blocklist BROADCAST " +
       "and the dedup winner-set join; robots+charset+extract fuse into " +
       "one projection (no per-stage doc_id re-joins, no cartesian)") {
    val p = plan("d62_frontdoor_pipeline")
    assert(!p.contains("CartesianProduct"))
    // blocklist side arrives broadcast — the corpus is never shuffled
    // for the suffix match
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    // exactly one SortMergeJoin-or-shuffle-join family is tolerated (the
    // paragraph-dedup winner join); stage re-joins would add more
    val smj = "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size
    assert(smj <= 1, s"unexpected shuffle joins ($smj):\n${p.take(1200)}")
  }
}
