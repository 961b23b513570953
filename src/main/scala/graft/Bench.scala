package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through the noop
  * DataSourceV2 sink so Catalyst cannot prune work the way `.count()` lets
  * it (VERDICT r1 "Bench fidelity" item). */
object Bench {
  /** Headline set: the heavier shapes — wide join+agg, window, LSH dedup,
    * winnowing/containment, trained-IVF k-means, hyperplane LSH, ANN,
    * sessionization, the SQL-catalog path — plus the scan-heavy Q1
    * aggregate. Every operator whose cost could regress with plan changes
    * gets round-over-round tracking here. */
  val headline: Seq[String] = Seq(
    "q01_agg_pushdown", "q12_join_multi", "q20_interval_join",
    "q24_window_lag", "ev01_sessionize",
    "d01_exact_dedup", "d02_minhash_lsh",
    "x01_lsh_skew_capped", "x02_lsh_skew_atcap",
    "d03_simhash", "d07_ngram_jaccard",
    "d08_winnow_fingerprints", "d10_winnow_containment",
    "e01_knn_bruteforce", "e02_ann_ivf",
    "e05_kmeans_ivf_cells", "e06_kmeans_ivf_topk",
    "e07_hyperplane_lsh_near_dup", "sql02_catalog_join",
    "d11_corpus_clean", "d12_repetition", "d13_vocab",
    "d14_decontaminate", "d15_dup_clusters", "d31_dup_clusters_star",
    "d17_semdedup", "d18_keyterms",
    "e08_pq_adc_topk", "ev05_asof_join",
    "d27_segment_dedup", "d28_overlap_decontaminate", "d32_dsir_weight",
    "d33_bm25_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Local iteration aid: bench only a comma-separated subset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = headline.filter(n => only.forall(_.contains(n))).flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        // Warm the JVM/page cache once so numbers measure the engine, not
        // first-touch classloading; then report the MEDIAN of three timed
        // materializations — single-shot timings on a shared box have
        // produced 2x phantom regressions round-over-round.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          SparkEntry.releaseCaches()
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val t = (System.nanoTime() - t0) / 1e9
            SparkEntry.releaseCaches()
            t
          }
          name -> times.sorted.apply(1)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
        } finally SparkEntry.releaseCaches()
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
