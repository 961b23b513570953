package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale diagnostic (not part of the library surface): counts the
  * LSH band-candidate pairs and band-bucket size distribution at a given
  * sf dir, to attribute superlinear d02/d15/d31 scaling between the engine
  * (join/sort pathology) and the fixture (cross-shard band collisions).
  * Usage: runMain graft.tools.LshScaleDiag <sfDir>
  */
object LshScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val sig = docs.select(col("doc_id"),
      expr("graft_minhash_sig(text)").as("sig"))
    // The SAME band-bucket keys the operators join on (shared builder —
    // the census must count the buckets the engine actually uses).
    val bandKeys = graft.operators.Dedup.bandHashKeys(col("sig"))
    val rows = sig.select(col("doc_id"),
      posexplode(bandKeys).as(Seq("band_id", "band_key")))
    val buckets = rows.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("m")).where(col("m") > 1)
      .select(col("m"), (col("m") * (col("m") - 1) / 2).as("pairs"))
    val mode = if (args.length > 1) args(1) else "buckets"
    if (mode == "pairs") {
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"TIMED $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val out = timed("nearDupPairs.count") {
        graft.operators.Dedup.minhashNearDupPairs(
          graft.Tables.t(spark, sfDir, "documents"), "doc_id", "text").count()
      }
      println(s"RESULT sf=$sfDir verified_pairs=$out")
      spark.stop(); return
    }
    val agg = buckets.agg(
      count(lit(1)).as("multi_buckets"), max("m").as("max_bucket"),
      sum("pairs").as("pairs_uncapped"),
      sum(when(col("m") <= 500, col("pairs"))).as("pairs_capped"),
      sum(when(col("m") <= 500, col("pairs")).otherwise(lit(0)))
        .as("pairs_capped0")).collect()(0)
    println(s"RESULT sf=$sfDir multi_buckets=${agg.getLong(0)} " +
      s"max_bucket=${agg.getLong(1)} pairs_uncapped=${agg.getDouble(2)} " +
      s"pairs_capped=${agg.getDouble(4)}")
    spark.stop()
  }
}
