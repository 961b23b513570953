package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock trace of ONE SparkEntry query — the "where do the
  * seconds go" diagnostic for iterative operators whose sf0.1 wall is
  * job-count-dominated (each Spark job carries fixed scheduling latency
  * that amortizes at scale but dominates tiny inputs).
  *
  * Usage: runMain graft.tools.JobTrace <query> [sfDir]
  * Diagnostic main; not part of the library surface.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (e.time,
          Option(e.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(e.jobId, (e.time, "?"))
        lines.add(f"job ${e.jobId}%3d  ${(e.time - t0) / 1000.0}%7.2fs  $desc")
      }
    })
    // warm-up then timed, like the bench
    val fn = graft.SparkEntry.queries(q)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    lines.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    lines.forEach(println)
    println(f"[jobtrace] $q total $wall%.2fs, ${lines.size} jobs")
    spark.stop()
  }
}
