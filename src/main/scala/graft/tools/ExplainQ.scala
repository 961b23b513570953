package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the AQE-final executed plan of one SparkEntry query at a given
  * scale (diagnostic main; not part of the library surface). */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", sys.env.getOrElse("GRAFT_UI", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    // GRAFT_COLLECT=1 executes df's OWN QueryExecution so the printed
    // plan is the AQE FINAL plan (stage reuse visible); default keeps the
    // noop write (separate execution, initial plan printed).
    if (sys.env.get("GRAFT_COLLECT").contains("1")) df.collect()
    else df.write.format("noop").mode("overwrite").save()
    println("=== EXECUTED PLAN (final) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
