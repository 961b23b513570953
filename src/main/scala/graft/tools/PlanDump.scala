package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `explain("formatted")` for a set of SparkEntry queries to files —
  * the optimization-round plan evidence (`plans/rN/<query>_<suffix>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  *
  * Diagnostic main; not part of the library surface. The plan printed is
  * the pre-execution formatted plan (what `df.explain("formatted")` shows:
  * scan details with PushedFilters/ReadSchema, join strategies, Exchange
  * placement, codegen spans); AQE runtime re-optimization is visible in
  * the executed plan instead (see [[ExplainQ]]).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        val p = java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt")
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $p (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $q FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
