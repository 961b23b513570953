package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r10 ask #2 — the d48 lesson generalized to EVERY gate: one
  * session, the full `SparkEntry.queries` map evaluated at sf0.001 under
  * two different shuffle-partition settings (4 vs 32), per-query digests
  * compared. Any partition-order-dependent value — the only way an
  * integer-exact pipeline can drift cross-engine — fails HERE, before the
  * driver's DuckDB compare can turn it into a round-long red.
  *
  * Digests are computed over ROW-SORTED rendered rows: the driver's
  * compare sorts rows before hashing, so row order is not part of the
  * cross-engine contract (orderBy clauses exist for human-readable dumps);
  * what must be invariant is the VALUE multiset. */
class QueryDeterminismCanarySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def digest(name: String): String = {
    val rows = SparkEntry.queries(name)(spark, dir)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .sorted
      .mkString("\n")
    SparkEntry.releaseCaches()
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("every gate is value-deterministic across shuffle-partition settings") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val names = SparkEntry.queries.keys.toSeq.sorted
    try {
      val drift = scala.collection.mutable.ArrayBuffer.empty[String]
      for (name <- names) {
        try {
          spark.conf.set(key, "4")
          val a = digest(name)
          spark.conf.set(key, "32")
          val b = digest(name)
          if (a != b) drift += s"$name: 4->$a 32->$b"
        } catch {
          case e: Throwable =>
            drift += s"$name: FAILED ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}"
        }
      }
      assert(drift.isEmpty,
        s"${drift.size} gate(s) drift with shuffle partitioning:\n" +
          drift.mkString("\n"))
    } finally spark.conf.set(key, saved)
  }
}
