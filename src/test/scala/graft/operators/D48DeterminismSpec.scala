package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r9 ask #1: the round's one officially-red gate
  * (d48_classifier_calibration, hash mismatch at the driver) reproduced
  * green in four independent re-drives at HEAD, so the suspicion is a
  * stale build or a cache/plan interaction in the driver's full-sequence
  * session. This spec makes both failure theories testable in-repo:
  *
  *  - bit-identity of the d48 result across shuffle-partition settings
  *    evaluated twice in ONE session (a partitioning-dependent value —
  *    the only way an integer-exact pipeline can drift — would differ);
  *  - a gate-order replay: d48 evaluated AFTER the gates that share its
  *    NB-classifier cache lineage (d40/d45/d49, the driver runs all
  *    gates in one session) must hash identically to a cold run.
  */
class D48DeterminismSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Canonical digest: every row rendered field-by-field in result order
    * (the query ends in orderBy, so row order is part of the contract). */
  private def digest(): String = {
    val rows = SparkEntry.queries("d48_classifier_calibration")(spark, dir)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .mkString("\n")
    SparkEntry.releaseCaches()
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("d48 is bit-identical across shuffle-partition settings in one session") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "4")
      val a = digest()
      spark.conf.set(key, "13")
      val b = digest()
      spark.conf.set(key, "29")
      val c = digest()
      assert(a == b && b == c,
        s"d48 varies with shuffle partitioning: 4->$a 13->$b 29->$c")
    } finally spark.conf.set(key, saved)
  }

  test("d48 after a cache-sharing gate replay equals a cold-session run") {
    val cold = digest()
    // The gates whose NbClassifier/registerCache lineage overlaps d48's,
    // materialized in sequence the way the driver's one-session Verify
    // drive does (each gate fully consumed, caches released after).
    for (q <- Seq("d40_nb_quality", "d49_nb_multiclass",
        "d45_curation_pipeline")) {
      SparkEntry.queries(q)(spark, dir).write.format("noop")
        .mode("overwrite").save()
      SparkEntry.releaseCaches()
    }
    val replayed = digest()
    assert(cold == replayed,
      s"d48 drifts after gate replay: cold=$cold replayed=$replayed")
  }
}
