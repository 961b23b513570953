package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture scale-contract gate (VERDICT r13 #2): three separate rounds
  * each found one more %-slice "small by contract" broadcast side that in
  * fact GROWS with the corpus (e19/d56 in r11, d55/e18 in r13). For a
  * broadcast-nested-loop operator whose cost is |corpus| x |small side|,
  * a growing small side makes the measured sf1/sf0.1 ratio quadratic BY
  * FIXTURE — the ceiling then codifies fixture growth and can no longer
  * catch a real corpus-side regression. This spec makes the class
  * mechanically unrepeatable: every side declared contract-small in
  * [[SparkEntry.contractSmallSides]] (extracted by the SAME helper the
  * query uses, so spec and query cannot drift) must have IDENTICAL
  * cardinality at sf0.01 and sf0.1 — the driver-shipped step where the
  * embeddings corpus grows 4x and documents grow 10x. Reverting any pin
  * (e.g. d55's benchmark side back to a bare `vec_id % 50` slice) fails
  * this spec: the slice counts 10 at sf0.01 but 40 at sf0.1. */
class FixtureScaleSpec extends AnyFunSuite with SparkSpec {

  private val sfSmall = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"

  test("every declared contract-small fixture side has identical " +
       "cardinality across sf dirs (scale-fixed, not %-sliced)") {
    // Precondition: the two dirs genuinely differ in corpus size, or the
    // equality below would be vacuous.
    val embSmall = spark.read.parquet(s"$sfSmall/embeddings.parquet").count()
    val embBig = spark.read.parquet(s"$sfBig/embeddings.parquet").count()
    assert(embBig > embSmall,
      s"sf dirs do not scale ($embSmall vs $embBig) — the contract check " +
        "below would be vacuous")
    for ((name, side) <- SparkEntry.contractSmallSides) {
      val nSmall = side(spark, sfSmall).count()
      val nBig = side(spark, sfBig).count()
      assert(nSmall === nBig,
        s"$name: contract-small side grows with the corpus " +
          s"($nSmall at sf0.01 -> $nBig at sf0.1) — the fixture-quadratic " +
          "class of VERDICT r11 #4 / r13 #1; pin the slice (vec_id < 500)")
      assert(nBig > 0, s"$name: contract-small side is empty — the " +
        "fixture no longer exercises the operator")
    }
  }

  test("the oracle SQL carries the same scale pin as the Spark fixture") {
    // The drift hole this closes: at sf0.01 the pin is a NO-OP (every
    // vec_id % 50 == 0 vector is < 500 there), so the routine hash gate
    // cannot see a pin lost on ONE side — the query and its oracle would
    // diverge silently until the next sf1 correctness pass. The committed
    // sf1 compare (SCALECHECK_r14: 5 OK / 0 BAD where the pin binds)
    // anchors today's state; this assert keeps both surfaces pinned.
    val pinned = Seq("d55_semantic_decontaminate", "d56_hard_negatives",
      "e18_filtered_topk", "e19_mmr_rerank",
      "t16_stream_semantic_decontaminate")
    pinned.foreach { n =>
      val sql = SparkEntry.oracleSql(n)
      // The pin must sit IN THE SAME PREDICATE as the eval-slice cut —
      // a bare substring check would accept the pin moved to the corpus
      // CTE while the bench/query CTE silently loses it.
      assert("vec_id\\s*%\\s*50\\s*=\\s*0\\s+AND\\s+vec_id\\s*<\\s*500".r
          .findFirstIn(sql).isDefined,
        s"$n: oracle SQL lost the `vec_id % 50 = 0 AND vec_id < 500` " +
          "pinned eval-slice predicate")
    }
  }

  test("the bare %-slice eval fixture cannot be reintroduced anywhere " +
       "in main source — every %50 eval cut must carry the pin inline") {
    // Source-level lint closing the declaration-list gap mechanically:
    // the fixture-quadratic class was reintroduced in three separate
    // rounds by WRITING a new bare `% 50 === 0` slice (or its SQL form
    // `% 50 = 0`), each time in a file the existing specs didn't cover.
    // This test makes the form unwritable: every occurrence in
    // src/main must be immediately followed by the scale pin. New
    // eval-slice fixtures must use SparkEntry.evalSlice (Spark side) and
    // the `vec_id % 50 = 0 AND vec_id < 500` predicate (oracle side).
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val files = Files.walk(Paths.get("src/main/scala/graft")).iterator()
      .asScala.filter(_.toString.endsWith(".scala")).toSeq
    // Scoped to vec_id (the embeddings eval-slice convention): doc_id %50
    // fixtures are per-doc HOST synthesis (d43-family), not broadcast
    // sides, and scaladoc mentions don't carry col().
    val sparkBare = ("""col\("vec_id"\)\s*%\s*50\s*===\s*0""" +
      """(?!\s*&&\s*col\("vec_id"\)\s*<\s*500)""").r
    val sqlBare =
      """vec_id\s*%\s*50\s*=\s*0(?!\s+AND\s+vec_id\s*<\s*500)""".r
    val bad = files.flatMap { f =>
      val txt = Files.readString(f)
      (sparkBare.findAllIn(txt).map(m => s"$f: Spark-side `$m`") ++
        sqlBare.findAllIn(txt).map(m => s"$f: SQL-side `$m`")).toSeq
    }
    assert(bad.isEmpty,
      s"bare %-slice eval fixture(s) reintroduced (VERDICT r11 #4 / " +
        s"r13 #1 class):\n${bad.mkString("\n")}")
  }

  test("the broadcast-nested-loop Similarity fixtures are all declared") {
    // The operators whose cost is |corpus| x |small side| — any of these
    // missing from the declaration map would escape the contract check.
    val bnl = Seq("d55_semantic_decontaminate", "d56_hard_negatives",
      "e18_filtered_topk", "e19_mmr_rerank",
      "t16_stream_semantic_decontaminate")
    bnl.foreach(n => assert(SparkEntry.contractSmallSides.contains(n),
      s"$n is a |corpus| x |small-side| fixture but not declared in " +
        "contractSmallSides"))
  }
}
