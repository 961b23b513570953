package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property: for ANY cursor distribution (duplicates, negatives, skew) and
  * ANY chunk size, the range chunks partition the input multiset exactly —
  * nothing lost, nothing duplicated. The boundaries come from an
  * approximate sketch, so chunk SIZES are not asserted; coverage is the
  * contract the ingest loop relies on. Cases are seeded-random (fixed seed:
  * reproducible failures). */
class ChunkerPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("range chunks partition the input multiset for arbitrary cursors") {
    val rnd = new scala.util.Random(20260812L)
    for (case_ <- 1 to 12) {
      val n = rnd.nextInt(120)
      val chunkSize = 1 + rnd.nextInt(40)
      // mix of heavy duplicates, negatives, and spread values
      val vs = List.fill(n)(rnd.nextInt(5) match {
        case 0 => 7L // hot duplicate
        case 1 => -rnd.nextInt(50).toLong
        case _ => rnd.nextInt(100).toLong
      })
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val chunks = Chunker.rangeChunks(df, "v", chunkSize.toLong).toSeq
      val got = chunks.flatMap(_.select("id").as[Long].collect()).sorted
      assert(got == (0L until n.toLong),
        s"case $case_: n=$n chunkSize=$chunkSize lost/duplicated rows")
    }
  }
}
