package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Adversarial-scale gate for the pair-generating dedup paths: a corpus an
  * order of magnitude bigger than the oracle fixtures, poisoned with a
  * boilerplate hot key (one text shared by far more documents than the
  * bucket/df caps allow). Locks the caps' PURPOSE, not just their
  * presence: candidate generation must stay sub-quadratic — the
  * O(hot²) pair explosion is provably dropped — while true near-duplicate
  * pairs still surface.
  */
class DedupAdversarialSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Hot = 60 // boilerplate clones; > the caps used below (20)
  private val Cap = 20

  /** 1000 unique docs + 3 true near-dup pairs + a hot boilerplate group.
    * Token spaces are disjoint (w…/nd…/boil…) so the hot key cannot leak
    * overlap into the honest pairs. Deterministic seed. */
  private lazy val docs: DataFrame = {
    val rnd = new scala.util.Random(42)
    def randWords(n: Int) = Seq.fill(n)("w" + rnd.nextInt(50000)).mkString(" ")
    val uniques = (0 until 1000).map(i => (i.toLong, randWords(30)))
    // near-dup pairs: same 30 words, one appended difference
    val pairs = (0 until 3).flatMap { p =>
      val base = Seq.fill(30)("nd" + (p * 100 + rnd.nextInt(100))).mkString(" ")
      Seq((2000L + 2 * p, base + " endA"), (2001L + 2 * p, base + " endB"))
    }
    // containment pair: doc B is the first half of doc A
    val aText = Seq.tabulate(40)(i => s"ct$i").mkString(" ")
    val contained = Seq((2500L, aText), (2501L, aText.split(" ").take(20).mkString(" ")))
    val boiler = (3000 until (3000 + Hot)).map(i =>
      (i.toLong, Seq.tabulate(25)(j => s"boil$j").mkString(" ")))
    (uniques ++ pairs ++ contained ++ boiler).toDF("doc_id", "text")
  }

  private def isBoiler(id: Long) = id >= 3000L

  test("minhash LSH: band cap drops the hot bucket's O(m^2) pairs, keeps true pairs") {
    val capped = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        maxBandBucket = Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // true near-dup pairs surface
    for (p <- 0 until 3)
      assert(capped.contains((2000L + 2 * p, 2001L + 2 * p)), s"missing true pair $p")
    // NO boilerplate pair survives: the m=60 bucket exceeded the cap
    assert(!capped.exists { case (a, b) => isBoiler(a) && isBoiler(b) })
    // sub-quadratic: output is the handful of true pairs, nowhere near
    // the 60*59/2 = 1770 pairs the hot key would otherwise fan out
    assert(capped.size < 20, s"capped candidate set too big: ${capped.size}")

    // control: uncapped, the hot key DOES explode quadratically — this is
    // exactly the cost the cap removes
    val uncapped = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        maxBandBucket = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count { case (a, b) => isBoiler(a) && isBoiler(b) } ==
      Hot * (Hot - 1) / 2)

    // the monitoring view reports what the cap dropped
    val oversized = Dedup.oversizedBandBuckets(docs, "doc_id", "text", Cap)
      .collect()
    assert(oversized.nonEmpty)
    assert(oversized.forall(_.getAs[Long]("bucket_size") == Hot.toLong))
  }

  test("n-gram Jaccard: df cap silences ubiquitous grams, keeps true pairs") {
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        maxDocFreq = Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    for (p <- 0 until 3)
      assert(capped.contains((2000L + 2 * p, 2001L + 2 * p)), s"missing true pair $p")
    assert(!capped.exists { case (a, b) => isBoiler(a) && isBoiler(b) })
    assert(capped.size < 20, s"capped candidate set too big: ${capped.size}")
  }

  test("winnow containment: df cap bounds fanout, partial duplication still found") {
    val capped = Dedup.winnowContainmentPairs(docs, "doc_id", "text",
        maxDocFreq = Cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((2500L, 2501L)), "containment pair missed")
    assert(!capped.exists { case (a, b) => isBoiler(a) && isBoiler(b) })
  }
}
