package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Model-based property gate for the copy-on-write row-level operations.
  * The touched/untouched file split in merge/delete/update is the riskiest
  * correctness surface in the table layer — a wrong "untouched" verdict is
  * SILENT data corruption (a matching row survives a delete, or misses an
  * update). Seeded random operation sequences run against both the real
  * table and an in-memory model; full contents must agree after every
  * step, across multi-file snapshots whose bounds overlap arbitrarily. */
class LakeTablePropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def runSequence(seed: Long, steps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val loc = tmpDir(s"lt_prop_$seed")
    val t = LakeTable.ensure(spark, loc,
      Seq((1L, "x", 0)).toDF("id", "name", "gen").schema,
      identifierFields = Seq("id"))
    var model = Map.empty[Long, (String, Int)]
    var gen = 0

    def df(rows: Seq[(Long, String, Int)]) = rows.toDF("id", "name", "gen")
    // keys cluster in a random 50-wide band so data files get TIGHT bounds
    // (that's what makes untouched-file carries reachable, like real tables
    // whose files cluster by ingest time)
    def randKeys(n: Int) = {
      val base = rnd.nextInt(20) * 50L
      Seq.fill(n)(base + rnd.nextInt(50)).distinct
    }

    for (step <- 1 to steps) {
      gen += 1
      rnd.nextInt(4) match {
        case 0 => // append fresh keys (never seen: keeps append duplicate-free)
          val keys = randKeys(1 + rnd.nextInt(8)).filterNot(model.contains)
          if (keys.nonEmpty) {
            val rows = keys.map(k => (k, s"a$k-$gen", gen))
            t.write(df(rows).coalesce(1), "append")
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          }
        case 1 => // merge: update some existing + insert some new
          val keys = randKeys(1 + rnd.nextInt(10))
          if (keys.nonEmpty) {
            val rows = keys.map(k => (k, s"m$k-$gen", gen))
            t.write(df(rows).coalesce(1), "merge")
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          }
        case 2 => // range delete
          val lo = rnd.nextInt(1000).toLong
          val hi = lo + rnd.nextInt(80)
          t.delete(col("id") >= lo && col("id") <= hi)
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 3 => // range update
          val lo = rnd.nextInt(1000).toLong
          val hi = lo + rnd.nextInt(80)
          t.update(Map("name" -> concat(col("name"), lit(s"+u$gen")),
            "gen" -> lit(gen)), col("id") >= lo && col("id") <= hi)
          model = model.map { case (k, (n, g)) =>
            if (k >= lo && k <= hi) k -> (n + s"+u$gen", gen) else k -> (n, g)
          }
      }
      val actual = t.read().as[(Long, String, Int)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(actual == model,
        s"seed=$seed step=$step: table ${actual.size} rows vs model ${model.size}\n" +
          s"missing=${(model.keySet -- actual.keySet).toSeq.sorted.take(10)} " +
          s"extra=${(actual.keySet -- model.keySet).toSeq.sorted.take(10)} " +
          s"diff=${model.collect { case (k, v) if actual.get(k).exists(_ != v) => k }.take(10)}")
    }
    // the sequence must have exercised copy-on-write carries at least once:
    // some snapshot reuses a file from an earlier snapshot dir
    val meta = t.metadata
    val carried = meta.snapshots.exists(s =>
      s.operation != "append" && s.files.exists(f =>
        !f.path.startsWith(s"data/snap-${s.id}")))
    assert(carried, s"seed=$seed never carried a file — sequence too weak")
  }

  test("random merge/delete/update sequences agree with an in-memory model") {
    for (seed <- Seq(11L, 42L, 1337L)) runSequence(seed, steps = 12)
  }
}
