package graft.tables

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Cross-PROCESS optimistic-commit races: `ConcurrencySpec` races threads
  * inside one JVM, but the hard-link CAS protocol's real adversary is a
  * second OS process (the reference serializes its loads to one worker for
  * exactly this reason — `[load] workers=1`). A child JVM appends to the
  * same table while the parent appends; the protocol must interleave both
  * writers' commits without losing an update, and a parent commit computed
  * from a base the child has since moved past must abort. */
class MultiProcessCommitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawnWriter(loc: String, startId: Long, count: Int): Process = {
    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tables.ForkedWriter", loc, startId.toString, count.toString)
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("appends from a second OS process interleave with ours, none lost") {
    val loc = tmpDir("mp_appends")
    val t = LakeTable.ensure(spark, loc, Seq((1L, "a")).toDF("id", "name").schema)
    val child = spawnWriter(loc, startId = 1000L, count = 4)
    // parent appends race the child's across the process boundary
    (0 until 4).foreach { i =>
      t.write(Seq((i.toLong, s"parent$i")).toDF("id", "name"), "append")
    }
    assert(child.waitFor() == 0, "forked writer failed — see its stderr above")
    // no lost updates: every commit from both processes is present
    val names = t.read().as[(Long, String)].collect().map(_._2).sorted.toSeq
    assert(names == Seq("child1000", "child1001", "child1002", "child1003",
      "parent0", "parent1", "parent2", "parent3"))
    assert(t.version == 9) // create + 8 single-row commits
  }

  test("a commit based on a version another process moved past aborts") {
    val loc = tmpDir("mp_abort")
    val t = LakeTable.ensure(spark, loc, Seq((1L, "a")).toDF("id", "name").schema)
    val (base, meta) = t.metadataAt
    val child = spawnWriter(loc, startId = 2000L, count = 1)
    assert(child.waitFor() == 0, "forked writer failed — see its stderr above")
    // the child owns version base+1 now; our stale CAS must lose loudly
    val e = intercept[ConcurrentCommitException] {
      t.commitCas(base, meta.copy(properties = meta.properties + ("stale" -> "1")))
    }
    assert(e.getMessage.contains("committed concurrently"))
    assert(!t.metadata.properties.contains("stale"))
    assert(t.read().count() == 1) // the child's row, untouched
  }
}
