package graft.tables

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Optimistic-concurrency guarantees of the commit protocol: version CAS,
  * append rebase, conflict abort, and VERSION-hint recovery. */
class ConcurrencySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("commitCas: exactly one writer owns a version number") {
    val loc = tmpDir("cc_cas")
    val t = LakeTable.ensure(spark, loc, Seq((1L, "a")).toDF("id", "name").schema)
    val (base, meta) = t.metadataAt
    t.commitCas(base, meta.copy(properties = meta.properties + ("w" -> "1")))
    val e = intercept[ConcurrentCommitException] {
      t.commitCas(base, meta.copy(properties = meta.properties + ("w" -> "2")))
    }
    assert(e.getMessage.contains("committed concurrently"))
    assert(t.readProperty("w") == "1") // the loser changed nothing
  }

  test("concurrent appends all survive via rebase (no lost updates)") {
    val loc = tmpDir("cc_appends")
    val t = LakeTable.ensure(spark, loc, Seq((1L, "a")).toDF("id", "name").schema)
    val threads = 4
    val perThread = 3
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until threads).foreach { ti =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            val w = LakeTable.load(spark, loc)
            (0 until perThread).foreach { i =>
              val id = (ti * perThread + i).toLong
              w.write(Seq((id, s"w$ti-$i")).toDF("id", "name"), "append")
            }
          } catch { case e: Throwable => failures.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"append failed: ${Option(failures.peek())}")
    // every append's rows are present: nothing was lost to a commit race
    assert(t.read().count() == threads * perThread)
    assert(t.version == 1 + threads * perThread) // create + one commit each
  }

  test("stale VERSION hint: readers probe forward to committed versions") {
    val loc = tmpDir("cc_hint")
    val t = LakeTable.ensure(spark, loc, Seq((1L, "a")).toDF("id", "name").schema)
    t.write(Seq((1L, "a")).toDF("id", "name"), "append")
    t.write(Seq((2L, "b")).toDF("id", "name"), "append")
    val v = t.version
    assert(v == 3)
    // simulate the last-writer-wins hint regression
    Files.write(Paths.get(loc, "metadata", "VERSION"), "1".getBytes)
    assert(t.version == 3)
    assert(t.read().count() == 2)
  }

  test("non-append data commits abort on conflict and clean up their files") {
    val loc = tmpDir("cc_abort")
    def batch(ids: Range) = ids.map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val t = LakeTable.ensure(spark, loc, batch(1 to 2).schema)
    t.write(batch(1 to 10), "append")
    // a delete whose predicate evaluation triggers a concurrent append —
    // the delete read table state at version 2, the append commits 3, so
    // the delete's CAS on 3 must fail and abort (its output was computed
    // from a base that no longer is the head)
    val racer = LakeTable.load(spark, loc)
    val (base, meta) = t.metadataAt
    racer.write(batch(11 to 12), "append") // moves head to base+1
    val touched = meta.currentSnapshot.map(_.files).getOrElse(Nil)
    // replay delete's commit with the stale base the predicate split used
    val e = intercept[ConcurrentCommitException] {
      t.commitCas(base, meta.copy(currentSnapshotId = meta.currentSnapshotId + 1))
    }
    assert(e.getMessage.contains("committed concurrently"))
    // the public API path: delete still works against the NEW head
    t.delete(col("id") === 11L)
    assert(t.read().count() == 11)
  }
}
