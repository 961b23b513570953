package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** File-based sources (S7/S8/F6) and the retry wrapper (S10).
  *
  * Listing is driver-side (file counts are metadata-scale); per-file content
  * work is distributed as a `Dataset[String]` of paths processed with
  * `mapPartitions` — the Spark shape of the reference's thread-pooled
  * fetch+parse (`electricity_sharepoint.py:40,189-216`).
  */
object FileSources {

  /** S7: recursive glob listing with a modified-after filter
    * (`dlt_sources/m365/__init__.py:22-62`; mtime filter
    * `electricity_sharepoint.py:239-241`). Glob is fnmatch-style against the
    * path relative to `root`. */
  def globFiles(root: String, pattern: String,
                modifiedAfter: Option[Long] = None): Seq[String] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return Nil
    val matcher = rootPath.getFileSystem.getPathMatcher(s"glob:$pattern")
    val s = Files.walk(rootPath)
    try s.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter(p => matcher.matches(rootPath.relativize(p)))
      .filter(p => modifiedAfter.forall(cut =>
        Files.getLastModifiedTime(p).compareTo(FileTime.fromMillis(cut)) > 0))
      .map(_.toString).toList.sorted
    finally s.close()
  }

  /** F6: distribute per-file parsing over the cluster. */
  def parseFiles[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, files: Seq[String], parallelism: Int)(
      parse: String => Iterator[T]): Dataset[T] = {
    import spark.implicits._
    spark.createDataset(files)
      .repartition(math.max(1, math.min(parallelism, files.size)))
      .mapPartitions(paths => paths.flatMap(parse))
  }

  /** S8: ISIS cycle-archive run discovery
    * (`moderator_performance.py:97-161`): scan `cycle_YY_N` directories,
    * sort by 4-digit-expanded year then cycle number, optionally keep only
    * the newest cycle (incremental mode), parse run numbers from `.nxs`
    * file names, honoring a skip list. */
  final case class CycleDir(name: String, year: Int, number: Int, path: String)

  private val CycleRe = """cycle_(\d{2})_(\d+)""".r

  def discoverCycles(archiveRoot: String): Seq[CycleDir] = {
    val root = Paths.get(archiveRoot)
    if (!Files.isDirectory(root)) return Nil
    val s = Files.list(root)
    val dirs =
      try s.iterator().asScala.filter(Files.isDirectory(_)).map(_.getFileName.toString)
        .collect { case n @ CycleRe(yy, num) =>
          // 2-digit -> 4-digit year sort rule: 9x => 199x else 20xx
          val year = if (yy.startsWith("9")) 1900 + yy.toInt else 2000 + yy.toInt
          CycleDir(n, year, num.toInt, root.resolve(n).toString)
        }.toList
      finally s.close()
    dirs.sortBy(c => (c.year, c.number))
  }

  private val RunRe = """[A-Za-z]*?(\d+)\.nxs""".r

  /** Run numbers from `.nxs` file names in a cycle dir, minus a skip list. */
  def discoverRuns(cycle: CycleDir, skip: Set[Long] = Set.empty): Seq[(Long, String)] = {
    val dir = Paths.get(cycle.path)
    val s = Files.list(dir)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .flatMap { p =>
        p.getFileName.toString match {
          case RunRe(num) => Some((num.toLong, p.toString))
          case _ => None
        }
      }
      .filterNot { case (run, _) => skip.contains(run) }
      .toList.sortBy(_._1)
    finally s.close()
  }

  /** Incremental mode reads only the newest cycle
    * (`moderator_performance.py:131-132`). */
  def cyclesFor(archiveRoot: String, incremental: Boolean): Seq[CycleDir] = {
    val all = discoverCycles(archiveRoot)
    if (incremental) all.takeRight(1) else all
  }

  /** S10: exponential-backoff retry (tenacity-equivalent: wait doubles from
    * `baseDelayMs`, capped at `capMs`; `attempts` tries total —
    * `sources/m365/client.py:17-30`). `retryOn` mirrors retrying only on
    * retryable failures (5xx/429/network there). */
  def withRetry[T](attempts: Int = 5, baseDelayMs: Long = 100,
                   capMs: Long = 5000,
                   retryOn: Throwable => Boolean = _ => true,
                   sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var delay = baseDelayMs
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e: Throwable if attempt < attempts && retryOn(e) =>
          sleep(delay)
          delay = math.min(delay * 2, capMs)
          attempt += 1
        case e: Throwable => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
