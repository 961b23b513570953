package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL shard reading — the fifth (and most common) ML corpus container
  * beside WebDataset tar (M8), ZIP (M9), WARC (M10) and Arrow (M13):
  * released text corpora overwhelmingly ship as directories of
  * `*.jsonl.gz` / `*.jsonl.zst` shards (The Pile, C4 dumps, RedPajama,
  * Dolma). The codecs are the runtimes Spark already ships
  * (`java.util.zip` for gzip — multi-member concatenation and per-member
  * CRC-32 handled by the JDK stream — and `zstd-jni` for zstd); what this
  * operator adds is the Spark-side shape: a partition-parallel explode of
  * shard BYTES into (shard_id, line_idx, line) rows with STREAMING
  * decompression (the shard never materializes decompressed — O(chunk)
  * memory regardless of compression ratio, the gzip-bomb stance), a
  * per-line byte guard and a line-count guard (a bomb of tiny lines meets
  * the same cap as WARC's record-count guard), and the codec-family
  * failure contract: a corrupt member ends the walk with the complete
  * lines already decoded — no rows lost to a throw, no task killed.
  * JSON parsing itself stays in the SQL layer (`from_json`), so a
  * malformed LINE yields a null struct exactly as Spark semantics say —
  * visible, never fatal.
  */
object JsonlShard {

  /** One decoded line, 0-indexed within its shard. */
  final case class JsonlLine(shard_id: Long, line_idx: Long, line: String)

  private val GzipMagic = (0x1f, 0x8b)
  private val ZstdMagic = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)

  /** Open the right decompressor by magic sniff: gzip, zstd, else the
    * bytes are taken as plain text. */
  private def open(payload: Array[Byte]): java.io.InputStream = {
    val raw = new java.io.ByteArrayInputStream(payload)
    if (payload.length >= 2 &&
        (payload(0) & 0xff) == GzipMagic._1 && (payload(1) & 0xff) == GzipMagic._2)
      new java.util.zip.GZIPInputStream(raw, 64 << 10)
    else if (payload.length >= 4 && payload.startsWith(ZstdMagic))
      new com.github.luben.zstd.ZstdInputStream(raw)
    else raw
  }

  /** Decode one shard into complete lines. `maxLineBytes` drops (and
    * skips past) any line longer than the guard; `maxLines` stops the
    * walk — both are the bomb caps. A stream error (truncated payload,
    * CRC-corrupt member) ends the walk with the lines already complete. */
  def parseShard(shardId: Long, payload: Array[Byte],
                 maxLineBytes: Int = 4 << 20,
                 maxLines: Int = 1 << 20): Seq[JsonlLine] = {
    if (payload == null || payload.length == 0) return Seq.empty
    val out = Seq.newBuilder[JsonlLine]
    var idx = 0L
    var in: java.io.InputStream = null
    try {
      in = open(payload)
      val buf = new Array[Byte](64 << 10)
      var line = new java.io.ByteArrayOutputStream(256)
      var oversized = false
      var stop = false
      def emit(): Unit = {
        if (idx < maxLines) {
          // \r\n tolerated: strip one trailing CR (Windows-written jsonl)
          val bytes = line.toByteArray
          val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
            bytes.length - 1 else bytes.length
          if (!oversized && n > 0)
            out += JsonlLine(shardId, idx, new String(bytes, 0, n, "UTF-8"))
          // oversized or blank lines still consume an index slot only if
          // non-empty content was present (blank separator lines are
          // structural noise, not records)
          if (n > 0) idx += 1
        } else stop = true
        line.reset()
        oversized = false
      }
      var eof = false
      while (!eof && !stop) {
        val k = in.read(buf)
        if (k < 0) eof = true
        else {
          var i = 0
          while (i < k && !stop) {
            val b = buf(i)
            if (b == '\n') emit()
            else if (!oversized) {
              if (line.size() >= maxLineBytes) { oversized = true; line.reset() }
              else line.write(b.toInt)
            }
            i += 1
          }
        }
      }
      if (!stop && line.size() > 0) emit() // final unterminated line
    } catch {
      case scala.util.control.NonFatal(_) => () // keep complete lines
    } finally {
      if (in != null) {
        try in.close() catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    out.result()
  }

  /** Partition-parallel explode of (shard_id, payload) rows. */
  def explodeLines(spark: SparkSession, shards: DataFrame,
                   maxLineBytes: Int = 4 << 20,
                   maxLines: Int = 1 << 20): Dataset[JsonlLine] = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseShard(id, bytes, maxLineBytes, maxLines)
      })
  }

  /** DISTRIBUTED JSONL shard publishing — the write side of the M14
    * reader, for the MOST COMMON publish format (jsonl.gz / jsonl.zst
    * directories). JSON serialization stays in the SQL layer (callers
    * build the line with `to_json`; the writer is format-agnostic): rows
    * carrying one LINE hash to shards, each shard's lines stream one at a
    * time through the compressor in deterministic `orderCols` order into
    * ONE payload. One exchange on the shard key with a partition-local
    * sort; per-task memory is the assembled payloads of the shards routed
    * to that task — O(one shard) at the one-shard-per-task production
    * setting. `codec`: "gzip", "zstd" or "none". */
  def writeShards(spark: SparkSession, df: DataFrame, shardCol: String,
                  lineCol: String, orderCols: Seq[String],
                  codec: String = "gzip"): DataFrame = {
    require(Seq("gzip", "zstd", "none").contains(codec),
      s"unknown codec '$codec' (gzip | zstd | none)")
    import spark.implicits._
    val cols = col(shardCol).cast("long").as("__shard") +:
      col(lineCol).cast("string").as("__line") +: orderCols.map(col)
    df.select(cols: _*)
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard") +: orderCols.map(col): _*)
      .select(col("__shard"), col("__line"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val done = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
        var cur = Long.MinValue
        var bos: java.io.ByteArrayOutputStream = null
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) {
          out.close() // flushes + finishes both compressors; no-op on raw
          done += ((cur, bos.toByteArray))
          out = null; bos = null
        }
        it.foreach { case (sid, line) =>
          if (out == null || sid != cur) {
            close()
            cur = sid
            bos = new java.io.ByteArrayOutputStream()
            out = codec match {
              case "gzip" => new java.util.zip.GZIPOutputStream(bos)
              case "zstd" => new com.github.luben.zstd.ZstdOutputStream(bos)
              case _ => bos
            }
          }
          out.write(line.getBytes("UTF-8")); out.write('\n')
        }
        close()
        done.iterator
      }
      .toDF("shard_id", "payload")
  }

  // ---- fixture encoders ------------------------------------------------

  def encodeGz(lines: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    lines.foreach { l => gz.write(l.getBytes("UTF-8")); gz.write('\n') }
    gz.close()
    bos.toByteArray
  }

  def encodeZst(lines: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    lines.foreach { l => z.write(l.getBytes("UTF-8")); z.write('\n') }
    z.close()
    bos.toByteArray
  }
}
