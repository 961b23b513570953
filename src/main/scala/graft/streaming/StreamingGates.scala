package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType, TimestampType}

import graft.functions.{TextFunctions => TF}

/** Oracle gates for the Structured-Streaming paths (T1/T2): the streaming
  * machinery — file-source offsets, state store, watermark advance,
  * event-time timeouts, append/complete sinks — driven end to end over the
  * driver's events table and compared row-for-row against batch DuckDB SQL.
  * The streams are deterministic by construction:
  *
  *  - t01 processes the whole table in ONE AvailableNow micro-batch with a
  *    complete-mode aggregation (no watermark dependence at all);
  *  - t02 pins micro-batch boundaries with `maxFilesPerTrigger=1` over
  *    mtime-ordered files, so the watermark sequence (and therefore every
  *    state timeout) is a pure function of the data: the real events land
  *    in batch 1, then two far-future sentinel files advance the watermark
  *    twice, flushing every open session (sessions ending within the gap of
  *    batch N's max timestamp survive batch N+1's watermark, hence TWO
  *    advances; the sentinel user is excluded from the output).
  */
object StreamingGates {

  /** Raw `events.ts` differs by testdata generation: parquet
    * TIMESTAMP(NANOS) reads as a long (legacy conf) in some, native
    * TIMESTAMP(MICROS) in others — see [[graft.Tables.events]]. Gates that
    * readStream the raw file reduce it through this to epoch micros. */
  private def tsUsSql(schema: StructType): String =
    if (schema("ts").dataType == LongType) "(ts div 1000)"
    else "unix_micros(cast(ts as timestamp))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // T1: streaming tumbling aggregation — readStream over the events
    // parquet, per-(hour, event_type) counts as a stateful streaming agg,
    // complete mode into a memory sink. Same partial-agg shuffle shape as
    // the batch plan; the state store holds one row per open group.
    "t01_stream_window" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$dir/events.parquet"
      val schema = s.read.parquet(path).schema // ts type varies by generation
      // the file source wants a DIRECTORY: stage the table as one symlink
      val in = freshDir("graft_t01_in")
      Files.createSymbolicLink(in.resolve("events.parquet"),
        java.nio.file.Paths.get(path))
      val sink = freshName("t01_sink")
      val q = s.readStream.schema(schema).parquet(in.toString)
        .select(expr(s"${tsUsSql(schema)} div 3600000000").as("hour_bucket"),
          col("event_type"))
        .groupBy("hour_bucket", "event_type")
        .agg(count(lit(1)).as("n"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("complete")
        .option("checkpointLocation", freshDir("graft_t01_ck").toString)
        .format("memory").queryName(sink)
        .start()
      q.awaitTermination()
      s.table(sink).orderBy("hour_bucket", "event_type")
    }),

    // T2: streaming gap-sessionization (flatMapGroupsWithState, event-time
    // timeout) must reproduce the batch ev01 lag/gap/running-sum semantics
    // EXACTLY — same oracle SQL. The stream runs in a scaled time domain
    // (1 stream-ms = 1 real µs; gap and lateness scaled identically) so the
    // ms-granular state arithmetic compares µs-exactly against the oracle.
    "t02_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val gapUs = 1800L * 1000000L
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("value"))
      val maxUs = ev.agg(max("ts_us")).head.getLong(0)
      val in = freshDir("graft_t02_in")
      val evScaled = ev.select(col("user_id"),
        expr("timestamp_millis(ts_us)").as("ts"), col("value"))
      writeWave(evScaled, in, "w1.parquet", mtimeSec = 1000)
      val sentinelSchema = evScaled.schema
      def sentinel(tsUs: Long): DataFrame =
        s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(-1L, new java.sql.Timestamp(tsUs), 0.0)),
          sentinelSchema)
      writeWave(sentinel(maxUs + 10 * gapUs), in, "w2.parquet", mtimeSec = 2000)
      writeWave(sentinel(maxUs + 20 * gapUs), in, "w3.parquet", mtimeSec = 3000)

      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("value", DoubleType)))
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in.toString)
        .as[StreamingSessionize.Event]
      // gapSeconds in the scaled domain: 1 800 000 scaled-seconds = the
      // real 1800 s gap expressed in µs-as-ms
      val sessions = StreamingSessionize.sessionize(s, stream,
        gapSeconds = 1800000L, lateness = "0 seconds")
      val sink = freshName("t02_sink")
      val q = sessions.toDF().writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", freshDir("graft_t02_ck").toString)
        .format("memory").queryName(sink)
        .start()
      q.awaitTermination()
      s.table(sink).where(col("user_id") >= 0L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .orderBy("user_id")
    }),

    // T1 (ingest side): streaming drain into a TRANSACTIONAL lake table —
    // readStream -> stateless transform -> foreachBatch append through the
    // commit protocol — then read the committed table back. The oracle is
    // the same projection straight off the source: the streaming hop and
    // the table layer must be lossless.
    "t03_stream_lake_drain" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$dir/events.parquet"
      val schema = s.read.parquet(path).schema
      val in = freshDir("graft_t03_in")
      Files.createSymbolicLink(in.resolve("events.parquet"),
        java.nio.file.Paths.get(path))
      val tableLoc = freshDir("graft_t03_tbl").resolve("events_lake").toString
      StreamingIngest.drainToTable(s, in.toString, schema, tableLoc,
        freshDir("graft_t03_ck").toString,
        transform = _.select(col("event_id"),
          expr(tsUsSql(schema)).as("ts_us"), col("user_id"),
          col("event_type"), col("value")))
      graft.tables.LakeTable.load(s, tableLoc).read().orderBy("event_id")
    }),

    // T4+T5: the medallion hop — events land in lake table A (batch
    // append), then drainTableToTable streams A's commits (snapshot-id
    // offsets over the commit log), filters/projects, and upserts each
    // micro-batch into table B through the copy-on-write merge. The oracle
    // is the same filter straight off the source.
    "t04_stream_table_drain" -> ((s, dir) => {
      val src = graft.Tables.events(s, dir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
      val aLoc = freshDir("graft_t04").resolve("bronze").toString
      val bLoc = freshDir("graft_t04").resolve("silver").toString
      graft.tables.LakeTable.ensure(s, aLoc, src.schema).write(src, "append")
      StreamingIngest.drainTableToTable(s, aLoc, bLoc,
        freshDir("graft_t04_ck").toString, mergeOn = Seq("event_id"),
        transform = _.where(col("user_id") % 2 === 0)
          .select(col("event_id"), col("ts_us"), col("user_id"), col("value")))
      graft.tables.LakeTable.load(s, bLoc).read().orderBy("event_id")
    }),

    // T7: watermarked stream-stream interval join — impressions (even
    // event ids) joined to the clicks (odd ids) landing within the
    // attribution window. Both sides are one AvailableNow batch; an inner
    // join emits on match, so the output is deterministic and the oracle is
    // the plain SQL interval join.
    "t05_stream_stream_join" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val impDir = freshDir("graft_t05_imp")
      val clkDir = freshDir("graft_t05_clk")
      writeWave(ev.where(col("event_id") % 2 === 0)
        .select(expr("event_id div 2").as("imp_id"), col("user_id"),
          expr("timestamp_micros(ts_us)").as("imp_ts")),
        impDir, "imp.parquet", mtimeSec = 1000)
      writeWave(ev.where(col("event_id") % 2 === 1)
        .select(col("event_id").as("click_id"),
          expr("event_id div 2").as("imp_id"),
          expr("timestamp_micros(ts_us)").as("click_ts")),
        clkDir, "clk.parquet", mtimeSec = 1000)
      def streamOf(p: Path, sample: DataFrame): DataFrame =
        s.readStream.schema(sample.schema).parquet(p.toString)
      val imp = streamOf(impDir, s.read.parquet(impDir.toString))
      val clk = streamOf(clkDir, s.read.parquet(clkDir.toString))
      val joined = StreamJoin.attributedClicks(imp, clk, withinSeconds = 3600L)
      val sink = freshName("t05_sink")
      val q = joined
        .select(col("imp_id"), col("user_id"),
          unix_micros(col("imp_ts")).as("imp_us"),
          col("click_id"), unix_micros(col("click_ts")).as("click_us"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", freshDir("graft_t05_ck").toString)
        .format("memory").queryName(sink)
        .start()
      q.awaitTermination()
      s.table(sink).orderBy("imp_id", "click_id")
    }),

    // T6: the streaming LSH admission gate — new docs arrive as a parquet
    // wave, the resident index of the accepted corpus is probed per
    // micro-batch, verified matches merge into a quarantine lake table.
    // One AvailableNow batch makes the output deterministic; the oracle is
    // d30's (cap over the indexed side only) since the resident and
    // persisted probes are the same asymmetric band join. Oracle SQL lives
    // in SparkEntry (needs its minhash CTE builder).
    "t07_stream_dedup_gate" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val newDocs = docs.where(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      val in = freshDir("graft_t07_in")
      writeWave(newDocs, in, "batch.parquet", mtimeSec = 1000)
      val qLoc = freshDir("graft_t07_tbl").resolve("quarantine").toString
      StreamingDedup.gateToTable(s, in.toString, newDocs.schema,
        indexed = docs.where(col("doc_id") % 10 =!= 0),
        matchesLocation = qLoc,
        checkpointDir = freshDir("graft_t07_ck").toString)
      graft.tables.LakeTable.load(s, qLoc).read().orderBy("doc_id")
    }),

    // T8: the streaming QUALITY admission gate — the d37 perplexity filter
    // in front of a continuously-growing corpus: new docs arrive as a
    // parquet wave, each micro-batch is scored against the resident
    // quantized LM (trained once on the accepted corpus), and docs above
    // the bits-per-kilotoken threshold merge into a rejects lake table.
    // One AvailableNow batch makes the output deterministic; the oracle
    // recomputes the full quantized scoring in SQL (train = doc_id%10!=0,
    // scored = %10==0, threshold 4860).
    "t08_stream_quality_gate" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val newDocs = docs.where(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      val in = freshDir("graft_t08_in")
      writeWave(newDocs, in, "batch.parquet", mtimeSec = 1000)
      val rLoc = freshDir("graft_t08_tbl").resolve("rejects").toString
      StreamingQuality.gateToTable(s, in.toString, newDocs.schema,
        trainDocs = docs.where(col("doc_id") % 10 =!= 0),
        maxBitsPerKiloToken = 4860L,
        matchesLocation = rLoc,
        checkpointDir = freshDir("graft_t08_ck").toString)
      if (graft.tables.LakeTable.exists(rLoc))
        graft.tables.LakeTable.load(s, rLoc).read().orderBy("doc_id")
      else // a wave with zero rejects never creates the table
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType.fromDDL("doc_id LONG, n_tokens LONG, bits LONG, " +
            "bits_per_kilotoken LONG"))
    }),

    // T9: the streaming CLASSIFIER admission gate — the d40 Naive Bayes
    // model (trained once on the labeled accepted corpus, lang='en' as
    // the positive class) scores each arriving micro-batch; docs the
    // model rejects (quantized log-odds <= 0) merge into a rejects lake
    // table. One AvailableNow batch makes the output deterministic; the
    // oracle recomputes the full quantized scoring in SQL (train =
    // doc_id%10!=0, scored = the %10==0 arrivals).
    "t09_stream_classifier_gate" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val newDocs = docs.where(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      val in = freshDir("graft_t09_in")
      writeWave(newDocs, in, "batch.parquet", mtimeSec = 1000)
      val rLoc = freshDir("graft_t09_tbl").resolve("rejects").toString
      StreamingClassifier.gateToTable(s, in.toString, newDocs.schema,
        trainDocs = docs.where(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("y")),
        matchesLocation = rLoc,
        checkpointDir = freshDir("graft_t09_ck").toString)
      if (graft.tables.LakeTable.exists(rLoc))
        graft.tables.LakeTable.load(s, rLoc).read().orderBy("doc_id")
      else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType.fromDDL("doc_id LONG, n_tokens LONG, score_bits LONG"))
    }),

    // T11: streaming WARC ingest — the Common Crawl front door: warc.gz
    // shards arrive as a stream, each micro-batch's records explode
    // (CRC-verified gzip member walk + Content-Length framing + HTTP
    // split, m17's machinery) and MERGE into a lake table keyed on
    // (shard, record). One AvailableNow batch over the %10==0 arrivals;
    // the oracle restates m17's analytic rows for that slice.
    "t11_stream_warc_ingest" -> ((s, dir) => {
      import s.implicits._
      val arrivals = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = (1 + id % 3).toInt
          val recs =
            Seq(graft.operators.WarcShard.encodeRecord("warcinfo", None,
              "software: graft\r\n".getBytes("ISO-8859-1"))) ++
            (1 to k).map { j =>
              val n = (20 + (id + 7 * j) % 50).toInt
              val body = Array.tabulate(n)(i =>
                ((id * 3 + j * 5 + i) % 64 + 32).toByte)
              val (st, rs) = if (j % 2 == 1) (200, "OK") else (404, "NO")
              graft.operators.WarcShard.encodeRecord("response",
                Some(s"http://h${id % 40}.example/p$j"),
                graft.operators.WarcShard.encodeHttpResponse(st, rs, body))
            }
          (id, graft.operators.WarcShard.encodeWarcGz(recs))
        }).toDF("shard_id", "payload")
      val in = freshDir("graft_t11_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t11_tbl").resolve("records").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t11_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "rec_idx"),
        batchTransform = batch =>
          graft.operators.WarcShard.explodeRecords(batch.sparkSession, batch)
            .toDF())
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "rec_idx")
    }),

    // T18: streaming WET extraction — D64 as continuous ingest (the
    // production Common Crawl shape: warc.gz shards arrive for weeks;
    // extraction cannot be a batch job). Each micro-batch's shards run
    // the WHOLE fused pipeline — CRC-verified WARC walk, HTTP-200 gate,
    // charset ladder, boilerplate classifier — and the clean text MERGES
    // into a lake table keyed on (shard, rec): AvailableNow + checkpoint
    // = exactly-once effective text extraction. Oracle: d64's analytic
    // row for every %10==0 arrival.
    "t18_stream_wet_extract" -> ((s, dir) => {
      import s.implicits._
      val arrivals = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          import java.nio.charset.StandardCharsets._
          val html = "<html><head><script>var trap = \"<p>no</p>\";</script>" +
            "<style>p{color:red}</style></head><body>" +
            "<nav><a href=\"/\">Home page</a> <a href=\"/about\">About this site</a></nav>" +
            "<h1>Tiny</h1><p>Paragraph one: " +
            text.substring(0, math.min(30, text.length)) +
            "</p><div><a href=\"/ad\">sponsored advertisement placement</a></div>" +
            "<p>Paragraph two says " +
            text.substring(math.min(30, text.length),
              math.min(46, text.length)) +
            " &amp; more words here</p></body></html>"
          val raw = (id % 5) match {
            case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
              html.getBytes(UTF_8)
            case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++
              html.getBytes(UTF_16LE)
            case 2 => Array[Byte](0xfe.toByte, 0xff.toByte) ++
              html.getBytes(UTF_16BE)
            case _ => html.getBytes(UTF_8)
          }
          val W = graft.operators.WarcShard
          val recs = Seq(
            W.encodeRecord("warcinfo", None,
              "software: graft\r\n".getBytes("ISO-8859-1")),
            W.encodeRecord("response",
              Some(s"http://h${id % 40}.example/main"),
              W.encodeHttpResponse(200, "OK", raw)),
            W.encodeRecord("response",
              Some(s"http://h${id % 40}.example/gone"),
              W.encodeHttpResponse(404, "NO",
                "not here".getBytes("ISO-8859-1"))))
          (id, W.encodeWarcGz(recs))
        }).toDF("shard_id", "payload")
      val in = freshDir("graft_t18_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t18_tbl").resolve("text").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t18_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "rec_idx"),
        batchTransform = batch =>
          graft.operators.CrawlFrontDoor.wetExtract(batch.sparkSession, batch))
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "rec_idx")
    }),

    // T13: streaming Arrow shard ingest — the published-dataset front
    // door (HF-datasets directories arrive shard by shard): each
    // micro-batch's Arrow IPC payloads explode through M13's reader
    // (per-payload allocator discipline, schema contract, batch-exact row
    // indices) and MERGE into a lake table keyed on (shard, row). One
    // AvailableNow batch over the %10==0 arrivals; the oracle restates
    // m20's analytic rows for that slice.
    "t13_stream_arrow_ingest" -> ((s, dir) => {
      import s.implicits._
      val arrivals = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = (2 + id % 3).toInt
          val rows = (0 until k).map { r =>
            (id * 10 + r, s"l${(id + r) % 4}", (id % 97).toDouble + r * 0.25)
          }
          (id, graft.operators.ArrowShard.encodeShard(rows, batchRows = 2))
        }).toDF("shard_id", "payload")
      val in = freshDir("graft_t13_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t13_tbl").resolve("records").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t13_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "row_idx"),
        batchTransform = batch =>
          graft.operators.ArrowShard.explodeRows(batch.sparkSession, batch)
            .toDF())
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "row_idx")
    }),

    // T14: streaming JSONL shard ingest — the MOST COMMON corpus front
    // door (jsonl.gz/jsonl.zst directories arriving shard by shard, the
    // Pile/C4/Dolma layout): each micro-batch's payloads explode through
    // M14's streaming-decompress line walk, parse in the SQL layer
    // (from_json — a malformed line is a null-fielded row, visible never
    // fatal), and MERGE into a lake table keyed on (shard, line). One
    // AvailableNow batch over the %10==0 arrivals; the oracle restates
    // m25's analytic rows for that slice.
    "t14_stream_jsonl_ingest" -> ((s, dir) => {
      import s.implicits._
      val arrivals = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = (2 + id % 3).toInt
          val lines = (0 until k).map { r =>
            s"""{"rec":${id * 10 + r},"label":"l${(id + r) % 4}","value":${(id % 97).toDouble + r * 0.25}}"""
          } ++ (if (id % 5 == 0) Seq("{oops") else Seq.empty)
          (id, if (id % 2 == 0) graft.operators.JsonlShard.encodeGz(lines)
               else graft.operators.JsonlShard.encodeZst(lines))
        }).toDF("shard_id", "payload")
      val in = freshDir("graft_t14_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t14_tbl").resolve("records").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t14_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "line_idx"),
        batchTransform = batch =>
          graft.operators.JsonlShard
            .explodeLines(batch.sparkSession, batch).toDF()
            .select(col("shard_id"), col("line_idx"),
              from_json(col("line"), org.apache.spark.sql.types.StructType
                .fromDDL("rec LONG, label STRING, value DOUBLE")).as("j"))
            .select(col("shard_id"), col("line_idx"),
              col("j.rec").as("rec"), col("j.label").as("label"),
              col("j.value").as("value")))
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "line_idx")
    }),

    // T15: streaming TFRecord shard ingest — the TFDS/TPU-pipeline front
    // door (directories of *.tfrecord.gz arriving shard by shard),
    // completing the streaming form for every exploded container (WARC
    // t11, Arrow t13, JSONL t14, TFRecord t15): each micro-batch's
    // payloads walk M15's CRC-verifying record reader and MERGE into a
    // lake table keyed on (shard, rec). The %10==0 arrival slice is all
    // even (gzip) and all %5==0 (record 1's data CRC corrupted -> skipped
    // with its index slot preserved), so the corruption contract is
    // itself under the streaming oracle.
    "t15_stream_tfrecord_ingest" -> ((s, dir) => {
      import s.implicits._
      val arrivals = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = (2 + id % 3).toInt
          val recs = (0 until k).map { r =>
            val sz = (10 + (id + r * 7) % 90).toInt
            Array.tabulate(sz)(i => ((id * 3 + r * 5 + i) % 256).toByte)
          }
          var framed = graft.operators.TfRecordShard.encodeShard(recs)
          if (id % 5 == 0)
            framed = graft.operators.TfRecordShard.corruptRecordData(framed, 1)
          if (id % 7 == 0) framed = framed ++ Array.fill(12)(0xaa.toByte)
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(framed); gz.close()
          (id, bos.toByteArray)
        }).toDF("shard_id", "payload")
      val in = freshDir("graft_t15_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t15_tbl").resolve("records").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t15_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "rec_idx"),
        batchTransform = batch => {
          import batch.sparkSession.implicits._
          graft.operators.TfRecordShard
            .explodeRecords(batch.sparkSession, batch)
            .map(r => (r.shard_id, r.rec_idx, r.record.length.toLong,
              r.record.foldLeft(0L)((a, b) => a + (b & 0xff))))
            .toDF("shard_id", "rec_idx", "size_bytes", "byte_sum")
        })
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "rec_idx")
    }),

    // T17: streaming Avro OCF shard ingest — the Hadoop-era front door
    // (directories of *.avro arriving shard by shard), completing the
    // streaming form for every exploded container (WARC t11, Arrow t13,
    // JSONL t14, TFRecord t15, Avro t17): each micro-batch's payloads
    // walk M16's container reader (sync framing, nullable unions, raw
    // deflate) and MERGE into a lake table keyed on (shard, rec). The
    // arrival slice carries m30's null-label union rows, so the union
    // decode sits under the streaming oracle too.
    "t17_stream_avro_ingest" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{StringType => SStr}
      val contract = StructType(Seq(
        StructField("rec", LongType), StructField("label", SStr),
        StructField("value", DoubleType)))
      val arrivals = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = (2 + id % 3).toInt
          val rows = (0 until k).map { r =>
            org.apache.spark.sql.Row(id * 10 + r,
              if ((id + r) % 5 == 0) null else s"l${(id + r) % 4}",
              (id % 97).toDouble + r * 0.25)
          }
          (id, graft.operators.AvroShard.encodeShard(rows.iterator, contract,
            id, codec = if (id % 2 == 0) "null" else "deflate", blockRows = 2))
        }).toDF("shard_id", "payload")
      val in = freshDir("graft_t17_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t17_tbl").resolve("records").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t17_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "rec_idx"),
        batchTransform = batch =>
          graft.operators.AvroShard.explodeRowsAs(
            batch.sparkSession, batch, contract))
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "rec_idx")
    }),

    // T19: streaming tensor-shard ingest — the npz/safetensors front
    // door (embedding dumps arriving shard by shard), keeping the
    // streaming form true for EVERY exploded container (WARC t11, Arrow
    // t13, JSONL t14, TFRecord t15, Avro t17, WET t18, npz t19): each
    // micro-batch's npz payloads walk the ZIP member + npy header parse
    // and the per-array stats MERGE into a lake table keyed on
    // (shard, name). Oracle: m33's recomputation over the %5==0 arrival
    // slice (vec_id % 23 shards restricted to arriving vectors).
    "t19_stream_npz_ingest" -> ((s, dir) => {
      import s.implicits._
      val arrivals = s.read.parquet(s"$dir/embeddings.parquet")
        .where(col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .groupByKey(_._1 % 23)
        .mapGroups { (sid, it) =>
          import graft.operators.{NpyShard, SafetensorsShard}
          val vecs = it.toSeq.sortBy(_._1)
          val arrays = vecs.map { case (id, v) =>
            (s"v$id", "f4", Seq(v.length.toLong),
              SafetensorsShard.encodeF32(v))
          } :+ (("ids", "i8", Seq(vecs.size.toLong),
            SafetensorsShard.encodeI64(vecs.map(_._1).toArray)))
          (sid, NpyShard.encodeNpz(arrays))
        }.toDF("shard_id", "payload")
      val in = freshDir("graft_t19_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t19_tbl").resolve("tensors").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t19_ck").toString,
        writeMode = "merge", mergeOn = Seq("shard_id", "name"),
        batchTransform = batch =>
          graft.operators.NpyShard.explodeNpz(batch.sparkSession, batch))
      graft.tables.LakeTable.load(s, loc).read()
        .orderBy("shard_id", "name")
    }),

    // T16: streaming SEMANTIC decontamination gate — d55 as admission
    // control: the benchmark embeddings are RESIDENT (an eval suite,
    // small by contract — broadcast into each trigger); every arriving
    // batch of training vectors streams once through the codegen cosine
    // kernel and MERGES into a lake table with its benchmark hit count +
    // keep flag, keyed on vec_id. Completes the admission family's
    // modalities: surface near-dup (t06), perplexity (t08), classifier
    // (t09), host budget (t10), embedding space (t16).
    "t16_stream_semantic_decontaminate" -> ((s, dir) => {
      // Bench side pinned like d55's (the shared evalSlice helper — 10
      // vectors at every sf, VERDICT r13 #1): the gate's cost is
      // |arrivals| x |bench|, so a %-slice bench side would scale the
      // ratio quadratically by fixture exactly as in the batch form.
      // Using the SAME helper as d55/d56/e18/e19 puts this side under
      // FixtureScaleSpec's cardinality contract (t16 is declared in
      // SparkEntry.contractSmallSides).
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val bench = graft.SparkEntry.evalSlice(emb)
      val arrivals = emb
        .where(col("vec_id") % 10 === 0 && col("vec_id") % 50 =!= 0)
        .select(col("vec_id"), col("embedding"))
      val in = freshDir("graft_t16_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val loc = freshDir("graft_t16_tbl").resolve("scored").toString
      StreamingIngest.drainToTable(s, in.toString, arrivals.schema, loc,
        freshDir("graft_t16_ck").toString,
        writeMode = "merge", mergeOn = Seq("vec_id"),
        batchTransform = batch =>
          graft.operators.Similarity.semanticDecontaminate(batch, bench, 0.30))
      graft.tables.LakeTable.load(s, loc).read().orderBy("vec_id")
    }),

    // T10: the streaming per-host BUDGET admission gate — d43's host cap
    // with the running per-host token total carried in
    // flatMapGroupsWithState state across micro-batches. One AvailableNow
    // batch processes each host best-first, so the oracle is the naive
    // per-host window rule over the arrivals.
    "t10_stream_host_budget" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val arrivals = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          concat(lit("h"), (col("doc_id") % 7).cast("string")).as("host"),
          graft.functions.TextFunctions.cleanTokens(col("text")).as("w"))
        .select(col("doc_id"), col("host"),
          size(col("w")).cast("long").as("n_tokens"),
          aggregate(col("w"), lit(0L),
            (acc, x) => acc + length(x).cast("long")).as("suml"))
        .select(col("doc_id"), col("host"),
          when(col("n_tokens") === 0L, 0L)
            .otherwise(expr("suml * 100 div n_tokens")).as("score"),
          col("n_tokens"))
      val in = freshDir("graft_t10_in")
      writeWave(arrivals, in, "batch.parquet", mtimeSec = 1000)
      val aLoc = freshDir("graft_t10_tbl").resolve("admitted").toString
      StreamingHostBudget.gateToTable(s, in.toString, arrivals.schema,
        budget = 300L, admittedLocation = aLoc,
        checkpointDir = freshDir("graft_t10_ck").toString)
      graft.tables.LakeTable.load(s, aLoc).read().orderBy("doc_id")
    }),

    // T12: streaming sequence packing — d46 as continuous ingest: two
    // arrival waves drain through the SAME checkpoint; the second wave
    // continues the concatenated token stream exactly where the first
    // ended (the base offset derives from the placed TABLE minus the
    // batch's own keys — replay-idempotent by construction, no side
    // state). The oracle states the naive global cumsum over
    // (arrival wave, doc_id) order.
    "t12_stream_sequence_pack" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.cleanTokens(col("text")))
            .cast("long").as("n"))
      val wave1 = docs.where(col("doc_id") % 3 =!= 0)
      val wave2 = docs.where(col("doc_id") % 3 === 0)
      val in = freshDir("graft_t12_in")
      val loc = freshDir("graft_t12_tbl").resolve("placed").toString
      val ck = freshDir("graft_t12_ck").toString
      writeWave(wave1, in, "wave1.parquet", mtimeSec = 1000)
      StreamingPack.packToTable(s, in.toString, wave1.schema, cap = 512L,
        placedLocation = loc, checkpointDir = ck)
      writeWave(wave2, in, "wave2.parquet", mtimeSec = 2000)
      StreamingPack.packToTable(s, in.toString, wave1.schema, cap = 512L,
        placedLocation = loc, checkpointDir = ck)
      graft.tables.LakeTable.load(s, loc).read().orderBy("doc_id")
    }),

    // T3: streaming exact dedup within the watermark — key state evicted
    // as the watermark advances; over one batch the surviving key set is
    // exactly DISTINCT.
    // T20: the streaming GOPHER admission gate — the published rule set
    // (d66's word-shaped composite AND d67's line-shaped rules) applied
    // to each arriving micro-batch; docs failing EITHER half merge into
    // a rejects lake table. Stateless per row (no resident model — the
    // cheapest admission gate, which is why production crawls run it
    // FIRST), planted line classes identical to d67's so the oracle is
    // analytic. One AvailableNow batch over the %10==0 arrivals.
    "t20_stream_gopher_gate" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val newDocs = docs.where(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      val in = freshDir("graft_t20_in")
      writeWave(newDocs, in, "batch.parquet", mtimeSec = 1000)
      val rLoc = freshDir("graft_t20_tbl").resolve("rejects").toString
      def gate(batch: DataFrame): DataFrame = {
        val l1 = substring(col("text"), 1, 20)
        val l2 = substring(col("text"), 21, 20)
        val l3 = substring(col("text"), 41, 20)
        val raw = when(col("doc_id") % 4 === 0,
            concat_ws("\n", l1, l2, l3, lit("closing line")))
          .when(col("doc_id") % 4 === 1,
            concat_ws("\n", l1, l1, l1, l1, l2))
          .when(col("doc_id") % 4 === 2,
            concat_ws("\n", concat(l1, lit("...")), concat(l2, lit("…")), l3))
          .otherwise(
            concat_ws("\n", concat(lit("• "), l1), concat(lit("- "), l2),
              concat(lit("* "), l3)))
        batch.select(col("doc_id"), TF.cleanTokens(raw).as("w"),
            TF.gopherLines(raw).as("ls"))
          .select(col("doc_id"), TF.gopherQualityOfTokens(col("w")).as("q"),
            TF.gopherLineRulesOfLines(col("ls")).as("lr"))
          .where(col("q.passed") === 0L || col("lr.passed") === 0L)
          .select(col("doc_id"), col("q.n_words"), col("q.mean_wlen_e2"),
            col("q.symbol_e4"), col("q.alpha_e4"), col("q.stop_count"),
            col("lr.n_lines"), col("lr.dup_line_e4"), col("lr.ellipsis_e4"),
            col("lr.bullet_e4"),
            col("q.passed").as("word_passed"),
            col("lr.passed").as("line_passed"))
      }
      StreamingIngest.drainToTable(s, in.toString, newDocs.schema, rLoc,
        freshDir("graft_t20_ck").toString, writeMode = "merge",
        mergeOn = Seq("doc_id"), batchTransform = gate)
      if (graft.tables.LakeTable.exists(rLoc))
        graft.tables.LakeTable.load(s, rLoc).read().orderBy("doc_id")
      else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType.fromDDL("doc_id LONG, n_words LONG, mean_wlen_e2 LONG, " +
            "symbol_e4 LONG, alpha_e4 LONG, stop_count LONG, n_lines LONG, " +
            "dup_line_e4 LONG, ellipsis_e4 LONG, bullet_e4 LONG, " +
            "word_passed LONG, line_passed LONG"))
    }),

    "t06_stream_dedup" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$dir/events.parquet"
      val schema = s.read.parquet(path).schema
      val in = freshDir("graft_t06_in")
      Files.createSymbolicLink(in.resolve("events.parquet"),
        java.nio.file.Paths.get(path))
      val sink = freshName("t06_sink")
      val q = StreamingIngest.dedupWithinWatermark(
          s.readStream.schema(schema).parquet(in.toString)
            .select(col("user_id"),
              expr(s"timestamp_micros(${tsUsSql(schema)})").as("ts")),
          "ts", "1 hour", Seq("user_id"))
        .select("user_id")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", freshDir("graft_t06_ck").toString)
        .format("memory").queryName(sink)
        .start()
      q.awaitTermination()
      s.table(sink).orderBy("user_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "t01_stream_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
           COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""",

    // identical text to the batch ev01 oracle: the streaming path must
    // reproduce batch sessionization row for row
    "t02_stream_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         lagged AS (
           SELECT user_id, ts_us,
                  LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
           FROM ev),
         flagged AS (
           SELECT user_id, ts_us,
                  CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM lagged),
         sess AS (
           SELECT user_id,
                  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM flagged)
         SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
         FROM sess GROUP BY user_id ORDER BY user_id""",

    "t03_stream_lake_drain" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         FROM events ORDER BY event_id""",

    "t04_stream_table_drain" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
         FROM events WHERE user_id % 2 = 0 ORDER BY event_id""",

    "t05_stream_stream_join" ->
      """WITH imp AS (SELECT event_id // 2 AS imp_id, user_id,
                             epoch_us(ts) AS imp_us
                      FROM events WHERE event_id % 2 = 0),
              clk AS (SELECT event_id AS click_id, event_id // 2 AS imp_id,
                             epoch_us(ts) AS click_us
                      FROM events WHERE event_id % 2 = 1)
         SELECT i.imp_id, i.user_id, i.imp_us, c.click_id, c.click_us
         FROM imp i JOIN clk c ON i.imp_id = c.imp_id
           AND c.click_us >= i.imp_us
           AND c.click_us <= i.imp_us + 3600000000
         ORDER BY i.imp_id, c.click_id""",

    "t06_stream_dedup" ->
      """SELECT DISTINCT user_id FROM events ORDER BY user_id""",

    // t20: both Gopher halves restated over the %10==0 arrivals with the
    // d67 line planting; rejects fail EITHER composite
    "t20_stream_gopher_gate" ->
      """WITH r AS (SELECT doc_id, CASE doc_id % 4
             WHEN 0 THEN concat_ws(chr(10), substr(text, 1, 20),
               substr(text, 21, 20), substr(text, 41, 20), 'closing line')
             WHEN 1 THEN concat_ws(chr(10), substr(text, 1, 20),
               substr(text, 1, 20), substr(text, 1, 20),
               substr(text, 1, 20), substr(text, 21, 20))
             WHEN 2 THEN concat_ws(chr(10), substr(text, 1, 20) || '...',
               substr(text, 21, 20) || chr(8230), substr(text, 41, 20))
             ELSE concat_ws(chr(10), chr(8226) || ' ' || substr(text, 1, 20),
               '- ' || substr(text, 21, 20), '* ' || substr(text, 41, 20))
             END AS raw
           FROM documents WHERE doc_id % 10 = 0),
         w AS (SELECT doc_id,
             [x for x in string_split(raw, ' ') if length(x) > 0] AS ws
           FROM r),
         wm AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(list_reduce(list_prepend(0, [length(x) for x in ws]),
               (a, b) -> a + b) AS BIGINT) AS total_chars,
             CAST(len([x for x in ws if regexp_matches(x, '[a-z]')])
               AS BIGINT) AS alpha_words,
             CAST(len([x for x in ws if NOT regexp_matches(x, '[a-z0-9]')])
               AS BIGINT) AS symbol_words,
             CAST(len([x for x in ws if x IN ('the','be','to','of','and',
               'that','have','with')]) AS BIGINT) AS stop_count
           FROM w),
         wf AS (SELECT doc_id, n_words,
             CAST(CASE WHEN n_words > 0 THEN total_chars * 100 // n_words
                  ELSE 0 END AS BIGINT) AS mean_wlen_e2,
             CAST(CASE WHEN n_words > 0 THEN symbol_words * 10000 // n_words
                  ELSE 0 END AS BIGINT) AS symbol_e4,
             CAST(CASE WHEN n_words > 0 THEN alpha_words * 10000 // n_words
                  ELSE 0 END AS BIGINT) AS alpha_e4,
             stop_count
           FROM wm),
         l AS (SELECT doc_id,
             [trim(x) for x in string_split(raw, chr(10))
              if trim(x) <> ''] AS ls
           FROM r),
         lm AS (SELECT doc_id,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_distinct(ls)) AS BIGINT) AS n_distinct,
             CAST(len([x for x in ls if ends_with(x, '...')
               OR ends_with(x, chr(8230))]) AS BIGINT) AS n_ell,
             CAST(len([x for x in ls
               if left(x, 1) IN ('-', '*', chr(8226))]) AS BIGINT) AS n_bul
           FROM l),
         lf AS (SELECT doc_id, n_lines,
             CAST(CASE WHEN n_lines > 0
                  THEN (n_lines - n_distinct) * 10000 // n_lines
                  ELSE 0 END AS BIGINT) AS dup_line_e4,
             CAST(CASE WHEN n_lines > 0 THEN n_ell * 10000 // n_lines
                  ELSE 0 END AS BIGINT) AS ellipsis_e4,
             CAST(CASE WHEN n_lines > 0 THEN n_bul * 10000 // n_lines
                  ELSE 0 END AS BIGINT) AS bullet_e4
           FROM lm),
         j AS (SELECT wf.doc_id, wf.n_words, wf.mean_wlen_e2, wf.symbol_e4,
             wf.alpha_e4, wf.stop_count, lf.n_lines, lf.dup_line_e4,
             lf.ellipsis_e4, lf.bullet_e4,
             CAST(CASE WHEN wf.n_words BETWEEN 5 AND 100000
                    AND wf.mean_wlen_e2 BETWEEN 300 AND 1000
                    AND wf.symbol_e4 < 1000 AND wf.alpha_e4 >= 8000
                    AND wf.stop_count >= 2 THEN 1 ELSE 0 END AS BIGINT)
               AS word_passed,
             CAST(CASE WHEN lf.dup_line_e4 <= 3000 AND lf.ellipsis_e4 <= 3000
                    AND lf.bullet_e4 <= 9000 THEN 1 ELSE 0 END AS BIGINT)
               AS line_passed
           FROM wf JOIN lf USING (doc_id))
         SELECT * FROM j WHERE word_passed = 0 OR line_passed = 0
         ORDER BY doc_id""",

    // t08: the d37 quantized scoring with train = doc_id%10!=0, scored =
    // the %10==0 arrivals, rejects = bits_per_kilotoken > 4860
    "t08_stream_quality_gate" ->
      """WITH toks AS (
           SELECT doc_id, (doc_id % 10 <> 0) AS train,
                  [x for x in string_split(text, ' ')
                   if length(x) > 0] AS w
           FROM documents),
         p2 AS (SELECT doc_id, train, pos, w[pos] AS cur,
                  CASE WHEN pos > 1 THEN w[pos-1] END AS prev
                FROM (SELECT doc_id, train,
                        unnest(range(1, len(w)+1)) AS pos, w FROM toks)),
         tr AS (SELECT * FROM p2 WHERE train),
         tstat AS (SELECT COUNT(*) AS t FROM tr),
         c1 AS (SELECT cur AS w, COUNT(*) AS c FROM tr GROUP BY 1),
         c2 AS (SELECT prev, cur, COUNT(*) AS c FROM tr
                WHERE prev IS NOT NULL GROUP BY 1, 2),
         sc AS (SELECT p.doc_id,
                  CASE WHEN p.pos = 1 THEN
                    CASE WHEN u.c IS NOT NULL
                         THEN (length(bin(s.t))-1) - (length(bin(u.c))-1)
                         ELSE (length(bin(s.t))-1) + 4 END
                  ELSE
                    CASE WHEN b.c IS NOT NULL
                         THEN (length(bin(up.c))-1) - (length(bin(b.c))-1)
                         WHEN u.c IS NOT NULL
                         THEN 3 + (length(bin(s.t))-1) - (length(bin(u.c))-1)
                         ELSE 3 + (length(bin(s.t))-1) + 4 END
                  END AS bits
                FROM p2 p
                LEFT JOIN c1 u ON u.w = p.cur
                LEFT JOIN c1 up ON up.w = p.prev
                LEFT JOIN c2 b ON b.prev = p.prev AND b.cur = p.cur
                CROSS JOIN tstat s
                WHERE NOT p.train),
         agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(bits) AS BIGINT) AS bits,
                   CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT)
                     AS bits_per_kilotoken
                 FROM sc GROUP BY 1)
         SELECT doc_id, n_tokens, bits, bits_per_kilotoken
         FROM agg WHERE bits_per_kilotoken > 4860 ORDER BY doc_id""",

    // t09: the d40 quantized NB scoring with train = doc_id%10!=0,
    // scored = the %10==0 arrivals, rejects = score_bits <= 0
    "t09_stream_classifier_gate" ->
      """WITH toks AS (
           SELECT doc_id, (doc_id % 10 <> 0) AS train, (lang = 'en') AS pos,
                  [x for x in string_split(text, ' ')
                   if length(x) > 0] AS w
           FROM documents),
         tok AS (SELECT doc_id, train, pos, unnest(w) AS w FROM toks),
         tr AS (SELECT * FROM tok WHERE train),
         cnt AS (SELECT w, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
                        SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
                 FROM tr GROUP BY 1),
         tot AS (SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS tp,
                        SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS tn FROM tr),
         nd AS (SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                       SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
                FROM toks WHERE train),
         sc AS (SELECT t.doc_id,
                  (length(bin(COALESCE(c.cp, 0) + 1)) - 1)
                  - (length(bin(COALESCE(c.cn, 0) + 1)) - 1)
                  + (length(bin(tt.tn)) - 1) - (length(bin(tt.tp)) - 1) AS b
                FROM tok t LEFT JOIN cnt c USING (w) CROSS JOIN tot tt
                WHERE NOT t.train),
         agg AS (SELECT doc_id, COUNT(*) AS nt, SUM(b) AS tb
                 FROM sc GROUP BY 1)
         SELECT d.doc_id,
           CAST(COALESCE(a.nt, 0) AS BIGINT) AS n_tokens,
           CAST((length(bin(n.np)) - 1) - (length(bin(n.nn)) - 1)
                + COALESCE(a.tb, 0) AS BIGINT) AS score_bits
         FROM documents d LEFT JOIN agg a USING (doc_id) CROSS JOIN nd n
         WHERE d.doc_id % 10 = 0
           AND (length(bin(n.np)) - 1) - (length(bin(n.nn)) - 1)
               + COALESCE(a.tb, 0) <= 0
         ORDER BY d.doc_id""",

    // t11: m17's analytic WARC rows restricted to the %10==0 arrivals
    // (no request records in the streamed shards)
    "t11_stream_warc_ingest" ->
      """WITH d AS (SELECT doc_id AS id, 1 + doc_id % 3 AS k
                    FROM documents WHERE doc_id % 10 = 0),
         info AS (
           SELECT id AS shard_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
             CAST(NULL AS VARCHAR) AS target_uri, 17 AS content_length,
             CAST(NULL AS BIGINT) AS http_status,
             17 AS body_len, 1520 AS body_sum
           FROM d),
         rj AS (SELECT id, k, unnest(range(1, k + 1)) AS j FROM d),
         rn AS (SELECT id, j, 20 + (id + 7 * j) % 50 AS n FROM rj),
         resp AS (
           SELECT id AS shard_id, j AS rec_idx, 'response' AS warc_type,
             'http://h' || (id % 40) || '.example/p' || j AS target_uri,
             45 + n AS content_length,
             CASE WHEN j % 2 = 1 THEN 200 ELSE 404 END AS http_status,
             n AS body_len,
             (SELECT SUM((id * 3 + j * 5 + i.r) % 64 + 32)
              FROM range(0, 70) i(r) WHERE i.r < n) AS body_sum
           FROM rn)
         SELECT shard_id, CAST(rec_idx AS BIGINT) AS rec_idx, warc_type,
           target_uri, CAST(content_length AS BIGINT) AS content_length,
           CAST(http_status AS BIGINT) AS http_status,
           CAST(body_len AS BIGINT) AS body_len,
           CAST(body_sum AS BIGINT) AS body_sum
         FROM (SELECT * FROM info UNION ALL SELECT * FROM resp)
         ORDER BY shard_id, rec_idx""",

    // t13: m20's analytic Arrow rows restricted to the %10==0 arrivals
    "t13_stream_arrow_ingest" ->
      """WITH d AS (SELECT doc_id AS id, 2 + doc_id % 3 AS k
                    FROM documents WHERE doc_id % 10 = 0),
         r AS (SELECT id, unnest(range(0, k)) AS r FROM d)
         SELECT id AS shard_id, CAST(r AS BIGINT) AS row_idx,
           CAST(id * 10 + r AS BIGINT) AS rec_id,
           'l' || ((id + r) % 4) AS label,
           CAST((id % 97) + r * 0.25 AS DOUBLE) AS value
         FROM r ORDER BY shard_id, row_idx""",

    // t14: m25's analytic JSONL rows restricted to the %10==0 arrivals
    // (the %5==0 malformed tail line surfaces as a null-fielded row)
    "t14_stream_jsonl_ingest" ->
      """WITH d AS (SELECT doc_id AS id, 2 + doc_id % 3 AS k
                    FROM documents WHERE doc_id % 10 = 0),
         good AS (SELECT id, unnest(range(0, k)) AS r, k FROM d),
         g AS (SELECT id AS shard_id, CAST(r AS BIGINT) AS line_idx,
             CAST(id * 10 + r AS BIGINT) AS rec,
             'l' || ((id + r) % 4) AS label,
             CAST((id % 97) + r * 0.25 AS DOUBLE) AS value
           FROM good),
         bad AS (SELECT id AS shard_id, CAST(k AS BIGINT) AS line_idx,
             CAST(NULL AS BIGINT) AS rec, CAST(NULL AS VARCHAR) AS label,
             CAST(NULL AS DOUBLE) AS value
           FROM d WHERE id % 5 = 0)
         SELECT * FROM (SELECT * FROM g UNION ALL SELECT * FROM bad)
         ORDER BY shard_id, line_idx""",

    // t15: m26's analytic TFRecord rows restricted to the %10==0 arrivals
    // (every arrival is %5==0, so record 1 is always the preserved gap;
    // the %7==0 trailing garbage stops the walk after the real records)
    "t15_stream_tfrecord_ingest" ->
      """WITH m AS (
           SELECT d.doc_id AS shard_id, j.r AS r,
             10 + (d.doc_id + j.r * 7) % 90 AS sz
           FROM documents d CROSS JOIN range(0, 5) j(r)
           WHERE d.doc_id % 10 = 0
             AND j.r < 2 + d.doc_id % 3
             AND NOT (d.doc_id % 5 = 0 AND j.r = 1)
         )
         SELECT m.shard_id, CAST(m.r AS BIGINT) AS rec_idx,
           CAST(m.sz AS BIGINT) AS size_bytes,
           CAST((SELECT SUM((m.shard_id * 3 + m.r * 5 + i.r) % 256)
                 FROM range(0, 110) i(r) WHERE i.r < m.sz) AS BIGINT)
             AS byte_sum
         FROM m ORDER BY shard_id, rec_idx""",

    // t18: d64's analytic WET row for every %10==0 arrival
    "t18_stream_wet_extract" ->
      """WITH b AS (SELECT doc_id,
           trim(regexp_replace('Paragraph one: ' || substr(text, 1, 30),
             ' +', ' ', 'g')) AS p1,
           trim(regexp_replace('Paragraph two says ' || substr(text, 31, 16)
             || ' & more words here', ' +', ' ', 'g')) AS p2
         FROM documents WHERE doc_id % 10 = 0)
         SELECT doc_id AS shard_id, CAST(1 AS BIGINT) AS rec_idx,
           'http://h' || (doc_id % 40) || '.example/main' AS target_uri,
           p1 || chr(10) || p2 AS main_text,
           CAST(5 AS BIGINT) AS n_blocks, CAST(2 AS BIGINT) AS n_content
         FROM b ORDER BY shard_id""",

    // t19: m33's stats recomputation over the %5==0 arrival slice
    "t19_stream_npz_ingest" ->
      """WITH e AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
         v AS (SELECT vec_id % 23 AS shard_id, 'v' || vec_id AS name,
             'f4' AS descr, CAST(1 AS BIGINT) AS n_dims,
             CAST(len(embedding) AS BIGINT) AS n_elems,
             list_reduce([CAST(x AS DOUBLE) for x in embedding],
               (a, b) -> a + b) AS sum_value,
             CAST(list_min(embedding) AS DOUBLE) AS min_value,
             CAST(list_max(embedding) AS DOUBLE) AS max_value
           FROM e),
         i AS (SELECT vec_id % 23 AS shard_id, 'ids' AS name,
             'i8' AS descr, CAST(1 AS BIGINT) AS n_dims,
             COUNT(*) AS n_elems, CAST(SUM(vec_id) AS DOUBLE) AS sum_value,
             CAST(MIN(vec_id) AS DOUBLE) AS min_value,
             CAST(MAX(vec_id) AS DOUBLE) AS max_value
           FROM e GROUP BY 1)
         SELECT * FROM (SELECT * FROM v UNION ALL SELECT * FROM i)
         ORDER BY shard_id, name""",

    // t17: m30's analytic Avro rows restricted to the %10==0 arrivals
    "t17_stream_avro_ingest" ->
      """WITH d AS (SELECT doc_id AS id, 2 + doc_id % 3 AS k
                    FROM documents WHERE doc_id % 10 = 0),
         g AS (SELECT id, unnest(range(0, k)) AS r FROM d)
         SELECT id AS shard_id, CAST(r AS BIGINT) AS rec_idx,
           CAST(id * 10 + r AS BIGINT) AS rec,
           CASE WHEN (id + r) % 5 = 0 THEN NULL
                ELSE 'l' || ((id + r) % 4) END AS label,
           CAST((id % 97) + r * 0.25 AS DOUBLE) AS value
         FROM g ORDER BY shard_id, rec_idx""",

    // t16: d55's cosine rule over the %10==0 (non-benchmark) arrivals
    "t16_stream_semantic_decontaminate" -> {
      def dot(a: String, b: String) =
        s"list_reduce([CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE) " +
          s"for x in list_zip($a,$b)], (p,q) -> p+q)"
      def cos(a: String, b: String) =
        s"ROUND(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})), 6)"
      s"""WITH b AS (SELECT vec_id AS bench_id, embedding AS b_emb
                     FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 500),
         c AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 10 = 0 AND vec_id % 50 <> 0),
         h AS (SELECT c.vec_id, COUNT(*) AS n_hits
               FROM c JOIN b
                 ON ${cos("c.embedding", "b.b_emb")} >= 0.30
               GROUP BY 1)
         SELECT c.vec_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(CASE WHEN h.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS kept
         FROM c LEFT JOIN h ON c.vec_id = h.vec_id
         ORDER BY c.vec_id"""
    },

    // t10: d43's per-host prefix rule over the %10==0 arrivals, budget 300
    "t10_stream_host_budget" ->
      """WITH toks AS (
           SELECT doc_id, 'h' || (doc_id % 7) AS host,
                  [x for x in string_split(text, ' ')
                   if length(x) > 0] AS w
           FROM documents WHERE doc_id % 10 = 0),
         d AS (SELECT doc_id, host,
                 CASE WHEN len(w) = 0 THEN 0
                      ELSE COALESCE(list_sum([length(x) for x in w]), 0)
                           * 100 // len(w) END AS score,
                 len(w) AS n_tokens
               FROM toks),
         c AS (SELECT d.*, SUM(n_tokens) OVER (PARTITION BY host
                 ORDER BY score DESC, doc_id) AS cum FROM d)
         SELECT doc_id, host, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum AS BIGINT) AS host_spent
         FROM c WHERE cum <= 300 ORDER BY doc_id"""
  )

  /** One wave = one parquet FILE with a pinned mtime, so
    * `maxFilesPerTrigger=1` yields one micro-batch per wave in wave order
    * (the file source orders by modification time). */
  private def writeWave(df: DataFrame, dir: Path, name: String,
                        mtimeSec: Long): Unit = {
    val stage = freshDir("graft_wave")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator()
    var src: Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    require(src != null, s"no parquet part written under $stage")
    val dst = dir.resolve(name)
    Files.move(src, dst)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000L))
  }

  private def freshName(prefix: String): String =
    prefix + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  private def freshDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }
}
