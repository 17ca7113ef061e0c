package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, when}
import graft.model.Page
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** WARC (Web ARChive, ISO 28500) source/sink — the Common-Crawl interchange
  * on-ramp for the north-rule page table. Reference semantics grafted: the
  * same "one self-describing document container in, typed rows out, one bad
  * record never kills the job" contract as the CityJSON source (S1/S2/P6),
  * applied to the format real crawl corpora actually arrive in.
  *
  * Supported layout (what Common Crawl publishes): a `.warc` file is a
  * sequence of WARC/1.0 (or 1.1) records — a version line, CRLF header
  * lines, a blank line, `Content-Length` block bytes, and a CRLF CRLF
  * separator. `WARC-Type: response` records carry an
  * `application/http; msgtype=response` block (HTTP status line + headers +
  * body = the page HTML); warcinfo/request/metadata records are skipped.
  * Files whose bytes start with the gzip magic are decompressed first —
  * including the member-per-record concatenated-gzip layout Common Crawl
  * uses (multi-member streams decode in one pass).
  *
  * Error isolation (P6 at the interchange boundary): a malformed record
  * yields one error row (file, byte offset in the decompressed stream,
  * reason) and the parser RESYNCS at the next `WARC/1.` magic, so the
  * records before and after a corrupt region all survive. A corrupt file
  * never fails the distributed read.
  *
  * Scale shape: `spark.read.format("binaryFile")` yields one task per WARC
  * file — exactly how production crawl jobs parallelize (Common Crawl
  * ships ~10⁵ ~1 GiB files per snapshot; per-file tasks at 10⁵ parallelism,
  * no splitting needed because gzip members make mid-file splits useless
  * anyway). Parsing is narrow (zero shuffles); downstream stages see the
  * same (url, warc_ts, html) rows the Iceberg page table carries.
  */
object Warc {

  /** A parsed response record. `text`/`lang` are downstream concerns (the
    * extractor/langid stages) — WARC carries only the capture itself. */
  final case class WarcPage(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte])

  /** One malformed record: where it started and why it failed. */
  final case class WarcError(file: String, offset: Long, reason: String)

  private val tsFmt = java.time.format.DateTimeFormatter.ISO_INSTANT

  // ---------------------------------------------------------------- writer

  /** Serialize one response record (WARC/1.0, CRLF framing, HTTP block). */
  def record(url: String, ts: java.sql.Timestamp, html: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n").getBytes(US_ASCII) ++ html
    // WARC named fields are UTF-8 (ISO 28500 §4) — a non-ASCII target URI
    // must survive byte-exactly, not collapse to '?'
    val headers = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: ${tsFmt.format(ts.toInstant)}\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(UTF_8)
    headers ++ http ++ "\r\n\r\n".getBytes(US_ASCII)
  }

  /** One gzip member (the Common-Crawl member-per-record convention). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Write a page Dataset as member-per-record gzipped WARC files, one file
    * per input partition (`part-<id>.warc.gz` under `dir`), through the
    * Hadoop FileSystem API — the sink targets any scheme the session can
    * reach (`file:`, HDFS, S3A), like every other sink in the repo. The
    * session's Hadoop conf is captured at the driver (SerializableConfig —
    * public in Spark 4) so executor tasks resolve the filesystem with the
    * caller's credentials/settings, not task-local defaults.
    *
    * Visibility protocol per partition file: write to an attempt-private
    * dot-prefixed temp (invisible to Spark's hidden-file filter, so a
    * concurrent reader of `dir` never sees a torn file), close, then
    * rename — a speculative or retried attempt can never interleave bytes
    * with another attempt writing the same partition file, and a committed
    * file is never deleted (first attempt wins). Corollary: partition
    * files are immutable once committed — re-running a job into an
    * already-populated `dir` keeps the existing files; write to a fresh
    * directory (or clean first) to regenerate. */
  def write(pages: org.apache.spark.sql.Dataset[Page], dir: String,
      prefix: String = "part"): Unit = {
    val spark = pages.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(conf.value).mkdirs(dirPath)
    pages.foreachPartition { (it: Iterator[Page]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val d = new org.apache.hadoop.fs.Path(dir)
        val fs = d.getFileSystem(conf.value)
        val dst = new org.apache.hadoop.fs.Path(d, f"$prefix-${tc.partitionId()}%05d.warc.gz")
        val tmp = new org.apache.hadoop.fs.Path(d, s".${dst.getName}.attempt-${tc.taskAttemptId()}")
        val out = new java.io.BufferedOutputStream(fs.create(tmp, true))
        try it.foreach(p => out.write(gzipMember(record(p.url, p.warc_ts, p.html))))
        finally out.close()
        // FIRST-attempt-wins: attempts write identical bytes, so a loser
        // discards its temp and a committed file is never deleted. The
        // exists-check BEFORE the rename (r7 advice fix) is what enforces
        // it on filesystems whose rename OVERWRITES an existing dst
        // (RawLocalFileSystem / POSIX rename(2), some object stores) —
        // relying on rename-refuses-overwrite let a slow retried attempt
        // silently replace the committed file. The residual exists→rename
        // race is benign for exactly the identical-bytes reason; a
        // transactional commit needs the catalog seam (Iceberg).
        if (fs.exists(dst)) {
          fs.delete(tmp, false)
        } else if (!fs.rename(tmp, dst)) {
          require(fs.exists(dst),
            s"rename $tmp -> $dst failed and no committed file exists")
          fs.delete(tmp, false)
        }
        ()
      }
    }
  }

  // ---------------------------------------------------------------- parser

  private def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompression guard: crawl data is untrusted, and a gzip bomb (a few
    * KiB expanding to gigabytes) would otherwise OOM the executor mid-task.
    * The cap MUST sit below the JVM's ~2 GiB byte-array ceiling — a larger
    * "guard" can never fire cleanly because the backing array throws
    * OutOfMemoryError (not catchable as NonFatal) first. Exceeding it is a
    * clean per-FILE error row, never a dead executor; a deployment
    * ingesting full ~1 GiB-compressed Common Crawl segments (≈5 GiB
    * decompressed) should split per gzip member instead of raising it. */
  val MaxDecompressedBytes: Long = 1L << 30

  /** Decompress a (possibly multi-member) gzip stream in one pass, bounded
    * by `max` decompressed bytes. */
  private[sources] def gunzipAll(b: Array[Byte],
      max: Long = MaxDecompressedBytes): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(b.length.toLong * 4, 1L << 20).toInt)
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        require(total <= max,
          s"decompressed size exceeds the $max-byte bomb guard")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean =
    at + s.length <= b.length &&
      (0 until s.length).forall(i => b(at + i) == s.charAt(i).toByte)

  /** Next `WARC/1.` magic at/after `from` — the resync point. */
  private def resync(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i < b.length && !startsWith(b, i, "WARC/1.")) i += 1
    i
  }

  /** Parse every record in one (already decompressed) WARC stream.
    * Malformed records become [[WarcError]] rows; parsing continues at the
    * next record magic. */
  def parseAll(bytes0: Array[Byte], file: String,
      maxDecompressed: Long = MaxDecompressedBytes): (Vector[WarcPage], Vector[WarcError]) = {
    // a broken or bomb-guarded gzip stream is a FILE-level error row (there
    // is nothing to resync into), isolated like any record failure
    val b =
      try { if (isGzip(bytes0)) gunzipAll(bytes0, maxDecompressed) else bytes0 }
      catch { case e if scala.util.control.NonFatal(e) =>
        return (Vector.empty,
          Vector(WarcError(file, 0L, s"gzip: ${String.valueOf(e.getMessage)}")))
      }
    val pages = Vector.newBuilder[WarcPage]
    val errors = Vector.newBuilder[WarcError]
    var i = 0
    while (i < b.length) {
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i < b.length) {
        val start = i
        try {
          val (page, next) = parseRecord(b, start)
          page.foreach(pages += _)
          i = next
        } catch {
          case e if scala.util.control.NonFatal(e) =>
            errors += WarcError(file, start.toLong, String.valueOf(e.getMessage))
            i = resync(b, start + 1)
        }
      }
    }
    (pages.result(), errors.result())
  }

  /** One record starting at `at`: returns (page-if-response, next offset).
    * Every lookup is bounds-checked with an offset-bearing message (the
    * N-Triples discipline — a clean error, never an index exception). */
  private def parseRecord(b: Array[Byte], at: Int): (Option[WarcPage], Int) = {
    require(startsWith(b, at, "WARC/1."), s"missing WARC version magic at offset $at")
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      require(i + 1 < b.length, s"unterminated header line at offset $from")
      i
    }
    var i = lineEnd(at) + 2 // past the version line
    var target: String = null
    var date: String = null
    var wtype: String = null
    var clen: Long = -1L
    while (!startsWith(b, i, "\r\n")) {
      val e = lineEnd(i)
      val line = new String(b, i, e - i, UTF_8)
      val colon = line.indexOf(':')
      require(colon > 0, s"malformed WARC header '$line' at offset $i")
      val name = line.substring(0, colon).trim.toLowerCase
      val value = line.substring(colon + 1).trim
      name match {
        case "warc-target-uri" => target = value.stripPrefix("<").stripSuffix(">")
        case "warc-date" => date = value
        case "warc-type" => wtype = value
        case "content-length" =>
          clen = try value.toLong
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"non-numeric Content-Length '$value' at offset $i") }
        case _ => ()
      }
      i = e + 2
    }
    i += 2 // past the blank line
    require(clen >= 0, s"record at offset $at has no Content-Length")
    require(wtype != null, s"record at offset $at has no WARC-Type")
    require(i + clen <= b.length,
      s"truncated record at offset $at (Content-Length $clen overruns the stream)")
    val next = i + clen.toInt
    if (wtype.equalsIgnoreCase("response")) {
      require(target != null, s"response record at offset $at has no WARC-Target-URI")
      require(date != null, s"response record at offset $at has no WARC-Date")
      val ts = try java.sql.Timestamp.from(java.time.Instant.parse(date))
      catch { case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(s"unparseable WARC-Date '$date' at offset $at") }
      require(startsWith(b, i, "HTTP/"),
        s"response block at offset $i is not an HTTP message")
      // body starts after the HTTP header terminator, inside the block
      var h = i
      val blockEnd = i + clen.toInt
      while (h + 3 < blockEnd && !(b(h) == '\r' && b(h + 1) == '\n' &&
        b(h + 2) == '\r' && b(h + 3) == '\n')) h += 1
      require(h + 3 < blockEnd, s"HTTP block at offset $i has no header terminator")
      val body = java.util.Arrays.copyOfRange(b, h + 4, blockEnd)
      (Some(WarcPage(target, ts, body)), next)
    } else (None, next)
  }

  // ---------------------------------------------------------------- reader

  /** The shared (file, bytes) → lenient row stage of the batch and
    * streaming readers. */
  private def parseStage(in: org.apache.spark.sql.Dataset[(String, Array[Byte])]): DataFrame = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions(_.flatMap { case (file, bytes) =>
        val (pages, errs) = parseAll(bytes, file)
        pages.iterator.map(p =>
          (p.url, p.warc_ts, p.html, null: String, -1L, null: String)) ++
          errs.iterator.map(e =>
            (null: String, null: java.sql.Timestamp, null: Array[Byte],
              e.file, e.offset, e.reason))
      })
      .toDF("url", "warc_ts", "html", "_err_file", "_err_offset", "_error")
  }

  /** All records of every `.warc`/`.warc.gz` under `path`, leniently: good
    * response rows carry a null `_error`; malformed records carry the
    * failure (and null page columns). One task per file. */
  def readAll(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    parseStage(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])])
  }

  /** Streaming WARC ingestion: the binaryFile FILE STREAM over a crawl drop
    * directory — each trigger processes only files the streaming checkpoint
    * has not seen (exactly-once per file), parsed by the same lenient
    * per-record stage as the batch reader. This is the catch-up shape for
    * a live crawl: new segments land, `Trigger.AvailableNow` drains them,
    * the checkpoint remembers. Good rows only (the page-table shape) —
    * but NOT silently: every micro-batch reports an observed
    * `warc_ingest` metric (n_rows, n_errors), so a gzip-bombed or corrupt
    * segment consumed by the checkpoint surfaces in every
    * `StreamingQueryProgress` instead of streaming as zero rows with no
    * signal. For a durable record, [[readStreamAll]] exposes the same
    * lenient rows (error rows included) for a parallel error sink. */
  def readStream(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 8): DataFrame =
    readStreamAll(spark, path, maxFilesPerTrigger)
      .observe("warc_ingest",
        count(when(col("_error").isNotNull, 1)).as("n_errors"),
        count(lit(1)).as("n_rows"))
      .filter(col("_error").isNull)
      .select("url", "warc_ts", "html")

  /** The LENIENT streaming reader: same per-record error isolation as the
    * batch [[readAll]], as a stream — good rows carry a null `_error`,
    * malformed records carry (file, offset, reason). Route
    * `_error IS NOT NULL` to an error sink to keep a durable record of
    * corrupt segments the streaming checkpoint has already consumed (the
    * batch [[errors]] cannot revisit them). */
  def readStreamAll(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 8): DataFrame = {
    import spark.implicits._
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    parseStage(spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])])
  }

  /** Well-formed response records only: the page-table shape (url, warc_ts,
    * html). */
  def read(spark: SparkSession, path: String): DataFrame =
    readAll(spark, path).filter(col("_error").isNull)
      .select("url", "warc_ts", "html")

  /** The error side channel. */
  def errors(spark: SparkSession, path: String): DataFrame =
    readAll(spark, path).filter(col("_error").isNotNull)
      .select(col("_err_file").as("file"), col("_err_offset").as("offset"),
        col("_error").as("reason"))
}
