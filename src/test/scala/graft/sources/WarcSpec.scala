package graft.sources

import graft.SparkTestBase
import graft.model.Page
import graft.synth.PagesSynth
import java.nio.charset.StandardCharsets.US_ASCII

class WarcSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  private def page(i: Int) = Page(
    url = s"https://example.org/p/$i",
    warc_ts = ts(s"2026-01-0${1 + i % 9}T0$i:00:00.${100 + i}Z"),
    html = s"<html><body>page $i &amp; more</body></html>".getBytes(US_ASCII),
    text = null, lang = null)

  test("single record round-trips url, timestamp (sub-second), and body bytes") {
    val p = page(3)
    val (pages, errs) = Warc.parseAll(Warc.record(p.url, p.warc_ts, p.html), "f")
    assert(errs.isEmpty && pages.size == 1)
    assert(pages.head.url == p.url)
    assert(pages.head.warc_ts == p.warc_ts)
    assert(pages.head.html.sameElements(p.html))
  }

  test("non-ASCII target URIs survive the header round trip byte-exactly (UTF-8)") {
    val url = "https://example.org/café/東京?q=😀"
    val ts = this.ts("2026-03-01T10:20:30.456789Z")
    val html = "<html>café</html>".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val (pages, errs) = Warc.parseAll(Warc.record(url, ts, html), "f")
    assert(errs.isEmpty && pages.size == 1)
    assert(pages.head.url == url, s"got ${pages.head.url}")
    assert(pages.head.html.sameElements(html))
  }

  test("non-response records (warcinfo, request) are skipped, not errors") {
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n" +
      "software\n\r\n\r\n").getBytes(US_ASCII)
    val req = ("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x/y\r\n" +
      "Content-Length: 18\r\n\r\nGET /y HTTP/1.1\r\n\r\n\r\n\r\n").getBytes(US_ASCII)
    val p = page(1)
    val stream = info ++ req ++ Warc.record(p.url, p.warc_ts, p.html)
    val (pages, errs) = Warc.parseAll(stream, "f")
    assert(errs.isEmpty, errs.mkString("; "))
    assert(pages.map(_.url) == Vector(p.url))
  }

  test("member-per-record concatenated gzip decodes in one pass") {
    val ps = (0 until 5).map(page)
    val stream = ps.flatMap(p =>
      Warc.gzipMember(Warc.record(p.url, p.warc_ts, p.html))).toArray
    val (pages, errs) = Warc.parseAll(stream, "f")
    assert(errs.isEmpty && pages.map(_.url) == ps.map(_.url).toVector)
  }

  test("a corrupt region yields one error and parsing resyncs at the next record") {
    val a = page(1); val c = page(2)
    val garbage = "WARC/1.0\r\nbroken header no colon\r\n\r\n".getBytes(US_ASCII)
    val stream = Warc.record(a.url, a.warc_ts, a.html) ++ garbage ++
      Warc.record(c.url, c.warc_ts, c.html)
    val (pages, errs) = Warc.parseAll(stream, "f")
    assert(pages.map(_.url) == Vector(a.url, c.url), "records around the corruption survive")
    assert(errs.size == 1 && errs.head.reason.contains("malformed WARC header"))
    assert(errs.head.offset > 0 && errs.head.file == "f")
  }

  test("a truncated final record errors cleanly and keeps prior records") {
    val a = page(4)
    val full = Warc.record(a.url, a.warc_ts, a.html)
    val truncated = Warc.record(page(5).url, page(5).warc_ts, page(5).html)
    val stream = full ++ truncated.take(truncated.length - 30)
    val (pages, errs) = Warc.parseAll(stream, "f")
    assert(pages.map(_.url) == Vector(a.url))
    assert(errs.size == 1 && errs.head.reason.contains("truncated"))
  }

  test("adversarial headers fail cleanly: bad Content-Length, bad date, non-HTTP block") {
    def rec(s: String) = s.getBytes(US_ASCII)
    val badLen = rec("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: NaN\r\n\r\n")
    val badDate = rec("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "WARC-Date: yesterday\r\nContent-Length: 20\r\n\r\nHTTP/1.1 200 OK\r\n\r\nx\r\n\r\n")
    val notHttp = rec("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 5\r\n\r\nxxxxx\r\n\r\n")
    for ((bytes, frag) <- Seq((badLen, "Content-Length"), (badDate, "WARC-Date"),
        (notHttp, "not an HTTP message"))) {
      val (pages, errs) = Warc.parseAll(bytes, "f")
      assert(pages.isEmpty && errs.size == 1, s"case $frag: $errs")
      assert(errs.head.reason.contains(frag), s"got: ${errs.head.reason}")
    }
  }

  test("gzip bombs and corrupt gzip streams become clean file-level errors") {
    // a "bomb": 1 MiB of zeros compressing to ~1 KiB, parsed under a 64 KiB cap
    val bomb = Warc.gzipMember(new Array[Byte](1 << 20))
    val (p1, e1) = Warc.parseAll(bomb, "bomb.warc.gz", maxDecompressed = 64 * 1024)
    assert(p1.isEmpty && e1.size == 1 && e1.head.reason.contains("bomb guard"))
    // under the default cap the same bytes are merely a non-WARC stream
    val (p2, e2) = Warc.parseAll(bomb, "bomb.warc.gz")
    assert(p2.isEmpty && e2.size == 1 && !e2.head.reason.contains("bomb guard"))
    // a truncated gzip stream fails as one error row, not an exception
    val p = page(1)
    val gz = Warc.gzipMember(Warc.record(p.url, p.warc_ts, p.html))
    val (p3, e3) = Warc.parseAll(gz.take(gz.length / 2), "trunc.warc.gz")
    assert(p3.isEmpty && e3.size == 1 && e3.head.reason.startsWith("gzip:"))
  }

  test("the KG pipeline from WARC input emits the identical triple multiset") {
    val sps = spark; import sps.implicits._
    import org.apache.spark.sql.functions.col
    import graft.pipeline.KgPipeline
    val dir = java.nio.file.Files.createTempDirectory("warc_pipe").toString
    val pages = PagesSynth.pages(spark, 200)
    Warc.write(pages.repartition(3), dir)
    // WARC carries the capture (url, warc_ts, html); lang rides the crawl
    // metadata table joined by url — text is re-derived by the extractor
    val meta = pages.select(col("url"), col("text"), col("lang"))
    val fromWarc = Warc.read(spark, dir).join(meta, "url")
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[Page]
    def key(t: graft.model.Triple) = (t.subj, t.pred, t.obj_iri, t.obj_lit, t.obj_type)
    val got = KgPipeline.pageTriples(KgPipeline.extracted(fromWarc), PagesSynth.aliasMap)
      .collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    val want = KgPipeline.pageTriples(KgPipeline.extracted(pages), PagesSynth.aliasMap)
      .collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("streaming WARC ingest is exactly-once per file across catch-up passes") {
    val sps = spark; import sps.implicits._
    import org.apache.spark.sql.functions.{col, md5, unix_micros}
    val warcDir = java.nio.file.Files.createTempDirectory("warc_stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("warc_stream_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("warc_stream_ck").toString
    val all = PagesSynth.pages(spark, 120)
    Warc.write(all.filter(col("url").rlike("/p/[0-9]*[02468]$")).repartition(2), warcDir)
    def runPass(): Unit = {
      val q = Warc.readStream(spark, warcDir)
        .select(col("url"), unix_micros(col("warc_ts")).as("us"), md5(col("html")).as("h"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runPass()
    val firstCount = spark.read.parquet(outDir).count()
    assert(firstCount == 60)
    // a new crawl segment lands between passes — only it is processed
    Warc.write(all.filter(!col("url").rlike("/p/[0-9]*[02468]$")).repartition(2),
      warcDir, prefix = "seg2")
    runPass()
    val got = spark.read.parquet(outDir)
      .as[(String, Long, String)].collect().toSet
    val want = all
      .select(col("url"), unix_micros(col("warc_ts")).as("us"), md5(col("html")).as("h"))
      .as[(String, Long, String)].collect().toSet
    assert(got.size == 120, "second pass appends only the new segment, no re-reads")
    assert(got == want)
  }

  test("distributed write/read round-trips the synthetic corpus exactly") {
    val sps = spark; import sps.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_rt").toString
    val pages = PagesSynth.pages(spark, 200)
    Warc.write(pages.repartition(4), dir)
    val got = Warc.read(spark, dir)
      .select(org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("warc_ts")).as("us"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("html")).as("h"))
      .as[(String, Long, String)].collect().toSet
    val want = pages
      .select(org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("warc_ts")).as("us"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("html")).as("h"))
      .as[(String, Long, String)].collect().toSet
    assert(got == want)
    assert(Warc.errors(spark, dir).count() == 0)
    // planted corruption in one extra file: errors surface, good rows remain
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.warc"),
      "WARC/1.0\r\nno colon here\r\n\r\n".getBytes(US_ASCII))
    assert(Warc.read(spark, dir).count() == 200)
    assert(Warc.errors(spark, dir).count() == 1)
  }

  test("writer targets an explicit file:-scheme Hadoop path, atomically visible") {
    val sps = spark; import sps.implicits._
    val local = java.nio.file.Files.createTempDirectory("warc_hfs")
    val dir = "file:" + local.toString // resolved via o.a.h.fs.FileSystem, not java.io
    val pages = PagesSynth.pages(spark, 60)
    Warc.write(pages.repartition(3), dir)
    // visible output = finished partition files only; the attempt-private
    // dot-temps either renamed away or remain invisible to Spark's
    // hidden-file filter (the atomic-visibility property)
    val files = java.nio.file.Files.list(local).iterator()
    val names = Iterator.continually(files).takeWhile(_.hasNext).map(_.next().getFileName.toString).toVector
    // dot-prefixed entries (Hadoop .crc sidecars, any abandoned attempt
    // temp) are invisible to Spark's hidden-file filter; every VISIBLE
    // entry must be a finished partition file, and no attempt temp survives
    val visible = names.filterNot(_.startsWith("."))
    assert(visible.nonEmpty && visible.forall(_.matches("part-\\d{5}\\.warc\\.gz")), names.toString)
    assert(!names.exists(_.contains(".attempt-")), names.toString)
    val got = Warc.read(spark, dir).select($"url").as[String].collect().toSet
    val want = pages.select($"url").as[String].collect().toSet
    assert(got == want)
  }

  test("streaming ingest surfaces malformed files: observed metric + lenient error stream") {
    val sps = spark; import sps.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_errstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_errstream_ck").toString
    val p = page(1)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "good.warc"),
      Warc.record(p.url, p.warc_ts, p.html))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.warc"),
      "WARC/1.0\r\nno colon here\r\n\r\n".getBytes(US_ASCII))
    val q = Warc.readStream(spark, dir)
      .writeStream.format("memory").queryName("warc_obs")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("warc_obs").count() == 1) // good rows only in the sink
    // ...but the batch was NOT silent: the observed warc_ingest metric
    // carried the malformed-record count in the query progress
    val metrics = q.recentProgress.flatMap(pr =>
      Option(pr.observedMetrics.get("warc_ingest")))
    assert(metrics.nonEmpty, "no warc_ingest observation in any progress event")
    assert(metrics.map(_.getAs[Long]("n_errors")).sum == 1L, metrics.mkString("; "))
    assert(metrics.map(_.getAs[Long]("n_rows")).sum == 2L, metrics.mkString("; "))
    // the lenient stream is the durable error sink: same rows, errors kept
    val ckpt2 = java.nio.file.Files.createTempDirectory("warc_errstream_ck2").toString
    val q2 = Warc.readStreamAll(spark, dir)
      .filter($"_error".isNotNull)
      .select($"_err_file", $"_err_offset", $"_error")
      .writeStream.format("memory").queryName("warc_obs_err")
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val errs = spark.table("warc_obs_err").collect()
    assert(errs.length == 1 && errs.head.getString(0).endsWith("bad.warc"), errs.mkString)
  }
}
