package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L) // epoch-based: TZ-safe

  test("windowed counts: streaming over AvailableNow == batch on the same parquet") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    // ts is TIMESTAMP_NTZ here → window start surfaces as LocalDateTime;
    // compare on the stringified key (type-agnostic, exact)
    val expected = EventStream.windowedTypeCounts(batch).collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2))).toSet

    // the file stream source wants a directory; stage the single test file
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = EventStream.windowedTypeCounts(stream)
      .writeStream.format("memory").queryName("wtc_complete")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("wtc_complete").collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("watermark: windows finalize in append mode exactly once; late rows are dropped") {
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = EventStream.windowedTypeCounts(df, "1 hour", delay = Some("30 minutes"))
      .writeStream.format("memory").queryName("wtc_append").outputMode("append").start()

    // batch 1: three events in hour-window [60, 120), one in [120, 180)
    input.addData((ts(61), "view"), (ts(70), "view"), (ts(95), "click"), (ts(130), "view"))
    q.processAllAvailable()
    assert(spark.table("wtc_append").count() == 0, "nothing finalized before watermark moves")

    // batch 2 advances the watermark past window [60,120) (wm = 300-30 = 270)
    input.addData((ts(300), "view"))
    q.processAllAvailable()
    // a LATE row for the already-finalized window: must be dropped, not re-emitted
    input.addData((ts(62), "view"))
    q.processAllAvailable()
    // close everything else out
    input.addData((ts(1000), "view"))
    q.processAllAvailable()
    input.addData((ts(2000), "view"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wtc_append").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2))).toSet
    // [60,120): view 2 (NOT 3 — the late third view was behind the watermark),
    // click 1; [120,180): view 1; [300,360): view 1; [960,1020): view 1
    assert(rows == Set(
      (60L, "view", 2L), (60L, "click", 1L),
      (120L, "view", 1L), (300L, "view", 1L), (960L, "view", 1L)))
  }

  test("streaming dedup suppresses duplicates within the watermark and evicts state past it") {
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val df = input.toDF().toDF("event_id", "ts")
    val q = EventStream.dedupedEvents(df, delay = "30 minutes")
      .writeStream.format("memory").queryName("dedup_ev").outputMode("append").start()

    // duplicates of event 1 and 2 inside the 30-minute horizon: suppressed
    input.addData((1L, ts(10)), (2L, ts(11)), (1L, ts(12)), (2L, ts(30)), (3L, ts(31)))
    q.processAllAvailable()
    // advance the watermark far past those keys (wm = 500 - 30 = 470) —
    // their dedup state is evicted
    input.addData((4L, ts(500)))
    q.processAllAvailable()
    // a redelivery of event 1 AFTER eviction re-emits (the documented
    // bounded-state trade) — but it is itself behind the watermark, so the
    // watermark filter drops it first: still exactly one row for id 1
    input.addData((1L, ts(13)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_ev").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L), s"got $ids")

    // batch path: plain exact dedup on the same shape, one row per id
    val batch = EventStream.dedupedEvents(
      Seq((1L, ts(10)), (1L, ts(12)), (2L, ts(11))).toDF("event_id", "ts"))
    assert(batch.count() == 2)
  }

  test("session_window: streaming append sessions == batch sessions on the same rows") {
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val events = Seq( // user 1: [10,20,45] = one session (gaps < 30m); 2nd at 200
      (ts(10), 1L), (ts(20), 1L), (ts(45), 1L), (ts(200), 1L),
      (ts(15), 2L), (ts(100), 2L)) // user 2: two sessions
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = EventStream.sessionWindows(df, "30 minutes", delay = Some("10 minutes"))
      .writeStream.format("memory").queryName("sw_append").outputMode("append").start()
    input.addData(events: _*)
    q.processAllAvailable()
    input.addData((ts(5000), 99L)) // advance watermark far past every session close
    q.processAllAvailable()
    input.addData((ts(9000), 99L))
    q.processAllAvailable()
    q.stop()

    val batch = EventStream.sessionWindows(
      events.toDF("ts", "user_id"), "30 minutes").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val streamed = spark.table("sw_append").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      .filter(_._1 != 99L)
    assert(streamed == batch)
    assert(batch.count(_._1 == 1L) == 2 && batch.count(_._1 == 2L) == 2)
  }

  test("batch session_window counts == lag-based ev_sessions on the test corpus") {
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val viaSessionWindow = EventStream.sessionCounts(batch, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLag = graft.SparkEntry.queries("ev_sessions")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSessionWindow == viaLag)
  }

  test("stream-stream interval join == banded batch range join on the same rows") {
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    // (user_id, ts, event_id): purchases at 100/200 for u1, 50 for u2;
    // views scattered inside and outside the 60-minute window
    val pRows = Seq((1L, ts(100), 1000L), (1L, ts(200), 1001L), (2L, ts(50), 1002L))
    val vRows = Seq(
      (1L, ts(45), 2000L),  // 55 min before p1000: match
      (1L, ts(100), 2001L), // at p1000 exactly AND 100 min before p1001: one match
      (1L, ts(150), 2002L), // 50 min before p1001: match
      (1L, ts(201), 2003L), // after p1001: no match
      (2L, ts(49), 2004L),  // 1 min before p1002: match
      (3L, ts(100), 2005L)) // wrong user: no match
    def df(rows: Seq[(Long, Timestamp, Long)]) = rows.toDF("user_id", "ts", "event_id")

    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStream.intervalJoin(
        pIn.toDF().toDF("user_id", "ts", "event_id"),
        vIn.toDF().toDF("user_id", "ts", "event_id"), beforeSec = 3600)
      .writeStream.format("memory").queryName("ssij").outputMode("append").start()
    // feed across multiple micro-batches in event-time order (rows behind
    // the 10-minute watermark are dropped by design) so matches must cross
    // buffered state
    pIn.addData((1L, ts(100), 1000L), (2L, ts(50), 1002L))
    vIn.addData((1L, ts(45), 2000L), (1L, ts(100), 2001L), (2L, ts(49), 2004L))
    q.processAllAvailable()
    pIn.addData((1L, ts(200), 1001L))
    vIn.addData((1L, ts(150), 2002L), (1L, ts(201), 2003L), (3L, ts(100), 2005L))
    q.processAllAvailable()
    // advance both watermarks far past everything so all joins finalize
    // (distinct sentinel users so the sentinels cannot join each other)
    pIn.addData((98L, ts(10000), 9L)); vIn.addData((99L, ts(10000), 9L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ssij").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.RangeJoin.band(
        df(pRows), df(vRows), "user_id", "ts", "ts",
        beforeSec = 3600, afterSec = 0, rightPayload = Seq("event_id"))
      .select(col("event_id"), col("range_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    // v2001 is 100 min before p1001 — outside the 60-min window for p1001
    // but an exact-time match for p1000
    assert(batch == Set((1000L, 2000L), (1000L, 2001L),
      (1001L, 2002L), (1002L, 2004L)))
  }

  test("streaming exact dedup: duplicate doc_ids across micro-batches emit once") {
    // the streaming form of Dedup.exactKeep for a crawl feed: state-backed
    // dropDuplicates; re-crawled ids in later batches are suppressed
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = input.toDF().toDF("doc_id", "ts", "text")
      .dropDuplicates("doc_id")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    input.addData((1L, ts(1), "a"), (2L, ts(2), "b"), (1L, ts(3), "a-dup"))
    q.processAllAvailable()
    input.addData((2L, ts(4), "b-recrawl"), (3L, ts(5), "c"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sdedup").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(rows.length == 3, s"one row per distinct doc_id: ${rows.toSeq}")
    assert(rows.toMap == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      "first-seen wins; the batch-2 recrawl of id 2 is suppressed by state")
  }

  test("flatMapGroupsWithState sessionizer == session_window on the same rows, emitted once") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val events = Seq( // same shape as the session_window spec: u1 two
      (1L, ts(10)), (1L, ts(20)), (1L, ts(45)), (1L, ts(200)), // sessions,
      (2L, ts(15)), (2L, ts(100)))                             // u2 two
    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStream.closedSessions(input.toDS(), gapSec = 1800, delay = "10 minutes")
      .writeStream.format("memory").queryName("fmgws").outputMode("append").start()
    // out-of-order feed inside the watermark, split across micro-batches
    input.addData((1L, ts(20)), (1L, ts(10)), (2L, ts(15)))
    q.processAllAvailable()
    input.addData((1L, ts(45)), (2L, ts(100)), (1L, ts(200)))
    q.processAllAvailable()
    input.addData((99L, ts(5000)))  // watermark far past every close
    q.processAllAvailable()
    input.addData((99L, ts(9000)))  // second advance: re-emission would show
    q.processAllAvailable()
    q.stop()

    val got = spark.table("fmgws").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
      .filter(_._1 != 99L).toList
    assert(got.size == got.toSet.size, "each closed session must be emitted exactly once")
    // parity with the native session_window (its end = last event + gap)
    val native = EventStream.sessionWindows(events.map(e => (e._2, e._1)).toDF("ts", "user_id"),
        "30 minutes").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime - 1800 * 1000L, r.getLong(3))).toSet
    assert(got.toSet == native, s"got ${got.toSet}\nnative $native")
  }

  test("transformWithState (Spark 4 arbitrary-state API) matches mapGroupsWithState") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Timestamp)]
      val q = EventStream.runningUserCountsTws(input.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode(EventStream.updateMode).start()
      input.addData((1L, ts(1)), (1L, ts(2)), (2L, ts(3)))
      q.processAllAvailable()
      input.addData((1L, ts(4)), (3L, ts(5)))
      q.processAllAvailable()
      q.stop()
      val byBatch = spark.table("tws").collect().map(r => (r.getLong(0), r.getLong(1)))
      val finalTotals = byBatch.groupBy(_._1).map { case (u, rows) => (u, rows.map(_._2).max) }
      // same contract the mapGroupsWithState spec pins
      assert(finalTotals == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
      assert(byBatch.toSet.contains((1L, 2L)) && byBatch.toSet.contains((1L, 3L)),
        "RocksDB-backed state carried the count across micro-batches")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("mapGroupsWithState: running per-user counts survive across micro-batches") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStream.runningUserCounts(input.toDS())
      .writeStream.format("memory").queryName("ruc")
      .outputMode(EventStream.updateMode).start()
    input.addData((1L, ts(1)), (1L, ts(2)), (2L, ts(3)))
    q.processAllAvailable()
    input.addData((1L, ts(4)), (3L, ts(5)))
    q.processAllAvailable()
    q.stop()
    val byBatch = spark.table("ruc").collect().map(r => (r.getLong(0), r.getLong(1)))
    // final totals: state carried 1 -> 3 (2 then +1), 2 -> 1, 3 -> 1
    val finalTotals = byBatch.groupBy(_._1).map { case (u, rows) => (u, rows.map(_._2).max) }
    assert(finalTotals == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    assert(byBatch.toSet.contains((1L, 2L)) && byBatch.toSet.contains((1L, 3L)),
      "both the batch-1 partial and the batch-2 updated total were emitted")
  }

  test("streaming Misra-Gries heavy hitters: MG guarantee, bounded state, cross-batch carry") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val sq = spark.sqlContext
    implicit val sqc: org.apache.spark.sql.SQLContext = sq
    import sq.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, String)]
      val q = EventStream.heavyHitters(input.toDS(), k = 3)
        .writeStream.format("memory").queryName("hh")
        .outputMode(EventStream.updateMode).start()
      // batch 1: A is heavy (6 of 9); with k=3 the worst-case decrement
      // schedule still leaves A with weight >= 3
      input.addData(Seq.fill(6)(("g", "A")) ++ Seq(("g", "B"), ("g", "C"), ("g", "D")): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("hh").collect()
        .map(r => (r.getString(1), r.getLong(2))).toMap
      // batch 2: A sees only 2 more rows — its final weight must exceed
      // what batch 2 alone could produce (proves RocksDB state carried)
      input.addData(Seq.fill(2)(("g", "A")) ++ Seq(("g", "E"), ("g", "D"), ("g", "D")): _*)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("hh").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(all.forall(_._1 == "g"))
      // each emission is the group's current candidate set: <= k rows each
      assert(all.length <= 6, all.mkString("; "))
      assert(afterB1.size <= 3 && afterB1.contains("A") && afterB1("A") >= 3L)
      // final emission = rows beyond batch 1's
      val finalRows = all.drop(afterB1.size).map(r => (r._2, r._3)).toMap
      assert(finalRows.size <= 3)
      // MG guarantee: total n = 14, threshold n/(k+1) = 3.5 -> A (8) must
      // be a candidate at the end, with cross-batch weight > 2
      assert(finalRows.contains("A") && finalRows("A") > 2L,
        s"state did not carry across batches: $finalRows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
