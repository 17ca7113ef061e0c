package graft.operators

import java.sql.Timestamp
import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  private def fixture() = {
    val sps = spark; import sps.implicits._
    val left = Seq(
      (1L, ts(100), "L1"), (1L, ts(200), "L2"), (1L, ts(50), "L0"),
      (2L, ts(100), "L3"),
      (3L, ts(10), "L4")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(90), "R1"), (1L, ts(100), "R2"), (1L, ts(150), "R3"),
      (2L, ts(500), "R4")).toDF("k", "t", "rv")
    (left, right)
  }

  test("backward as-of join picks the latest right row at or before each left ts") {
    val (left, right) = fixture()
    val out = AsofJoin.backward(left, right, "k", "t", "t", Seq("rv")).collect()
      .map(r => r.getAs[String]("lv") -> r.getAs[String]("asof_rv")).toMap
    assert(out("L0") == null) // no right <= t50 for k=1
    assert(out("L1") == "R2") // t100: R2 at exactly t100 wins over R1 at t90
    assert(out("L2") == "R3") // t200: latest is R3 at t150
    assert(out("L3") == null) // k=2 right row is later (t500)
    assert(out("L4") == null) // k=3 has no right rows
  }

  test("tolerance nulls out stale matches") {
    val (left, right) = fixture()
    val out = AsofJoin.backward(left, right, "k", "t", "t", Seq("rv"), toleranceSec = Some(20))
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("asof_rv")).toMap
    assert(out("L1") == "R2") // 0s old
    assert(out("L2") == null) // R3 is 50s old > 20s tolerance
  }

  test("tolerance is microsecond-exact, not truncated to seconds") {
    val sps = spark; import sps.implicits._
    def tms(ms: Long) = new Timestamp(1704067200000L + ms)
    // right at t=0; left rows at 20.000s and 20.500s after it
    val left = Seq((1L, tms(20000), "Lexact"), (1L, tms(20500), "Lpast")).toDF("k", "t", "lv")
    val right = Seq((1L, tms(0), "R0")).toDF("k", "t", "rv")
    val out = AsofJoin.backward(left, right, "k", "t", "t", Seq("rv"), toleranceSec = Some(20))
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("asof_rv")).toMap
    assert(out("Lexact") == "R0") // exactly at the 20 s cutoff: kept
    // 20.5 s old: second-truncated arithmetic would read 20 and wrongly keep it
    assert(out("Lpast") == null)
  }

  test("tolerance arithmetic is timezone-independent on NTZ inputs (DST straddle)") {
    val sps = spark; import sps.implicits._
    // NTZ wall-clock times straddling the US spring-forward gap: naive diff
    // between 01:30 and 03:30 local is 2 h; an instant diff in a DST session
    // (01:30 EST -> 03:30 EDT) is only 1 h. With a 1.5 h tolerance the match
    // must be dropped — a cast through the session timezone would keep it.
    val before = java.time.LocalDateTime.of(2024, 3, 10, 1, 30, 0)
    val after = java.time.LocalDateTime.of(2024, 3, 10, 3, 30, 0)
    val left = Seq((1L, after, "L")).toDF("k", "t", "lv")
    val right = Seq((1L, before, "R")).toDF("k", "t", "rv")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val out = AsofJoin.backward(left, right, "k", "t", "t", Seq("rv"),
        toleranceSec = Some(5400)).collect()
      assert(out.length == 1 && out.head.getAs[String]("asof_rv") == null,
        "2h-naive-old match must fall outside the 1.5h tolerance regardless of session tz")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("a planted 1M-event hot key completes within one window task (skew bound)") {
    val sps = spark; import sps.implicits._
    // AQE does not split window exchanges, so a hot key is one task; the
    // operator's running-last frame holds a single row and the sort spills —
    // this pins the documented memory bound with a 10⁶-event key.
    val r2 = spark.range(1000000L).selectExpr("1L AS k",
      "timestamp_micros(1704067200000000 + id * 1000000) AS t", "id AS rid")
    val l2 = spark.range(1000L).selectExpr("1L AS k",
      "timestamp_micros(1704067200000000 + (id * 1000 + 500) * 1000000) AS t", "id AS lid")
    val out = AsofJoin.backward(l2, r2, "k", "t", "t", Seq("rid"))
      .select("lid", "asof_rid").collect()
    assert(out.length == 1000)
    // left at t = lid*1000 + 500 s -> latest right is rid = lid*1000 + 500
    out.foreach(r => assert(r.getLong(1) == r.getLong(0) * 1000 + 500, r.toString))
  }

  test("reserved/colliding column names are rejected loudly") {
    val sps = spark; import sps.implicits._
    val (left, right) = fixture()
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left.withColumn("__match", org.apache.spark.sql.functions.lit(1)),
        right, "k", "t", "t", Seq("rv"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left.withColumn("asof_rv", org.apache.spark.sql.functions.lit(1)),
        right, "k", "t", "t", Seq("rv"))
    }
  }

  test("as-of join agrees with a brute-force computation on events data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val purchases = ev.filter("event_type = 'purchase'")
    val views = ev.filter("event_type = 'view'")
    val out = AsofJoin.backward(purchases, views, "user_id", "ts", "ts", Seq("event_id"))
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // brute force locally (ts is TIMESTAMP_NTZ -> compare as epoch micros)
    import org.apache.spark.sql.functions.{col, unix_micros}
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vRows = rows(views)
    val pRows = rows(purchases)
    pRows.foreach { case (u, t, pid) =>
      val best = vRows.filter(v => v._1 == u && v._2 <= t)
        .sortBy(v => (v._2, v._3)).lastOption.map(_._3).getOrElse(-1L)
      assert(out(pid) == best, s"purchase $pid")
    }
    assert(out.size == pRows.length)
  }
}
