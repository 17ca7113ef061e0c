package graft.plans

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkTestBase
import graft.operators.AsofJoin

/** Locks the native sort-merge as-of join ([[AsofJoinExec]]) to the composed
  * operator (`AsofJoin.backward`) — same rows on every input shape the
  * composed spec worried about: ties, null keys, null timestamps, tolerance,
  * self-joins from one relation, and arbitrary partitioning. */
class AsofJoinNativeSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertParity(left: DataFrame, right: DataFrame, key: String,
      payload: Seq[String], tol: Option[Long] = None): Unit = {
    val native = AsofJoinNative.backward(left, right, key, "t", "t", payload, tol)
    val composed = AsofJoin.backward(left, right, key, "t", "t", payload, tol)
    assert(native.columns.toSeq == composed.columns.toSeq, "column parity")
    assert(canon(native) == canon(composed), "row parity with the composed operator")
  }

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  test("hand fixture: latest right at-or-before each left ts; exact-ts match; empty keys") {
    val sps = spark; import sps.implicits._
    val left = Seq((1L, ts(100), "L1"), (1L, ts(200), "L2"), (1L, ts(50), "L0"),
      (2L, ts(100), "L3"), (3L, ts(10), "L4")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(90), "R1"), (1L, ts(100), "R2"), (1L, ts(150), "R3"),
      (2L, ts(500), "R4")).toDF("k", "t", "rv")
    val out = AsofJoinNative.backward(left, right, "k", "t", "t", Seq("rv")).collect()
      .map(r => r.getAs[String]("lv") -> r.getAs[String]("asof_rv")).toMap
    assert(out == Map("L0" -> null, "L1" -> "R2", "L2" -> "R3", "L3" -> null, "L4" -> null))
    assertParity(left, right, "k", Seq("rv"))
  }

  test("randomized parity: ties, null keys, null timestamps, multi-column payload") {
    val sps = spark; import sps.implicits._
    val rnd = new Random(42)
    def mkRows(n: Int) = Seq.tabulate(n) { i =>
      val k: java.lang.Long = if (rnd.nextInt(10) == 0) null else rnd.nextInt(6).toLong
      // ts drawn from 8 values so equal-timestamp ties are common
      val t: Timestamp = if (rnd.nextInt(12) == 0) null else ts(rnd.nextInt(8) * 10)
      (k, t, s"v$i", rnd.nextInt(3))
    }
    val left = mkRows(120).toDF("k", "t", "lv", "lx")
    val right = mkRows(150).toDF("k", "t", "rv", "rx")
    assertParity(left, right, "k", Seq("rv", "rx"))
    assertParity(left, right, "k", Seq("rv", "rx"), tol = Some(30))
  }

  test("string keys take the non-long ordering path") {
    val sps = spark; import sps.implicits._
    val rnd = new Random(7)
    def mk(n: Int) = Seq.tabulate(n)(i =>
      (s"u${rnd.nextInt(5)}", ts(rnd.nextInt(6) * 10), s"p$i")).toDF("k", "t", "v")
    assertParity(mk(80), mk(90), "k", Seq("v"))
  }

  test("self-join from one relation (duplicate exprIds) matches the composed operator and the oracle shape") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val purchases = ev.filter("event_type = 'purchase'")
    val views = ev.filter("event_type = 'view'")
    val native = AsofJoinNative.backward(purchases, views, "user_id", "ts", "ts", Seq("event_id"))
      .select("event_id", "asof_event_id")
    val composed = AsofJoin.backward(purchases, views, "user_id", "ts", "ts", Seq("event_id"))
      .select("event_id", "asof_event_id")
    assert(canon(native) == canon(composed))
  }

  test("tolerance is microsecond-exact and matches the composed cutoff behavior") {
    val sps = spark; import sps.implicits._
    def tms(ms: Long) = new Timestamp(1704067200000L + ms)
    val left = Seq((1L, tms(20000), "Lexact"), (1L, tms(20500), "Lpast")).toDF("k", "t", "lv")
    val right = Seq((1L, tms(0), "R0")).toDF("k", "t", "rv")
    val out = AsofJoinNative.backward(left, right, "k", "t", "t", Seq("rv"), Some(20))
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("asof_rv")).toMap
    assert(out == Map("Lexact" -> "R0", "Lpast" -> null))
  }

  test("output is invariant to input partitioning") {
    val sps = spark; import sps.implicits._
    val rnd = new Random(11)
    def mk(n: Int) = Seq.tabulate(n)(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(5) * 10), s"x$i")).toDF("k", "t", "v")
    val l = mk(60); val r = mk(70)
    val base = canon(AsofJoinNative.backward(l.coalesce(1), r.coalesce(1), "k", "t", "t", Seq("v")))
    val wide = canon(AsofJoinNative.backward(l.repartition(13), r.repartition(7), "k", "t", "t", Seq("v")))
    assert(base == wide)
  }

  test("plan shape: AsofJoinExec fed by one exchange+sort per side, no window, no union") {
    val sps = spark; import sps.implicits._
    val l = Seq((1L, ts(1), "a")).toDF("k", "t", "lv")
    val r = Seq((1L, ts(0), "b", 9)).toDF("k", "t", "rv", "rx")
    val df = AsofJoinNative.backward(l, r, "k", "t", "t", Seq("rv", "rx"))
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan
    val asof = collectWithSubqueries(plan) { case e: AsofJoinExec => e }
    assert(asof.length == 1, s"expected one AsofJoinExec in:\n$plan")
    assert(collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }.length == 2,
      "one hash exchange per side, nothing else")
    assert(collectWithSubqueries(plan) { case s: SortExec => s }.length == 2,
      "one sort per side — the composed operator's single combined sort is gone")
    assert(!plan.toString.contains("Window"), "no window machinery in the native plan")
    // right-side sort carries the tie-break columns
    val rightSort = collectWithSubqueries(plan) { case s: SortExec => s }
      .find(_.output.exists(_.name == "rv")).get
    assert(rightSort.sortOrder.length == 4, s"key, ts, rv, rx: ${rightSort.sortOrder}")
  }

  test("type and collision guards fail loudly") {
    val sps = spark; import sps.implicits._
    val l = Seq((1L, ts(1), "a")).toDF("k", "t", "asof_rv")
    val r = Seq((1L, ts(0), "b")).toDF("k", "t", "rv")
    intercept[IllegalArgumentException] {
      AsofJoinNative.backward(l, r, "k", "t", "t", Seq("rv"))
    }
    intercept[IllegalArgumentException] {
      // key present on the right but absent on the left hits the attr guard
      AsofJoinNative.backward(l.toDF("k", "t", "lv"), r, "rv", "t", "t", Seq("rv"))
    }
    intercept[IllegalArgumentException] {
      // tolerance over a non-timestamp "ts" column
      val li = Seq((1L, 5L, "a")).toDF("k", "t", "lv")
      val ri = Seq((1L, 3L, "b")).toDF("k", "t", "rv")
      AsofJoinNative.backward(li, ri, "k", "t", "t", Seq("rv"), Some(10))
    }
  }
}
