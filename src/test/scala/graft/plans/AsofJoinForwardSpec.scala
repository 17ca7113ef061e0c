package graft.plans

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.SparkTestBase

/** Locks the forward (next-event) direction of the native as-of join
  * against an in-memory brute-force reference with explicit semantics:
  * match = same key (null matches null), right ts at-or-after left ts,
  * both timestamps non-null, optional `rt - lt <= tol`; winner = earliest
  * right ts, ties broken by greatest payload tuple. */
class AsofJoinForwardSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  private case class R(k: java.lang.Long, t: Timestamp, v: String, x: Int)

  // brute force: min right ts at-or-after, then max (v, x) within that ts
  private def bruteForward(left: Seq[R], right: Seq[R], tolSec: Option[Long]): Map[Int, Option[R]] =
    left.zipWithIndex.map { case (l, i) =>
      val cands =
        if (l.t == null) Seq.empty
        else right.filter(r => r.k == l.k && r.t != null && !r.t.before(l.t) &&
          tolSec.forall(t => r.t.getTime - l.t.getTime <= t * 1000))
      val m = if (cands.isEmpty) None else {
        val minTs = cands.map(_.t.getTime).min
        Some(cands.filter(_.t.getTime == minTs).maxBy(r => (r.v, r.x)))
      }
      i -> m
    }.toMap

  private def runNative(left: Seq[R], right: Seq[R], tolSec: Option[Long]): DataFrame = {
    val sps = spark; import sps.implicits._
    val l = left.zipWithIndex.map { case (r, i) => (i, r.k, r.t) }.toDF("lid", "k", "t")
    val r = right.map(r => (r.k, r.t, r.v, r.x)).toDF("k", "t", "v", "x")
    AsofJoinNative.forward(l, r, "k", "t", "t", Seq("v", "x"), tolSec)
  }

  private def check(left: Seq[R], right: Seq[R], tolSec: Option[Long]): Unit = {
    val expect = bruteForward(left, right, tolSec)
    val got = runNative(left, right, tolSec).collect().map { row =>
      row.getAs[Int]("lid") ->
        (Option(row.getAs[String]("asof_v")), Option(row.getAs[Any]("asof_x")))
    }.toMap
    assert(got.keySet == expect.keySet, "one output row per left row")
    expect.foreach { case (i, m) =>
      assert(got(i) == (m.map(_.v), m.map(_.x)),
        s"left #$i: expected $m got ${got(i)} (tol=$tolSec)")
    }
  }

  test("hand fixture: earliest right at-or-after; exact-ts hit; no backward leakage") {
    val sps = spark; import sps.implicits._
    val left = Seq((1L, ts(100), "L1"), (1L, ts(200), "L2"), (2L, ts(50), "L3"),
      (3L, ts(10), "L4")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(100), "R-exact"), (1L, ts(150), "R-mid"),
      (1L, ts(90), "R-past"), (2L, ts(40), "R-only-before")).toDF("k", "t", "rv")
    val out = AsofJoinNative.forward(left, right, "k", "t", "t", Seq("rv"))
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("asof_rv")).toMap
    assert(out == Map(
      "L1" -> "R-exact",  // ts 100 matches at-or-after, not the 150
      "L2" -> null,       // nothing at-or-after 200
      "L3" -> null,       // key 2's only right row is strictly before
      "L4" -> null))      // key 3 absent on the right
  }

  test("randomized brute-force parity: ties, null keys, null timestamps") {
    val rnd = new Random(1234)
    def mk(n: Int) = Seq.tabulate(n) { i =>
      R(if (rnd.nextInt(10) == 0) null else rnd.nextInt(6).toLong,
        if (rnd.nextInt(12) == 0) null else ts(rnd.nextInt(8) * 10),
        s"v${rnd.nextInt(4)}", rnd.nextInt(3))
    }
    val l = mk(120); val r = mk(150)
    check(l, r, None)
    check(l, r, Some(30))
  }

  test("tolerance cuts exactly at the bound (second-granularity input, µs arithmetic)") {
    val left = Seq(R(1L, ts(0), "", 0))
    val in = Seq(R(1L, ts(21), "late", 0))
    assert(bruteForward(left, in, Some(20))(0).isEmpty)
    check(left, in, Some(20))          // 21 s > 20 s → no match
    val atBound = Seq(R(1L, ts(20), "bound", 0))
    check(left, atBound, Some(20))     // exactly 20 s → match
  }

  test("output invariant to partitioning; plan keeps the 2-exchange 2-sort shape with ts descending") {
    val sps = spark; import sps.implicits._
    val rnd = new Random(77)
    def mk(n: Int) = Seq.tabulate(n)(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(5) * 10), s"x$i")).toDF("k", "t", "v")
    val l = mk(60); val r = mk(70)
    val base = AsofJoinNative.forward(l.coalesce(1), r.coalesce(1), "k", "t", "t", Seq("v"))
    val wide = AsofJoinNative.forward(l.repartition(13), r.repartition(7), "k", "t", "t", Seq("v"))
    assert(base.collect().map(_.toString).sorted.toSeq ==
      wide.collect().map(_.toString).sorted.toSeq)
    base.collect()
    val sorts = collectWithSubqueries(base.queryExecution.executedPlan) { case s: SortExec => s }
    assert(sorts.length == 2)
    assert(sorts.forall(_.sortOrder.exists(_.toString.contains("DESC"))),
      s"forward mode must sort ts descending on both sides: ${sorts.map(_.sortOrder)}")
  }
}
