package graft.plans

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.AsofJoin

/** Locks [[AsofJoinLeftFilterPushdown]] — the `Rule[LogicalPlan]` rung:
  * left-only deterministic filters sink below [[AsofJoinNode]] (before the
  * left side's exchange+sort), conjuncts referencing the asof payload or
  * nondeterministic expressions stay above, and results are unchanged. */
class AsofJoinPushdownSpec extends SparkTestBase {

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  private def filtersAboveAndBelow(plan: LogicalPlan): (Seq[Filter], Seq[Filter]) = {
    val node = plan.collect { case a: AsofJoinNode => a }.head
    val below = node.left.collect { case f: Filter => f }
    val above = plan.collect { case f: Filter => f }.filterNot(below.contains)
    (above, below)
  }

  private def mk(n: Int, seed: Int): DataFrame = {
    val sps = spark; import sps.implicits._
    val rnd = new Random(seed)
    Seq.tabulate(n)(i =>
      (rnd.nextInt(6).toLong, ts(rnd.nextInt(8) * 10), i.toLong, s"v$i")).toDF("k", "t", "x", "v")
  }

  test("left-only deterministic filter sinks below the node; rows unchanged") {
    val l = mk(120, 1); val r = mk(150, 2)
    val out = AsofJoinNative.backward(l, r, "k", "t", "t", Seq("v"))
      .filter(col("x") > 40)
    val (above, below) = filtersAboveAndBelow(out.queryExecution.optimizedPlan)
    assert(below.exists(_.condition.toString.contains("x")),
      s"x > 40 must sit below AsofJoinNode:\n${out.queryExecution.optimizedPlan}")
    assert(!above.exists(_.condition.toString.contains("x")),
      "no residual x-filter above the node")
    val composed = AsofJoin.backward(l, r, "k", "t", "t", Seq("v")).filter(col("x") > 40)
    assert(out.collect().map(_.toString).sorted.toSeq ==
      composed.collect().map(_.toString).sorted.toSeq)
  }

  test("mixed conjunction splits: left conjunct pushed, asof-payload conjunct stays") {
    val l = mk(120, 3); val r = mk(150, 4)
    val out = AsofJoinNative.backward(l, r, "k", "t", "t", Seq("v"))
      .filter(col("x") > 40 && col("asof_v").isNotNull)
    val (above, below) = filtersAboveAndBelow(out.queryExecution.optimizedPlan)
    assert(below.exists(_.condition.toString.contains("x")), "left conjunct pushed")
    assert(above.exists(_.condition.toString.contains("asof_v")),
      "payload conjunct must stay above the node")
    assert(!below.exists(_.condition.toString.contains("asof_v")))
    val composed = AsofJoin.backward(l, r, "k", "t", "t", Seq("v"))
      .filter(col("x") > 40 && col("asof_v").isNotNull)
    assert(out.collect().map(_.toString).sorted.toSeq ==
      composed.collect().map(_.toString).sorted.toSeq)
  }

  test("nondeterministic predicates are not pushed") {
    val l = mk(50, 5); val r = mk(60, 6)
    // build the Filter condition directly on the node (a DataFrame .filter
    // would have analysis pull rand() into a `_nondeterministic` Project
    // first, sidestepping the rule entirely) and run just our rule over it
    val joined = AsofJoinNative.backward(l, r, "k", "t", "t", Seq("v"))
    val node = joined.queryExecution.analyzed.collect { case a: AsofJoinNode => a }.head
    val x = node.left.output.find(_.name == "x").get
    val cond = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
        new org.apache.spark.sql.catalyst.expressions.Rand(
          org.apache.spark.sql.catalyst.expressions.Literal(42)),
        org.apache.spark.sql.catalyst.expressions.Literal(0.0)),
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
        x, org.apache.spark.sql.catalyst.expressions.Literal(0L)))
    val rewritten = AsofJoinLeftFilterPushdown(Filter(cond, node))
    val (above, below) = filtersAboveAndBelow(rewritten)
    assert(above.exists(_.condition.toString.contains("rand")),
      s"rand() must stay above the node:\n$rewritten")
    assert(!below.exists(_.condition.toString.contains("rand")))
    assert(below.exists(_.condition.toString.contains("x")),
      "the deterministic left conjunct is still pushed")
  }

  // NOTE: the extensions-session variant (rule in the fixed-point batch →
  // pushed conjunct merges into the scan's PushedFilters) lives in
  // GraftExtensionsSpec, which owns its sessions — a second builder here
  // would getOrCreate the suite's extension-less session.
}
