package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions gets graft_hash64 with no per-session register() call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects graft_hash64 as a session built-in") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val got = spark.sql("SELECT graft_hash64('hello') AS h").collect()(0).getLong(0)
      val want = Hash64Expr.hashUtf8(org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
      assert(got == want)
      assert(got == graft.text.TextOps.hash64("hello"))

      // arity gate: zero args and two args both raise an AnalysisException
      // (not NoSuchElementException / silent second-arg drop)
      val e0 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_hash64()").collect()
      }
      assert(e0.getMessage.contains("graft_hash64"))
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_hash64('a', 'b')").collect()
      }
      assert(e2.getMessage.contains("graft_hash64"))

      // the per-session register() path enforces the same arity
      Hash64Expr.register(spark)
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_hash64('a', 'b')").collect()
      }

      // graft_cosine rides the same injection (orthogonal vectors -> 0.0)
      import spark.implicits._
      Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
        .createOrReplaceTempView("cos_ext_t")
      assert(spark.sql("SELECT graft_cosine(a, b) AS c FROM cos_ext_t")
        .head.getDouble(0) == 0.0)
      val ec = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_cosine(a) FROM cos_ext_t").collect()
      }
      assert(ec.getMessage.contains("graft_cosine"))

      // graft_zorder rides the injection (the clustered layout's write key)
      assert(spark.sql("SELECT graft_zorder(3L, 5) AS z").head.getLong(0) ==
        ZorderExpr.interleave(3, 5))

      // graft_heavy_hitters rides the injection too (aggregate, grouped)
      Seq(("g", "x"), ("g", "x"), ("g", "y")).toDF("g", "item")
        .createOrReplaceTempView("hh_ext_t")
      val hh = spark.sql(
        "SELECT graft_heavy_hitters(item, 4) AS hh FROM hh_ext_t GROUP BY g")
        .head.getMap[String, Long](0)
      assert(hh == Map("x" -> 2L, "y" -> 1L))
      val eh = intercept[IllegalArgumentException] {
        // k must be a constant integer, not a column — and the error must
        // SAY that (not a bogus wrong-argument-count message)
        spark.sql("SELECT graft_heavy_hitters(item, item) FROM hh_ext_t").collect()
      }
      assert(eh.getMessage.contains("k must be a constant INTEGER"))
      // a foldable non-Literal constant is accepted (folded before matching)
      val hh2 = spark.sql(
        "SELECT graft_heavy_hitters(item, CAST(4 AS INT)) AS hh FROM hh_ext_t GROUP BY g")
        .head.getMap[String, Long](0)
      assert(hh2 == Map("x" -> 2L, "y" -> 1L))

      // the native as-of join strategy rides the same extensions class
      assert(spark.sessionState.planner.strategies.contains(graft.plans.AsofJoinStrategy),
        "injectPlannerStrategy must register AsofJoinStrategy")

      // ...and so does the left-filter pushdown rule: because it sits in the
      // fixed-point operator-optimization batch here (unlike the ad-hoc
      // extraOptimizations fallback), a left-only filter above the node
      // merges all the way into the parquet scan's PushedFilters
      val tmp = java.nio.file.Files.createTempDirectory("asof_push")
      Seq.tabulate(50)(i => (i.toLong % 5,
          new java.sql.Timestamp(1704067200000L + i * 1000L), i.toLong, s"v$i"))
        .toDF("k", "t", "x", "v").write.parquet(s"$tmp/l")
      Seq.tabulate(50)(i => (i.toLong % 5,
          new java.sql.Timestamp(1704067200000L + i * 700L), i.toLong, s"w$i"))
        .toDF("k", "t", "x", "v").write.parquet(s"$tmp/r")
      val out = graft.plans.AsofJoinNative.backward(
        spark.read.parquet(s"$tmp/l"), spark.read.parquet(s"$tmp/r"),
        "k", "t", "t", Seq("v")).filter($"x" > 30)
      out.collect()
      val planStr = out.queryExecution.executedPlan.toString
      assert(planStr.contains("GreaterThan(x,30)"),
        s"left filter must reach PushedFilters at the scan:\n$planStr")
    } finally spark.stop()
  }
}
