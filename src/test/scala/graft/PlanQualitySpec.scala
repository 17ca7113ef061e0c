package graft

import org.apache.spark.sql.execution.SparkPlan

/** Locks the physical-plan properties the engine's queries rely on at scale
  * (SURVEY.md §4): filter/projection pushdown into the parquet scan, global
  * sort+limit planning as TakeOrderedAndProject, broadcast joins on dimension
  * tables, and no cross products anywhere in the driver-contract queries. */
class PlanQualitySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan

  test("q1_pricing pushes the shipdate filter and prunes columns at the scan") {
    val plan = planOf("q1_pricing").toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), plan)
    assert(!plan.contains("l_orderkey"), "scan reads columns the query never uses")
  }

  test("q_top_orders plans as TakeOrderedAndProject, never a full sort") {
    val plan = planOf("q_top_orders").toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_join_broadcast broadcasts both dimension tables") {
    val plan = planOf("q_join_broadcast").toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("doc_tfidf_topterms truncates per-doc candidates map-side (partial WindowGroupLimit)") {
    val plan = planOf("doc_tfidf_topterms").toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"), plan)
  }

  test("doc_length_quantiles does all window+agg work on one exchange") {
    val plan = planOf("doc_length_quantiles").toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("kg_comention_triangles plans equi-joins only (no cross product)") {
    // the full query's upstream (cap window included) materializes inside
    // Triangles' localCheckpoint — its plan properties are locked separately
    // on groupedPairs below
    val plan = planOf("kg_comention_triangles").toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("Triangles.groupedPairs caps group fan-out map-side, before the self-join") {
    val sp = spark; import sp.implicits._
    val rows = Seq.tabulate(300)(i => ("hub", s"m$i")).toDF("g", "m")
    val pairs = graft.operators.Triangles.groupedPairs(rows, "g", "m", 64)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(pairs.count() == 64L * 63 / 2, "fan-out must be C(cap,2), not C(300,2)")
  }

  test("no driver-contract query plans a cartesian product") {
    // ALL queries; emb_pairs_cosine's bounded-head brute force is the
    // documented exception (nested-loop on 120 rows by design)
    val exceptions = Set("emb_pairs_cosine")
    SparkEntry.queries.keys
      .filterNot(exceptions)
      .foreach { name =>
        val plan = planOf(name).toString
        assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a broadcast nested-loop join (non-equi join leaked in)")
      }
  }
}
