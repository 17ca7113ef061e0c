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

  test("no driver-contract query plans a cartesian product") {
    // every query that reads testdata tables (kg/cj/mm synthesize their own
    // input); emb_pairs_cosine's bounded-head brute force is the documented
    // exception (nested-loop on 120 rows by design)
    val exceptions = Set("emb_pairs_cosine")
    SparkEntry.queries.keys
      .filter(n => n.startsWith("q_") || n.startsWith("ev_") || n.startsWith("doc_"))
      .filterNot(exceptions)
      .foreach { name =>
        val plan = planOf(name).toString
        assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      }
  }
}
