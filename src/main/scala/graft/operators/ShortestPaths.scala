package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** Multi-source BFS shortest-path distances over an undirected simple
  * graph, to a FIXED horizon: exactly `maxDist` expansion rounds, so the
  * result is a pure function of (graph, seeds, maxDist) with no
  * convergence clause — which is what lets the DuckDB oracle unroll the
  * same rounds as MATERIALIZED CTEs and match exactly whatever the graph's
  * diameter is (nodes farther than the horizon are simply absent, both
  * sides).
  *
  * Shuffle shape per round: one equi-join of the frontier to the symmetric
  * edge list + one anti-join against the visited set + a distinct — all
  * hash-partitioned on (seed, node). Frontiers shrink as the ball
  * saturates; lineage cut per round via [[Checkpoints.cut]] (local by
  * default, durable with `reliableEvery`). The classic KG reachability /
  * hop-distance primitive generalizing the fixed 2-hop query.
  */
object ShortestPaths {

  /** @param edges undirected (src, dst); canonicalized/deduped here
    * @param seeds one column `seed`
    * @return (seed, node, dist) for every node within maxDist hops of its
    *         seed (the seed itself at dist 0); dist = minimum hop count */
  def distances(edges: DataFrame, seeds: DataFrame, maxDist: Int,
      reliableEvery: Option[Int] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val e = Checkpoints.cut(Triangles.canonical(edges), 0, reliableEvery)
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    var visited = Checkpoints.cut(
      seeds.select(col("seed"), col("seed").as("node"), lit(0).as("dist")).distinct(),
      0, reliableEvery)
    var frontier = visited
    for (d <- 1 to maxDist) {
      frontier = Checkpoints.cut(
        frontier.join(sym, frontier("node") === sym("src"))
          .select(col("seed"), col("dst").as("node"))
          .distinct()
          .join(visited, Seq("seed", "node"), "left_anti")
          .withColumn("dist", lit(d)),
        d, reliableEvery)
      visited = Checkpoints.cut(visited.unionAll(frontier), d, reliableEvery)
    }
    visited
  }
}
