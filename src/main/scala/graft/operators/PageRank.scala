package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** Fixed-iteration PageRank over an undirected simple graph, in EXACT
  * integer arithmetic so results are deterministic across partitionings and
  * engines (floating-point rank sums are accumulation-order-dependent; long
  * sums are not — the same discipline as the engine's cents/bigint money
  * aggregation).
  *
  * Ranks are scaled by `scale` (1e6 = micro-rank units). One round is
  *   rank'(v) = (15·scale) DIV 100 + (85 · Σ_{u∈N(v)} rank(u) DIV deg(u)) DIV 100
  * — the standard damping-0.85 update with integer floor division in place
  * of real division (the mass lost to flooring is ≤ deg(u) micro-units per
  * node and does not affect ordering at any realistic scale).
  *
  * Shuffle shape per round: one equi-join of ranks to the symmetric edge
  * list (hash on node id) + one partial/final sum aggregation — the same
  * topology as Dedup.components, O(iters) rounds total. Per-round lineage
  * cuts go through [[graft.util.Checkpoints.cut]]: local (executor-storage)
  * by default, durable `Dataset.checkpoint` every `reliableEvery` rounds on
  * a cluster with a checkpoint dir configured. Skewed (hub) nodes are pure
  * aggregation skew — partial map-side sums absorb them; there is no
  * per-node materialization.
  */
object PageRank {

  /** @param edges undirected (src, dst); canonicalized/deduped here
    * @param reliableEvery Some(k): storage-backed checkpoint every k rounds
    *   (requires SparkContext.setCheckpointDir) — cluster durability
    * @return (node, rank_micro) with rank in scaled integer units */
  def ranks(edges: DataFrame, iters: Int = 5, scale: Long = 1000000L,
      reliableEvery: Option[Int] = None): DataFrame = {
    val e = Checkpoints.cut(Triangles.canonical(edges), 0, reliableEvery)
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = Checkpoints.cut(sym.groupBy("src").agg(count(lit(1)).as("deg")), 0, reliableEvery)
    val base = scale * 15 / 100
    var rank = deg.select(col("src").as("node"), lit(scale).as("rank_micro"))
    for (round <- 1 to iters) {
      val contrib = sym
        .join(deg, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank_micro DIV deg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      rank = Checkpoints.cut(
        deg.select(col("src").as("node"))
          .join(contrib, Seq("node"), "left_outer")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("rank_micro")),
        round, reliableEvery)
    }
    rank
  }
}
