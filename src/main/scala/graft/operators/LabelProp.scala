package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** Fixed-iteration synchronous label propagation (community detection) over
  * an undirected simple graph — the entity-clustering staple of KG
  * canonicalization (densely co-mentioned entities converge to one label;
  * weak inter-community links do not pull labels across).
  *
  * Determinism is the whole design: every node starts with its own id as
  * its label; each round EVERY node simultaneously takes the most frequent
  * label among its neighbors, ties broken by the MINIMUM label. Synchronous
  * update + total-order tie-break make the result a pure function of the
  * edge set and the round count — no partitioning, scheduling, or
  * float-accumulation dependence — which is what lets the oracle re-derive
  * every round in plain SQL (unrolled MATERIALIZED CTEs). Asynchronous LPA
  * (the usual single-machine formulation) is schedule-dependent and cannot
  * be oracled; synchronous LPA can oscillate on bipartite structures, but a
  * fixed horizon makes that irrelevant: round `iters` is the contract.
  *
  * Shuffle shape per round: one equi-join of labels to the symmetric edge
  * list (hash on node id) + a (node, label) count aggregation + the argmax
  * resolved as two aggregations keyed on node (max count, then min label at
  * that count) — Catalyst reuses the exchange between them, so each round
  * costs the same topology as one PageRank round. Hub skew is aggregation
  * skew only (absorbed map-side); nothing materializes per node. Lineage is
  * cut per round through [[graft.util.Checkpoints.cut]] (local by default,
  * durable every `reliableEvery` rounds).
  */
object LabelProp {

  /** @param edges undirected (src, dst); canonicalized/deduped here
    * @param iters fixed round count (the contract — see oscillation note)
    * @param reliableEvery Some(k): storage-backed checkpoint every k rounds
    * @return (node, community) — community = the round-`iters` label */
  def communities(edges: DataFrame, iters: Int = 4,
      reliableEvery: Option[Int] = None): DataFrame = {
    require(iters >= 1, s"label propagation needs >= 1 round, got $iters")
    val e = Checkpoints.cut(Triangles.canonical(edges), 0, reliableEvery)
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = Checkpoints.cut(sym.select(col("src").as("node")).distinct(), 0, reliableEvery)
    var lab = nodes.select(col("node"), col("node").as("label"))
    for (round <- 1 to iters) {
      val counts = sym
        .join(lab.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val mx = counts.groupBy("node").agg(max("cnt").as("mx"))
      lab = Checkpoints.cut(
        counts.join(mx, "node")
          .filter(col("cnt") === col("mx"))
          .groupBy("node").agg(min("label").as("label")),
        round, reliableEvery)
    }
    lab.withColumnRenamed("label", "community")
  }
}
