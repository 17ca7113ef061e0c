package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** k-core decomposition by iterative peeling: repeatedly drop every node
  * whose degree is below k (and its edges) until the remaining subgraph is
  * stable — the standard KG-denoising primitive (a k-core survives k−1
  * removals; fringe entities and single-link noise peel away).
  *
  * The fixpoint is CONFLUENT — unique regardless of peel order or how many
  * nodes a round removes — which is what lets a fixed-round SQL unrolling
  * (the DuckDB oracle) and this converge-when-stable loop agree exactly.
  *
  * Shuffle shape per round: one degree aggregation (partial/final count on
  * node id) + two semi-joins filtering the edge list to surviving
  * endpoints — all hash-partitioned on node id, the same topology as
  * [[PageRank]] / Dedup.components, lineage cut per round through
  * [[Checkpoints.cut]] (local by default, durable with `reliableEvery`).
  * Rounds are bounded by the PEEL DEPTH, which is graph-dependent and NOT
  * bounded by the degeneracy: simultaneous peeling of a pendant path of
  * length L (degeneracy 1) takes L rounds at k = 2. Power-law graphs peel
  * shallow in practice (this corpus: ≤ 12 rounds, pinned by KCoreSpec),
  * but legitimate chain-heavy graphs can need rounds proportional to their
  * longest path — hence the generous default `maxIter` and a loud,
  * actionable error on non-convergence.
  */
object KCore {

  /** @param edges undirected (src, dst) — canonicalized/deduped here
    * @return (node, core_deg): the nodes of the k-core with their degree
    *         INSIDE the core subgraph (all ≥ k by definition) */
  def nodes(edges: DataFrame, k: Int, maxIter: Int = 200,
      reliableEvery: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = Checkpoints.cut(Triangles.canonical(edges), 0, reliableEvery)
    var nEdges = e.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val keep = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      val next = Checkpoints.cut(
        e.join(keep, Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst"),
        iter + 1, reliableEvery)
      val nNext = next.count()
      converged = nNext == nEdges
      e = next
      nEdges = nNext
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"KCore did not converge in $maxIter rounds — this graph's peel depth exceeds " +
          s"maxIter (long chains peel one hop per round); raise maxIter to proceed")
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src").agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
  }
}
