package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic "random" walks over a graph — the corpus generator for
  * DeepWalk/node2vec-style graph-embedding training (Perozzi et al. 2014):
  * the walk sequences ARE the training sentences, so a KG-embedding
  * pipeline at scale runs exactly this job over the entity graph before
  * any learning starts.
  *
  * Determinism instead of RNG (the house discipline, same as
  * [[NegativeSampling]]): step t of the walk seeded at node s moves to the
  * neighbor v minimizing a mixed-congruential score of (s, t, v) — a
  * reproducible surrogate for a uniform pick whose ranks are spread per
  * (seed, step). Checkpoint-resumable, partition-invariant, and exactly
  * re-derivable in plain SQL (the oracle unrolls the steps; an RNG-based
  * walker can never be oracled). Ties in the score break on the neighbor
  * id, so the argmin is total.
  *
  * Scale shape: one walk per seed node (run it γ times with different
  * `round` salts for DeepWalk's γ walks/node); each step is one equi join
  * of the frontier against the edge list (keyed on the current node) plus
  * one per-seed argmin — 2 bounded shuffles per step, frontier size =
  * |seeds| throughout, never a blow-up. Walks follow the SYMMETRIZED edge
  * set, so no walk dead-ends on direction.
  *
  * Input: canonical (src, dst) integer edges ([[Triangles.canonical]]).
  * Output: (seed, step, node) — step 0 is the seed itself.
  */
object RandomWalks {

  private val M = 1000003L // prime modulus; score arithmetic stays well inside Long

  def walks(edges: DataFrame, steps: Int, round: Int = 0,
      reliableEvery: Option[Int] = None): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // symmetrize once; referenced every step (loop invariant = round 0,
    // durable in reliable mode like every iterative operator here)
    val sym = graft.util.Checkpoints.cut(
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst"))),
      0, reliableEvery)
    var pos = sym.select(col("src").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"))
      .localCheckpoint()
    var out = pos.select(col("seed"), lit(0).as("step"), col("node"))
    for (t <- 1 to steps) {
      val score = pmod(
        col("seed") * 40503L + lit(t.toLong + round * 1000L) * 69069L +
          col("dst") * 97561L, lit(M))
      val next = pos.join(sym, pos("node") === sym("src"))
        .select(col("seed"), col("dst"), score.as("h"))
        .groupBy("seed")
        .agg(min_by(col("dst"), struct(col("h"), col("dst"))).as("node"))
      pos = graft.util.Checkpoints.cut(next, t, reliableEvery)
      out = out.unionAll(pos.select(col("seed"), lit(t).as("step"), col("node")))
    }
    out
  }

  /** Skip-gram (center, context) pairs from a walk corpus — the word2vec-
    * style training input DeepWalk feeds its embedder: within each walk,
    * every ordered node pair at step distance 1..window, with corpus-wide
    * counts. One self-join keyed on the walk id (bounded: ≤ steps+1 rows
    * per key) plus one pair aggregation. */
  def skipGrams(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val a = walks.select(col("seed"), col("step").as("step_a"), col("node").as("center"))
    val b = walks.select(col("seed"), col("step").as("step_b"), col("node").as("context"))
    a.join(b, Seq("seed"))
      .filter(col("step_a") =!= col("step_b") &&
        abs(col("step_a") - col("step_b")) <= window)
      .groupBy("center", "context").agg(count(lit(1)).as("n_pairs"))
  }
}
