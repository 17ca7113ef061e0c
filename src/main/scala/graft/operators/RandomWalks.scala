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

  /** node2vec-biased walks (Grover & Leskovec 2016) on the same
    * deterministic argmin scheme: stepping from `prev` through `node`, each
    * neighbor x is weighted by the 3-case second-order bias —
    * 1/p if x == prev (return), 1 if x is a neighbor of prev (BFS-ish),
    * 1/q otherwise (DFS-ish) — and the walk moves to the neighbor
    * minimizing `hash * multiplier`, where the multiplier is the micro-
    * scaled INVERSE weight (p·10⁶, 10⁶, q·10⁶): smaller weight ⇒ larger
    * effective score ⇒ picked less, the deterministic surrogate for
    * weighted sampling, integer-exact so the oracle re-derives it in SQL.
    * Step 1 is uniform (no previous node), exactly [[walks]]' step 1; with
    * p = q = 1 every multiplier is 10⁶ and the whole walk reproduces
    * [[walks]] EXACTLY (spec-locked).
    *
    * Scale shape: the frontier carries (seed, prev, node) — still one row
    * per seed; each step adds one extra equi join (the dist-1 flag against
    * the symmetrized edge list on (prev, x)) to [[walks]]' two — 3 bounded
    * shuffles/step, never a blow-up. */
  def node2vecWalks(edges: DataFrame, steps: Int, p: Double = 1.0, q: Double = 1.0,
      round: Int = 0, reliableEvery: Option[Int] = None): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(p > 0 && q > 0, s"p and q must be > 0, got p=$p q=$q")
    val pM = math.round(p * 1e6)
    val qM = math.round(q * 1e6)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val sym = graft.util.Checkpoints.cut(
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst"))),
      0, reliableEvery)
    val pos0 = sym.select(col("src").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"))
      .localCheckpoint()
    var out = pos0.select(col("seed"), lit(0).as("step"), col("node"))
    def h(t: Int) = pmod(
      col("seed") * 40503L + lit(t.toLong + round * 1000L) * 69069L +
        col("dst") * 97561L, lit(M))
    // step 1: uniform over the seed's neighbors (identical to walks')
    var pos = graft.util.Checkpoints.cut(
      pos0.join(sym, pos0("node") === sym("src"))
        .select(col("seed"), col("dst"), h(1).as("hw"))
        .groupBy("seed")
        .agg(min_by(col("dst"), struct(col("hw"), col("dst"))).as("node"))
        .select(col("seed"), col("seed").as("prev"), col("node")),
      1, reliableEvery)
    out = out.unionAll(pos.select(col("seed"), lit(1).as("step"), col("node")))
    val d1 = sym.select(col("src").as("prev"), col("dst"), lit(1).as("is_d1"))
    for (t <- 2 to steps) {
      val mult = when(col("dst") === col("prev"), lit(pM))
        .when(col("is_d1").isNotNull, lit(1000000L))
        .otherwise(lit(qM))
      val next = pos.join(sym, pos("node") === sym("src"))
        .select(col("seed"), col("prev"), col("node"), col("dst"))
        .join(d1, Seq("prev", "dst"), "left")
        .select(col("seed"), col("node"), col("dst"), (h(t) * mult).as("hw"))
        .groupBy("seed")
        .agg(min_by(struct(col("dst"), col("node")), struct(col("hw"), col("dst"))).as("nx"))
        .select(col("seed"), col("nx.node").as("prev"), col("nx.dst").as("node"))
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
