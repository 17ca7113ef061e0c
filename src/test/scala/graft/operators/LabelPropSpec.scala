package graft.operators

import graft.SparkTestBase

class LabelPropSpec extends SparkTestBase {

  /** Independent in-memory reference: the SAME contract (synchronous
    * update, most-frequent neighbor label, min tie-break, fixed rounds)
    * over adjacency maps — no Spark, no shared code with the operator. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val canon = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val adj = (canon ++ canon.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (n, nbrs) =>
        val freq = nbrs.map(lab).groupBy(identity).view.mapValues(_.size)
        val best = freq.values.max
        n -> freq.collect { case (l, c) if c == best => l }.min
      }
    }
    lab
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int = 4): Map[Long, Long] = {
    val sps = spark; import sps.implicits._
    LabelProp.communities(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand-derived: one round on a star takes the hub label; the hub takes the min leaf") {
    // star 5-(6,7,8): leaves see only {5} -> 5; hub sees {6,7,8} all count 1 -> min 6
    val star = Seq((5L, 6L), (5L, 7L), (5L, 8L))
    assert(run(star, iters = 1) == Map(5L -> 6L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
    // round 2: leaves see hub label 6 -> 6; hub sees leaf labels {5,5,5} -> 5
    // (the bipartite oscillation the fixed horizon contract embraces)
    assert(run(star, iters = 2) == Map(5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 6L))
  }

  test("two cliques joined by a bridge: intra-clique labels agree, and the result matches the reference at every horizon") {
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val edges = cliqueA ++ cliqueB ++ Seq((4L, 10L))
    for (iters <- 1 to 5) {
      assert(run(edges, iters) == refLpa(edges, iters), s"iters=$iters")
    }
    // at round 3 each clique has internally converged on its own min id
    val r3 = run(edges, 3)
    assert((1L to 3L).map(r3).toSet.size == 1)
    assert((11L to 13L).map(r3).toSet.size == 1)
  }

  test("matches the in-memory reference on a messy random graph, partition-invariantly") {
    val rng = new scala.util.Random(777)
    // dup edges, self-loops, both orientations — canonicalization's job
    val edges = Seq.fill(160)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    val expect = refLpa(edges, 4)
    assert(run(edges, 4, parts = 1) == expect)
    assert(run(edges, 4, parts = 13) == expect)
  }

  test("rounds are validated") {
    val sps = spark; import sps.implicits._
    val ex = intercept[IllegalArgumentException](
      LabelProp.communities(Seq((1L, 2L)).toDF("src", "dst"), iters = 0))
    assert(ex.getMessage.contains("round"))
  }
}
