package graft.operators

import graft.SparkTestBase

class ShortestPathsSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], maxDist: Int,
      parts: Int = 1): Map[(Long, Long), Int] = {
    val sps = spark; import sps.implicits._
    ShortestPaths.distances(
        edges.toDF("src", "dst").repartition(parts), seeds.toDF("seed"), maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
  }

  test("hand-derived: layered BFS distances on a path with a branch, horizon-truncated") {
    // 1-2-3-4 path, branch 2-5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L))
    assert(run(edges, Seq(1L), maxDist = 3) == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 5L) -> 2, (1L, 4L) -> 3))
    // the horizon truncates, it does not approximate: node 4 is absent at 2
    assert(run(edges, Seq(1L), maxDist = 2) == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 5L) -> 2))
    // dist is the MIN hop count even with multiple routes (cycle 1-2-3-1)
    val cyc = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(run(cyc, Seq(1L), maxDist = 3) == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 1, (1L, 4L) -> 2))
  }

  test("multi-source: each seed carries its own ball; disconnected nodes never appear") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val d = run(edges, Seq(1L, 10L), maxDist = 6)
    assert(d == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2,
      (10L, 10L) -> 0, (10L, 11L) -> 1))
  }

  test("distances are partition-invariant on messy duplicated/looped input") {
    val rng = new scala.util.Random(77)
    val edges = Seq.fill(200)((rng.nextInt(40).toLong, rng.nextInt(40).toLong)) ++
      Seq((0L, 0L), (1L, 2L), (2L, 1L))
    val a = run(edges, Seq(0L, 1L), maxDist = 4, parts = 1)
    val b = run(edges, Seq(0L, 1L), maxDist = 4, parts = 7)
    assert(a == b)
  }
}
