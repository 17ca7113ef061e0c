package graft.operators

import graft.SparkTestBase

/** Common-neighbor link prediction: hand-derived counts on a tiny graph,
  * brute-force parity on a random graph, and the hub cap. */
class LinkPredictSpec extends SparkTestBase {

  private def edges(pairs: (Long, Long)*) = {
    val s = spark; import s.implicits._
    pairs.toDF("src", "dst")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("hand-derived counts on a tiny graph") {
    // 0-1, 0-2, 1-2, 1-3, 2-3, 3-4: non-edges are (0,3) via {1,2},
    // (1,4) via {3}, (2,4) via {3}; (0,4) shares no neighbor
    val got = collect(LinkPredict.commonNeighbors(
      edges((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)), 64, 10))
    assert(got == Seq((0L, 3L, 2L), (1L, 4L, 1L), (2L, 4L, 1L)))
  }

  test("matches a local brute force on a random graph") {
    val rng = new scala.util.Random(17)
    val pairs = (0 until 200).map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = pairs.toSet
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b && !edgeSet((a, b))
      n = adj(a).intersect(adj(b)).size if n > 0
    } yield (a, b, n.toLong))
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
    val got = collect(LinkPredict.commonNeighbors(edges(pairs: _*), 64, 20))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("resource-allocation index matches a local brute force, micro-weight exact") {
    val rng = new scala.util.Random(29)
    val pairs = (0 until 200).map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = pairs.toSet
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b && !edgeSet((a, b))
      common = adj(a).intersect(adj(b)) if common.nonEmpty
      w = common.toSeq.map(z => 1000000000000L / adj(z).size).sum
    } yield (a, b, w))
      .sortBy { case (a, b, w) => (-w, a, b) }.take(20)
    val got = collect(LinkPredict.resourceAllocation(edges(pairs: _*), 64, 20))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("the hub cap bounds wedge fan-out") {
    // star: node 0 adjacent to 1..100 — with cap 10, wedges through hub 0
    // come from its first 10 neighbors only: C(10,2) candidate pairs
    val star = (1 to 100).map(i => (0L, i.toLong))
    val got = collect(LinkPredict.commonNeighbors(edges(star: _*), 10, 1000))
    assert(got.size == 10 * 9 / 2)
    assert(got.forall { case (a, b, n) => n == 1L && a >= 1 && b <= 10 })
  }
}
