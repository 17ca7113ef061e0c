package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the filtered tail-corruption sampler against a hand-computed
  * reference on a tiny graph, plus the properties a trainer relies on:
  * determinism across partitionings, the filtered-protocol guarantees
  * (no self-negatives, no true edges), and candidate spread. */
class NegativeSamplingSpec extends SparkTestBase {

  private def edges(pairs: (Int, Int)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  /** The sampler's arithmetic, recomputed independently. */
  private def expected(pos: Seq[(Int, Int)], k: Int): Set[(Int, Int, Int, Int)] = {
    val vocab = pos.flatMap(p => Seq(p._1, p._2)).max + 1L
    val set = pos.toSet
    (for {
      (s, d) <- pos
      i <- 1 to k
      neg = ((s * 40503L + d * 69069L + i * 97561L) % vocab).toInt
      if neg != s && neg != d
      if !set.contains((math.min(s, neg), math.max(s, neg)))
    } yield (s, d, i, neg)).toSet
  }

  test("matches the hand-derived filtered candidate set on a tiny graph") {
    val pos = Seq((0, 1), (0, 2), (1, 2), (2, 3), (3, 4))
    val got = NegativeSampling.tailCorrupt(edges(pos: _*), negsPerEdge = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expected(pos, 3))
    assert(got.nonEmpty)
  }

  test("filtered protocol: no candidate equals an endpoint or a true edge") {
    val pos = (0 until 40).flatMap(i => Seq((i, (i + 1) % 40), (i, (i + 7) % 40)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val posSet = pos.toSet
    val rows = NegativeSampling.tailCorrupt(edges(pos: _*), negsPerEdge = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, d, _, n) =>
      assert(n != s && n != d, s"self-negative ($s,$d)->$n")
      assert(!posSet.contains((math.min(s, n), math.max(s, n))),
        s"unfiltered true edge ($s,$d)->$n")
    }
    // spread: the congruential mix must not collapse onto a few entities
    assert(rows.map(_._4).distinct.length >= 15,
      s"candidates collapsed onto ${rows.map(_._4).distinct.length} entities")
  }

  test("deterministic across partitionings") {
    val pos = (0 until 60).map(i => (i, (i * 13 + 5) % 97))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val one = NegativeSampling.tailCorrupt(edges(pos: _*).repartition(1), 3)
      .collect().map(_.toSeq).toSet
    val many = NegativeSampling.tailCorrupt(edges(pos: _*).repartition(7), 3)
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("an empty edge set yields zero negatives, not a crash") {
    val out = NegativeSampling.tailCorrupt(edges().limit(0), 3)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("src_id", "dst_id", "k", "neg_id"))
  }
}
