package graft.operators

import graft.SparkTestBase

/** Deterministic walks: hand-derived steps on a tiny graph (the score
  * arithmetic recomputed by hand in the comments), an independent local
  * reference on random graphs, partition invariance, and the round salt. */
class RandomWalksSpec extends SparkTestBase {

  private def edges(pairs: (Long, Long)*) = {
    val s = spark; import s.implicits._
    pairs.toDF("src", "dst")
  }

  /** The walk rule, recomputed independently: symmetrize, then step t from
    * node u (walk seeded at s) to the neighbor v minimizing
    * ((s*40503 + (t + round*1000)*69069 + v*97561) mod 1000003, v). */
  private def refWalks(pairs: Seq[(Long, Long)], steps: Int, round: Int): Set[(Long, Int, Long)] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val out = Set.newBuilder[(Long, Int, Long)]
    adj.keys.foreach { seed =>
      var node = seed
      out += ((seed, 0, node))
      (1 to steps).foreach { t =>
        node = adj(node).minBy(v =>
          (Math.floorMod(seed * 40503L + (t + round * 1000L) * 69069L + v * 97561L,
            1000003L), v))
        out += ((seed, t, node))
      }
    }
    out.result()
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("matches the independent reference on a messy random graph") {
    val rng = new scala.util.Random(3)
    val pairs = (0 until 150).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val got = collect(RandomWalks.walks(edges(pairs: _*), steps = 6))
    assert(got == refWalks(pairs, 6, 0))
    assert(got.nonEmpty)
  }

  test("every walk advances along edges and emits one node per step") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (1L, 3L))
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    val got = collect(RandomWalks.walks(edges(pairs: _*), steps = 5))
    val bySeed = got.groupBy(_._1)
    assert(bySeed.keySet == Set(0L, 1L, 2L, 3L))
    bySeed.foreach { case (seed, rows) =>
      val path = rows.toSeq.sortBy(_._2).map(_._3)
      assert(rows.size == 6, s"seed $seed: one node per step 0..5")
      assert(path.head == seed)
      path.sliding(2).foreach { case Seq(a, b) =>
        assert(sym.contains((a, b)), s"step $a->$b must be an edge")
      }
    }
  }

  test("partition-invariant and different round salts diverge") {
    val rng = new scala.util.Random(9)
    val pairs = (0 until 80).map(_ => (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter(p => p._1 != p._2).distinct
    val df = edges(pairs: _*)
    val a = collect(RandomWalks.walks(df.repartition(1), 4))
    val b = collect(RandomWalks.walks(df.repartition(7), 4))
    assert(a == b)
    val salted = collect(RandomWalks.walks(df, 4, round = 1))
    assert(salted != a, "a different round salt must produce different walks")
    assert(salted == refWalks(pairs, 4, 1))
  }

  /** node2vec rule re-derived independently: step 1 uniform; step t ≥ 2
    * argmin of hash·mult with mult = p·10⁶ (return), 10⁶ (neighbor of
    * prev), q·10⁶ (else); ties on v. */
  private def refNode2vec(pairs: Seq[(Long, Long)], steps: Int, p: Double, q: Double,
      round: Int): Set[(Long, Int, Long)] = {
    val pM = math.round(p * 1e6); val qM = math.round(q * 1e6)
    val symPairs = (pairs ++ pairs.map(x => (x._2, x._1))).distinct
    val adj = symPairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val edgeSet = symPairs.toSet
    def h(seed: Long, t: Int, v: Long) =
      Math.floorMod(seed * 40503L + (t + round * 1000L) * 69069L + v * 97561L, 1000003L)
    val out = Set.newBuilder[(Long, Int, Long)]
    adj.keys.foreach { seed =>
      var prev = seed
      var node = seed
      out += ((seed, 0, node))
      if (steps >= 1) {
        val n1 = adj(node).minBy(v => (h(seed, 1, v), v))
        prev = node; node = n1
        out += ((seed, 1, node))
      }
      (2 to steps).foreach { t =>
        val nx = adj(node).minBy { v =>
          val mult = if (v == prev) pM
            else if (edgeSet((prev, v))) 1000000L else qM
          (h(seed, t, v) * mult, v)
        }
        prev = node; node = nx
        out += ((seed, t, node))
      }
    }
    out.result()
  }

  test("node2vec with p = q = 1 reproduces the unbiased walks exactly") {
    val rng = new scala.util.Random(5)
    val pairs = (0 until 120).map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val df = edges(pairs: _*)
    assert(collect(RandomWalks.node2vecWalks(df, steps = 5)) ==
      collect(RandomWalks.walks(df, steps = 5)))
  }

  test("node2vec matches the independent reference and the bias changes paths") {
    val rng = new scala.util.Random(13)
    val pairs = (0 until 150).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val df = edges(pairs: _*)
    val biased = collect(RandomWalks.node2vecWalks(df, steps = 6, p = 0.25, q = 4.0))
    assert(biased == refNode2vec(pairs, 6, 0.25, 4.0, 0))
    assert(biased != collect(RandomWalks.walks(df, steps = 6)),
      "a strong return/in-out bias must change at least one path")
    // partition invariance, like the unbiased walker
    assert(collect(RandomWalks.node2vecWalks(df.repartition(7), steps = 6, p = 0.25, q = 4.0)) == biased)
  }

  test("skip-gram pairs equal a local window expansion over the same walks") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (1L, 3L), (3L, 4L))
    val walks = RandomWalks.walks(edges(pairs: _*), steps = 5)
    val got = RandomWalks.skipGrams(walks, window = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val w = collect(walks).toSeq
    val want = (for {
      (s1, t1, a) <- w; (s2, t2, b) <- w
      if s1 == s2 && t1 != t2 && math.abs(t1 - t2) <= 2
    } yield (a, b)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
