package graft.operators

import graft.SparkTestBase
import graft.pipeline.KgPipeline
import graft.synth.PagesSynth

class KCoreSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)], k: Int, parts: Int = 1): Map[Long, Long] = {
    val sps = spark; import sps.implicits._
    KCore.nodes(edges.toDF("src", "dst").repartition(parts), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand-derived: a pendant chain peels away, the triangle is the 2-core") {
    // triangle 1-2-3 plus chain 3-4-5: node 5 (deg 1) peels, then 4 peels
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(run(edges, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=1 keeps everything (original degrees); k=3 empties this graph
    assert(run(edges, k = 1).keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(run(edges, k = 3).isEmpty)
  }

  test("cascading peel: a dangling chain unravels link by link; a bridge PATH survives (degree 2 throughout)") {
    // triangle (1,2,3) with dangling chain 3-5-6: 6 peels (deg 1), which
    // drops 5 to deg 1 -> second-round peel — the cascade the fixpoint
    // definition requires (a one-pass degree filter would keep 5)
    val dangling = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (5L, 6L))
    assert(run(dangling, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // but a bridge CONNECTING two triangles has degree 2 along the path —
    // it is part of the 2-core (k-core is not bridge removal)
    val bridged = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (5L, 6L), (6L, 7L),
      (7L, 8L), (8L, 9L), (7L, 9L))
    val core = run(bridged, k = 2)
    assert(core.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L))
    assert(core(5L) == 2L && core(3L) == 3L && core(7L) == 3L)
  }

  test("fixpoint is partition-invariant (confluence) on messy input") {
    val rng = new scala.util.Random(4242)
    val edges = Seq.fill(300)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b } ++ Seq((100L, 100L), (1L, 2L), (2L, 1L))
    val a = run(edges, k = 3, parts = 1)
    val b = run(edges, k = 3, parts = 7)
    assert(a == b, "k-core must not depend on partitioning")
    assert(a.values.forall(_ >= 3L), "every core node keeps >= k in-core neighbors")
  }

  test("corpus peel depth stays within the oracle's 12-round unrolling (sf0.001 + sf0.01)") {
    // the DuckDB oracle unrolls exactly 12 peel rounds; confluence makes
    // that equal to the engine's adaptive fixpoint IFF depth <= 12 — pin it
    // at both driver scales (maxIter = 13: 12 peels + the confirming round)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val links = KgPipeline.links(
        KgPipeline.extracted(PagesSynth.pages(spark, PagesSynth.pageCount(dir))),
        PagesSynth.aliasMap).toDF().select("url", "entity_iri").distinct()
      val edges = Triangles.groupedPairs(links, "url", "entity_iri", 64)
      val core = KCore.nodes(edges, k = 3, maxIter = 13)
      assert(core.count() > 0, s"$dir: 3-core unexpectedly empty")
    }
  }
}
