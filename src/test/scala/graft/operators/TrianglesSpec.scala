package graft.operators

import graft.SparkTestBase
import graft.util.Rng

class TrianglesSpec extends SparkTestBase {

  private def countOf(edges: Seq[(Long, Long)]): Long = {
    val sp = spark; import sp.implicits._
    Triangles.count(edges.toDF("src", "dst")).collect()(0).getLong(0)
  }

  /** reference: enumerate all vertex triples over the canonical edge set */
  private def brute(edges: Seq[(Long, Long)]): Long = {
    val e = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    vs.combinations(3).count { case Seq(x, y, z) =>
      e((x, y)) && e((x, z)) && e((y, z))
    }
  }

  test("known graphs: triangle, K4, square, star") {
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == 1L)
    // K4 has C(4,3) = 4 triangles
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(countOf(k4) == 4L)
    // 4-cycle: none
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == 0L)
    // star (hub of high degree): none — and the orientation must not wedge
    // out of the hub (all star edges point INTO it)
    val star = (2L to 40L).map(v => (1L, v))
    assert(countOf(star) == 0L)
  }

  test("duplicates, reversed duplicates and self-loops are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(countOf(messy) == 1L)
  }

  test("random graphs match the brute-force count") {
    val rng = new Rng(20260816L)
    for (trial <- 1 to 3) {
      val n = 24
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rng.nextDouble() < 0.25
      } yield (a, b)) ++ Seq((3L, 3L), (5L, 2L)) // loop + reversed dup
      assert(countOf(edges) == brute(edges), s"trial $trial")
    }
  }
}
