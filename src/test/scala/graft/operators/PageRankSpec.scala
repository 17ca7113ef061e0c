package graft.operators

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {

  /** independent reference implementation of the integer update */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val sym = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = deg.keys.map(n => n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int = 1): Map[Long, Long] = {
    val sps = spark; import sps.implicits._
    PageRank.ranks(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the hand-derived integer update on a triangle with a pendant") {
    // 1-2-3 triangle, pendant 4 on 3: deg = (2, 2, 3, 1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    // one round by hand (scale 1e6): contrib(1) = r2/2 + r3/3 = 500000+333333
    // rank(1) = 150000 + 85*833333/100 = 150000 + 708333 = 858333
    assert(run(edges, 1)(1L) == 858333L)
    assert(run(edges, 1) == ref(edges, 1))
    assert(run(edges, 5) == ref(edges, 5))
  }

  test("hub ranks above spokes; results are exactly partition-invariant") {
    // star of 10 spokes + a detached edge; messy duplicates/loops in input
    val edges = Seq.tabulate(10)(i => (100L, i.toLong)) ++
      Seq((200L, 201L), (201L, 200L), (5L, 5L), (0L, 100L))
    val a = run(edges, 5, parts = 1)
    val b = run(edges, 5, parts = 7)
    assert(a == b, "integer ranks must not depend on partitioning")
    assert(a == ref(edges, 5))
    assert(a(100L) > a(0L) && a(100L) > a(200L))
  }

  test("reliable checkpoint option: identical ranks, durable files, truncated lineage") {
    val sps = spark; import sps.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val ckpt = java.nio.file.Files.createTempDirectory("pr_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val rel = PageRank.ranks(edges, iters = 5, reliableEvery = Some(2))
    val relMap = rel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relMap == ref(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), 5),
      "reliable-checkpoint path must be bit-identical to the default path")
    // durable: the checkpoint dir holds RDD checkpoint data written this run
    val files = java.nio.file.Files.walk(ckpt).iterator()
    var rddDirs = 0
    while (files.hasNext) { if (files.next().getFileName.toString.startsWith("rdd-")) rddDirs += 1 }
    assert(rddDirs >= 3, s"expected checkpointed RDDs for rounds 0/2/4, found $rddDirs dirs")
    // truncated lineage: the result reads back from a (local or reliable)
    // checkpoint scan, not a 5-round join tree
    assert(rel.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
    // asking for durability without a checkpoint dir must fail loudly — but
    // there is no unset API, so lock the require path via the k<=0 guard
    intercept[IllegalArgumentException] {
      PageRank.ranks(edges, iters = 1, reliableEvery = Some(0))
    }
  }
}
