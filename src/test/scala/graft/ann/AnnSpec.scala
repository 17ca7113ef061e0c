package graft.ann

import graft.SparkTestBase
import graft.text.TextOps
import graft.util.Rng

class AnnSpec extends SparkTestBase {

  /** clustered vectors: 10 centers, 40 points each, strong cluster signal */
  private def clustered() = {
    val sps = spark; import sps.implicits._
    val centers = (0 until 10).map { c =>
      val rng = Rng.at(77, c)
      Array.fill(32)(rng.nextDouble() * 2 - 1)
    }
    val rows = (0 until 400).map { i =>
      val c = i % 10
      val rng = Rng.at(177, i)
      val v = centers(c).map(x => (x + 0.08 * (rng.nextDouble() * 2 - 1)).toFloat)
      (i.toLong, v, c)
    }
    spark.createDataset(rows).toDF("vec_id", "embedding", "label")
  }

  test("hard negatives exclude same-label vectors and match a local reference") {
    val emb = clustered()
    val queries = Ann.headLabeledQueries(emb, 5)
    val got = Ann.hardNegatives(emb, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toVector).toMap
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    queries.foreach { case (qid, qv, ql) =>
      // label filter applies BEFORE ranking — the independent reference
      val expected = all.filter { case (id, _, l) => id != qid && l != ql }
        .map { case (id, v, _) => (id, TextOps.cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toVector
      assert(got(qid) == expected, s"query $qid")
      // in this strongly clustered set every query's UNFILTERED nearest
      // neighbors are same-cluster — the filter must provably bite
      val labelOf = all.map(t => t._1 -> t._3).toMap
      assert(got(qid).forall(labelOf(_) != ql))
    }
  }

  test("IVF hard negatives: different-label only, recall >= 0.8 vs the exact path") {
    val emb = clustered()
    val queries = Ann.headLabeledQueries(emb, 5)
    val exact = Ann.hardNegatives(emb, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Ann.hardNegativesIvf(emb, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val labelOf = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val qLabel = queries.map(q => q._1 -> q._3).toMap
    assert(ivf.forall { case (q, v) => labelOf(v) != qLabel(q) })
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${ivf.size}/${exact.size})")
  }

  test("brute-force top-k matches a local exact computation") {
    val emb = clustered()
    val queries = Ann.headQueries(emb, 5)
    val result = Ann.bruteTopK(emb, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toVector).toMap

    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    queries.foreach { case (qid, qv) =>
      val expected = all.filter(_._1 != qid)
        .map { case (id, v) => (id, TextOps.cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toVector
      assert(result(qid) == expected, s"query $qid")
    }
  }

  test("top-1 neighbor shares the cluster label (exact and LSH)") {
    val emb = clustered()
    val queries = Ann.headQueries(emb, 20)
    def purity(df: org.apache.spark.sql.DataFrame): Double = {
      val top1 = df.filter(df("rank") === 1).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
      val got = top1.count { case (q, n) => (q % 10) == (n % 10) }
      got.toDouble / top1.length
    }
    assert(purity(Ann.bruteTopK(emb, queries, 1)) == 1.0)
    assert(purity(Ann.lshTopK(emb, queries, 1)) >= 0.9)
  }

  test("LSH top-k recall vs brute force is high on clustered data") {
    val emb = clustered()
    val queries = Ann.headQueries(emb, 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = pairs(Ann.bruteTopK(emb, queries, 5))
    val lsh = pairs(Ann.lshTopK(emb, queries, 5))
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF top-k recall vs brute force is high; purity holds") {
    val emb = clustered()
    val queries = Ann.headQueries(emb, 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = pairs(Ann.bruteTopK(emb, queries, 5))
    val ivf = pairs(Ann.ivfTopK(emb, queries, 5, nlist = 16, nProbe = 4))
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF is deterministic and partition-invariant") {
    val emb = clustered()
    val queries = Ann.headQueries(emb, 5)
    def res(parts: Int) = Ann.ivfTopK(emb.repartition(parts), queries, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("rank"))).toSet
    assert(res(1) == res(7))
  }

  test("results are partition-invariant") {
    val emb = clustered()
    val queries = Ann.headQueries(emb, 5)
    def res(parts: Int) = Ann.bruteTopK(emb.repartition(parts), queries, 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("rank"))).toSet
    assert(res(1) == res(7))
  }
}
