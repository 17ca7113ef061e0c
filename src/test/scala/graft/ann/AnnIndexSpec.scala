package graft.ann

import java.nio.file.Files
import graft.SparkTestBase
import graft.util.Rng
import org.apache.spark.sql.functions.col

class AnnIndexSpec extends SparkTestBase {

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
      (i.toLong, v)
    }
    spark.createDataset(rows).toDF("vec_id", "embedding")
  }

  test("materialized IVF index returns exactly the fused ivfTopK results") {
    val emb = clustered()
    val dir = Files.createTempDirectory("ivf").toString
    Ann.buildIvfIndex(emb, dir, nlist = 16)
    val queries = Ann.headQueries(emb, 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val fused = rows(Ann.ivfTopK(emb, queries, 5, nlist = 16, nProbe = 4))
    val indexed = rows(Ann.ivfSearchIndex(spark, dir, queries, 5, nProbe = 4))
    assert(indexed == fused)
  }

  private def clusteredLabeled() = {
    val sps = spark; import sps.implicits._
    val centers = (0 until 10).map { c =>
      val rng = Rng.at(77, c)
      Array.fill(32)(rng.nextDouble() * 2 - 1)
    }
    val rows = (0 until 400).map { i =>
      val c = i % 10
      val rng = Rng.at(177, i)
      val v = centers(c).map(x => (x + 0.08 * (rng.nextDouble() * 2 - 1)).toFloat)
      (i.toLong, v, c % 3) // 3 labels, orthogonal-ish to clusters
    }
    spark.createDataset(rows).toDF("vec_id", "embedding", "label")
  }

  test("indexed hard negatives equal the fused IVF miner exactly, partition-pruned") {
    val emb = clusteredLabeled()
    val dir = Files.createTempDirectory("ivf_hn").toString
    Ann.buildIvfIndex(emb, dir, nlist = 16) // labels ride the index rows
    val queries = Ann.headLabeledQueries(emb, 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val fused = rows(Ann.hardNegativesIvf(emb, queries, 5, nlist = 16, nProbe = 4))
    val indexed = rows(Ann.hardNegativesIndexed(spark, dir, queries, 5, nProbe = 4))
    assert(indexed.nonEmpty && indexed == fused)
    // every mined negative carries a different label than its query
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qLabels = queries.map { case (qid, _, l) => qid -> l }.toMap
    indexed.foreach { case (qid, vid, _, _) => assert(labels(vid) != qLabels(qid)) }
    // the mining scan is partition-pruned to the probed list directories
    val plan = Ann.hardNegativesIndexed(spark, dir, queries.take(1), 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list"), plan)
  }

  test("probe scan is partition-pruned to the probed lists") {
    val emb = clustered()
    val dir = Files.createTempDirectory("ivf").toString
    Ann.buildIvfIndex(emb, dir, nlist = 16)
    // one query, nProbe 2: at most 2 of the 16 list directories may be read
    val queries = Ann.headQueries(emb, 1)
    val df = Ann.ivfSearchIndex(spark, dir, queries, 3, nProbe = 2)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("list"), scan)
    val listDirs = new java.io.File(s"$dir/data").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("list="))
    // k-means may leave a few lists empty; pruning is only meaningful if the
    // index actually fans out over many directories
    assert(listDirs >= 10, s"index should fan out over many list directories, saw $listDirs")
    // functional check: results only come from the probed lists
    val probedData = spark.read.parquet(s"$dir/data")
    val got = df.select("vec_id").collect().map(_.getLong(0)).toSet
    val lists = probedData.filter(col("vec_id").isin(got.toSeq.map(java.lang.Long.valueOf): _*))
      .select("list").distinct().collect().map(_.getInt(0)).toSet
    assert(lists.size <= 2, s"results came from ${lists.size} lists, nProbe=2")
  }
}
