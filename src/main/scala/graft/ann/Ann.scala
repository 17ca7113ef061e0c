package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteTopK]]: exact baseline. The (small) query set is broadcast; each
  *   partition scores its vectors against every query and keeps a local
  *   top-k, so the shuffle is only Q x k x partitions rows — never the
  *   full cross product.
  * - [[lshTopK]]: scale path. Vectors and queries are bucketed by fixed
  *   random-hyperplane LSH; scoring happens only within (multi-probed)
  *   buckets. Same output schema; recall < 1 by construction.
  */
object Ann {

  final case class Scored(query_id: Long, vec_id: Long, cosine: Double)

  /** Exact top-k cosine neighbors for each query (excluding self-matches). */
  def bruteTopK(emb: DataFrame, queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries)
    val partials = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        // local top-k heap per query: bounds memory at Q*k per partition
        val heaps = Array.fill(qs.length)(new scala.collection.mutable.PriorityQueue[Scored]()(
          Ordering.by[Scored, Double](s => -s.cosine))) // min-heap via negation
        it.foreach { case (id, v) =>
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (qid != id) {
              val c = TextOps.cosine(qv, v)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(Scored(qid, id, c))
              else if (c > h.head.cosine) { h.dequeue(); h.enqueue(Scored(qid, id, c)) }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap(_.iterator)
      }
    // merge partition-local top-ks: tiny shuffle keyed by query
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining — the contrastive-training staple: for each
    * LABELED query, the k most-similar vectors carrying a DIFFERENT label
    * (the negatives that actually move an InfoNCE/triplet loss; easy
    * negatives teach nothing). Same single-scan per-partition-heap shape
    * as [[bruteTopK]] — the label test is one extra comparison per
    * candidate, so the exact path costs the same as plain kNN. At corpus
    * scale the IVF index path applies the identical label filter on the
    * probed lists. */
  def hardNegatives(emb: DataFrame, queries: Array[(Long, Array[Float], Int)], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries)
    val partials = emb
      .select(col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val qs = bq.value
        val heaps = Array.fill(qs.length)(new scala.collection.mutable.PriorityQueue[Scored]()(
          Ordering.by[Scored, Double](s => -s.cosine)))
        it.foreach { case (id, v, label) =>
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qLabel) = qs(qi)
            if (qid != id && label != qLabel) {
              val c = TextOps.cosine(qv, v)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(Scored(qid, id, c))
              else if (c > h.head.cosine) { h.dequeue(); h.enqueue(Scored(qid, id, c)) }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap(_.iterator)
      }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-path hard negatives — the corpus-scale form: candidates limited to
    * the query's nProbe nearest centroid lists (exactly [[ivfTopK]]'s scan)
    * with the different-label test applied inline, so the probe pruning and
    * the label filter compose in one pass. Same recall/exactness trade as
    * plain IVF search; [[hardNegatives]] is the exact baseline. */
  def hardNegativesIvf(emb: DataFrame, queries: Array[(Long, Array[Float], Int)], k: Int,
      nlist: Int = 16, nProbe: Int = 4, sampleN: Int = 2048, iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(emb, nlist, sampleN, iters)
    val probes = labeledProbeMap(cents, queries, nProbe)
    val bc = spark.sparkContext.broadcast(cents)
    val bp = spark.sparkContext.broadcast(probes)
    val partials = emb
      .select(col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val cs = bc.value
        val pm = bp.value
        it.flatMap { case (id, v, label) =>
          val best = assign(cs, v)
          pm.getOrElse(best, Vector.empty).collect {
            case (qid, qv, qLabel) if qid != id && label != qLabel =>
              Scored(qid, id, TextOps.cosine(qv, v))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** First `q` vectors with their labels (the hard-negative query set). */
  def headLabeledQueries(emb: DataFrame, q: Int): Array[(Long, Array[Float], Int)] =
    emb.select(col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
      .orderBy("vec_id").limit(q).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))

  /** LSH-bucketed top-k: candidates limited to vectors sharing the query's
    * hyperplane bucket or any single-bit-flip probe of it. */
  def lshTopK(emb: DataFrame, queries: Array[(Long, Array[Float])], k: Int, bits: Int = 10): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val probed: Map[Int, Vector[(Long, Array[Float])]] = queries.toVector
      .flatMap { case (qid, qv) =>
        val b = TextOps.hyperplaneBucket(qv, bits)
        (b +: (0 until bits).map(i => b ^ (1 << i))).distinct.map(pb => (pb, (qid, qv)))
      }
      .groupBy(_._1).map { case (b, v) => (b, v.map(_._2)) }
    val bq = spark.sparkContext.broadcast(probed)
    val partials = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val buckets = bq.value
        it.flatMap { case (id, v) =>
          buckets.getOrElse(TextOps.hyperplaneBucket(v, bits), Vector.empty).collect {
            case (qid, qv) if qid != id => Scored(qid, id, TextOps.cosine(qv, v))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) top-k: the cluster-scale ANN path. A small, seeded
    * k-means (Lloyd) trains `nlist` centroids driver-side on a bounded
    * deterministic sample; each vector is assigned to its nearest centroid in
    * ONE narrow pass that also scores it against exactly the queries probing
    * that centroid's list (queries probe their `nProbe` nearest centroids).
    * Per-query work drops from O(N) to ~O(N * nProbe / nlist); the only
    * shuffle is the tiny partition-local-top-k merge, same as [[bruteTopK]].
    * At 100 TB the centroid assignment would be persisted as a partition
    * column so probes prune file groups — here it stays fused in the scan. */
  def ivfTopK(emb: DataFrame, queries: Array[(Long, Array[Float])], k: Int,
      nlist: Int = 16, nProbe: Int = 4, sampleN: Int = 2048, iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(emb, nlist, sampleN, iters)
    val probes = probeMap(cents, queries, nProbe)

    val bc = spark.sparkContext.broadcast(cents)
    val bp = spark.sparkContext.broadcast(probes)
    val partials = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        val pm = bp.value
        it.flatMap { case (id, v) =>
          val best = assign(cs, v)
          pm.getOrElse(best, Vector.empty).collect {
            case (qid, qv) if qid != id => Scored(qid, id, TextOps.cosine(qv, v))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Seeded Lloyd's k-means over a deterministic bounded sample (collected to
    * the driver — the sample is O(sampleN * dim), never the table). */
  def ivfCentroids(emb: DataFrame, nlist: Int, sampleN: Int, iters: Int): Array[Array[Float]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = emb
      .select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .sort("vec_id").limit(sampleN).collect().map(_._2)
    require(sample.nonEmpty, "empty embedding table")
    val dim = sample.head.length
    // evenly-spaced deterministic init (sample is vec_id-ordered)
    var cents = Array.tabulate(math.min(nlist, sample.length)) { i =>
      sample((i.toLong * sample.length / math.min(nlist, sample.length)).toInt).clone()
    }
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var best = 0; var bestC = Double.MinValue
        var ci = 0
        while (ci < cents.length) {
          val c = TextOps.cosine(v, cents(ci))
          if (c > bestC) { bestC = c; best = ci }
          ci += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      cents = cents.indices.toArray.map { ci =>
        if (counts(ci) == 0) cents(ci)
        else Array.tabulate(dim)(d => (sums(ci)(d) / counts(ci)).toFloat)
      }
      iter += 1
    }
    cents
  }

  /** THE probed-list selection, generic in the query payload: each query
    * probes its nProbe nearest centroids (deterministic tie-break on
    * centroid index). Every IVF path — plain search, fused and indexed
    * hard negatives — derives its probe map HERE, so their candidate sets
    * agree by construction and a tie-break change can never fork them. */
  private def probeMapBy[Q](cents: Array[Array[Float]], queries: Array[Q],
      nProbe: Int)(vec: Q => Array[Float]): Map[Int, Vector[Q]] =
    queries.toVector
      .flatMap { q =>
        cents.indices.map(ci => (TextOps.cosine(vec(q), cents(ci)), ci))
          .sortBy { case (c, ci) => (-c, ci) }
          .take(nProbe).map { case (_, ci) => (ci, q) }
      }
      .groupBy(_._1).map { case (ci, v) => (ci, v.map(_._2)) }

  private def probeMap(cents: Array[Array[Float]], queries: Array[(Long, Array[Float])],
      nProbe: Int): Map[Int, Vector[(Long, Array[Float])]] =
    probeMapBy(cents, queries, nProbe)(_._2)

  private def labeledProbeMap(cents: Array[Array[Float]],
      queries: Array[(Long, Array[Float], Int)],
      nProbe: Int): Map[Int, Vector[(Long, Array[Float], Int)]] =
    probeMapBy(cents, queries, nProbe)(_._2)

  /** Nearest-centroid assignment, identical tie-break to the fused scan in
    * [[ivfTopK]] (first index wins on equal cosine). */
  private def assign(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestC = Double.MinValue
    var ci = 0
    while (ci < cs.length) {
      val c = TextOps.cosine(v, cs(ci))
      if (c > bestC) { bestC = c; best = ci }
      ci += 1
    }
    best
  }

  /** Deterministic (vec_id, list) assignment table — the IVF analog of an
    * LSH bucket dump; oracles re-derive the candidate join + ranking from
    * this. Same centroids as [[ivfTopK]] with equal parameters. */
  def listAssignments(emb: DataFrame, nlist: Int = 16, sampleN: Int = 2048,
      iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ivfCentroids(emb, nlist, sampleN, iters))
    emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, assign(cs, v)) }
      }.toDF("vec_id", "list")
  }

  /** Deterministic (query_id, probe_list) table for a query set. */
  def queryProbes(emb: DataFrame, queries: Array[(Long, Array[Float])],
      nProbe: Int = 4, nlist: Int = 16, sampleN: Int = 2048, iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(emb, nlist, sampleN, iters)
    probeMap(cents, queries, nProbe).toSeq
      .flatMap { case (list, qs) => qs.map { case (qid, _) => (qid, list) } }
      .toDF("query_id", "probe_list")
  }

  /** Materialize the IVF index: vectors written as parquet PARTITIONED BY
    * their inverted-list id (`indexDir/data/list=<i>/…`), centroids beside
    * them (`indexDir/centroids`). This is the 100 TB form of [[ivfTopK]]'s
    * fused assignment: the list id becomes a storage partition column, so a
    * probe reads only `nProbe` of `nlist` directories — partition pruning at
    * the file index, before any I/O ([[ivfSearchIndex]]; `AnnIndexSpec`
    * locks `PartitionFilters` in the scan). Assignment is one narrow pass;
    * the write shuffles nothing (partitionBy fans out within each task). */
  def buildIvfIndex(emb: DataFrame, indexDir: String, nlist: Int = 16,
      sampleN: Int = 2048, iters: Int = 8): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(emb, nlist, sampleN, iters)
    val bc = spark.sparkContext.broadcast(cents)
    // payload metadata (the label column, when the table carries one) rides
    // the index rows, so downstream filtered searches — hard-negative
    // mining's different-label test — run off the index alone
    val data =
      if (emb.columns.contains("label"))
        emb.select(col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
          .as[(Long, Array[Float], Int)]
          .mapPartitions { it =>
            val cs = bc.value
            it.map { case (id, v, label) => (assign(cs, v), id, v, label) }
          }
          .toDF("list", "vec_id", "embedding", "label")
      else
        emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
          .mapPartitions { it =>
            val cs = bc.value
            it.map { case (id, v) => (assign(cs, v), id, v) }
          }
          .toDF("list", "vec_id", "embedding")
    data.write.mode("overwrite").partitionBy("list").parquet(s"$indexDir/data")
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Hard-negative mining off the MATERIALIZED index — [[hardNegativesIvf]]
    * run against the stored, partition-pruned lists instead of the fused
    * scan: the probe prunes `list=<i>` directories at the file index
    * (`PartitionFilters`, locked by `AnnIndexSpec`) and the different-label
    * test applies inline on the index rows (labels were stored at build).
    * Results are EXACTLY [[hardNegativesIvf]]'s on the same centroids
    * (shared [[labeledProbeMap]]; spec-locked). */
  def hardNegativesIndexed(spark: SparkSession, indexDir: String,
      queries: Array[(Long, Array[Float], Int)], k: Int, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = readCentroids(spark, indexDir)
    val probes = labeledProbeMap(cents, queries, nProbe)
    val probedLists = probes.keys.toSeq.sorted
    val bp = spark.sparkContext.broadcast(probes)
    val partials = spark.read.parquet(s"$indexDir/data")
      .filter(col("list").isin(probedLists: _*)) // prunes list=<i> directories
      .select(col("list"), col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
      .as[(Int, Long, Array[Float], Int)]
      .mapPartitions { it =>
        val pm = bp.value
        it.flatMap { case (list, id, v, label) =>
          pm.getOrElse(list, Vector.empty).collect {
            case (qid, qv, qLabel) if qid != id && label != qLabel =>
              Scored(qid, id, TextOps.cosine(qv, v))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The stored centroid table, list-ordered. */
  private def readCentroids(spark: SparkSession, indexDir: String): Array[Array[Float]] =
    spark.read.parquet(s"$indexDir/centroids")
      .select("list", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)

  /** Probe a materialized IVF index: same results as [[ivfTopK]] with the
    * same parameters, but the candidate read is partition-pruned to the
    * probed lists instead of scanning and re-assigning every vector. */
  def ivfSearchIndex(spark: SparkSession, indexDir: String,
      queries: Array[(Long, Array[Float])], k: Int, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = readCentroids(spark, indexDir)
    val probes = probeMap(cents, queries, nProbe)
    val probedLists = probes.keys.toSeq.sorted
    val bp = spark.sparkContext.broadcast(probes)
    val partials = spark.read.parquet(s"$indexDir/data")
      .filter(col("list").isin(probedLists: _*)) // prunes list=<i> directories
      .select(col("list"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .mapPartitions { it =>
        val pm = bp.value
        it.flatMap { case (list, id, v) =>
          pm.getOrElse(list, Vector.empty).collect {
            case (qid, qv) if qid != id => Scored(qid, id, TextOps.cosine(qv, v))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    partials.toDF("query_id", "vec_id", "cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Convenience: the first q vectors of the table as the query set. */
  def headQueries(emb: DataFrame, q: Int): Array[(Long, Array[Float])] =
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .orderBy("vec_id").limit(q).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
}
