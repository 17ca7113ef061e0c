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

  /** Convenience: the first q vectors of the table as the query set. */
  def headQueries(emb: DataFrame, q: Int): Array[(Long, Array[Float])] =
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .orderBy("vec_id").limit(q).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
}
