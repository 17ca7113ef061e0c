package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.KgPipeline
import graft.synth.PagesSynth

/** Driver bench contract: one JSON line on stdout.
  *
  * Headline = the full KG-construction pipeline (synth pages → extract →
  * mention/link → triples) at the sf-scaled corpus, plus representative
  * relational / training-data queries. `value` = total seconds across the
  * timed queries (the driver's metric); the queries map carries the
  * per-query seconds.
  */
object Bench {

  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** queries timed by the bench (subset of SparkEntry.queries + pipeline) */
  val benchQueries: Vector[String] = Vector(
    "q1_pricing", "q3_priority_revenue", "q_window_topk", "ev_sessions",
    "doc_minhash_pairs", "doc_simhash_pairs", "emb_knn_brute", "kg_top_entities",
    "kg_link_relational", "cj_doc_stats")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // warm-up (untimed): JIT, codegen and FS init so per-query numbers
    // measure the queries, not session bring-up
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    KgPipeline.triples(spark, 200).count()

    // headline: full pipeline, counts triples (forces every stage)
    val n = PagesSynth.pageCount(sfDir)
    val (nTriples, pipeSec) = timed { KgPipeline.triples(spark, n).count() }
    results += "kg_pipeline" -> pipeSec

    benchQueries.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val (_, sec) = timed {
          try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        }
        results += name -> sec
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.sum
    val tps = if (pipeSec > 0) (nTriples / pipeSec).toLong else 0L
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pages":$n,"triples":$nTriples,"triples_per_sec":$tps,"cpus":$cpus}""")
    spark.stop()
  }
}
