package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.KgPipeline
import graft.synth.PagesSynth

/** Attributes the scaling wall by timing the pipeline in cumulative stage
  * prefixes at one parallelism level (run at two levels and diff to see
  * which stage loses efficiency):
  *
  *   synth    — corpus generation only (html bytes + text, pure CPU+alloc)
  *   extract  — synth + frozen boilerplate-strip extraction
  *   full     — synth + extract + mention detect + link + triple emission
  *
  * Each stage is the previous plus one more pass, so (stage_k − stage_{k−1})
  * is that stage's marginal cost; a stage whose marginal cost grows with
  * core count is the one binding on shared resources (allocation rate /
  * memory bandwidth), not the scheduler.
  *
  * Usage: runMain graft.tools.StageScaling <cores> [pages]
  */
object StageScaling {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val pages = if (args.length > 1) args(1).toLong else 8000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jobs: Seq[(String, Long => Long)] = Seq(
      "synth" -> (n => PagesSynth.pages(spark, n).count()),
      "extract" -> (n => KgPipeline.extracted(PagesSynth.pages(spark, n)).count()),
      "full" -> (n => KgPipeline.triples(spark, n).count()))

    jobs.foreach { case (_, f) => f(30000) } // warm-up all chains
    val results = jobs.map { case (name, f) =>
      System.gc(); Thread.sleep(500)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f(pages); (System.nanoTime() - t0) / 1e9
      }
      name -> secs.min
    }
    val parts = results.map { case (n, s) => f""""$n":$s%.2f""" }.mkString(",")
    println(s"""{"stage_scaling":true,"cores":$cores,"pages":$pages,$parts}""")
    spark.stop()
  }
}
