package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentLinkedQueue

/** Round-7 measurement harness (guide §1): per bench query, under the EXACT
  * Bench session conf, repeat-time the Bench action (count), collect
  * per-stage wall/task metrics via a listener, and dump explain("formatted")
  * to plans/<tag>/<query>_<suffix>.txt. Separate main from Bench — the
  * driver contract stays frozen.
  *
  * Usage: runMain graft.tools.BenchProbe <sfDir> <cpus> <tag> <suffix> [q...]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val tag = args(2) // e.g. r07
    val suffix = args(3) // before | after
    val names =
      if (args.length > 4) args.drop(4).toSeq
      else graft.Bench.benchQueries :+ "kg_pipeline"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage listener: (stageId, name, numTasks, executorRunTimeMs, gcMs, wallMs)
    val stages = new ConcurrentLinkedQueue[(Int, String, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(-1L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime, wall))
      }
    })

    val plansDir = new java.io.File(s"plans/$tag")
    plansDir.mkdirs()

    def q(name: String) =
      if (name == "kg_pipeline")
        graft.pipeline.KgPipeline.triples(spark, graft.synth.PagesSynth.pageCount(sfDir)).toDF()
      else graft.SparkEntry.queries(name)(spark, sfDir)

    // action: count (the frozen Bench action, default) or the noop sink
    // (guide §1.4 — computes every column, isolates compute from the
    // count's column pruning); GRAFT_PROBE_ACTION=noop selects it
    val useNoop = sys.env.get("GRAFT_PROBE_ACTION").contains("noop")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      if (useNoop) df.write.format("noop").mode("overwrite").save()
      else { df.count(); () }

    names.foreach { name =>
      // plan dump (pre-execution, AQE initial plan)
      val df = q(name)
      val planTxt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        plansDir.toPath.resolve(s"${name}_$suffix.txt"), planTxt)

      // warm-up (JIT + codegen), like Bench's warm pass
      run(q(name))
      System.gc()

      // timed passes, min of 5, Bench action; per-pass stage breakdown
      import scala.jdk.CollectionConverters._
      val passes = (1 to 5).map { _ =>
        System.gc()
        stages.clear()
        val t0 = System.nanoTime()
        run(q(name))
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        (sec, stages.asScala.toVector.sortBy(_._1))
      }
      println(f"### $name%-22s min=${passes.map(_._1).min}%.3f  times=" +
        passes.map(p => f"${p._1}%.3f").mkString(","))
      passes.zipWithIndex.foreach { case ((sec, st), pi) =>
        st.foreach { case (sid, nm, nt, run, gc, wall) =>
          println(f"    pass=$pi stage=$sid%-4d tasks=$nt%-4d wall=${wall}%-6d runSum=${run}%-7d gcSum=${gc}%-6d $nm")
        }
      }
    }
    spark.stop()
  }
}
