package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.ConcurrentLinkedQueue
import graft.pipeline.KgPipeline
import graft.synth.PagesSynth
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = 100000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tasks = new ConcurrentLinkedQueue[(Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) tasks.add((e.stageId, m.executorRunTime, m.jvmGCTime, m.executorDeserializeTime))
      }
    })
    KgPipeline.links(KgPipeline.extracted(PagesSynth.pages(spark, 2000)), PagesSynth.aliasMap).count() // warmup
    tasks.clear()
    val t0 = System.nanoTime()
    val c = KgPipeline.links(KgPipeline.extracted(PagesSynth.pages(spark, n)), PagesSynth.aliasMap).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val ts = tasks.asScala.toVector
    val byStage = ts.groupBy(_._1)
    println(f"LINKS cores=$cores rows=$c wall=$sec%.2f")
    byStage.foreach { case (sid, v) =>
      println(f"  stage=$sid tasks=${v.size} runSum=${v.map(_._2).sum}ms gcSum=${v.map(_._3).sum}ms deserSum=${v.map(_._4).sum}ms maxRun=${v.map(_._2).max}ms")
    }
    spark.stop()
  }
}
// sampling variant: long-running links stage for jstack capture
object StageProbeLong {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    KgPipeline.links(KgPipeline.extracted(PagesSynth.pages(spark, 2000)), PagesSynth.aliasMap).count()
    println("WARMED")
    val c = KgPipeline.links(KgPipeline.extracted(PagesSynth.pages(spark, 400000)), PagesSynth.aliasMap).count()
    println(s"DONE $c")
    spark.stop()
  }
}
