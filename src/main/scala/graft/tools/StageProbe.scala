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
// focused probe: where does linkRelational's time go vs the narrow path
object LinkRelProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 20000L
    def mentions() = {
      val ext = KgPipeline.extracted(PagesSynth.pages(spark, n))
      val bc = spark.sparkContext.broadcast(graft.mention.MentionDetect.buildDictionary(PagesSynth.aliasMap.keys))
      ext.mapPartitions(_.flatMap(p => graft.mention.MentionDetect.detect(p.url, p.text, bc.value)))
    }
    def time(tag: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val c = f
        println(f"$tag rep$i rows=$c wall=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    time("mentions_only") { mentions().count() }
    time("link_relational") {
      graft.link.Linker.linkRelational(mentions(), PagesSynth.aliases(spark).toDF()).count()
    }
    time("join_only") {
      mentions().join(org.apache.spark.sql.functions.broadcast(PagesSynth.aliases(spark).toDF()), "alias_norm").count()
    }
    spark.stop()
  }
}
// compare min_by(struct,struct) vs min(struct) top-1 formulations
object LinkAggProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 20000L
    def mentions() = {
      val ext = KgPipeline.extracted(PagesSynth.pages(spark, n))
      val bc = spark.sparkContext.broadcast(graft.mention.MentionDetect.buildDictionary(PagesSynth.aliasMap.keys))
      ext.mapPartitions(_.flatMap(p => graft.mention.MentionDetect.detect(p.url, p.text, bc.value)))
    }
    val aliases = PagesSynth.aliases(spark).toDF()
    def minBy() = graft.link.Linker.linkRelational(mentions(), aliases).count()
    def minStruct() = {
      mentions().join(broadcast(aliases), "alias_norm")
        .groupBy("url", "span_start", "span_end", "surface")
        .agg(min(struct((col("prior") * -1).as("np"), col("entity_iri"), col("prior"))).as("b"))
        .select(col("url"), col("b.entity_iri")).count()
    }
    def time(tag: String)(f: => Long): Unit =
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime(); val c = f
        println(f"$tag rep$i rows=$c wall=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    time("min_by ")(minBy())
    time("min_struct")(minStruct())
    println(graft.link.Linker.linkRelational(mentions(), aliases).queryExecution.executedPlan.toString.split("\n").filter(_.contains("Aggregate")).mkString("\n"))
    spark.stop()
  }
}
