package graft.tools

import java.util.concurrent.Executors
import graft.extract.TextExtract
import graft.mention.MentionDetect
import graft.synth.PagesSynth

/** No-Spark stage microbench: isolates synth / extract / detect cost and
  * thread-scaling so pipeline tuning targets the real bottleneck. */
object PipeProbe {
  val N = 60000

  def par[T](threads: Int)(work: Range => Unit): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val chunk = N / threads
    val t0 = System.nanoTime()
    (0 until threads).map { t =>
      val r = (t * chunk) until (if (t == threads - 1) N else (t + 1) * chunk)
      pool.submit(new Runnable { def run(): Unit = work(r) })
    }.foreach(_.get())
    pool.shutdown()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val htmls = (0 until N).map(i => new String(PagesSynth.pageAt(i, N).page.html, "UTF-8")).toArray
    val texts = htmls.map(TextExtract.extract)
    val dict = MentionDetect.buildDictionary(PagesSynth.aliasMap.keys)
    @volatile var sink = 0L

    def synthOnly(r: Range): Unit = { var a = 0L; r.foreach(i => a += PagesSynth.pageAt(i, N).page.html.length); sink += a }
    def extractOnly(r: Range): Unit = { var a = 0L; r.foreach(i => a += TextExtract.extract(htmls(i)).length); sink += a }
    def detectOnly(r: Range): Unit = { var a = 0L; r.foreach(i => a += MentionDetect.detect("u", texts(i), dict).size); sink += a }

    // warm all paths
    par(8)(synthOnly); par(8)(extractOnly); par(8)(detectOnly)
    for (threads <- Seq(8, 32); round <- 1 to 2) {
      val s = par(threads)(synthOnly)
      val e = par(threads)(extractOnly)
      val d = par(threads)(detectOnly)
      println(f"threads=$threads round=$round synth=$s%.2f extract=$e%.2f detect=$d%.2f (sink=$sink)")
    }
  }
}
// reproduce: pipeline throughput at 500k pages in a fresh session
object PipeProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.pipeline.KgPipeline.triples(spark, 50000).count()
    (1 to 3).foreach { rep =>
      System.gc()
      val t0 = System.nanoTime()
      val c = graft.pipeline.KgPipeline.triples(spark, 500000).count()
      val sec = (System.nanoTime()-t0)/1e9
      println(f"PIPE500K rep$rep triples=$c wall=$sec%.2f tps=${(c/sec).toLong}")
    }
    spark.stop()
  }
}
