package graft.tools
import java.util.concurrent.Executors
import graft.mention.MentionDetect
import graft.link.Linker
import graft.synth.PagesSynth
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val texts = (0L until 20000L).map(i => PagesSynth.pageAt(i, 20000).page.text).toArray
    val am = PagesSynth.aliasMap
    val dict = MentionDetect.buildDictionary(am.keys)
    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = texts.length / threads
      val t0 = System.nanoTime()
      val futures = (0 until threads).map { t =>
        pool.submit(new Runnable { def run(): Unit = {
          var i = t * chunk
          val end = if (t == threads - 1) texts.length else (t + 1) * chunk
          var acc = 0
          while (i < end) {
            val ms = MentionDetect.detect("u", texts(i), dict)
            acc += ms.flatMap(m => Linker.resolve(m, am)).size
            i += 1
          }
        }})
      }
      futures.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"warmup4 sec=${run(4)}%.2f")
    for (round <- 1 to 2) {
      println(f"round=$round threads=32 sec=${run(32)}%.2f")
      println(f"round=$round threads=8  sec=${run(8)}%.2f")
      println(f"round=$round threads=1  sec=${run(1)}%.2f")
    }
  }
}
