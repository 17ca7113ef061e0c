package graft.tools
import java.nio.file.{Files, Paths}
import graft.cj.CjConvert
object CjPerf {
  def main(args: Array[String]): Unit = {
    val json = Files.readString(Paths.get("/root/reference/examples/DenHaag_01.city.json"))
    // warmup
    (1 to 3).foreach(_ => CjConvert.convert("cj:w", json))
    val t0 = System.nanoTime()
    val n = 10
    var triples = 0L
    (1 to n).foreach(_ => triples += CjConvert.convert("cj:d", json).triples.size)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"DenHaag x$n: ${sec / n}%.3f s/doc, ${(triples / sec).toLong} triples/s, ${(n * 3.15e6 / sec / 1e6)}%.1f MB/s")
  }
}
