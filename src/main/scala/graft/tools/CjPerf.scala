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
// distributed conversion throughput: N copies of the largest reference
// fixture across all cores (the single-node match-or-beat evidence)
object CjSparkPerf {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val copies = if (args.length > 1) args(1).toInt else 128
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val json = Files.readString(Paths.get("/root/reference/examples/DenHaag_01.city.json"))
    def corpus(n: Int) = spark.createDataset(
      (0 until n).map(i => graft.cj.CjSpark.CjDoc(s"cj:doc$i", json))).repartition(cores)
    graft.cj.CjSpark.convert(corpus(cores)).count() // warmup
    (1 to 3).foreach { rep =>
      System.gc()
      val t0 = System.nanoTime()
      val triples = graft.cj.CjSpark.convert(corpus(copies)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CJSPARK rep$rep cores=$cores copies=$copies triples=$triples wall=$sec%.2f triples_per_sec=${(triples / sec).toLong} mb_per_sec=${copies * 3.15 / sec}%.0f")
    }
    // stats path: triples emitted inside the extractor, only per-doc counts
    // cross the Dataset boundary — isolates emitter throughput from the
    // row-encoding cost of materializing every triple
    (1 to 3).foreach { rep =>
      System.gc()
      val t0 = System.nanoTime()
      val triples = graft.cj.CjSpark.convertStats(corpus(copies))
        .agg(org.apache.spark.sql.functions.sum("n_triples")).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CJSTATS rep$rep cores=$cores copies=$copies triples=$triples wall=$sec%.2f triples_per_sec=${(triples / sec).toLong} mb_per_sec=${copies * 3.15 / sec}%.0f")
    }
    spark.stop()
  }
}
