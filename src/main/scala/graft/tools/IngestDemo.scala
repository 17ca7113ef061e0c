package graft.tools
import org.apache.spark.sql.SparkSession
import graft.streaming.IncrementalIngest
import graft.synth.PagesSynth
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Files.createTempDirectory("ingestdemo").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def graphCount() = try spark.read.parquet(s"$root/graph").count() catch { case _: Throwable => 0L }

    PagesSynth.pages(spark, 150).write.mode("append").parquet(s"$root/pages")
    IncrementalIngest.runOnce(spark, s"$root/pages", s"$root/graph", s"$root/ckpt")
    println(s"SNAPSHOT1 triples=${graphCount()}")

    IncrementalIngest.runOnce(spark, s"$root/pages", s"$root/graph", s"$root/ckpt")
    println(s"NOOP      triples=${graphCount()}")

    spark.range(150, 300).mapPartitions(_.map(i => PagesSynth.pageAt(i, 300).page))
      .write.mode("append").parquet(s"$root/pages")
    IncrementalIngest.runOnce(spark, s"$root/pages", s"$root/graph", s"$root/ckpt")
    println(s"SNAPSHOT2 triples=${graphCount()}")

    val dups = spark.read.parquet(s"$root/graph")
      .filter("pred = 'web:lang'").groupBy("subj").count().filter("count > 1").count()
    println(s"DUP_PAGES=$dups")

    // probe: drop a non-parquet file into the snapshot dir
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/pages/garbage.parquet"), "not parquet")
    try { IncrementalIngest.runOnce(spark, s"$root/pages", s"$root/graph", s"$root/ckpt"); println("GARBAGE: query completed") }
    catch { case e: Throwable => println(s"GARBAGE: failed with ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}") }
    println(s"FINAL triples=${graphCount()}")
    spark.stop()
  }
}
