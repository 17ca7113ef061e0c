package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.KgPipeline
object WriteBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val out = java.nio.file.Files.createTempDirectory("writebench").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    KgPipeline.triples(spark, 50000).count() // JIT warmup
    var t0 = System.nanoTime()
    val tr = KgPipeline.run(spark, n, out, writeParts = 64)
    val total = tr.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"WRITE pages=$n triples=$total sec=$sec%.2f triples_per_sec=${(total/sec).toLong}")
    // resume: every stage manifest matches -> near-instant
    t0 = System.nanoTime()
    val total2 = KgPipeline.run(spark, n, out, writeParts = 64).count()
    val sec2 = (System.nanoTime() - t0) / 1e9
    println(f"RESUME triples=$total2 sec=$sec2%.2f (manifest hit)")
    require(total == total2)
    // partition balance of the salted write
    import org.apache.spark.sql.functions._
    val sizes = spark.read.parquet(s"$out/triples").groupBy(input_file_name()).count()
      .agg(min("count"), max("count"), count(lit(1))).collect()(0)
    println(s"BALANCE min=${sizes.getLong(0)} max=${sizes.getLong(1)} files=${sizes.getLong(2)}")
    spark.stop()
  }
}
