package graft.tools

import org.apache.spark.sql.SparkSession

/** r7 sweep: time EVERY SparkEntry query once (count action, Bench conf)
  * to rank non-bench operators by cost.
  * Usage: runMain graft.tools.QuerySweep <sfDir> <cpus>
  */
object QuerySweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toVector.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val r =
        try Right(graft.SparkEntry.queries(name)(spark, sfDir).count())
        catch { case e: Throwable => Left(e.getMessage.take(80)) }
      val sec = (System.nanoTime() - t0) / 1e9
      r match {
        case Right(n) => println(f"SWEEP $name%-32s $sec%8.2f s  rows=$n")
        case Left(m) => println(f"SWEEP $name%-32s $sec%8.2f s  ERROR: $m")
      }
    }
    spark.stop()
  }
}
