package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-timing probe: run named SparkEntry queries k times in one JVM to
  * separate steady-state cost from JIT/GC noise.
  * Usage: runMain graft.tools.RepeatQuery <cores> <sfDir> <reps> <q1> [q2...]
  */
object RepeatQuery {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = args(1)
    val reps = args(2).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(3).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q%-24s " + times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
