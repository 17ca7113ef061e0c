package graft.tools

import org.apache.spark.sql.SparkSession

/** Loop one SparkEntry query for jstack sampling.
  * Usage: runMain graft.tools.QueryProfile <sfDir> <cpus> <reps> <query>
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val reps = args(2).toInt
    val name = args(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    println("PROFILE_READY pid=" + ProcessHandle.current().pid())
    (1 to reps).foreach { _ => fn(spark, sfDir).count() }
    println("PROFILE_DONE")
    spark.stop()
  }
}
