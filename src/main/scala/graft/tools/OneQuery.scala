package graft.tools
import org.apache.spark.sql.SparkSession
object OneQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      println(s"== $q")
      graft.SparkEntry.queries(q)(spark, args(0)).show(10, false)
    }
    spark.stop()
  }
}
