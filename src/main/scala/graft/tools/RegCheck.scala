package graft.tools
import org.apache.spark.sql.SparkSession
object RegCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("doc_minhash_pairs","doc_simhash_pairs","ev_asof_join","cj_doc_stats","cj_triples_by_pred","cj_log_categories")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val rows = df.collect().map(_.toString).sorted
      println(s"REG $q rows=${rows.length} hash=${rows.mkString("|").hashCode}")
    }
    // plan check: cj ingestion must show a FileScan now
    val plan = graft.cj.CjSpark.referenceCorpus(spark).queryExecution.executedPlan.toString
    println("REG cj_scan_filescan=" + plan.contains("FileScan"))
    spark.stop()
  }
}
