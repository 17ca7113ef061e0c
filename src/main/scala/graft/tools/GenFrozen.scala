package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** Generates the frozen expected-value oracles under `golden/frozen/`:
  * for pure-function queries DuckDB cannot express (simhash, winnowing
  * fingerprint, engine hash64, langid, quality score), the oracle is a
  * checked-in parquet of the expected output at the driver's verification
  * scale (sf0.01). Generated ONCE, reviewed, committed — afterwards it is a
  * drift lock: any change to the frozen functions (TextOps/Tokenize/
  * Hash64Expr) fails the driver's rows+schema+hash compare until the
  * fixture is deliberately regenerated (same contract as `golden/` and
  * `FrozenExtractSpec`).
  */
object GenFrozen {
  val FrozenQueries: Vector[String] = Vector(
    "doc_simhash", "doc_fingerprint", "doc_split_hash64", "doc_langid", "doc_quality_score")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = Paths.get(if (args.length > 1) args(1) else "golden/frozen")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    FrozenQueries.foreach { name =>
      val tmp = Files.createTempDirectory(s"frozen_$name").resolve("out").toString
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, outDir.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
          moved = true
        }
      }
      require(moved, s"no parquet part written for $name")
      println(s"frozen: $name -> ${outDir.resolve(s"$name.parquet")}")
    }
    spark.stop()
  }
}
