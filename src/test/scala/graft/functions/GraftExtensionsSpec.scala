package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions gets graft_hash64 with no per-session register() call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects graft_hash64 as a session built-in") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val got = spark.sql("SELECT graft_hash64('hello') AS h").collect()(0).getLong(0)
      val want = Hash64Expr.hashUtf8(org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
      assert(got == want)
      assert(got == graft.text.TextOps.hash64("hello"))
    } finally spark.stop()
  }
}
