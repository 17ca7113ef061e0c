package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase
import graft.text.TextOps

class Hash64ExprSpec extends SparkTestBase {

  test("expression matches TextOps.hash64 on ASCII and handles null/unicode") {
    Seq("", "a", "hello world", "the quick brown fox").foreach { s =>
      assert(Hash64Expr.hashUtf8(UTF8String.fromString(s)) == TextOps.hash64(s), s)
    }
    // non-ASCII: hashes UTF-8 bytes (its own frozen contract), deterministic
    val u = UTF8String.fromString("héllo wörld")
    assert(Hash64Expr.hashUtf8(u) == Hash64Expr.hashUtf8(UTF8String.fromString("héllo wörld")))
  }

  test("works as a Column function and in SQL, null-safe") {
    val sps = spark; import sps.implicits._
    Hash64Expr.register(spark)
    val df = Seq(Some("abc"), None, Some("xyz")).toDF("s")
    val viaCol = df.select(Hash64Expr.graft_hash64(col("s")).as("h")).collect()
    assert(viaCol(1).isNullAt(0), "null in -> null out")
    assert(viaCol(0).getLong(0) == TextOps.hash64("abc"))
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT graft_hash64(s) AS h FROM t WHERE s IS NOT NULL").collect()
    assert(viaSql.map(_.getLong(0)).toSet == Set(TextOps.hash64("abc"), TextOps.hash64("xyz")))
  }

  test("stays inside whole-stage codegen (no UDF boundary)") {
    Hash64Expr.register(spark)
    val df = spark.range(1000)
      .select(Hash64Expr.graft_hash64(col("id").cast("string")).as("h"))
      .filter(col("h") =!= 0)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into WholeStageCodegen stage n
    assert(plan.contains("*(1) Project [graft_hash64"), plan)
    assert(plan.contains("*(1) Filter"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(df.count() == 1000)
    // codegen result equals interpreted eval
    val one = spark.range(42, 43).select(Hash64Expr.graft_hash64(col("id").cast("string"))).collect()(0).getLong(0)
    assert(one == TextOps.hash64("42"))
  }

  test("content-addressed splits are stable and well-distributed") {
    val sps = spark; import sps.implicits._
    Hash64Expr.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = docs.select(pmod(Hash64Expr.graft_hash64(col("text")), lit(10)).as("bucket"))
      .groupBy("bucket").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split.keySet.subsetOf((0L to 9L).toSet))
    assert(split.size >= 8, s"buckets used: ${split.keySet}")
    assert(split.values.max < 120, s"500 docs over 10 buckets, max ${split.values.max}")
  }
}
