package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkTestBase {

  private def vecsDf(rows: Seq[(Long, Array[Float], Array[Float])]) = {
    val sps = spark; import sps.implicits._
    rows.toDF("id", "a", "b")
  }

  test("bit-identical to the aggregate(zip_with(...)) higher-order formulation") {
    CosineExpr.register(spark)
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() - 0.5f), Array.fill(16)(rng.nextFloat() - 0.5f))
    }
    val df = vecsDf(rows)
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)") /
          sqrt(expr("aggregate(a, 0D, (acc, x) -> acc + cast(x as double) * x)") *
            expr("aggregate(b, 0D, (acc, x) -> acc + cast(x as double) * x)")))
      .withColumn("native", CosineExpr.graft_cosine(col("a"), col("b")))
    val bad = df.filter(col("hof") =!= col("native")).count()
    assert(bad == 0, "native cosine diverged from the HOF formulation")
    // literally bit-identical, not just close
    df.select("hof", "native").collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("degenerate inputs yield NULL and are rejected by threshold filters") {
    // NULL, not NaN: Spark orders NaN ABOVE every double, so a NaN cosine
    // would PASS >= threshold filters and surface garbage pairs
    CosineExpr.register(spark)
    val rows = Seq(
      (1L, Array(1f, 0f), Array(1f, 0f)),       // cosine 1.0
      (2L, Array(0f, 0f), Array(1f, 0f)),       // zero norm -> null
      (3L, Array(1f, 0f), Array(1f, 0f, 1f)),   // length mismatch -> null
      (4L, Array.empty[Float], Array.empty[Float])) // empty -> null
    val out = vecsDf(rows).select(col("id"), CosineExpr.graft_cosine(col("a"), col("b")).as("c"))
    val rowsById = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rowsById(1L).getDouble(1) == 1.0)
    assert(Seq(2L, 3L, 4L).forall(rowsById(_).isNullAt(1)))
    assert(out.filter(col("c") >= lit(-10.0)).count() == 1, "null must fail every threshold")
  }

  test("null arrays propagate null (nullIntolerant)") {
    CosineExpr.register(spark)
    val sps = spark; import sps.implicits._
    val df = Seq((1L, Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
      .select(CosineExpr.graft_cosine(col("a"), col("b")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("fuses into whole-stage codegen (no CodegenFallback in the span)") {
    // over a real parquet scan (a local relation would be constant-folded
    // before physical planning)
    CosineExpr.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.filter(CosineExpr.graft_cosine(col("embedding"), col("embedding")) >= 0.5)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage; the filter
    // carrying graft_cosine must be starred
    assert(plan.linesIterator.next().startsWith("*(1) Filter"), plan)
    // the generated filter code calls the static helper — no fallback
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("graft.functions.CosineExpr.cosineBoxed"), codegen.take(3000))
    assert(df.count() == emb.count(), "self-cosine must pass the filter for every row")
  }

  test("SQL registration + arity gate") {
    CosineExpr.register(spark)
    val sps = spark; import sps.implicits._
    Seq((Array(3f, 4f), Array(3f, 4f))).toDF("a", "b").createOrReplaceTempView("cos_t")
    assert(spark.sql("SELECT graft_cosine(a, b) AS c FROM cos_t").head.getDouble(0) == 1.0)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(a) FROM cos_t").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
  }

}
