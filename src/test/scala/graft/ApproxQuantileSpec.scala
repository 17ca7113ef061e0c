package graft

import org.apache.spark.sql.functions._

/** doc_length_quantiles is the exact (per-group sort) path; this pins the
  * approximate path a 100 TB corpus would take instead — approx_percentile's
  * sketch must land within its accuracy contract of the exact answers, so
  * swapping exact→approx at scale is a bounded-error decision, not a leap. */
class ApproxQuantileSpec extends SparkTestBase {

  test("approx_percentile tracks the exact per-lang quantiles within 1% rank error") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val accuracy = 100 // rank error <= 1/accuracy = 1%
    val approx = docs.groupBy("lang")
      .agg(percentile_approx(col("n_chars"), array(lit(0.5), lit(0.9)), lit(accuracy))
        .as("qs"))
      .select(col("lang"), col("qs")(0).as("p50"), col("qs")(1).as("p90"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap

    // exact rank envelope: for each lang the approx value must sit between
    // the values at ranks ceil(p*n) -/+ max(n/accuracy, 1) (the sketch's
    // contract has a one-rank floor at small n)
    val sorted = docs.select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((lang, (p50, p90)) <- approx; (p, v) <- Seq((0.5, p50), (0.9, p90))) {
      val xs = sorted(lang); val n = xs.length
      val slack = math.max(n / 100, 1)
      val r0 = math.max(math.ceil(p * n).toInt - 1 - slack, 0)
      val r1 = math.min(math.ceil(p * n).toInt - 1 + slack, n - 1)
      assert(v >= xs(r0) && v <= xs(r1),
        s"$lang p$p: approx $v outside exact rank envelope [${xs(r0)}, ${xs(r1)}]")
    }
  }
}
