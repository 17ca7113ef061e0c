package graft.dedup

import graft.SparkTestBase
import graft.util.Rng
import org.apache.spark.sql.functions.col

/** Materialized LSH band index ([[Dedup.writeBandIndex]] /
  * [[Dedup.incrementalPairsIndexed]]): the stored-index path must be
  * bit-identical to the recompute-per-batch path, and the candidate join
  * must consume the index's bucketing instead of reshuffling it. */
class DedupIndexSpec extends SparkTestBase {

  // same planted structure as DedupSpec: 40 base, exact dups at +100 (the
  // NEW batch), near-dups at +200, 40 unrelated
  private def corpus() = {
    val sps = spark; import sps.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(seed: Long, n: Int) = {
      val rng = Rng.at(seed, n)
      (0 until 60).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    }
    val base = (0 until 40).map(i => (i.toLong, doc(1, i)))
    val exact = base.map { case (i, t) => (100 + i, t) }
    val near = base.map { case (i, t) =>
      val ws = t.split(" "); ws(30) = "CHANGED"; (200 + i, ws.mkString(" "))
    }
    val unrelated = (0 until 40).map(i => (300L + i, doc(99, i)))
    spark.createDataset(base ++ exact ++ near ++ unrelated).toDF("doc_id", "text")
  }

  private def freshTable(name: String): String = {
    graft.util.Warehouse.dropTable(spark, name)
    name
  }

  test("indexed incremental pairs equal the recompute-per-batch path exactly") {
    val df = corpus()
    val newSide = df.filter(col("doc_id") >= 100 && col("doc_id") < 200)
    val oldSide = df.filter(col("doc_id") < 100 || col("doc_id") >= 200)
    val table = freshTable("band_index_parity")
    Dedup.writeBandIndex(oldSide, table, buckets = 4)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val indexed = Dedup.incrementalPairsIndexed(newSide, oldSide, table, 0.6)
      .collect().map(key).toSet
    val direct = Dedup.incrementalPairs(newSide, oldSide, 0.6)
      .collect().map(key).toSet
    assert(indexed.nonEmpty, "planted dups must cross the batch split")
    assert(indexed == direct)
  }

  test("stored index is capped per bucket at build time") {
    val sps = spark; import sps.implicits._
    // 3 copies of one text -> identical signatures -> every band bucket of
    // that text holds 3 rows; with MaxBucket far above 3 nothing caps, so
    // instead verify the cap law directly on a degenerate corpus exceeding
    // no cap but grouped correctly: per (band, band_hash) counts <= MaxBucket
    val many = (0 until 50).map(i => (i.toLong, "same text for every document here"))
    val df = spark.createDataset(many).toDF("doc_id", "text")
    val table = freshTable("band_index_capped")
    Dedup.writeBandIndex(df, table, buckets = 2)
    val counts = spark.table(table)
      .groupBy("band", "band_hash").count().collect().map(_.getLong(2))
    assert(counts.nonEmpty && counts.forall(_ <= Dedup.MaxBucket))
    // all 50 identical docs share every bucket (cap not binding at 50)
    assert(counts.forall(_ == 50))
  }

  // (doc_id, text) helper corpora for the append/ingest tests
  private def docsFrom(rows: Seq[(Long, String)]) = {
    val sps = spark; import sps.implicits._
    spark.createDataset(rows).toDF("doc_id", "text")
  }
  private def doc2(seed: Long, n: Int) = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rng = Rng.at(seed, n)
    (0 until 60).map(_ => words(rng.nextInt(words.size))).mkString(" ")
  }
  private def nearOf(t: String): String = {
    val ws = t.split(" "); ws(30) = "CHANGED"; ws.mkString(" ")
  }

  test("appended batches are visible: batch 2 finds batch 1's near-dups via the index alone") {
    val batch0 = docsFrom((0 until 40).map(i => (i.toLong, doc2(1, i))))
    val batch1 = docsFrom((0 until 40).map(i => (1000L + i, doc2(101, i))))
    // batch 2 = near-dups of BATCH 1 documents (absent from the seed index)
    val batch2 = docsFrom((0 until 40).map(i => (2000L + i, nearOf(doc2(101, i)))))
    val table = freshTable("band_index_append")
    Dedup.writeBandIndex(batch0, table, buckets = 4)
    Dedup.appendToBandIndex(batch1, table)
    val corpus = batch0.unionAll(batch1)
    val pairs = Dedup.incrementalPairsIndexed(batch2, corpus, table, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every batch-2 doc finds its batch-1 original — impossible without the
    // append (the seed index has no batch-1 bands)
    assert(pairs.map(_._1).toSet == (0 until 40).map(2000L + _).toSet, pairs.toSeq.sorted.toString)
    assert(pairs.forall { case (n, o) => o == n - 1000L }, pairs.toSeq.sorted.toString)
    // and the exchange-free plan lock survives the append
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.incrementalPairsIndexed(batch2, corpus, table, 0.6)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(band".r.findAllIn(plan).size == 1, plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("recap re-applies the global bucket cap across appended batches") {
    val sps = spark; import sps.implicits._
    // every append is capped to MaxBucket per key, but appends ACCUMULATE:
    // 3 batches of one identical text overflow the union cap, recap restores it
    val same = "same text for every document here"
    val table = freshTable("band_index_recap")
    Dedup.writeBandIndex(
      docsFrom((0 until Dedup.MaxBucket).map(i => (i.toLong, same))), table, buckets = 2)
    for (b <- 1 to 2)
      Dedup.appendToBandIndex(
        docsFrom((0 until Dedup.MaxBucket).map(i => (1000L * b + i, same))), table)
    val before = spark.table(table).groupBy("band", "band_hash").count()
      .collect().map(_.getLong(2))
    assert(before.forall(_ == 3L * Dedup.MaxBucket), before.toSeq.toString)
    Dedup.recapBandIndex(spark, table)
    val after = spark.table(table).groupBy("band", "band_hash").count()
      .collect().map(_.getLong(2))
    assert(after.nonEmpty && after.forall(_ == Dedup.MaxBucket), after.toSeq.toString)
  }

  test("streamed ingest composes: each batch dedups against all prior batches and extends the index") {
    val sps = spark; import sps.implicits._
    val root = java.nio.file.Files.createTempDirectory("dedup_ingest").toString
    val docsDir = s"$root/in"; val corpusDir = s"$root/corpus"; val ckpt = s"$root/ckpt"
    val table = freshTable("band_index_stream")
    // seed: batch 0 is the initial corpus + index
    val batch0 = docsFrom((0 until 40).map(i => (i.toLong, doc2(1, i))))
    batch0.write.parquet(corpusDir)
    Dedup.writeBandIndex(batch0, table, buckets = 4)
    // pass 1: 20 fresh docs + 20 near-dups of the SEED corpus + 5
    // near-dups of docs in the SAME batch (the index can't see those —
    // the intra-batch pass must)
    docsFrom((0 until 20).map(i => (1000L + i, doc2(101, i))) ++
             (0 until 20).map(i => (1100L + i, nearOf(doc2(1, i)))) ++
             (0 until 5).map(i => (1500L + i, nearOf(doc2(101, i)))))
      .write.mode("append").parquet(docsDir)
    graft.streaming.IncrementalIngest.runOnceDedupedDocs(
      spark, docsDir, corpusDir, ckpt, table, 0.6)
    // pass 2: 20 near-dups of PASS 1's accepted docs + 10 fresh
    docsFrom((0 until 20).map(i => (2000L + i, nearOf(doc2(101, i)))) ++
             (0 until 10).map(i => (2100L + i, doc2(201, i))))
      .write.mode("append").parquet(docsDir)
    graft.streaming.IncrementalIngest.runOnceDedupedDocs(
      spark, docsDir, corpusDir, ckpt, table, 0.6)
    val ids = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    val want = (0 until 40).map(_.toLong).toSet ++
      (0 until 20).map(1000L + _).toSet ++ (0 until 10).map(2100L + _).toSet
    // 1100s (near seed) rejected in pass 1; 1500s (near docs of the SAME
    // batch, keep-first-by-id) rejected by the intra-batch pass; 2000s
    // (near pass-1 docs) rejected in pass 2 — only possible because
    // pass 1 APPENDED its bands
    assert(ids == want,
      s"unexpected: extra=${(ids -- want).toSeq.sorted} missing=${(want -- ids).toSeq.sorted}")
  }

  test("candidate join reads the index bucketed: no exchange on the index side") {
    val df = corpus()
    val newSide = df.filter(col("doc_id") >= 100 && col("doc_id") < 200)
    val oldSide = df.filter(col("doc_id") < 100 || col("doc_id") >= 200)
    val table = freshTable("band_index_plan")
    Dedup.writeBandIndex(oldSide, table, buckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE rewrites mid-plan shuffles and hides the static shape under test
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.incrementalPairsIndexed(newSide, oldSide, table, 0.6)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // exactly ONE exchange on the band key — the new batch side; the
      // index side's bucketing satisfies the join's distribution.
      // (Without bucketing this is 2.)
      val bandExchanges = "Exchange hashpartitioning\\(band".r
        .findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected 1 band-key exchange (new side only), got $bandExchanges:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
