package graft

import org.apache.spark.sql.functions._

/** Semantics locks for the round-6 analytics additions: the property-table
  * pivot (star-query equivalence with the vertical triple layout), VoID
  * statistics, integer-micro co-mention lift, OOV-rate scoring, and cohort
  * retention. Each test either hand-computes the expected value on toy data
  * or proves the query equivalent to an independent formulation on the
  * synthetic corpus. */
class AnalyticsAdditionsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("kg_property_table answers a star query identically to triple self-joins") {
    import graft.pipeline.KgPipeline
    val n = graft.synth.PagesSynth.pageCount(sfDir)
    val enc = KgPipeline.encodedTriples(spark, n).toDF().localCheckpoint()

    // star query via the property table: English pages with >= 2 mentions
    val pt = SparkEntry.queries("kg_property_table")(spark, sfDir)
    val viaPt = pt.filter(col("lang_id") === 0 && col("n_mentions") >= 2)
      .select("page_id").collect().map(_.getLong(0)).toSet

    // same query the vertical way: one self-join per predicate touched
    val langs = enc.filter(col("pred_id") === KgPipeline.PredLang && col("lit") === 0L)
      .select("page_id")
    val ments = enc.filter(col("pred_id") === KgPipeline.PredMentions)
      .groupBy("page_id").agg(count(lit(1)).as("nm")).filter(col("nm") >= 2)
      .select("page_id")
    val viaJoin = langs.join(ments, "page_id").collect().map(_.getLong(0)).toSet

    assert(viaPt.nonEmpty && viaPt === viaJoin)
    // every page owns exactly one property-table row
    assert(pt.count() === n)
  }

  test("kg_void_stats matches independently computed cardinalities per predicate") {
    import graft.pipeline.KgPipeline
    val n = graft.synth.PagesSynth.pageCount(sfDir)
    val enc = KgPipeline.encodedTriples(spark, n).toDF().localCheckpoint()
    val stats = SparkEntry.queries("kg_void_stats")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // all five predicates present; subjects bounded by the page count
    assert(stats.keySet === Set(0, 1, 2, 3, 4))
    stats.foreach { case (_, (nt, ns, no)) =>
      assert(ns <= n && ns <= nt && no <= nt)
    }
    // independent recount for the mentions predicate
    val m = enc.filter(col("pred_id") === KgPipeline.PredMentions)
    assert(stats(4)._1 === m.count())
    assert(stats(4)._2 === m.select("page_id").distinct().count())
    assert(stats(4)._3 === m.select("ent_id").distinct().count())
    // rdf:type has a single object (the class) and one row per page
    assert(stats(0) === ((n, n, 1L)))
  }

  test("co-mention lift formula is exact on a hand-built bipartite toy") {
    val sp = spark; import sp.implicits._
    // 4 pages; e1 and e2 co-occur twice, e1 and e3 once; deg(e1)=3,
    // deg(e2)=2, deg(e3)=2; n_pages=4
    val mentions = Seq(
      (0L, 1), (0L, 2),
      (1L, 1), (1L, 2),
      (2L, 1), (2L, 3),
      (3L, 3)).toDF("page_id", "ent_id")
    val l = graft.operators.Triangles
      .cappedMembers(mentions, "page_id", "ent_id", 64).localCheckpoint()
    val pairs = l.as("a").join(l.as("b"),
        $"a.page_id" === $"b.page_id" && $"a.ent_id" < $"b.ent_id")
      .groupBy($"a.ent_id".as("src"), $"b.ent_id".as("dst"))
      .agg(count(lit(1)).as("n_pair"))
    val deg = l.groupBy("ent_id").agg(count(lit(1)).as("deg"))
    val total = l.agg(countDistinct($"page_id").as("n_pages"))
    val lift = pairs
      .join(deg.select($"ent_id".as("src"), $"deg".as("sdeg")), "src")
      .join(deg.select($"ent_id".as("dst"), $"deg".as("ddeg")), "dst")
      .crossJoin(broadcast(total))
      .withColumn("lift_micro", expr("((n_pair * 1000000) DIV sdeg) * n_pages DIV ddeg"))
      .select("src", "dst", "n_pair", "lift_micro")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // (1,2): ((2*1e6) DIV 3) * 4 DIV 2 = 666666 * 4 / 2 = 1333332
    assert(lift((1, 2)) === ((2L, 1333332L)))
    // (1,3): ((1*1e6) DIV 3) * 4 DIV 2 = 333333 * 4 / 2 = 666666
    assert(lift((1, 3)) === ((1L, 666666L)))
    assert(!lift.contains((2, 3)))
  }

  test("kg_comention_lift ranks pairs and respects the top-50 total order") {
    val out = SparkEntry.queries("kg_comention_lift")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 50)
    val keys = out.map(r => (r.getLong(3), r.getLong(0), r.getLong(1)))
    val sorted = keys.sortBy { case (m, s, d) => (-m, s, d) }.toSeq
    assert(keys.toSeq === sorted)
  }

  test("doc_oov_rate: a token outside the head vocabulary counts as OOV") {
    val sp = spark; import sp.implicits._
    // 17 distinct tokens: t00..t15 frequent (vocab of 16), 'rare' excluded
    val common = (0 until 16).map(i => f"t$i%02d").mkString(" ")
    val docs = Seq(
      (1L, common + " " + common),        // all in-vocab (each t: freq 3)
      (2L, common + " rare"),             // 1 OOV of 17 (rare: freq 2 < 3)
      (3L, "rare")                        // all OOV
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("oov").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("doc_oov_rate")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((32L, 0L)))
    assert(out(2L) === ((17L, 1L)))
    assert(out(3L) === ((1L, 1L)))
  }

  test("kg_mention_reified emits exactly six statements per mention with a stable IRI") {
    import graft.pipeline.KgPipeline
    val n = graft.synth.PagesSynth.pageCount(sfDir)
    val nMentions = KgPipeline.encodedTriples(spark, n)
      .filter(_.pred_id == KgPipeline.PredMentions).count()
    val reified = SparkEntry.queries("kg_mention_reified")(spark, sfDir).cache()
    assert(reified.count() === nMentions * 6)
    // each reification predicate appears exactly once per statement
    val perPred = reified.groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perPred === Map(
      "rdf:type" -> nMentions, "rdf:subject" -> nMentions,
      "rdf:predicate" -> nMentions, "rdf:object" -> nMentions,
      "web:spanStart" -> nMentions, "web:spanEnd" -> nMentions))
    // statement IRIs are deterministic: a re-run mints the identical rows
    val again = SparkEntry.queries("kg_mention_reified")(spark, sfDir)
    assert(again.exceptAll(reified).count() === 0L)
    assert(reified.exceptAll(again).count() === 0L)
    reified.unpersist()
  }

  test("ev_hourly_gapfill zero-fills interior hours with no events") {
    val sp = spark; import sp.implicits._
    val ev = Seq(
      (0L, "2024-03-01 10:15:00"),
      (1L, "2024-03-01 10:45:00"),
      (2L, "2024-03-01 13:05:00")) // 11:00 and 12:00 are gaps
      .toDF("event_id", "ts_s")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"),
        lit(0L).as("user_id"), lit("x").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("gapfill").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("ev_hourly_gapfill")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h10 = java.time.Instant.parse("2024-03-01T10:00:00Z").getEpochSecond
    assert(out === Map(
      h10 -> 2L, (h10 + 3600) -> 0L, (h10 + 7200) -> 0L, (h10 + 10800) -> 1L))
  }

  test("ev_cohort_retention cohorts by first-seen day with exact day offsets") {
    val sp = spark; import sp.implicits._
    val ev = Seq(
      (10L, "2024-01-01 08:00:00"), // u10 cohort 01-01
      (10L, "2024-01-03 09:00:00"), // offset 2
      (11L, "2024-01-01 23:59:59"), // u11 cohort 01-01
      (11L, "2024-01-02 00:00:01"), // offset 1
      (12L, "2024-01-02 12:00:00")  // u12 cohort 01-02, offset 0
    ).toDF("user_id", "ts_s")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"),
        lit(0L).as("event_id"), lit("x").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("cohort").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("ev_cohort_retention")(spark, tmp)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L,
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L))
  }
}
