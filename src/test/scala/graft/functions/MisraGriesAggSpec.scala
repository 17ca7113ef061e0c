package graft.functions

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.MisraGriesAgg.Summary

class MisraGriesAggSpec extends SparkTestBase {

  test("exact when the vocabulary fits in k (no compression ever fires)") {
    val s = new Summary(8)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    stream.foreach(s.add(_, 1L))
    assert(s.estimate("a") == 3 && s.estimate("b") == 2 && s.estimate("c") == 1)
  }

  test("MG guarantee on an adversarial stream: heavy items survive, estimates within n/(k+1)") {
    val k = 9
    val rnd = new Random(7)
    // 1000 'hot' + 2000 spread over 200 cold items: hot share 1/3 >> n/(k+1)
    val stream = rnd.shuffle(
      Seq.fill(1000)("hot") ++ (0 until 2000).map(i => s"cold${i % 200}"))
    val s = new Summary(k)
    stream.foreach(s.add(_, 1L))
    val n = stream.size
    assert(s.size <= k, s"state exceeded k: ${s.size}")
    val est = s.estimate("hot")
    assert(est > 0, "item above n/(k+1) must never be dropped")
    assert(est <= 1000 && est >= 1000 - n / (k + 1), s"estimate $est outside MG bound")
  }

  test("merge tree gives the same guarantee as sequential (mergeable summaries)") {
    val k = 9
    val rnd = new Random(13)
    val stream = rnd.shuffle(
      Seq.fill(900)("hot") ++ Seq.fill(500)("warm") ++ (0 until 1500).map(i => s"c${i % 300}"))
    val n = stream.size
    // arbitrary merge tree: 7 chunks, pairwise-merged left to right
    val merged = stream.grouped(math.max(1, n / 7 + 1)).map { chunk =>
      val s = new Summary(k); chunk.foreach(s.add(_, 1L)); s
    }.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.size <= k)
    assert(merged.estimate("hot") >= 900 - n / (k + 1) && merged.estimate("hot") <= 900)
    assert(merged.estimate("warm") >= 500 - n / (k + 1) && merged.estimate("warm") <= 500)
  }

  test("aggregate works through SQL + groupBy with partial aggregation, and serde round-trips") {
    val sps = spark; import sps.implicits._
    MisraGriesAgg.register(spark)
    val df = (Seq.fill(50)(("g1", "x")) ++ Seq.fill(20)(("g1", "y")) ++
      Seq.tabulate(30)(i => ("g1", s"z$i")) ++ Seq.fill(10)(("g2", "w")))
      .toDF("g", "item").repartition(7) // forces partial/merge + serde across exchange
    val out = df.groupBy("g")
      .agg(MisraGriesAgg.graft_heavy_hitters(col("item"), 4).as("hh"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    // g1: n=100, k=4 -> bound 20; x(50) must survive with est in [30, 50]
    val g1x = out("g1").getOrElse("x", 0L)
    assert(g1x >= 30 && g1x <= 50, s"x estimate $g1x")
    assert(out("g1").size <= 4)
    // g2's stream is a single item: exact
    assert(out("g2") == Map("w" -> 10L))
    // SQL surface
    df.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql(
      "SELECT g, graft_heavy_hitters(item, 4) FROM hh_in GROUP BY g").count()
    assert(viaSql == 2)
  }

  test("kg_heavy_entities contract output is exact and partition-invariant (sketch-prune + exact-verify)") {
    val a = graft.SparkEntry.queries("kg_heavy_entities")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty, "the Zipf-skewed corpus must surface heavy entities")
    // exactness: re-derive without any sketch (plain exact aggregation)
    val sps = spark; import sps.implicits._
    import graft.pipeline.KgPipeline
    import graft.synth.PagesSynth
    val n = PagesSynth.pageCount("/root/testdata/sf0.001")
    val ext = KgPipeline.extracted(PagesSynth.pages(spark, n)).toDF().select("url", "lang")
    val links = KgPipeline.links(
      KgPipeline.extracted(PagesSynth.pages(spark, n)), PagesSynth.aliasMap)
      .toDF().select("url", "entity_iri")
    val stream = links.join(ext, "url").select("lang", "entity_iri")
    val totals = stream.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val exact = stream.groupBy("lang", "entity_iri").agg(count(lit(1)).as("n_mentions"))
      .join(totals, "lang")
      .filter(col("n_mentions") * 32 > col("n_lang"))
      .select("lang", "entity_iri", "n_mentions")
      .collect().map(_.toString).sorted.toSeq
    assert(a == exact, "sketch-pruned output must equal the exact aggregation")
  }
}
