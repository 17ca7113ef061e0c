package graft.synth

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Alias, Page}
import graft.util.Rng

/** Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §3).
  *
  * Everything is a pure function of (SEED, page index): generation is
  * partition-invariant, re-runnable, and needs no external data. The html is
  * templated boilerplate around the text, built so the FROZEN extractor
  * recovers `text` byte-identically (the input_hint invariant). Hosts and
  * entity popularity are power-law skewed to exercise salting at scale.
  */
object PagesSynth {
  val Seed = 42L
  val NumEntities = 400

  // filler vocabulary deliberately disjoint from alias words
  private val fillers = Vector(
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
    "et", "dolore", "magna", "aliqua", "enim", "ad", "minim", "veniam",
    "quis", "nostrud", "exercitation", "ullamco", "laboris", "nisi",
    "aliquip", "ex", "ea", "commodo", "consequat")

  private val adjectives = Vector(
    "quantum", "stellar", "crimson", "azure", "golden", "silver", "rapid",
    "silent", "ancient", "modern", "northern", "southern", "eastern",
    "western", "bright", "hollow", "solid", "liquid", "frozen", "burning",
    "hidden", "open", "prime", "vivid")

  private val nouns = Vector(
    "falcon", "harbor", "engine", "summit", "garden", "bridge", "canyon",
    "meadow", "beacon", "anchor", "compass", "lantern", "turbine", "orchard",
    "quarry", "vault", "spire", "delta", "prairie", "glacier", "reef",
    "mesa", "grove", "citadel")

  def entityIri(i: Int): String = s"ent:e$i"

  /** canonical two-word surface form of entity i (unique for i < 576) */
  def canonicalAlias(i: Int): String = {
    val base = adjectives(i % adjectives.size) + " " + nouns((i / adjectives.size) % nouns.size)
    if (i >= adjectives.size * nouns.size) base + " " + (i / (adjectives.size * nouns.size)) else base
  }

  /** The alias index (broadcast side of the link join). Each entity has its
    * canonical alias; every 9th entity ALSO claims its successor's canonical
    * alias with a lower prior — planted ambiguity that the top-1 scorer must
    * resolve toward the higher-prior owner. Priors are distinct per alias. */
  lazy val aliasIndex: Vector[Alias] = {
    val own = (0 until NumEntities).map { i =>
      Alias(canonicalAlias(i), entityIri(i), prior = 0.9 - 0.3 * ((i % 7) / 10.0))
    }
    val ambiguous = (0 until NumEntities).collect {
      case i if i % 9 == 3 && i + 1 < NumEntities =>
        Alias(canonicalAlias(i + 1), entityIri(i), prior = 0.2)
    }
    (own ++ ambiguous).toVector
  }

  /** alias_norm -> candidates sorted best-first by (prior desc, iri asc) */
  lazy val aliasMap: Map[String, Vector[(String, Double)]] =
    aliasIndex.groupBy(_.alias_norm).map { case (k, v) =>
      k -> v.map(a => (a.entity_iri, a.prior)).sortBy { case (iri, p) => (-p, iri) }
    }

  final case class Gold(url: String, surface: String, entity_iri: String)
  final case class PageGold(page: Page, golds: Vector[Gold])

  private val epochMs = 1704067200000L // 2024-01-01T00:00:00Z

  def numHosts(n: Long): Int = math.max(10, (n / 100).toInt)

  private def hostUrl(host: Int, i: Long): String = s"https://host-$host.example/p/$i"

  /** url of page i — a pure function of the page id (the host is the FIRST
    * rng draw of [[pageAt]], replayed here), so the synthetic corpus's
    * page-id -> IRI "dictionary" needs no materialized table. A real corpus
    * carries this as a broadcast/joined page-dictionary instead; the
    * encoded-pipeline decode stage is the one consumer either way. */
  def urlAt(i: Long, n: Long): String = {
    val rng = Rng.at(Seed, i)
    hostUrl((numHosts(n) * math.pow(rng.nextDouble(), 3)).toInt, i)
  }

  /** Pure generator for page i of a corpus of n. */
  def pageAt(i: Long, n: Long): PageGold = {
    val rng = Rng.at(Seed, i)
    // Zipf-ish host skew: u^3 concentrates mass on low host ids
    val host = (numHosts(n) * math.pow(rng.nextDouble(), 3)).toInt
    val url = hostUrl(host, i)
    val lang = if (rng.nextDouble() < 0.9) "en" else Vector("de", "fr", "es", "nl")(rng.nextInt(4))

    val golds = Vector.newBuilder[Gold]
    val nSentences = 5 + rng.nextInt(6)
    // allocation-lean assembly (this generator stands in for the input scan
    // in every scaling run, and its allocation rate was the measured
    // non-scaling stage): sentences write straight into one paragraph
    // builder instead of materializing per-sentence strings and regrouping.
    // Draw order and output bytes are IDENTICAL to the historical
    // formulation (sentence word-count draw, word draws, mention branch,
    // entity + position draws; paragraphs = groups of 3 sentences joined
    // by spaces) — locked by the corpus-hash check in PagesSynthSpec.
    val words = new scala.collection.mutable.ArrayBuffer[String](16)
    val paragraphsB = Vector.newBuilder[String]
    val pb = new StringBuilder(256)
    var s = 0
    while (s < nSentences) {
      if (s % 3 == 0) pb.clear() else pb.append(' ')
      words.clear()
      val nWords = 6 + rng.nextInt(7)
      var j = 0
      while (j < nWords) { words += fillers(rng.nextInt(fillers.size)); j += 1 }
      if (rng.nextDouble() < 0.45) {
        // entity popularity skew: hot head via u^2.5
        val e = math.min(NumEntities - 1, (NumEntities * math.pow(rng.nextDouble(), 2.5)).toInt)
        val surface = canonicalAlias(e)
        val pos = rng.nextInt(words.size + 1)
        words.insert(pos, surface)
        // gold = what a prior-only top-1 linker must produce for this surface
        golds += Gold(url, surface, aliasMap(surface).head._1)
      }
      var k = 0
      while (k < words.length) { if (k > 0) pb.append(' '); pb.append(words(k)); k += 1 }
      pb.append('.')
      if (s % 3 == 2 || s == nSentences - 1) paragraphsB += pb.toString
      s += 1
    }
    val paragraphs = paragraphsB.result()
    val title = s"page $i"
    val tb = new StringBuilder(64 + paragraphs.foldLeft(0)(_ + _.length))
    tb.append(title)
    paragraphs.foreach(p => tb.append('\n').append(p))
    val text = tb.toString

    val html = buildHtml(title, paragraphs, host)
    PageGold(Page(url, new Timestamp(epochMs + i * 1000), html.getBytes("UTF-8"), text, lang), golds.result())
  }

  /** Boilerplate template; the frozen extractor inverts this exactly. */
  private def buildHtml(title: String, paragraphs: Vector[String], host: Int): String = {
    // fast path: the word-soup corpus almost never contains markup chars,
    // and the three-replace chain allocates three intermediate strings per
    // paragraph regardless — skip it when nothing needs escaping
    def esc(s: String) =
      if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0) s
      else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder(1024)
    sb.append("<!DOCTYPE html><html><head><title>").append(esc(title)).append("</title>")
    sb.append("<script>var trk=").append(host).append(";trk__init();</script>")
    sb.append("<style>.main{margin:0} nav{color:#333}</style></head><body>")
    sb.append("<nav>Home | About | <a href=\"/contact\">Contact</a></nav>")
    sb.append("<header><h1>host-").append(host).append(" portal</h1></header>")
    sb.append("<!-- boilerplate chrome -->")
    sb.append("<div class=\"main\">")
    paragraphs.foreach(p => sb.append("<p>").append(esc(p)).append("</p>"))
    sb.append("</div>")
    sb.append("<aside>ads ads ads</aside>")
    sb.append("<footer>(c) example inc</footer></body></html>")
    sb.toString
  }

  /** Corpus size keyed off the testdata scale dir name (SURVEY.md §7.5). */
  def pageCount(sfDir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max(200L, (sf * 200000).toLong)
  }

  /** Distributed generation: narrow, partition-invariant, no shuffle.
    * 4 task waves per core so page-length variance balances out instead of
    * leaving straggler tasks in a single wave. */
  private[graft] def rangeParts(spark: SparkSession, n: Long): Int = {
    val waves = spark.sparkContext.defaultParallelism * 4
    math.max(1, math.min(waves.toLong, n / 100 max 1).toInt)
  }

  def pages(spark: SparkSession, n: Long): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, rangeParts(spark, n)).mapPartitions(_.map(i => pageAt(i, n).page))
  }

  def golds(spark: SparkSession, n: Long): Dataset[Gold] = {
    import spark.implicits._
    spark.range(0, n, 1, rangeParts(spark, n)).mapPartitions(_.flatMap(i => pageAt(i, n).golds))
  }

  def aliases(spark: SparkSession): Dataset[Alias] = {
    import spark.implicits._
    spark.createDataset(aliasIndex)
  }

  /** The page dictionary (page_id, url) AS A DATASET — what a real corpus
    * materializes beside its encoded fact table (EncodedGraphTable's
    * dict_pages sidecar). Generated distributively: at 10^12 pages this is
    * a table, never a driver map. */
  def pageDict(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, rangeParts(spark, n))
      .mapPartitions(_.map(i => (i, urlAt(i, n)))).toDF("page_id", "url")
  }

  /** The entity dictionary (ent_id, iri) as a Dataset, generated
    * distributively — decode paths JOIN it (AQE broadcasts while it is
    * small) rather than collecting it to the driver, so the same code
    * survives a 10^9-entity vocabulary. */
  def entityDict(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, NumEntities)
      .mapPartitions(_.map(i => (i.toInt, entityIri(i.toInt)))).toDF("ent_id", "iri")
  }
}
