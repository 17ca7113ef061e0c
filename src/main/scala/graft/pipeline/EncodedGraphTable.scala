package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Triple, Vocab => V}
import graft.pipeline.KgPipeline.EncTriple
import graft.synth.PagesSynth

/** The dictionary-encoded graph TABLE — the 100 TB storage shape the
  * encoded stream implies: triples land as FIXED-WIDTH numeric rows
  * (≈40 B vs ≈117 B Tungsten, and far less on disk after parquet's
  * delta/dictionary encodings on integer columns), with the string
  * dictionaries written ONCE as tiny sidecars:
  *
  *   target/triples/        (page_id, pred_id, ent_id, lit) parquet
  *   target/dict_entities/  (ent_id, iri)
  *   target/dict_preds/     (pred_id, iri)
  *   target/dict_langs/     (lang_id, lang)
  *   target/_meta           corpus size n (the page-id → url function's
  *                          parameter — a real corpus stores a page
  *                          dictionary table here instead)
  *
  * `read` decodes at the consumer edge FROM THE STORED SIDECARS (not the
  * in-memory vocab), so the table is self-describing; the round-trip spec
  * transitively proves the sidecars complete. Scans that filter on
  * predicate or entity push integer comparisons down to parquet
  * (min/max + dictionary pages) — the cheap-scan shape string tables
  * cannot match at scale.
  */
object EncodedGraphTable {

  def write(enc: Dataset[EncTriple], n: Long, target: String, parts: Int = 32): Unit = {
    val spark = enc.sparkSession
    import spark.implicits._
    enc.repartition(parts, col("page_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$target/triples")
    (0 until PagesSynth.NumEntities).map(i => (i, PagesSynth.entityIri(i)))
      .toDF("ent_id", "iri").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$target/dict_entities")
    KgPipeline.PredVocab.zipWithIndex.map { case (iri, id) => (id, iri) }
      .toDF("pred_id", "iri").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$target/dict_preds")
    KgPipeline.Langs.zipWithIndex.map { case (l, id) => (id, l) }
      .toDF("lang_id", "lang").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$target/dict_langs")
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$target/_meta"), true)
    try out.write(s"""{"n_pages":$n}""".getBytes("UTF-8")) finally out.close()
  }

  /** The raw encoded relation (for consumers that stay in id space —
    * aggregations, degree counts, joins — and never pay string decode). */
  def readEncoded(spark: SparkSession, target: String): Dataset[EncTriple] = {
    import spark.implicits._
    spark.read.parquet(s"$target/triples").as[EncTriple]
  }

  def nPages(spark: SparkSession, target: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$target/_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    "\"n_pages\":(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"malformed _meta at $target: $s"))
  }

  /** Decoded read: strings materialize HERE, from the stored dictionaries
    * (broadcast — they are a few hundred rows beside a trillion-row fact
    * table). Multiset-identical to the string pipeline's page triples. */
  def read(spark: SparkSession, target: String): Dataset[Triple] = {
    import spark.implicits._
    val n = nPages(spark, target)
    val ents = spark.read.parquet(s"$target/dict_entities")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val preds = spark.read.parquet(s"$target/dict_preds")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val langs = spark.read.parquet(s"$target/dict_langs")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val bEnts = spark.sparkContext.broadcast(ents)
    val bPreds = spark.sparkContext.broadcast(preds)
    val bLangs = spark.sparkContext.broadcast(langs)
    readEncoded(spark, target).mapPartitions { it =>
      val en = bEnts.value; val pr = bPreds.value; val la = bLangs.value
      it.map { t =>
        val url = PagesSynth.urlAt(t.page_id, n)
        val pred = pr.getOrElse(t.pred_id,
          throw new IllegalArgumentException(s"unknown pred_id ${t.pred_id} (stale dict_preds?)"))
        t.pred_id match {
          case KgPipeline.PredType => Triple(url, pred, V.WebPage, null, null)
          case KgPipeline.PredLang => Triple(url, pred, null, la(t.lit.toInt), V.XsdString)
          case KgPipeline.PredWarcTs => Triple(url, pred, null, t.lit.toString, V.XsdLong)
          case KgPipeline.PredNChars => Triple(url, pred, null, t.lit.toString, V.XsdLong)
          case KgPipeline.PredMentions =>
            Triple(url, pred, en(t.ent_id), s"${(t.lit >>> 32).toInt}:${t.lit.toInt}", null)
          case other => throw new IllegalArgumentException(s"pred_id $other has no decode rule")
        }
      }
    }
  }
}
