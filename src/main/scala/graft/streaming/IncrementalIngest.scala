package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.Page
import graft.pipeline.KgPipeline
import graft.synth.PagesSynth

/** Incremental page ingestion (SURVEY.md §2.7): a `Trigger.AvailableNow`
  * file stream over page parquet snapshots — each invocation processes only
  * snapshot files not yet recorded in the streaming checkpoint, runs the
  * SAME narrow extract→mention→link→triples stages as the batch pipeline,
  * and appends to the graph table. Watermarks/stateful ops are deliberately
  * absent (the north rule wants checkpoint-resumable batch, not continuous
  * streaming); this is the catch-up path for new crawl snapshots.
  */
object IncrementalIngest {

  val pageSchema = Encoders.product[Page].schema

  /** Start one catch-up pass; returns the query (await termination to let
    * AvailableNow drain everything currently in `pagesDir`). */
  def start(spark: SparkSession, pagesDir: String, graphDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", 8)
      .parquet(pagesDir)
      .as[Page]
    val triples = KgPipeline.pageTriples(KgPipeline.extracted(pages), PagesSynth.aliasMap)
    triples.writeStream
      .format("parquet")
      .option("path", graphDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Convenience: run one pass to completion. */
  def runOnce(spark: SparkSession, pagesDir: String, graphDir: String, checkpointDir: String): Unit = {
    val q = start(spark, pagesDir, graphDir, checkpointDir)
    q.awaitTermination()
  }

  /** Encoded-path catch-up (the 100 TB table shape's ingest): the same
    * AvailableNow file stream, but rows land in the DICTIONARY-ENCODED fact
    * table (`<table>/triples`, EncodedGraphTable's layout) as fixed-width
    * numerics. page_ids resolve by a STREAM-STATIC JOIN against the page
    * dictionary (`pageDict`, typically `EncodedGraphTable.readPageDict` of
    * the table being appended to) — ids come from the dictionary, never
    * from parsing urls, so late-arriving snapshot files of already-minted
    * pages encode consistently. Exactly-once per file via the streaming
    * checkpoint, like the string path. */
  def startEncoded(spark: SparkSession, pagesDir: String, tableDir: String,
      checkpointDir: String, pageDict: org.apache.spark.sql.DataFrame): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", 8)
      .parquet(pagesDir)
      .as[Page]
    val enc = KgPipeline.encodeExtracted(KgPipeline.extracted(pages), pageDict)
    enc.writeStream
      .format("parquet")
      .option("path", s"$tableDir/triples")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Convenience: run one encoded catch-up pass to completion. */
  def runOnceEncoded(spark: SparkSession, pagesDir: String, tableDir: String,
      checkpointDir: String, pageDict: org.apache.spark.sql.DataFrame): Unit = {
    val q = startEncoded(spark, pagesDir, tableDir, checkpointDir, pageDict)
    q.awaitTermination()
  }

  /** WARC-fed catch-up (the live-crawl end of the north rule): crawl
    * segments land in `warcDir` as `.warc(.gz)` files, each pass processes
    * only files the checkpoint has not seen ([[graft.sources.Warc.readStream]],
    * exactly-once per file), languages resolve by a STREAM-STATIC join
    * against the crawl metadata table (`langMeta`: url → lang — ids/metadata
    * come from the catalog, never from re-derivation, the same discipline
    * as [[startEncoded]]'s page dictionary), and the SAME narrow
    * extract→mention→link→triples stages append to the graph table. */
  def startWarc(spark: SparkSession, warcDir: String, graphDir: String,
      checkpointDir: String,
      langMeta: org.apache.spark.sql.DataFrame): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val pages = graft.sources.Warc.readStream(spark, warcDir)
      .join(langMeta.select(col("url"), col("lang")), "url")
      .select(col("url"), col("warc_ts"), col("html"),
        lit(null).cast("string").as("text"), col("lang"))
      .as[Page]
    val triples = KgPipeline.pageTriples(KgPipeline.extracted(pages), PagesSynth.aliasMap)
    triples.writeStream
      .format("parquet")
      .option("path", graphDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Convenience: drain every unseen WARC segment once. */
  def runOnceWarc(spark: SparkSession, warcDir: String, graphDir: String,
      checkpointDir: String, langMeta: org.apache.spark.sql.DataFrame): Unit = {
    val q = startWarc(spark, warcDir, graphDir, checkpointDir, langMeta)
    q.awaitTermination()
  }

  /** Per-ingest DEDUPLICATED document ingestion — the band index composed
    * with the catch-up stream (the 100 TB per-batch dedup loop):
    *
    *  1. each micro-batch of (doc_id, text) files dedups against the STORED
    *     band index ([[graft.dedup.Dedup.incrementalPairsIndexed]] — only
    *     the batch computes signatures, the index side joins exchange-free),
    *  2. near-dups of any ALREADY-ACCEPTED document are dropped,
    *  3. the remainder dedups WITHIN the batch ([[graft.dedup.Dedup.minhashPairs]]
    *     — a crawl segment routinely carries its own duplicates, and the
    *     index join alone cannot see them); the lowest doc_id of each
    *     near-dup pair survives,
    *  4. accepted rows append to the corpus table at `corpusDir`,
    *  5. their band rows append to the index with the same bucket spec
    *     ([[graft.dedup.Dedup.appendToBandIndex]]) — so batch N+1 dedups
    *     against batch N, not just the seed corpus.
    *
    * Caller seeds `corpusDir` + `indexTable` from the initial corpus
    * ([[graft.dedup.Dedup.writeBandIndex]]) before the first pass.
    * foreachBatch is at-least-once under mid-batch failure (the standard
    * caveat); an Iceberg/transactional sink would make steps 4-5 atomic. */
  def startDedupedDocs(spark: SparkSession, docsDir: String, corpusDir: String,
      checkpointDir: String, indexTable: String, threshold: Double): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 8)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.select(col("doc_id").cast("long"), col("text")).persist()
        try {
          val corpus = b.sparkSession.read.parquet(corpusDir)
          val dupIds = graft.dedup.Dedup
            .incrementalPairsIndexed(b, corpus, indexTable, threshold)
            .select(col("doc_new").as("doc_id")).distinct()
          val survivors = b.join(dupIds, Seq("doc_id"), "left_anti")
          // intra-batch pass over what the index could not see: pairs are
          // (doc_a < doc_b), keep-first-by-id drops every doc_b
          val intraDups = graft.dedup.Dedup.minhashPairs(survivors, threshold)
            .select(col("doc_b").as("doc_id")).distinct()
          val accepted = survivors.join(intraDups, Seq("doc_id"), "left_anti").persist()
          accepted.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(corpusDir)
          graft.dedup.Dedup.appendToBandIndex(accepted, indexTable)
          accepted.unpersist()
          ()
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** Convenience: drain every unseen document file once, deduplicated. */
  def runOnceDedupedDocs(spark: SparkSession, docsDir: String, corpusDir: String,
      checkpointDir: String, indexTable: String, threshold: Double): Unit = {
    val q = startDedupedDocs(spark, docsDir, corpusDir, checkpointDir, indexTable, threshold)
    q.awaitTermination()
  }
}
