package graft.cj

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{LogRow, Triple}

/** Distributed CityJSON conversion: the pure per-document emitter
  * ([[CjConvert]]) lifted over a corpus as a narrow mapPartitions stage —
  * the Spark-native generalization of the reference's one-document-per-
  * process CLI (cityJSON2bin/Main.cpp). Per-document failures are isolated
  * inside the emitter (partial triples + logs), so a bad document can never
  * fail a task.
  *
  * Determinism: CjConvert output is a pure function of (docIri, bytes), so
  * conversion is partition-invariant; ontology triples are emitted per
  * document with identical IRIs — corpus-level `distinct` collapses them
  * (the distributed analog of the reference's created-once classes).
  */
object CjSpark {

  final case class CjDoc(doc_iri: String, json: String)
  final case class DocResult(doc_iri: String, n_triples: Long, n_errors: Long, failed: Boolean)

  def convert(docs: Dataset[CjDoc]): Dataset[Triple] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap(d => CjConvert.convert(d.doc_iri, d.json).triples))
  }

  def convertLogs(docs: Dataset[CjDoc]): Dataset[LogRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap(d => CjConvert.convert(d.doc_iri, d.json).logs))
  }

  /** per-document conversion summary (progress/metrics sink analog, S5) */
  def convertStats(docs: Dataset[CjDoc]): Dataset[DocResult] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { d =>
      val r = CjConvert.convert(d.doc_iri, d.json)
      DocResult(d.doc_iri, r.triples.size.toLong, r.logs.count(_.level == "Error").toLong, r.docFailed)
    })
  }

  /** The reference example corpus as a Dataset (read-only fixtures). */
  def referenceCorpus(spark: SparkSession,
      dir: String = "/root/reference/examples"): Dataset[CjDoc] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".city.json")).toVector.sortBy(_.getFileName.toString)
    val docs = files.map { f =>
      CjDoc("cj:" + f.getFileName.toString.stripSuffix(".city.json"),
        java.nio.file.Files.readString(f))
    }
    spark.createDataset(docs).repartition(math.min(docs.size, 12))
  }
}
