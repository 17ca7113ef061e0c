package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term relevance over a document corpus, fully declarative.
  *
  * Weighting is the log-free inverse-document-frequency variant
  * `score = tf * (N / df)` (both operands exact integers, one IEEE
  * division + one multiplication): every engine computes the identical
  * double, so results cross-check byte-exact against a SQL oracle. The
  * usual `ln` smoothing is a monotone function of `df` alone, so for
  * fixed `df` it never reorders terms within a document; we trade its
  * cross-document damping for engine-exact reproducibility (transcendental
  * libm results are not bit-stable across engines).
  *
  * Plan shape at scale (the 100 TB story):
  *  - tokenize → explode is narrow (stays in the scan's pipeline);
  *  - (doc, term) tf and per-term df are two-phase hash aggregates (map-side
  *    partial combine — hot stopword terms are absorbed before the shuffle,
  *    unlike a window-count-per-term formulation, which would pin every
  *    occurrence of "the" to one task). Catalyst broadcasts the df side only
  *    while the vocabulary is small; past the threshold AQE takes the
  *    shuffled join, both sides already keyed by term;
  *  - df is derived from tf, so the tokenize+tf lineage appears on both join
  *    sides; at corpus scale, stage-materialize tf first (KgPipeline.runStage
  *    or .persist) so the raw corpus is scanned once — the composition here
  *    stays declarative and unmaterialized by default;
  *  - top-k per document is `row_number <= k`, which Catalyst rewrites to
  *    WindowGroupLimit with a partial (map-side) pass: per-document
  *    candidate sets are truncated before the final shuffle.
  */
object Tfidf {

  /** Lowercased alphanumeric token stream — mirrors the oracle's
    * `string_split_regex(lower(text), '[^a-z0-9]+')`. */
  private def terms(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .filter(length(col("term")) > 0)

  /** Top-`k` terms per document by `tf * (N / df)`; ties broken by term
    * ascending (total order ⇒ deterministic row set). */
  def topTerms(docs: DataFrame, k: Int)(implicit spark: SparkSession): DataFrame = {
    val nDocs = docs.select(countDistinct(col("doc_id"))).first().getLong(0)
    val tf = terms(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "term")
      .withColumn("score", col("tf") * (lit(nDocs).cast("double") / col("df")))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }
}
