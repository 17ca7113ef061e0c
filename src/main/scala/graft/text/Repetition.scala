package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition statistics behind Gopher/RefinedWeb-style quality filters
  * ("fraction of the most common word", "duplicate n-gram fraction"): per
  * document, the integer counts a downstream filter divides — emitting the
  * raw counts instead of ratios keeps the operator engine-exact (the oracle
  * compares integers, consumers pick thresholds).
  *
  * Plan: tokenize+posexplode is narrow; token stats are two back-to-back
  * hash aggregates both keyed by doc_id-prefixed keys (one shuffle chain);
  * bigrams use a per-document lead() window (documents are bounded, so the
  * per-key window state is too); the final join is doc_id ⋈ doc_id on two
  * sides already partitioned by doc_id.
  */
object Repetition {

  /** Per doc: n_tokens, n_distinct_tokens, max_tf (count of the most common
    * token), n_bigrams, n_distinct_bigrams. Bigrams are adjacent pairs in
    * appearance order. Docs with < 2 tokens report zero bigrams. */
  def stats(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(lower(col("text")), "[^a-z0-9]+")))
      .toDF("doc_id", "pos", "term")
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val tokStats = tf.groupBy("doc_id").agg(
      sum("c").as("n_tokens"),
      count(lit(1)).as("n_distinct_tokens"),
      max("c").as("max_tf"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = toks
      .withColumn("nxt", lead(col("term"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("term"), col("nxt")).as("bigram"))
    val bigStats = bigrams.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      countDistinct(col("bigram")).as("n_distinct_bigrams"))
    tokStats.join(bigStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"), col("max_tf"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"))
  }
}
