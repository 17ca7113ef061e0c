package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.extract.Tokenize

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, the GPT-2
  * recipe): learn the merge table from the corpus, the way web-scale
  * tokenizers are actually built.
  *
  * Scale shape — the classic map-reduce BPE trick: the corpus is touched
  * EXACTLY ONCE, by the pre-token frequency aggregation ([[wordFreqs]], one
  * shuffle keyed on the pre-token). Every merge round after that operates
  * on the VOCABULARY table (distinct pre-tokens + counts — ~10⁵-10⁶ rows at
  * web scale, independent of corpus size): one narrow adjacent-pair
  * explode, one tiny aggregation, one bounded single-row argmax fetch, one
  * narrow merge map. 100 TB of text and 1 GB of text pay the same per-round
  * cost.
  *
  * Determinism (the property every oracle and every reproducible-training
  * run needs): the argmax tie-break is total — (freq DESC, left ASC,
  * right ASC) — so the merge table is a pure function of the corpus,
  * independent of partitioning. Merges apply greedily left-to-right,
  * non-overlapping (the reference semantics).
  */
object Bpe {

  /** Pre-token frequency table: one corpus-scale aggregation over the
    * [[Tokenize.BpePattern]] pre-tokenizer (the same frozen pattern the
    * token-count contract queries use; runs as a codegen'd regex). */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(col("text"),
        lit(Tokenize.BpePattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right, non-overlapping application of one merge. */
  private[text] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn up to `rounds` merges from the corpus. Output: one row per
    * learned merge — (round, left, right, freq), `freq` = the pair's
    * corpus-weighted count when it was chosen. Training stops early when
    * no adjacent pair occurs at least twice (merging singletons would only
    * memorize the tail). */
  def learnMerges(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // symbols start as single characters; the vocab table is materialized
    // once (the only corpus-wide pass) and each round's merge map is cut
    // from lineage eagerly — rounds stay O(vocab), plans stay flat
    var vocab: Dataset[(Array[String], Long)] = wordFreqs(docs).as[(String, Long)]
      .map { case (w, f) => (w.toArray.map(_.toString), f) }
      .localCheckpoint()
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = vocab
        .flatMap { case (syms, f) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), f)) }
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("freq"))
        .orderBy(desc("freq"), asc("l"), asc("r"))
        .limit(1) // bounded single-row argmax fetch (the Ann-style action)
        .as[(String, String, Long)]
        .collect()
      top.headOption.filter(_._3 >= 2L) match {
        case Some((l, r, f)) =>
          merges += ((round, l, r, f))
          vocab = vocab.map { case (syms, wf) => (applyMerge(syms, l, r), wf) }
            .localCheckpoint()
          round += 1
        case None => exhausted = true
      }
    }
    merges.result().toDF("round", "left", "right", "freq")
  }

  /** The MANY-MERGES path (how real tokenizer training runs): after the one
    * corpus-scale aggregation, the vocabulary table is O(distinct
    * pre-tokens) — 10⁵-10⁶ rows at web scale, a bounded driver fetch of the
    * same class as Ann's centroid samples — so training 32k-100k merges
    * collects it once and iterates locally instead of paying one Spark job
    * (plans, scheduling, a shuffle) PER MERGE. Output is bit-identical to
    * [[learnMerges]] (spec-locked); use the distributed variant when the
    * vocabulary genuinely cannot fit the driver, this one everywhere else.
    * The loop recounts pairs per round (O(vocab·len)); a production trainer
    * would delta-update counts for the words containing the merged pair —
    * same output, lower constant. */
  def learnMergesLocal(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Array[(Array[String], Long)] = wordFreqs(docs).as[(String, Long)]
      .collect().map { case (w, f) => (w.toArray.map(_.toString), f) }
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.foreach { case (k, v) =>
        if (best == null || v > best._2 ||
          (v == best._2 && (k._1 < best._1._1 ||
            (k._1 == best._1._1 && k._2 < best._1._2)))) best = (k, v)
      }
      if (best == null || best._2 < 2L) exhausted = true
      else {
        val ((l, r), f) = best
        merges += ((round, l, r, f))
        vocab = vocab.map { case (syms, wf) => (applyMerge(syms, l, r), wf) }
        round += 1
      }
    }
    merges.result().toDF("round", "left", "right", "freq")
  }

  /** Tokenize with a learned merge table (the inference side — applied in
    * learned order, the standard BPE encode): pre-tokens → characters →
    * each merge replayed. Narrow; the merge table rides a broadcast-sized
    * local array (vocab-bounded, like any tokenizer's). */
  def encode(docs: DataFrame, merges: Array[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val pat = java.util.regex.Pattern.compile(Tokenize.BpePattern)
        it.map { case (id, text) =>
          val m = pat.matcher(text)
          var n = 0L
          while (m.find()) {
            var syms = m.group().toArray.map(_.toString)
            ms.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
            n += syms.length
          }
          (id, n)
        }
      }
      .toDF("doc_id", "n_tokens")
  }
}
