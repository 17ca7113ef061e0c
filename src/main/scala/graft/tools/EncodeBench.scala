package graft.tools

import graft.text.Bpe

/** A/B of the two BPE encode strategies at tokenizer-realistic merge
  * counts — the measured evidence for the rank-map encode's merge-count
  * independence (round-5 verdict #2). No Spark: encode cost is per
  * pre-token CPU; the distributed wrapper is identical around both.
  *
  * Usage: runMain graft.tools.EncodeBench [nMerges] [nWords] [wordLen]
  */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val nMerges = if (args.nonEmpty) args(0).toInt else 32000
    val nWords = if (args.length > 1) args(1).toInt else 2000
    val wordLen = if (args.length > 2) args(2).toInt else 40
    val rng = new scala.util.Random(42)
    val base = "abcdefgh".map(_.toString).toVector
    // pool-structured table: components always derive from earlier rounds
    val pool = scala.collection.mutable.ArrayBuffer(base: _*)
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val merges = Array.newBuilder[(String, String)]
    while (seen.size < nMerges) {
      val p = (pool(rng.nextInt(pool.size)), pool(rng.nextInt(pool.size)))
      if (!seen(p) && (p._1 + p._2).length <= 32) {
        seen += p; merges += p; pool += (p._1 + p._2)
      }
    }
    val table = merges.result()
    val ranks = table.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val words = Array.fill(nWords)(
      (0 until wordLen).map(_ => base(rng.nextInt(base.size))).mkString)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm-up both paths on a slice
    words.take(100).foreach { w =>
      Bpe.encodeSymbols(Bpe.splitSymbols(w), ranks).length +
        Bpe.encodeReplay(w, table).length
    }
    val (fastSec, fastToks) = time(
      words.map(w => Bpe.encodeSymbols(Bpe.splitSymbols(w), ranks).length.toLong).sum)
    val (replaySec, replayToks) = time(
      words.map(w => Bpe.encodeReplay(w, table).length.toLong).sum)
    require(fastToks == replayToks, s"path divergence: $fastToks vs $replayToks")
    println(
      s"""{"encode_bench":true,"n_merges":$nMerges,"n_words":$nWords,"word_len":$wordLen,""" +
        s""""rank_map_sec":$fastSec,"replay_sec":$replaySec,""" +
        s""""speedup":${replaySec / fastSec},"tokens":$fastToks}""")
  }
}
