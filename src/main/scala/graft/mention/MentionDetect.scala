package graft.mention

import graft.extract.Tokenize
import graft.model.Mention

/** Dictionary mention detection: greedy longest-match over token n-grams
  * against a broadcast alias dictionary. Pure per-row function — runs inside
  * mapPartitions, never shuffles (SURVEY.md §2.3 J1 analog: the dictionary
  * rides as a broadcast, the scan is narrow).
  *
  * The dictionary is indexed by first token, with per-slot candidates sorted
  * longest-first, so the common non-matching position costs ONE hash lookup
  * of an already-materialized token string and zero allocation — building
  * n-gram strings per position collapses under many executor threads
  * (allocation-rate bound), observed as 3x anti-scaling from 8 to 32 cores.
  */
object MentionDetect {
  val maxGram = 3

  /** candidate alias entry: token sequence + its normalized joined form */
  final class Entry(val tokens: Array[String], val norm: String) extends Serializable

  /** first-token-indexed alias dictionary (broadcast side) */
  final class Dictionary(val byFirst: java.util.HashMap[String, Array[Entry]]) extends Serializable

  def buildDictionary(aliasNorms: Iterable[String]): Dictionary = {
    val tmp = new java.util.HashMap[String, java.util.ArrayList[Entry]]()
    aliasNorms.foreach { norm =>
      val toks = norm.split(' ')
      val e = new Entry(toks, norm)
      tmp.computeIfAbsent(toks(0), _ => new java.util.ArrayList[Entry]()).add(e)
    }
    val out = new java.util.HashMap[String, Array[Entry]](tmp.size * 2)
    tmp.forEach { (k, v) =>
      val arr = v.toArray(new Array[Entry](v.size))
      // longest-first => first match is the greedy longest match
      java.util.Arrays.sort(arr, (a: Entry, b: Entry) => b.tokens.length - a.tokens.length)
      out.put(k, arr)
    }
    new Dictionary(out)
  }

  def detect(url: String, text: String, dict: Dictionary): Vector[Mention] = {
    val toks = Tokenize.tokens(text)
    val n = toks.size
    val out = Vector.newBuilder[Mention]
    var i = 0
    while (i < n) {
      var advance = 1
      val cands = dict.byFirst.get(toks(i).norm)
      if (cands != null) {
        var c = 0
        var done = false
        while (c < cands.length && !done) {
          val e = cands(c)
          val len = e.tokens.length
          if (i + len <= n) {
            var j = 1
            while (j < len && toks(i + j).norm == e.tokens(j)) j += 1
            if (j == len) {
              val start = toks(i).start
              val end = toks(i + len - 1).end
              out += Mention(url, start, end, text.substring(start, end), e.norm)
              advance = len // greedy non-overlapping
              done = true
            }
          }
          c += 1
        }
      }
      i += advance
    }
    out.result()
  }
}
