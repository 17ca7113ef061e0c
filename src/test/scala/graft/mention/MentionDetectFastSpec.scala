package graft.mention

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Tokenize
import graft.model.Mention

/** Locks the r7 streaming MentionDetect (span/hash arrays, hash-keyed
  * dictionary, region-compare verification) to the historical
  * Tokenize.tokens-based scan: same mentions, same offsets, same greedy
  * longest-match choices, on adversarial unicode and randomized corpora.
  * The reference below is a faithful copy of the pre-r7 implementation
  * (string-keyed first-token index, token-norm string comparison). */
class MentionDetectFastSpec extends AnyFunSuite {

  // ---- pre-r7 reference implementation (frozen copy) ----
  private final class RefEntry(val tokens: Array[String], val norm: String)
  private def refDetect(url: String, text: String, aliasNorms: Iterable[String]): Vector[Mention] = {
    val byFirst = new java.util.HashMap[String, Array[RefEntry]]()
    locally {
      val tmp = new java.util.HashMap[String, java.util.ArrayList[RefEntry]]()
      aliasNorms.foreach { norm =>
        val toks = norm.split(' ')
        tmp.computeIfAbsent(toks(0), _ => new java.util.ArrayList[RefEntry]()).add(new RefEntry(toks, norm))
      }
      tmp.forEach { (k, v) =>
        val arr = v.toArray(new Array[RefEntry](v.size))
        java.util.Arrays.sort(arr, (a: RefEntry, b: RefEntry) => b.tokens.length - a.tokens.length)
        byFirst.put(k, arr)
      }
    }
    val toks = Tokenize.tokens(text)
    val n = toks.size
    val out = Vector.newBuilder[Mention]
    var i = 0
    while (i < n) {
      var advance = 1
      val cands = byFirst.get(toks(i).norm)
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
              advance = len
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

  private val aliases = Vector(
    "quantum falcon", "quantum", "silver harbor", "falcon", "istanbul",
    "σοφία", "i̇stanbul", "grove", "vivid grove citadel", "vivid grove")

  private val texts = Vector(
    "",
    "plain words only here",
    "a quantum falcon flew over the silver harbor at dawn",
    "quantum alone then quantum falcon overlapping greedy",
    "VIVID GROVE CITADEL beats vivid grove beats grove",
    "İstanbul and ISTANBUL and istanbul and ΣΟΦΙΑ σοφία",      // full-case chars
    "mid-token İ like xİy and final Σ like xΣ stay faithful",
    "punctuation, quantum... falcon! (silver) harbor?",
    "digits 42 quantum7 falcon 42falcon quantum falcon9")

  test("streaming detect equals the historical scan on adversarial corpora") {
    val dict = MentionDetect.buildDictionary(aliases)
    texts.foreach { t =>
      val got = MentionDetect.detect("u", t, dict)
      val want = refDetect("u", t, aliases)
      assert(got === want, s"diverged on: $t")
    }
  }

  test("streaming detect equals the historical scan on 300 random texts") {
    val rnd = new scala.util.Random(0xDE7EC7)
    val words = Vector("quantum", "falcon", "silver", "harbor", "grove", "vivid",
      "citadel", "lorem", "ipsum", "İstanbul", "σοφία", "x1", "the")
    val dict = MentionDetect.buildDictionary(aliases)
    (0 until 300).foreach { i =>
      val t = (0 until rnd.nextInt(40)).map { _ =>
        val w = words(rnd.nextInt(words.size))
        if (rnd.nextBoolean()) w.toUpperCase(java.util.Locale.ROOT) else w
      }.mkString(" ")
      assert(MentionDetect.detect("u", t, dict) === refDetect("u", t, aliases), s"case $i: $t")
    }
  }
}
