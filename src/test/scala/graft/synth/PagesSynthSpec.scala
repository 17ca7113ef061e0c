package graft.synth

import org.scalatest.funsuite.AnyFunSuite

/** Content lock for the synthetic corpus generator: every scaling and
  * correctness number across rounds is tied to THIS corpus, so any
  * refactor of the assembly (e.g. the round-4 allocation-lean rewrite)
  * must keep draw order and output bytes exactly — a drift here silently
  * invalidates cross-round comparisons and the planted link golds. */
class PagesSynthSpec extends AnyFunSuite {

  test("corpus content hash is frozen (text + html + golds over 2000 pages)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0L until 2000L).foreach { i =>
      val pg = PagesSynth.pageAt(i, 20000L)
      md.update(pg.page.text.getBytes("UTF-8"))
      md.update(pg.page.html)
      md.update(pg.golds.mkString("|").getBytes("UTF-8"))
    }
    val hash = md.digest().map("%02x".format(_)).mkString
    assert(hash == "e33cfee6d27d956243612c169a033a9b",
      s"corpus generator output drifted: $hash — if intentional, every " +
        "cross-round benchmark comparison and planted gold breaks; refreeze deliberately")
  }

  test("urlAt replays exactly the url pageAt embeds") {
    Seq(200L, 20000L).foreach { n =>
      (0L until 50L).foreach { i =>
        assert(PagesSynth.urlAt(i, n) == PagesSynth.pageAt(i, n).page.url)
      }
    }
  }
}
