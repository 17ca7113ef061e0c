package graft.mention

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.PagesSynth

/** Locks the mention-uniqueness contract Linker depends on: linkRelational
  * emits one output row per input mention ROW (no span dedup), which is
  * equivalent to resolve() only while MentionDetect never emits duplicate
  * spans for a url. The greedy non-overlapping scan guarantees it — this
  * spec pins that guarantee against regression.
  */
class MentionDetectSpec extends AnyFunSuite {

  private lazy val dict = MentionDetect.buildDictionary(PagesSynth.aliasMap.keys)

  test("detected spans are unique and non-overlapping per url") {
    (0L until 500L).foreach { i =>
      val pg = PagesSynth.pageAt(i, 500)
      val ms = MentionDetect.detect(pg.page.url, pg.page.text, dict)
      val spans = ms.map(m => (m.span_start, m.span_end))
      assert(spans.distinct.size == spans.size, s"duplicate span on page $i")
      spans.sorted.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2, s"overlapping spans on page $i")
        case _ =>
      }
      ms.foreach { m =>
        assert(m.span_start >= 0 && m.span_end <= pg.page.text.length && m.span_start < m.span_end)
        assert(pg.page.text.substring(m.span_start, m.span_end) == m.surface)
      }
    }
  }

  test("identical text twice in a page yields two mention rows (distinct spans)") {
    val alias = PagesSynth.canonicalAlias(0)
    val text = s"intro $alias middle $alias outro"
    val ms = MentionDetect.detect("u", text, dict)
    assert(ms.size == 2)
    assert(ms.map(m => (m.span_start, m.span_end)).distinct.size == 2)
    assert(ms.forall(_.alias_norm == alias))
  }
}
