package graft.text

import graft.SparkTestBase

class RepetitionSpec extends SparkTestBase {

  test("hand-computed repetition stats") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the cat the cat the dog"), // 6 toks, 3 distinct, max_tf(the)=3
                                       // bigrams: the cat, cat the, the cat, cat the, the dog -> 5, 3 distinct
      (2L, "unique words only here"),  // 4/4/1, 3 bigrams all distinct
      (3L, "solo"),                    // 1 token, no bigrams
      (4L, "a; a! a?")                 // punctuation-split: 3x "a", bigrams "a a" x2
    ).toDF("doc_id", "text")
    val out = Repetition.stats(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out(1L) == ((6L, 3L, 3L, 5L, 3L)))
    assert(out(2L) == ((4L, 4L, 1L, 3L, 3L)))
    assert(out(3L) == ((1L, 1L, 1L, 0L, 0L)))
    assert(out(4L) == ((3L, 1L, 3L, 2L, 1L)))
  }

  test("a highly repetitive doc is separable from natural text by the count ratios") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, Seq.fill(50)("buy cheap pills").mkString(" ")),
      (2L, "this sentence has reasonably varied words across its modest span")
    ).toDF("doc_id", "text")
    val out = Repetition.stats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3).toDouble / r.getLong(1), // max_tf frac
        1.0 - r.getLong(5).toDouble / math.max(r.getLong(4), 1L)))   // dup bigram frac
      .map { case (id, tf, dup) => (id, (tf, dup)) }.toMap
    assert(out(1L)._1 > 0.3 && out(1L)._2 > 0.9, s"spam doc: ${out(1L)}")
    assert(out(2L)._1 < 0.2 && out(2L)._2 == 0.0, s"natural doc: ${out(2L)}")
  }
}
