package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

class TfidfSpec extends SparkTestBase {

  test("hand-computed tf-idf on a 3-doc corpus, ties broken by term asc") {
    implicit val sp: SparkSession = spark
    val sp2 = spark; import sp2.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "Cherry, cherry; apple!")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).sortBy(t => (t._1, t._6))

    // N=3; df: apple 2, banana 2, cherry 2 → idf = 3/2 = 1.5 for all
    assert(out.toSeq == Seq(
      (1L, "apple", 2L, 2L, 3.0, 1),   // 2 * 1.5
      (1L, "banana", 1L, 2L, 1.5, 2),
      (2L, "banana", 1L, 2L, 1.5, 1),  // banana < cherry at equal score
      (2L, "cherry", 1L, 2L, 1.5, 2),
      (3L, "cherry", 2L, 2L, 3.0, 1),  // punctuation split + lowercased
      (3L, "apple", 1L, 2L, 1.5, 2)))
  }

  test("rarer terms outrank frequent ones at equal tf") {
    implicit val sp: SparkSession = spark
    val sp2 = spark; import sp2.implicits._
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common x"),
      (3L, "common y"),
      (4L, "common z")).toDF("doc_id", "text")
    val top1 = Tfidf.topTerms(docs, k = 1)
      .filter("doc_id = 1").collect()(0).getString(1)
    assert(top1 == "rare") // score 4/1 = 4.0 vs common's 4/4 = 1.0
  }
}
