package graft.pipeline

import graft.SparkTestBase
import graft.model.Triple
import org.apache.spark.sql.functions._

/** N-Quads 1.1 surface: quadLine/parseQuad bijectivity (graph + default
  * graph), compatibility with plain N-Triples through the same parser,
  * lenient distributed read with error isolation, and decodeQuads'
  * 1:1-with-decodeTriples parity. */
class NQuadsSpec extends SparkTestBase {

  private val cases = Seq(
    Triple("http://ex.org/page/1", "web:mentions", "ent:e7", "3:12", null),
    Triple("graft:stmt_1", "web:lang", null, "en", "xsd:string"),
    Triple("graft:stmt_1", "rdfs:label", null, "a \"quoted\"\nliteral\t\\", null))

  test("quadLine/parseQuad round-trips triple AND graph exactly") {
    for (t <- cases; g <- Seq("graft:seg_0", "graft:seg_41")) {
      val ln = NTriples.quadLine(t, g)
      assert(NTriples.parseQuad(ln) === ((t, g)), s"line: $ln")
    }
  }

  test("null graph emits a plain N-Triples line; parseQuad reads it as default graph") {
    for (t <- cases) {
      val ln = NTriples.quadLine(t, null)
      assert(ln === NTriples.line(t))
      assert(NTriples.parseQuad(ln) === ((t, null)))
      // and the strict triple parser still accepts it
      assert(NTriples.parse(ln) === t)
    }
  }

  test("the strict triple parser rejects a quad line instead of mis-reading it") {
    val quad = NTriples.quadLine(cases.head, "graft:seg_0")
    val e = intercept[IllegalArgumentException](NTriples.parse(quad))
    assert(e.getMessage.contains("unexpected term"))
    // malformed graph term: two terms after the object
    val bad = quad.dropRight(1) + "<http://ex.org/extra> ."
    intercept[IllegalArgumentException](NTriples.parseQuad(bad))
  }

  test("Quads sink round-trips a distributed write and isolates corrupt lines") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 100).map { i =>
      (s"http://ex.org/page/$i", "web:mentions", s"ent:e${i % 7}",
        null: String, null: String, s"graft:seg_${i / 10}")
    }
    val df = rows.toDF("subj", "pred", "obj_iri", "obj_lit", "obj_type", "graph")
    val dir = java.nio.file.Files.createTempDirectory("nquads").toString
    NTriples.Quads.write(df, dir, parts = 4)
    // plant a corrupt line in its own file alongside the written parts
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-corrupt.txt"),
      "<http://ex.org/x> <bad line with no object\n")
    val back = NTriples.Quads.readAll(spark, dir)
    assert(back.filter(col("_error").isNotNull).count() === 1)
    val good = NTriples.Quads.read(spark, dir)
      .select("subj", "pred", "obj_iri", "obj_lit", "obj_type", "graph")
      .as[(String, String, String, String, String, String)].collect().toSet
    assert(good === rows.toSet)
  }

  test("the lenient TRIPLE reader accepts a quads file (graph dropped, not an empty result)") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 20).map(i =>
      (s"http://ex.org/page/$i", "web:mentions", s"ent:e$i",
        null: String, null: String, s"graft:seg_$i"))
    val dir = java.nio.file.Files.createTempDirectory("nq_as_nt").toString
    NTriples.Quads.write(rows.toDF("subj", "pred", "obj_iri", "obj_lit", "obj_type", "graph"), dir, 2)
    // N-Quads is a superset format: the triple reader must surface the
    // triples (graph dropped), never silently return nothing
    val asTriples = new NTriples.Files(2).read(spark, dir)
    assert(asTriples.count() === 20)
    assert(asTriples.columns.toSeq === Seq("subj", "pred", "obj_iri", "obj_lit", "obj_type"))
  }

  test("decodeQuads is decodeTriples plus the segment graph, row for row") {
    val sp = spark; import sp.implicits._
    val n = 2000L
    val enc = KgPipeline.encodedTriples(spark, n)
    val quads = KgPipeline.decodeQuads(enc, n, segSize = 100L).cache()
    val triples = KgPipeline.decodeTriples(enc, n).toDF()
    assert(quads.count() === triples.count())
    // the five triple columns agree as multisets
    val qt = quads.drop("graph").collect().map(_.toString).sorted
    val tt = triples.collect().map(_.toString).sorted
    assert(qt.toSeq === tt.toSeq)
    // graph labels: every row's graph is its subject page's segment
    val segs = quads.select("graph").distinct().as[String].collect().toSet
    assert(segs === (0 until 20).map(i => s"graft:seg_$i").toSet)
    quads.unpersist()
  }
}
