package graft.operators

import graft.SparkTestBase
import graft.model.{Triple, Vocab => V}
import graft.pipeline.KgPipeline
import graft.synth.PagesSynth

class ValidateSpec extends SparkTestBase {

  private def graph(ts: Triple*) = {
    val sps = spark; import sps.implicits._
    spark.createDataset(ts)
  }

  test("hand-built graph: range violations surface exactly the non-conforming edges") {
    val g = graph(
      // ontology: p1 ranges over C, p2 over D; p3 declares nothing
      Triple("p1", V.GraftRange, "C", null, null),
      Triple("p2", V.GraftRange, "D", null, null),
      // instances: a is a C, b is a D, c is typed with the WRONG class
      Triple("a", V.RdfType, "C", null, null),
      Triple("b", V.RdfType, "D", null, null),
      Triple("c", V.RdfType, "C", null, null),
      // edges
      Triple("x", "p1", "a", null, null),  // conforms (a: C)
      Triple("x", "p2", "b", null, null),  // conforms (b: D)
      Triple("x", "p2", "c", null, null),  // VIOLATION (c is C, p2 wants D)
      Triple("x", "p1", "ghost", null, null), // VIOLATION (ghost untyped)
      Triple("x", "p3", "ghost", null, null), // no declaration -> not checked
      Triple("x", "p1", null, "lit", V.XsdString)) // literal edge -> not checked
    val v = Validate.rangeViolations(g)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(v == Set(("x", "p2", "c"), ("x", "p1", "ghost")))
  }

  test("an instance typed with BOTH classes conforms to either range") {
    val g = graph(
      Triple("p1", V.GraftRange, "C", null, null),
      Triple("p2", V.GraftRange, "D", null, null),
      Triple("m", V.RdfType, "C", null, null),
      Triple("m", V.RdfType, "D", null, null),
      Triple("x", "p1", "m", null, null),
      Triple("y", "p2", "m", null, null))
    assert(Validate.rangeViolations(g).count() == 0)
  }

  test("the emitted pipeline graph is fully range-conformant; planted corruption fires") {
    val sps = spark; import sps.implicits._
    val base = KgPipeline.triples(spark, 300)
    assert(Validate.rangeViolations(base).count() == 0,
      "the pipeline's own emission must conform to its own ontology")
    val bad = graph(Triple("https://h.example/p/1", "web:mentions", "ent:not-registered", "0:1", null))
    val v = Validate.rangeViolations(base.unionAll(bad))
    assert(v.collect().map(_.getString(2)).toSeq == Seq("ent:not-registered"))
  }
}
