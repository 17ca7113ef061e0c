package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Triple, Vocab => V}

/** Ontology-conformance validation over the emitted graph — the integrity
  * gate a KG-construction pipeline runs before publishing a snapshot (the
  * reference's analog is its strict emission discipline: every object ref
  * resolves through typed lookups at build time, CityModel.cpp:361 — a
  * distributed pipeline assembling triples from many stages needs the
  * check as a first-class operator instead).
  *
  * The ontology is read FROM THE GRAPH ITSELF (`graft:range` declarations
  * ride as ordinary triples, emitted once per job), so the validator needs
  * no side-channel schema. Scale shape: the range table is O(vocabulary)
  * (broadcast side), instance types are a filtered scan of the graph, and
  * the conformance check is one equi anti-join keyed on the object IRI —
  * no cross product, no driver state.
  */
object Validate {

  /** Edges violating their predicate's declared range: for every predicate
    * carrying a `graft:range C` declaration in `triples`, the object-IRI
    * edges whose object lacks `rdf:type C`. Conforming graphs return 0
    * rows; each violation surfaces as its offending (subj, pred, obj_iri,
    * range_cls) edge. */
  def rangeViolations(triples: Dataset[Triple]): DataFrame = {
    val ranges = triples.filter(col("pred") === V.GraftRange)
      .select(col("subj").as("range_pred"), col("obj_iri").as("range_cls")).distinct()
    val types = triples.filter(col("pred") === V.RdfType)
      .select(col("subj").as("typed_inst"), col("obj_iri").as("typed_cls")).distinct()
    triples.filter(col("obj_iri").isNotNull)
      .join(ranges, col("pred") === col("range_pred")) // broadcast: O(vocab)
      .select(col("subj"), col("pred"), col("obj_iri"), col("range_cls"))
      .join(types,
        col("obj_iri") === col("typed_inst") && col("range_cls") === col("typed_cls"),
        "left_anti")
  }
}
