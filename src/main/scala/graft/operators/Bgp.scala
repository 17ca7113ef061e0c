package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern matching over a (subj, pred, obj) triple table —
  * the SPARQL BGP core (SPARQL 1.1 §5.1 shape; the reference engine's
  * per-document lookups generalize to this declarative form at corpus
  * scale). A pattern term starting with '?' is a variable; anything else
  * is a constant.
  *
  * Compilation is one filtered SCAN of the triple table per pattern
  * (constants become scan predicates — they push into the parquet reader;
  * a pattern with a constant predicate never reads the other predicates'
  * row groups under predicate-ordered clustering) and one INNER EQUI-JOIN
  * per shared variable, folded left in pattern order. Join strategy and
  * ordering stay with Catalyst/AQE: selective patterns broadcast, big
  * ones shuffle on the shared-variable key — the plan a SPARQL engine's
  * cost model would pick, for free.
  *
  * Disconnected patterns are REJECTED up front: a BGP whose variable
  * graph is not connected multiplies bindings (a cartesian product) — at
  * 10¹²-triple scale that is always a query bug, and the engine's
  * contract-wide no-cross-join plan guard forbids the plan it would
  * compile to. Split such a query and combine the halves explicitly.
  *
  * Result: one column per distinct variable (without the '?'), one row
  * per binding (bag semantics, duplicates preserved — SPARQL's default).
  */
object Bgp {

  final case class Pattern(s: String, p: String, o: String) {
    private[Bgp] def terms = Seq("subj" -> s, "pred" -> p, "obj" -> o)
    private[Bgp] def vars = terms.collect { case (_, t) if isVar(t) => t.tail }
  }

  private def isVar(t: String): Boolean = t.startsWith("?")

  /** Solve the BGP against `triples(subj, pred, obj)`. */
  def solve(triples: DataFrame, patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")
    patterns.foreach { pt =>
      require(pt.vars.nonEmpty, s"pattern binds no variable: $pt")
      val dup = pt.vars.diff(pt.vars.distinct)
      require(dup.isEmpty, s"repeated variable inside one pattern is unsupported: $pt")
    }
    requireConnected(patterns)

    def scan(pt: Pattern): DataFrame = {
      // constants filter the scan; variables project to their column name
      val filtered = pt.terms.foldLeft(triples) { case (df, (c, t)) =>
        if (isVar(t)) df else df.filter(col(c) === t)
      }
      filtered.select(pt.terms.collect { case (c, t) if isVar(t) =>
        col(c).as(t.tail)
      }: _*)
    }

    // greedy SELECTIVITY-ordered connected fold (r7): without CBO stats
    // Catalyst does not reorder inner joins, so list order used to decide
    // the join tree — a user writing the unselective pattern first
    // shuffled the whole triple table before the selective one pruned.
    // Order instead by the variable-counting heuristic (Stocker et al.,
    // "SPARQL Basic Graph Pattern Optimization Using Selectivity
    // Estimation", WWW'08): most-bound pattern first; ties by original
    // list position (deterministic). Every later pick must still share a
    // variable with the bindings ACCUMULATED SO FAR (connectivity
    // constraint — requireConnected guarantees a pick always exists).
    // Result multisets are join-order invariant; output column order may
    // differ (callers and the driver compare columns by name).
    val idx = patterns.zipWithIndex
    val first = idx.minBy { case (pt, i) => (selectivityRank(pt), i) }
    val ordered = scala.collection.mutable.Buffer(first._1)
    val seen = scala.collection.mutable.Set(first._1.vars: _*)
    var rest = idx.filterNot(_._2 == first._2)
    while (rest.nonEmpty) {
      val pick = rest.filter(_._1.vars.exists(seen.contains))
        .minBy { case (pt, i) => (selectivityRank(pt), i) }
      ordered += pick._1; seen ++= pick._1.vars
      rest = rest.filterNot(_._2 == pick._2)
    }
    ordered.tail.foldLeft(scan(ordered.head)) { (acc, pt) =>
      val shared = pt.vars.filter(acc.columns.contains)
      acc.join(scan(pt), shared)
    }
  }

  /** Variable-counting selectivity rank — lower folds earlier. Constants
    * beat variables; among equal counts a bound subject beats a bound
    * object beats a bound predicate (predicates are the LOW-cardinality
    * dimension of a triple table, so a predicate-only pattern is the least
    * selective bound form — Stocker et al.'s ordering). */
  private def selectivityRank(pt: Pattern): Int = {
    val s = if (isVar(pt.s)) 0 else 4
    val o = if (isVar(pt.o)) 0 else 2
    val p = if (isVar(pt.p)) 0 else 1
    -(s + o + p)
  }

  /** [[solve]] extended with SPARQL OPTIONAL groups (SPARQL 1.1 §6):
    * each optional group solves independently and LEFT-joins the required
    * bindings on its shared variables — bindings with no match keep the
    * group's variables null instead of disappearing. Each group must share
    * at least one variable with the required pattern (an unshared group
    * would be a cartesian extension — rejected like disconnected BGPs). */
  def solveOptional(triples: DataFrame, required: Seq[Pattern],
      optionals: Seq[Seq[Pattern]]): DataFrame = {
    val base = solve(triples, required)
    val requiredVars = base.columns.toSet
    // vars minted by earlier optional groups: NULLABLE, so they can never
    // be equi-join keys — SPARQL treats an unbound variable as COMPATIBLE
    // (the join would have to match on null), Spark's equi join treats
    // null as matching nothing. Chaining optionals through such a var
    // silently diverges from SPARQL, so it is rejected loudly instead.
    val optionalVars = scala.collection.mutable.Set[String]()
    optionals.foldLeft(base) { (acc, group) =>
      val g = solve(triples, group)
      val shared = g.columns.filter(requiredVars.contains).toSeq
      require(shared.nonEmpty,
        s"OPTIONAL group shares no variable with the required pattern: ${group.mkString(", ")}")
      val chained = g.columns.filter(optionalVars.contains)
      require(chained.isEmpty,
        s"OPTIONAL group references variables bound only by another OPTIONAL group " +
          s"(${chained.mkString(", ")}) — unbound-compatible SPARQL semantics do not map " +
          "to an equi join; nest the patterns into one group instead")
      optionalVars ++= g.columns.filterNot(requiredVars.contains)
      acc.join(g, shared, "left")
    }
  }

  /** SPARQL MINUS (SPARQL 1.1 §8.3): drop every required binding for which
    * the minus group has at least one compatible solution — compiled as a
    * LEFT ANTI join on the shared variables (exactly SPARQL's
    * compatibility: shared variables equal, unshared ones unconstrained).
    * A minus group sharing NO variable is rejected: SPARQL defines that
    * case as removing nothing, and silently keeping everything is a
    * footgun — ask for the no-op explicitly. */
  def solveMinus(triples: DataFrame, required: Seq[Pattern],
      minusGroup: Seq[Pattern]): DataFrame = {
    val base = solve(triples, required)
    val g = solve(triples, minusGroup)
    val shared = g.columns.filter(base.columns.contains).toSeq
    require(shared.nonEmpty,
      s"MINUS group shares no variable with the required pattern (a SPARQL no-op): ${minusGroup.mkString(", ")}")
    base.join(g, shared, "left_anti")
  }

  /** SPARQL CONSTRUCT: instantiate triple templates once per binding row
    * (SPARQL 1.1 §16.2) — the generic rule-inference form: WHERE finds the
    * premise bindings, CONSTRUCT emits the conclusion triples. Template
    * terms substitute binding columns ('?x') or pass through as constants.
    * Bag semantics like the rest of the family; callers `.distinct()` when
    * materializing a rule's closure (SPARQL engines dedup at serialization
    * — same place). */
  def construct(bindings: DataFrame, templates: Seq[Pattern]): DataFrame = {
    require(templates.nonEmpty, "empty CONSTRUCT template")
    templates.foreach(_.vars.foreach(v =>
      require(bindings.columns.contains(v), s"template variable ?$v is not bound")))
    def term(t: String) = if (isVar(t)) col(t.tail) else lit(t)
    templates.map { t =>
      bindings.select(term(t.s).as("subj"), term(t.p).as("pred"), term(t.o).as("obj"))
    }.reduce(_ unionAll _)
  }

  /** Every pattern after the first must share a variable with some earlier
    * pattern (checked in ANY order — the pattern list need not be
    * pre-sorted; a standard union-find over the variable sets). */
  private def requireConnected(patterns: Seq[Pattern]): Unit = {
    val reach = scala.collection.mutable.Set(patterns.head.vars: _*)
    var rest = patterns.tail
    var progress = true
    while (rest.nonEmpty && progress) {
      val (hit, miss) = rest.partition(p => p.vars.exists(reach.contains))
      progress = hit.nonEmpty
      hit.foreach(p => reach ++= p.vars)
      rest = miss
    }
    require(rest.isEmpty,
      s"disconnected basic graph pattern (cartesian product at scale): ${rest.mkString(", ")}")
  }
}
