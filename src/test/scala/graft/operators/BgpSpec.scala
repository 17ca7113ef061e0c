package graft.operators

import graft.SparkTestBase
import graft.operators.Bgp.Pattern
import org.apache.spark.sql.functions._

/** Bgp.solve semantics: hand-derived bindings for star/chain/variable-
  * predicate shapes, bag semantics, out-of-order connectivity, and loud
  * rejection of disconnected patterns. */
class BgpSpec extends SparkTestBase {

  private def triples = {
    val sp = spark; import sp.implicits._
    Seq(
      ("p1", "lang", "en"),
      ("p1", "mentions", "e1"),
      ("p1", "mentions", "e2"),
      ("p1", "mentions", "e1"), // duplicate mention: bag semantics
      ("p2", "lang", "de"),
      ("p2", "mentions", "e1"),
      ("p3", "lang", "en"),
      ("e1", "name", "Entity One"),
      ("e2", "name", "Entity Two")).toDF("subj", "pred", "obj")
  }

  test("star with constant object: hand-derived bindings") {
    val sp = spark; import sp.implicits._
    val out = Bgp.solve(triples, Seq(
        Pattern("?p", "lang", "en"), Pattern("?p", "mentions", "?e")))
      .as[(String, String)].collect().sorted.toSeq
    // p3 is English but mentions nothing; p2 mentions but is German
    assert(out === Seq(("p1", "e1"), ("p1", "e1"), ("p1", "e2")))
  }

  test("chain joins a pattern's object to the next pattern's subject") {
    val sp = spark; import sp.implicits._
    val out = Bgp.solve(triples, Seq(
        Pattern("?p", "mentions", "?e"), Pattern("?e", "name", "?n")))
      .select("p", "n").as[(String, String)].collect().sorted.toSeq
    assert(out === Seq(("p1", "Entity One"), ("p1", "Entity One"),
      ("p1", "Entity Two"), ("p2", "Entity One")))
  }

  test("variable predicate binds the predicate column") {
    val sp = spark; import sp.implicits._
    val out = Bgp.solve(triples, Seq(Pattern("p2", "?r", "?o")))
      .as[(String, String)].collect().sorted.toSeq
    assert(out === Seq(("lang", "de"), ("mentions", "e1")))
  }

  test("connectivity may arrive out of list order (greedy reorder)") {
    val sp = spark; import sp.implicits._
    // pattern 2 shares nothing with pattern 1 directly; pattern 3 bridges
    val out = Bgp.solve(triples, Seq(
        Pattern("?p", "lang", "en"),
        Pattern("?e", "name", "?n"),
        Pattern("?p", "mentions", "?e")))
      .select("p", "n").as[(String, String)].collect().sorted.toSeq
    assert(out === Seq(("p1", "Entity One"), ("p1", "Entity One"),
      ("p1", "Entity Two")))
  }

  test("disconnected patterns are rejected, never cross-joined") {
    val e = intercept[IllegalArgumentException] {
      Bgp.solve(triples, Seq(
        Pattern("?p", "lang", "en"), Pattern("?e", "name", "?n")))
    }
    assert(e.getMessage.contains("disconnected"))
    // all-constant pattern binds nothing: also rejected
    intercept[IllegalArgumentException] {
      Bgp.solve(triples, Seq(Pattern("p1", "lang", "en")))
    }
    // repeated variable inside one pattern: unsupported, loud
    intercept[IllegalArgumentException] {
      Bgp.solve(triples, Seq(Pattern("?x", "mentions", "?x")))
    }
  }

  test("OPTIONAL keeps unmatched bindings with null columns (bag-preserving)") {
    val out = Bgp.solveOptional(triples,
        Seq(Pattern("?p", "lang", "?l")),
        Seq(Seq(Pattern("?p", "mentions", "?e"))))
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getString(2)}")
      .sorted.toSeq
    // p3 has no mentions: survives with a null ?e; p1's duplicate mention
    // contributes two bindings (bag semantics through the left join)
    assert(out === Seq("p1|en|e1", "p1|en|e1", "p1|en|e2", "p2|de|e1", "p3|en|null"))
  }

  test("an OPTIONAL group sharing no variable is rejected") {
    val e = intercept[IllegalArgumentException] {
      Bgp.solveOptional(triples,
        Seq(Pattern("?p", "lang", "en")),
        Seq(Seq(Pattern("?x", "name", "?n"))))
    }
    assert(e.getMessage.contains("OPTIONAL"))
  }

  test("an OPTIONAL group chained through another group's variable is rejected") {
    // ?e is bound only by the first optional group: it is NULLABLE there,
    // and SPARQL's unbound-compatible semantics cannot map to an equi
    // join — must be rejected, not silently mis-joined
    // a group with NO required-var anchor trips the first guard
    intercept[IllegalArgumentException] {
      Bgp.solveOptional(triples,
        Seq(Pattern("?p", "lang", "?l")),
        Seq(Seq(Pattern("?p", "mentions", "?e")),
            Seq(Pattern("?e", "name", "?n"))))
    }
    // a group anchored on ?p but ALSO re-using group 1's nullable ?e trips
    // the chained-variable guard specifically
    val e = intercept[IllegalArgumentException] {
      Bgp.solveOptional(triples,
        Seq(Pattern("?p", "lang", "?l")),
        Seq(Seq(Pattern("?p", "mentions", "?e")),
            Seq(Pattern("?p", "mentions", "?e"))))
    }
    assert(e.getMessage.contains("another OPTIONAL group"))
    // but two INDEPENDENT groups, each anchored on required vars, are fine
    val ok = Bgp.solveOptional(triples,
      Seq(Pattern("?p", "lang", "?l")),
      Seq(Seq(Pattern("?p", "mentions", "?e")),
          Seq(Pattern("?p", "lang", "en"))))
    assert(ok.columns.toSet === Set("p", "l", "e"))
  }

  test("MINUS drops bindings with a compatible minus solution; unshared group rejected") {
    val sp = spark; import sp.implicits._
    val out = Bgp.solveMinus(triples,
        Seq(Pattern("?p", "mentions", "?e")),
        Seq(Pattern("?p", "lang", "en")))
      .as[(String, String)].collect().sorted.toSeq
    // p1 is English → all its mention bindings removed; p2 (German) survives
    assert(out === Seq(("p2", "e1")))
    val e = intercept[IllegalArgumentException] {
      Bgp.solveMinus(triples,
        Seq(Pattern("?p", "mentions", "?e")),
        Seq(Pattern("?x", "name", "?n")))
    }
    assert(e.getMessage.contains("MINUS"))
  }

  test("CONSTRUCT instantiates templates per binding; unbound vars rejected") {
    val sp = spark; import sp.implicits._
    val premise = Bgp.solve(triples, Seq(
        Pattern("?p", "mentions", "?a"), Pattern("?p", "mentions", "?b")))
      .filter(col("a") < col("b"))
    val out = Bgp.construct(premise,
        Seq(Pattern("?a", "coMentioned", "?b"), Pattern("?b", "coMentioned", "?a")))
      .distinct()
      .as[(String, String, String)].collect().toSet
    // only p1 mentions two distinct entities
    assert(out === Set(("e1", "coMentioned", "e2"), ("e2", "coMentioned", "e1")))
    val e = intercept[IllegalArgumentException] {
      Bgp.construct(premise, Seq(Pattern("?a", "coMentioned", "?missing")))
    }
    assert(e.getMessage.contains("not bound"))
  }

  test("selectivity ordering: the most-bound pattern folds first regardless of list order (r7)") {
    // unselective predicate-only pattern listed FIRST; the (p,o)-bound
    // pattern must still anchor the join tree (deepest-left leaf) — the
    // Stocker et al. variable-counting order inside the connectivity
    // constraint
    val df = Bgp.solve(triples, Seq(
      Pattern("?p", "mentions", "?e"),        // 1 constant (pred) — least selective
      Pattern("?e", "name", "Entity One")))   // 2 constants — most selective
    // analyzed plan (pre-constant-folding — LocalRelation tests would
    // otherwise inline the filters away): left-deep fold ⇒ the
    // first-folded pattern's filter prints before the other leaf's in
    // pre-order
    val s = df.queryExecution.analyzed.toString
    assert(s.indexOf("Entity One") >= 0 && s.indexOf("mentions") >= 0, s)
    assert(s.indexOf("Entity One") < s.indexOf("mentions"),
      s"selective pattern did not fold first:\n$s")
    // and the bindings are unchanged by the reorder
    val rows = df.select("p", "e").collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq(("p1", "e1"), ("p1", "e1"), ("p2", "e1")))
  }

  test("constant terms push down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("bgp").toString
    triples.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val plan = Bgp.solve(stored, Seq(
        Pattern("?p", "lang", "en"), Pattern("?p", "mentions", "?e")))
      .queryExecution.executedPlan.toString
    // each branch's constant predicate reaches the scan as a pushed filter
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(pred,lang)") && plan.contains("EqualTo(obj,en)"), plan)
    assert(plan.contains("EqualTo(pred,mentions)"), plan)
  }
}
